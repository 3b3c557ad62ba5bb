"""Auxiliary subsystems: stats/profiling and checkpoint/resume."""

import numpy as np
import pytest

import pipe_tpu
from pipe_tpu import checkpoint, mock, ops


def test_stats_recorder_counts_blocks():
    src = mock.Source(value=1.0, channels=2, limit=10 * 64)
    sink = mock.Sink(discard=True)
    stats = pipe_tpu.StatsRecorder()
    pipe_tpu.run(
        64,
        pipe_tpu.Line(source=src.source(), sink=sink.sink()),
        stats=stats,
    )
    ls = stats.lines["line0"]
    assert ls.blocks == 11  # 10 data blocks + 1 EOF step
    assert ls.block_size == 64 and ls.channels == 2
    assert ls.wall_s > 0
    assert "line0" in stats.report()


def test_stats_on_async_pipe():
    src = mock.Source(value=1.0, channels=1, limit=5 * 32)
    sink = mock.Sink(discard=True)
    stats = pipe_tpu.StatsRecorder()
    p = pipe_tpu.Pipe(
        32, pipe_tpu.Line(source=src.source(), sink=sink.sink()), stats=stats
    )
    p.start()
    p.wait(60)
    assert stats.total_blocks >= 5
    assert stats.lines["line0"].samples_per_s > 0


def test_checkpoint_roundtrip_resumes_stream(tmp_path, rng):
    """Snapshot mid-stream (between runs), restore into a fresh pipe, and
    the resumed output must equal the uninterrupted stream: filter tails
    and resampler history survive the round-trip."""
    h = ops.design_lowpass(63, cutoff=4000, sample_rate=44100)
    x = rng.standard_normal((2, 2048)).astype(np.float32)

    def make_pipe(data, sink):
        src = _array_source(data)
        fir = ops.FIR(h)
        return pipe_tpu.Pipe(
            256,
            pipe_tpu.Line(
                source=src, sink=sink.sink(), processors=[fir.processor()]
            ),
        )

    # uninterrupted reference
    sink_full = mock.Sink()
    p = make_pipe(x, sink_full)
    p.start()
    p.wait(60)

    # first half, snapshot, save/load, restore into a second-half pipe
    sink_a = mock.Sink()
    pa = make_pipe(x[:, :1024], sink_a)
    pa.start()
    pa.wait(60)
    ck = checkpoint.snapshot(pa)
    path = tmp_path / "s.npz"
    ck.save(str(path))
    ck2 = checkpoint.load(str(path))

    sink_b = mock.Sink()
    pb = make_pipe(x[:, 1024:], sink_b)
    checkpoint.restore(pb, ck2)
    # the restored source state has consumed 1024 frames; reset only its
    # position so it reads the second half from the start of its own data
    pb.routes[0].source.update_state(
        lambda s: {**s, "pos": np.int32(0)}
    )
    pb.start()
    pb.wait(60)

    got = np.concatenate([sink_a.values, sink_b.values], axis=1)
    np.testing.assert_allclose(got, sink_full.values, atol=1e-6)


def test_checkpoint_after_width_changing_surgery(rng):
    """A pipe modified by a width-changing LIVE INSERT snapshots into a
    checkpoint that restores into a pipe BUILT with the final graph: the
    surgically-grown route's state trees match the fresh build's, so the
    resumed stream continues exactly (the surgery x checkpoint cross
    product, r5)."""
    import threading
    import time as _time

    from pipe_tpu import checkpoint
    from pipe_tpu.components import Source
    from pipe_tpu.signal import SignalProperties

    B = 256
    h = ops.design_lowpass(63, cutoff=4000, sample_rate=44100)
    x = rng.standard_normal((2, B * 16)).astype(np.float32)
    half = B * 8

    # phase 1: stream the first half; a resampler is live-inserted at
    # block 4 (width-changing: downstream FIR re-allocated, tail carried)
    pos = [0]
    gate = threading.Event()

    def feed_a(n):
        if pos[0] >= 2 * B:
            gate.wait(60)
        if pos[0] >= half:
            return None
        c = x[:, pos[0] : pos[0] + n]
        pos[0] += n
        return c

    fir_a = ops.FIR(h)
    sink_a = mock.Sink()
    pa = pipe_tpu.Pipe(
        B,
        pipe_tpu.Line(
            source=lambda ctx, b: Source(
                output=SignalProperties(44100.0, 2), feed=feed_a
            ),
            processors=[fir_a.processor()],
            sink=sink_a.sink(),
        ),
    )
    pa.start()
    hd = pa.insert_processor(0, 0, ops.Resampler(2, 1).processor(), at_block=4)
    le = pa._exec_of_route[0]
    deadline = _time.time() + 60
    while le._next_target(0) != 4:
        assert _time.time() < deadline
        _time.sleep(0.002)
    gate.set()
    assert hd.wait(60) and hd.error is None, hd.error
    pa.wait(60)
    ck = checkpoint.snapshot(pa)

    # phase 2: a FRESH pipe built with the post-surgery graph; restore
    # and stream the second half — tails and resampler phase continue
    pos2 = [0]

    def feed_b(n):
        if pos2[0] >= half:
            return None
        c = x[:, half + pos2[0] : half + pos2[0] + n]
        pos2[0] += n
        return c

    fir_b = ops.FIR(h)
    sink_b = mock.Sink()
    pb = pipe_tpu.Pipe(
        B,
        pipe_tpu.Line(
            source=lambda ctx, b: Source(
                output=SignalProperties(44100.0, 2), feed=feed_b
            ),
            processors=[ops.Resampler(2, 1).processor(), fir_b.processor()],
            sink=sink_b.sink(),
        ),
    )
    checkpoint.restore(pb, ck)
    pb.start()
    pb.wait(60)

    got = np.concatenate([sink_a.values, sink_b.values], axis=1)
    # oracle: raw to the cut (block 4), 2x-resampled after, one
    # continuous FIR over the stitched stream
    from pipe_tpu.ops.resample import polyphase_design
    import scipy.signal

    cut = 4 * B
    hp64 = polyphase_design(2, 1, 32)
    K = hp64.shape[1]
    tail = x.astype(np.float64)[:, cut:]
    n_out = 2 * tail.shape[1]
    j = np.arange(n_out)
    ph, n0 = j % 2, j // 2
    nidx = n0[:, None] - np.arange(K)[None, :]
    valid = (nidx >= 0) & (nidx < tail.shape[1])
    xg = np.where(valid[None], tail[:, np.clip(nidx, 0, tail.shape[1] - 1)], 0.0)
    res = np.einsum("cok,ok->co", xg, hp64[ph])
    stream = np.concatenate([x.astype(np.float64)[:, :cut], res], axis=1)
    oracle = scipy.signal.lfilter(np.asarray(h), [1.0], stream, axis=1)
    assert got.shape == oracle.shape, (got.shape, oracle.shape)
    from pipe_tpu.signal import snr_db

    assert snr_db(oracle, got) > 100


def test_checkpoint_rejects_mismatch(rng):
    src = mock.Source(value=1.0, channels=1, limit=64)
    sink = mock.Sink(discard=True)
    p = pipe_tpu.Pipe(64, pipe_tpu.Line(source=src.source(), sink=sink.sink()))
    ck = checkpoint.snapshot(p)

    src2 = mock.Source(value=1.0, channels=1, limit=64)
    sink2 = mock.Sink(discard=True)
    p2 = pipe_tpu.Pipe(32, pipe_tpu.Line(source=src2.source(), sink=sink2.sink()))
    with pytest.raises(ValueError):
        checkpoint.restore(p2, ck)  # block size mismatch

    src3 = mock.Source(value=1.0, channels=1, limit=64)
    g = ops.Gain(1.0)
    sink3 = mock.Sink(discard=True)
    p3 = pipe_tpu.Pipe(
        64,
        pipe_tpu.Line(
            source=src3.source(), sink=sink3.sink(), processors=[g.processor()]
        ),
    )
    with pytest.raises(ValueError):
        checkpoint.restore(p3, ck)  # structural mismatch (extra processor)


def test_snapshot_requires_stopped_pipe():
    src = mock.Source(value=1.0, channels=1, limit=100_000 * 16, interval=0.001)
    sink = mock.Sink(discard=True)
    p = pipe_tpu.Pipe(16, pipe_tpu.Line(source=src.source(), sink=sink.sink()))
    p.start()
    try:
        with pytest.raises(RuntimeError):
            checkpoint.snapshot(p)
    finally:
        # end the stream quickly — as a MUTATION, so the state write runs
        # on the executor thread at a block boundary (writing component
        # state from this thread would race the donated step buffers)
        def end():
            src._component.update_state(
                lambda s: {**s, "produced": np.int32(100_000 * 16)}
            )

        p.push(src.context.mutate(end))
        p.wait(60)


def _array_source(data):
    """Source over a fixed (C, N) array with device-side position state."""
    import jax
    import jax.numpy as jnp

    from pipe_tpu.components import Source
    from pipe_tpu.signal import Signal, SignalProperties

    arr = jnp.asarray(data, jnp.float32)
    C, total = arr.shape

    def alloc(mctx, block_size):
        def step(state, params):
            pos = state["pos"]
            left = total - pos
            read = jnp.clip(left, 0, block_size)
            blk = jax.lax.dynamic_slice(
                jnp.pad(arr, ((0, 0), (0, block_size))), (0, pos), (C, block_size)
            )
            return {"pos": pos + read}, Signal(blk, read), read <= 0

        return Source(
            output=SignalProperties(sample_rate=44100.0, channels=C),
            step=step,
            state={"pos": jnp.asarray(0, jnp.int32)},
            params={},
        )

    return alloc


def test_determinism_same_seed_same_output(rng):
    """The race-detector analog (SURVEY.md §5): two async runs of the same
    graph produce bit-identical output — scheduling cannot affect data."""
    h = ops.design_lowpass(63, cutoff=4000, sample_rate=44100)
    x = rng.standard_normal((2, 4096)).astype(np.float32)

    def run_once():
        sink = mock.Sink()
        fir = ops.FIR(h)
        p = pipe_tpu.Pipe(
            256,
            pipe_tpu.Line(
                source=_array_source(x),
                sink=sink.sink(),
                processors=[fir.processor()],
            ),
        )
        p.start()
        p.wait(60)
        return sink.values

    a, b = run_once(), run_once()
    np.testing.assert_array_equal(a, b)


def test_checkpoint_roundtrip_dynamics_chain(tmp_path, rng):
    """Snapshot/restore mid-stream across the new stateful ops (delay line,
    compressor envelope, channelizer history): resumed output == unbroken."""
    import pipe_tpu
    from pipe_tpu import checkpoint, mock, ops

    C, block, n_blocks = 1, 512, 12
    x = rng.standard_normal((C, block * n_blocks)).astype(np.float32)

    def build():
        pos = [0]

        def feed(bs):
            if pos[0] >= x.shape[1]:
                return None
            c = x[:, pos[0] : pos[0] + bs]
            pos[0] += c.shape[1]
            return c

        def src_alloc(mctx, bs):
            from pipe_tpu.components import Source
            from pipe_tpu.signal import SignalProperties

            return Source(output=SignalProperties(44100.0, C), feed=feed)

        sink = mock.Sink()
        procs = [
            ops.Delay(700, feedback=0.4, wet=0.5, dry=1.0).processor(),
            ops.Compressor(threshold_db=-10.0, ratio=3.0).processor(),
        ]
        return src_alloc, procs, sink, pos

    # unbroken run
    src_alloc, procs, sink, _ = build()
    line = pipe_tpu.Line(source=src_alloc, processors=procs, sink=sink.sink())
    pipe_tpu.run(block, line)
    whole = sink.values

    # run half (driving the executor directly for a deterministic cut),
    # snapshot, restore into a FRESH graph, resume the second half
    half = block * n_blocks // 2
    from pipe_tpu.graph import make_route
    from pipe_tpu.runtime.executor import LineExecutor

    src_alloc2, procs2, sink2, pos2 = build()
    line2 = pipe_tpu.Line(source=src_alloc2, processors=procs2, sink=sink2.sink())
    route = make_route(line2, block)
    le = LineExecutor(route, block)
    le.start_hook()
    for _ in range(n_blocks // 2):
        le.execute()
    le.drain()

    # snapshot the component states, build a new executor, restore, resume
    states = [jax.device_get(c.state) for c in route.components()]
    src_alloc3, procs3, sink3, pos3 = build()
    pos3[0] = half
    line3 = pipe_tpu.Line(source=src_alloc3, processors=procs3, sink=sink3.sink())
    route3 = make_route(line3, block)
    for comp, st in zip(route3.components(), states):
        comp.state = jax.tree.map(jnp.asarray, st)
    le3 = LineExecutor(route3, block)
    le3.start_hook()
    while le3.execute() is not EOFSentinel:
        pass
    le3.flush_hook()

    resumed = np.concatenate([sink2.values, sink3.values], axis=1)
    assert resumed.shape == whole.shape
    np.testing.assert_allclose(resumed, whole, atol=1e-6)


from pipe_tpu.runtime.executor import EOF as EOFSentinel  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
