"""Soak tests: long-running async pipes under a barrage of live mutations
and graph surgery — the integration stress the reference's race-detector
CI provides implicitly (SURVEY.md §5: our analog is structural + this).

The randomized matrix (`test_soak_randomized_*`) is the adversarial class:
seeded random mutation schedules + surgery + EOF partial tail + restart,
over thousands of blocks, under every lookahead/batch_blocks combination,
with an EXACT sample-level oracle (targeted pushes land deterministically,
so the expected output is computable in float64)."""

import threading
import time

import numpy as np
import pytest

import pipe_tpu
from pipe_tpu import mock, ops
from pipe_tpu.components import Source
from pipe_tpu.signal import SignalProperties, snr_db


def test_soak_mutations_and_surgery(rng):
    """Run ~200 blocks while pushing dozens of mutations, inserting two
    processors, and adding a line mid-flight; assert stream integrity."""
    block = 256
    total = block * 200
    gain = ops.Gain(1.0)
    src = mock.Source(channels=1, value=1.0, limit=total, interval=0.004)
    sink = mock.Sink()
    line = pipe_tpu.Line(
        source=src.source(),
        processors=pipe_tpu.Processors(gain.processor()),
        sink=sink.sink(),
    )
    p = pipe_tpu.Pipe(block, line)
    p.start()

    # barrage of gain mutations
    for i in range(25):
        p.push(gain.set_gain(1.0 + (i % 5) * 0.25))
        time.sleep(0.01)

    # splice two processors into the running line
    g2 = ops.Gain(2.0)
    h1 = p.insert_processor(0, 1, g2.processor())
    assert h1.wait(60) and h1.error is None
    bq = ops.Biquad(ops.design_peaking_eq(44100, freq=500, q=0.7, gain_db=0.0))
    h2 = p.insert_processor(0, 0, bq.processor())
    assert h2.wait(60) and h2.error is None

    # grow the graph with a second line while running
    src2 = mock.Source(channels=1, value=-1.0, limit=block * 40)
    sink2 = mock.Sink()
    h3 = p.add_line(
        pipe_tpu.Line(
            source=src2.source(),
            processors=pipe_tpu.Processors(),
            sink=sink2.sink(),
        )
    )
    assert h3.wait(60) and h3.error is None

    # more mutations after surgery, through the spliced component too
    for i in range(10):
        p.push(g2.set_gain(1.0 + i * 0.1))
        time.sleep(0.005)

    p.wait(240)

    out = sink.values
    assert out.shape == (1, total)  # no samples lost through all surgery
    assert np.isfinite(out).all()
    # mutations land at block boundaries only: values are piecewise-constant
    # per block (source is constant, chain is memoryless after settle)
    out2 = sink2.values
    assert out2.shape == (1, block * 40)
    assert np.allclose(out2, -1.0)


def _step_gains(schedule, n_samples, block):
    """Per-sample float64 gain curve from a (block_idx -> value) schedule."""
    g = np.ones(n_samples, np.float64)
    for b, v in schedule:
        g[b * block :] = np.float64(np.float32(v))
    return g


def _randomized_soak(lookahead, batch_blocks, mesh=None, block=256,
                     chunky=False):
    """Seeded-random targeted mutations on two live params, neutral
    mid-stream surgery (insert + add_line), an EOF partial tail, and a
    full restart — checked against an exact float64 oracle. With ``mesh``
    the same scenario runs the sharded executor; a ``block`` that does
    not divide the time axis exercises the r4 aggregation path (targets
    snap to the a-block grid). ``chunky`` makes the feed return
    random-length short reads (1..n frames per call — the reference's
    accept-anything SourceFunc), stressing the r5 mesh re-chunking
    against targets, held blocks, surgery, and restart."""
    from pipe_tpu import parallel

    seed = (
        1000 + lookahead * 100 + batch_blocks + (7 if mesh else 0) + block
        + (13 if chunky else 0)
    )
    r = np.random.default_rng(seed)
    BLOCK, n_blocks, tail, C = block, 1024, 73, 2
    if mesh is not None and not chunky:
        tail = 0  # legacy shape; the chunky variant also takes the
        # partial EOF tail through the mesh path (r5 re-chunking)
    total = BLOCK * n_blocks + tail
    data = r.standard_normal((C, total)).astype(np.float32)

    gate = threading.Event()
    pos = [0]
    # own RNG: the feed runs on the executor thread, concurrent with the
    # schedule-building main thread (np Generators are not thread-safe)
    r_feed = np.random.default_rng(seed + 1)

    def feed(n):
        gate.wait(60)
        if pos[0] >= total:
            return None
        take = n
        if chunky:
            take = min(int(r_feed.integers(1, n + 1)), total - pos[0])
        c = data[:, pos[0] : pos[0] + take]
        pos[0] += take
        return c

    def alloc(ctx, block):
        return Source(output=SignalProperties(44100.0, C), feed=feed)

    mk_gain = (lambda v: parallel.sharded.Gain(v)) if mesh else ops.Gain
    g1, g2 = mk_gain(1.0), mk_gain(1.0)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=alloc,
            processors=[g1.processor(), g2.processor()],
            sink=sink.sink(),
        ),
        lookahead=lookahead,
        batch_blocks=batch_blocks,
        mesh=mesh,
    )
    p.start()

    # random schedules, queued while the gated feed pins the frontier at 0
    # (every target is then strictly ahead: deterministic landing). On an
    # aggregated mesh pipe targets must sit on the a-block grid.
    agg = getattr(p, "_agg", 1)
    grid = np.arange((8 // agg) + 1, n_blocks // agg) * agg

    def schedule(gain):
        blocks = np.sort(r.choice(grid, 30, replace=False))
        vals = r.uniform(0.25, 2.0, blocks.size)
        for b, v in zip(blocks, vals):
            p.push(gain.set_gain(float(v)), at_block=int(b))
        return list(zip(blocks.tolist(), vals.tolist()))

    sched1, sched2 = schedule(g1), schedule(g2)
    time.sleep(0.3)  # let the control thread drain the queue into the dest
    gate.set()

    # neutral surgery mid-flight: oracle-invariant, structurally real
    deadline = time.time() + 120
    while sink.samples < 32 * BLOCK and time.time() < deadline:
        time.sleep(0.005)
    g3 = mk_gain(1.0)
    h1 = p.insert_processor(0, int(r.integers(0, 3)), g3.processor())
    assert h1.wait(60) and h1.error is None
    side_n = [0]
    side_C = C if mesh is not None else 1  # mesh: channel-axis divisibility

    side_total = 10 * BLOCK

    def side_feed(n):
        if side_n[0] >= side_total:
            return None
        m = min(n, side_total - side_n[0])
        side_n[0] += m
        return np.full((side_C, m), 0.5, np.float32)

    def side_alloc(ctx, block):
        return Source(output=SignalProperties(44100.0, side_C), feed=side_feed)

    side_src = mock.Source(channels=1, value=0.5, limit=10 * BLOCK)
    side_sink = mock.Sink()
    h2 = p.add_line(
        pipe_tpu.Line(
            source=side_alloc if mesh is not None else side_src.source(),
            processors=pipe_tpu.Processors(),
            sink=side_sink.sink(),
        )
    )
    assert h2.wait(60) and h2.error is None
    for _ in range(5):  # untargeted but neutral: stresses routing only
        p.push(g3.set_gain(1.0))
        time.sleep(0.002)

    p.wait(240)

    out = sink.values
    assert out.shape == (C, total)  # EOF partial tail fully delivered
    oracle = (
        data.astype(np.float64)
        * _step_gains(sched1, total, BLOCK)
        * _step_gains(sched2, total, BLOCK)
    )
    snr = snr_db(oracle, out)
    assert snr > 100, f"first run: {snr:.1f} dB"
    assert side_sink.values.shape == (side_C, 10 * BLOCK)
    assert np.allclose(side_sink.values, 0.5)

    # restart: initializers reset the params; the feed rewinds. The second
    # pass re-runs the whole stream (surgery survivors included — all
    # neutral or reset) against the plain-data oracle.
    pos[0] = 0
    gate.clear()  # re-pin the frontier so the new pushes cannot race it
    p.start(g1.set_gain(1.0), g2.set_gain(1.0), g3.set_gain(1.0))
    blocks = np.sort(r.choice(grid, 10, replace=False))
    vals = r.uniform(0.5, 1.5, blocks.size)
    for b, v in zip(blocks, vals):
        p.push(g1.set_gain(float(v)), at_block=int(b))
    time.sleep(0.3)
    gate.set()
    p.wait(240)
    out2 = sink.values[:, total:]
    assert out2.shape == (C, total)
    oracle2 = data.astype(np.float64) * _step_gains(
        list(zip(blocks.tolist(), vals.tolist())), total, BLOCK
    )
    snr2 = snr_db(oracle2, out2)
    assert snr2 > 100, f"restart run: {snr2:.1f} dB"


@pytest.mark.parametrize(
    "lookahead,batch_blocks", [(1, 1), (8, 1), (1, 32), (8, 32)]
)
def test_soak_randomized_mutations_surgery_eof_restart(lookahead, batch_blocks):
    """VERDICT r1 item 8: the randomized scenario under every perf-knob
    combination (see :func:`_randomized_soak`)."""
    _randomized_soak(lookahead, batch_blocks)


@pytest.mark.parametrize("lookahead,batch_blocks", [(1, 1), (8, 4)])
def test_soak_randomized_on_mesh(lookahead, batch_blocks):
    """The SAME randomized scenario (mutations + surgery + add_line +
    restart) on a 2x4 mesh — the unified-path stress."""
    from pipe_tpu import parallel

    _randomized_soak(lookahead, batch_blocks, mesh=parallel.make_mesh(2, 4))


def test_soak_randomized_on_aggregated_mesh():
    """The SAME randomized scenario on a mesh whose block size forces
    r4 block aggregation (block 257 on 4 time shards -> a = 4): grid-
    aligned targets land exactly, surgery/restart/EOF all hold."""
    from pipe_tpu import parallel

    _randomized_soak(1, 1, mesh=parallel.make_mesh(2, 4), block=257)


def test_soak_randomized_on_mesh_chunky_short_reads():
    """The randomized scenario on a 2x4 mesh with a feed returning
    random-length short reads (r5 re-chunking) AND a partial EOF tail:
    residue parking must compose with targeted landings, held blocks,
    surgery, and restart — exactly."""
    from pipe_tpu import parallel

    _randomized_soak(1, 4, mesh=parallel.make_mesh(2, 4), chunky=True)


def test_soak_randomized_on_aggregated_mesh_chunky():
    """Short-read re-chunking UNDER block aggregation (block 257 -> a=4):
    the residue machinery assembles aggregated dispatch chunks from
    arbitrary-length reads while targets land on the a-grid."""
    from pipe_tpu import parallel

    _randomized_soak(1, 1, mesh=parallel.make_mesh(2, 4), block=257,
                     chunky=True)


@pytest.mark.parametrize("batch_blocks", [1, 32])
def test_soak_stop_midstream_under_load(batch_blocks):
    """stop() while mutations are in flight on an unbounded stream: clean
    exit at a block boundary, flush hooks run, no error raised."""
    gain = ops.Gain(1.0)
    src = mock.Source(channels=1, value=1.0, interval=0.002)  # unbounded
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        256,
        pipe_tpu.Line(
            source=src.source(),
            processors=[gain.processor()],
            sink=sink.sink(),
        ),
        lookahead=8,
        batch_blocks=batch_blocks,
    )
    p.start()
    deadline = time.time() + 60
    while sink.samples < 256 and time.time() < deadline:
        time.sleep(0.005)
    for i in range(10):
        p.push(gain.set_gain(1.0 + 0.1 * i))
    p.stop(120)
    assert sink.flushed
    n = sink.values.shape[1]
    assert n >= 256 and n % 256 == 0
    assert np.isfinite(sink.values).all()


def test_soak_failure_midstream_under_batching():
    """A feed failure deep in a batched stream with pending targeted
    mutations: first-error-wins, wait() raises, flush still runs."""
    fed = [0]

    def feed(n):
        if fed[0] >= 200 * 256:
            raise IOError("injected failure at block 200")
        fed[0] += n
        return np.ones((1, n), np.float32)

    def alloc(ctx, block):
        return Source(output=SignalProperties(44100.0, 1), feed=feed)

    gain = ops.Gain(1.0)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        256,
        pipe_tpu.Line(
            source=alloc, processors=[gain.processor()], sink=sink.sink()
        ),
        lookahead=8,
        batch_blocks=32,
    )
    p.start()
    p.push(gain.set_gain(2.0), at_block=100)
    p.push(gain.set_gain(0.5), at_block=3000)
    with pytest.raises(pipe_tpu.errors.RunError):
        p.wait(120)
    assert sink.flushed
