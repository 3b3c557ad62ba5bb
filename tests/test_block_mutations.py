"""Block-indexed mutations (VERDICT r1 item 3): a push tagged with a target
block index lands EXACTLY there under any lookahead/batch_blocks setting —
the executor splits its dispatch batch at the boundary. This restores the
reference's deterministic sample-stream ordering (pipe.go:381-413) when the
perf knobs are on; the untargeted default keeps the next-dispatch
guarantee."""

import time

import numpy as np
import pytest

import pipe_tpu
from pipe_tpu import mock, mutable, ops


BLOCK = 256


def _wait_samples(sink, n, timeout=60.0):
    deadline = time.time() + timeout
    while sink.samples < n:
        if time.time() > deadline:
            raise AssertionError(f"timeout waiting for {n} samples")
        time.sleep(0.005)


@pytest.mark.parametrize("lookahead,batch_blocks", [(1, 1), (4, 1), (1, 32), (8, 32)])
def test_targeted_push_lands_at_exact_block(lookahead, batch_blocks):
    """A gain step targeted at block N switches the output at sample
    N*block_size exactly — even mid-batch with batch_blocks=32."""
    gain = ops.Gain(1.0)
    src = mock.Source(channels=1, value=1.0, interval=0.01)  # unbounded
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(), processors=[gain.processor()], sink=sink.sink()
        ),
        lookahead=lookahead,
        batch_blocks=batch_blocks,
    )
    p.start()
    _wait_samples(sink, BLOCK)  # stream is live
    # target far enough ahead that the push cannot race the frontier,
    # and NOT on a batch boundary so the batch must split
    target = p.block_index(0) + 3 * max(batch_blocks, 4) + 1
    p.push(gain.set_gain(2.0), at_block=target)
    _wait_samples(sink, (target + 2 * batch_blocks + 2) * BLOCK)
    p.stop(60)

    v = sink.values[0]
    sw = np.where(np.diff(v) != 0)[0]
    assert len(sw) == 1, f"expected one switch, got {len(sw)}"
    assert sw[0] + 1 == target * BLOCK  # EXACT landing sample


def test_untargeted_push_lands_at_next_dispatch():
    """The default push keeps the reference's next-buffer guarantee at
    dispatch granularity: it lands at a dispatch boundary (a multiple of
    batch_blocks blocks)."""
    k = 8
    gain = ops.Gain(1.0)
    src = mock.Source(channels=1, value=1.0, interval=0.01)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(), processors=[gain.processor()], sink=sink.sink()
        ),
        batch_blocks=k,
    )
    p.start()
    _wait_samples(sink, BLOCK)
    p.push(gain.set_gain(0.5))
    _wait_samples(sink, sink.samples + 3 * k * BLOCK)
    p.stop(60)

    v = sink.values[0]
    sw = np.where(np.diff(v) != 0)[0]
    assert len(sw) == 1
    assert (sw[0] + 1) % (k * BLOCK) == 0  # a dispatch boundary


def test_targeted_push_in_the_past_applies_at_next_block():
    """A target the frontier already passed cannot apply retroactively; it
    lands at the next dispatched block instead of being dropped."""
    gain = ops.Gain(1.0)
    src = mock.Source(channels=1, value=1.0, interval=0.005)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(), processors=[gain.processor()], sink=sink.sink()
        ),
    )
    p.start()
    _wait_samples(sink, 4 * BLOCK)
    p.push(gain.set_gain(3.0), at_block=0)  # long gone
    _wait_samples(sink, sink.samples + 4 * BLOCK)
    p.stop(60)
    v = sink.values[0]
    sw = np.where(np.diff(v) != 0)[0]
    assert len(sw) == 1 and v[-1] == 3.0
    assert (sw[0] + 1) % BLOCK == 0


def test_feed_line_batch_blocks_matches_unbatched(rng):
    """Host-fed lines get dispatch batching too (VERDICT r1 weak 2): one
    scanned dispatch per k fed blocks, identical output, fewer compiled
    dispatches."""
    C, k = 2, 8
    data = rng.standard_normal((C, BLOCK * 27 + 111)).astype(np.float32)

    def make_feed():
        pos = [0]

        def feed(n):
            if pos[0] >= data.shape[1]:
                return None
            c = data[:, pos[0] : pos[0] + n]
            pos[0] += n
            return c

        return feed

    from pipe_tpu.components import Source
    from pipe_tpu.signal import SignalProperties

    outs = {}
    for bb in (1, k):
        feed = make_feed()

        def alloc(ctx, block, _feed=feed):
            return Source(output=SignalProperties(44100.0, C), feed=_feed)

        h = np.asarray(ops.design_lowpass(63, 4000, 44100))
        fir = ops.FIR(h)
        sink = mock.Sink()
        p = pipe_tpu.Pipe(
            BLOCK,
            pipe_tpu.Line(
                source=alloc, processors=[fir.processor()], sink=sink.sink()
            ),
            batch_blocks=bb,
        )
        p.start()
        p.wait(60)
        outs[bb] = sink.values

    assert outs[1].shape == outs[k].shape == data.shape
    np.testing.assert_allclose(outs[1], outs[k], atol=1e-6)


def test_strict_late_target_raise_preserves_pending():
    """take_due(strict=True) raising LateTargetError must be side-effect
    free: the pending untargeted batch stays in the mailbox."""
    ctx = mutable.mutable()
    dest = mutable.Destination()
    log = []
    dest.put(mutable.Mutations().put(ctx.mutate(lambda: log.append("u"))))
    dest.put(
        mutable.Mutations().put(ctx.mutate(lambda: log.append("late"))),
        at_block=3,
    )
    with pytest.raises(mutable.LateTargetError):
        dest.take_due(10, strict=True)
    assert dest.pending_targets() == [3]
    ms = dest.take_due(10)  # non-strict drain still delivers everything
    ms.apply_to(ctx)
    assert log == ["u", "late"]


def test_destination_block_indexed_delivery():
    """Unit semantics of the targeted mailbox: due-at-frontier delivery,
    ordering, next_target, and take() drains everything."""
    ctx = mutable.mutable()
    dest = mutable.Destination()
    log = []

    def m(tag):
        return mutable.Mutations().put(ctx.mutate(lambda: log.append(tag)))

    dest.put(m("now"))
    dest.put(m("b5"), at_block=5)
    dest.put(m("b3"), at_block=3)

    assert dest.next_target(0) == 3
    ms = dest.take_due(0)
    ms.apply_to(ctx)
    assert log == ["now"]

    assert dest.next_target(3) == 5
    ms = dest.take_due(4)  # frontier past 3
    ms.apply_to(ctx)
    assert log == ["now", "b3"]

    dest.put(m("b9"), at_block=9)
    ms = dest.take()  # drain-everything path
    ms.apply_to(ctx)
    assert log == ["now", "b3", "b5", "b9"]
    assert dest.next_target(0) is None
    assert dest.take_due(100) is None


@pytest.mark.parametrize("lookahead,batch_blocks", [(1, 1), (8, 32)])
def test_insert_processor_at_block_exact(lookahead, batch_blocks):
    """Targeted surgery: insert_processor(at_block=N) takes effect at
    sample N*block_size exactly — the deterministic-adoption contract that
    multi-host surgery builds on."""
    src = mock.Source(channels=1, value=1.0, interval=0.01)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=src.source(), processors=[], sink=sink.sink()),
        lookahead=lookahead,
        batch_blocks=batch_blocks,
    )
    p.start()
    _wait_samples(sink, BLOCK)
    target = p.block_index(0) + 3 * max(batch_blocks, 4) + 1
    h = p.insert_processor(
        0, 0, ops.Gain(2.0).processor(), at_block=target
    )
    assert h.wait(60) and h.error is None
    _wait_samples(sink, (target + 2 * batch_blocks + 2) * BLOCK)
    p.stop(60)

    v = sink.values[0]
    sw = np.where(np.diff(v) != 0)[0]
    assert len(sw) == 1, f"expected one switch, got {len(sw)}"
    assert sw[0] + 1 == target * BLOCK
    assert v[-1] == 2.0


def test_streaming_at_block_counts_source_buffers_under_short_reads():
    """Streaming (non-mesh) lines dispatch EVERY feed result as one
    block, so ``at_block=k`` is the k-th SOURCE-BUFFER boundary — the
    reference's next-buffer coordinate (pipe.go:381-413) even when
    buffers are short. (The mesh engine re-chunks, so its at_block is
    sample-uniform — README 'Surface contracts'.)"""
    import threading

    B = 384
    r = np.random.default_rng(99)
    reads = [int(r.integers(1, B + 1)) for _ in range(40)]
    gate = threading.Event()
    i = [0]

    def feed(n):
        gate.wait(30)
        if i[0] >= len(reads):
            return None
        k = reads[i[0]]
        i[0] += 1
        return np.ones((1, k), np.float32)

    from pipe_tpu.components import Source
    from pipe_tpu.signal import SignalProperties

    gain = ops.Gain(1.0)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        B,
        pipe_tpu.Line(
            source=lambda ctx, b: Source(
                output=SignalProperties(44100.0, 1), feed=feed
            ),
            processors=[gain.processor()],
            sink=sink.sink(),
        ),
    )
    p.start()
    p.push(gain.set_gain(0.5), at_block=5)
    time.sleep(0.3)  # control thread delivers while the gate pins block 0
    gate.set()
    p.wait(60)
    v = sink.values[0]
    sw = np.where(np.diff(v) != 0)[0]
    assert v.shape[0] == sum(reads)
    assert len(sw) == 1 and sw[0] + 1 == sum(reads[:5])


def test_insert_width_changing_resampler_exact(rng):
    """Live insert of a RESAMPLER (out_capacity != input width) into a
    running streaming line (r4 VERDICT item 5): the downstream allocators
    are re-run at the new width at the adoption boundary, carrying state
    where shapes match — the downstream FIR's (C, T-1) input tail is
    width-independent, so it continues EXACTLY across the adoption. The
    landing is sample-exact at at_block and the whole output matches a
    float64 oracle >= 100 dB. Reference: InsertProcessor takes any
    allocator (pipe.go:297-312)."""
    import scipy.signal

    from pipe_tpu.components import Source
    from pipe_tpu.signal import SignalProperties, snr_db

    import threading

    C, N_BLOCKS = 2, 40
    N = N_BLOCKS * BLOCK
    data = rng.standard_normal((C, N)).astype(np.float32)
    pos = [0]
    # deterministic under suite load: the feed holds at block 2 until the
    # surgery's block target is DELIVERED to the executor's destination,
    # so the frontier cannot race past the target
    target_queued = threading.Event()

    def feed(n):
        if pos[0] >= 2 * BLOCK:
            target_queued.wait(60)
        if pos[0] >= N:
            return None
        c = data[:, pos[0] : pos[0] + n]
        pos[0] += n
        return c

    h = np.asarray(ops.design_lowpass(63, 4000, 44100))
    fir = ops.FIR(h)
    r = ops.Resampler(160, 147)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=lambda ctx, b: Source(
                output=SignalProperties(44100.0, C), feed=feed
            ),
            processors=[fir.processor()],
            sink=sink.sink(),
        ),
    )
    p.start()
    target = 6
    hd = p.insert_processor(0, 0, r.processor(), at_block=target)
    le = p._exec_of_route[0]
    deadline = time.time() + 60
    while le._next_target(0) != target:  # control thread delivered it?
        assert time.time() < deadline, "surgery target never delivered"
        time.sleep(0.002)
    target_queued.set()
    assert hd.wait(60) and hd.error is None, hd.error
    p.wait(60)

    # oracle: raw stream to the cut, polyphase-resampled after it (fresh
    # resampler state at adoption), ONE continuous FIR over the whole
    # thing (the tail carries across the re-allocation)
    cut = target * BLOCK
    hp64 = ops.polyphase_design(r.up, r.down, r.taps_per_phase)
    x64 = data.astype(np.float64)
    tail = x64[:, cut:]
    L, M, K = r.up, r.down, hp64.shape[1]
    n_out = -(-tail.shape[1] * L // M)
    j = np.arange(n_out)
    p_, n0 = (j * M) % L, (j * M) // L
    nidx = n0[:, None] - np.arange(K)[None, :]
    valid = (nidx >= 0) & (nidx < tail.shape[1])
    xg = np.where(valid[None], tail[:, np.clip(nidx, 0, tail.shape[1] - 1)], 0.0)
    res = np.einsum("cok,ok->co", xg, hp64[p_])
    stream = np.concatenate([x64[:, :cut], res], axis=1)
    oracle = scipy.signal.lfilter(h, [1.0], stream, axis=1)

    assert sink.values.shape == oracle.shape, (
        sink.values.shape,
        oracle.shape,
    )
    assert snr_db(oracle, sink.values) > 100


def test_insert_width_changer_upstream_of_width_changer():
    """A width-changing insert UPSTREAM of another width-changing stage:
    the downstream rebuild threads out_capacity through the re-allocated
    chain (the STFT is re-sized for the doubled input width, and the sink
    for the STFT's new output width). Stream integrity + exact frame
    accounting."""
    src = mock.Source(channels=1, value=1.0, interval=0.004)
    sg = ops.SpectralGain(240, 48)  # width-changing: 48 does not divide 256
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(), processors=[sg.processor()],
            sink=sink.sink(),
        ),
    )
    p.start()
    _wait_samples(sink, 2 * BLOCK)
    target = p.block_index(0) + 6
    hd = p.insert_processor(0, 0, ops.Resampler(2, 1).processor(), at_block=target)
    assert hd.wait(60) and hd.error is None, hd.error
    before = sink.samples
    _wait_samples(sink, before + 8 * BLOCK)
    p.stop(60)
    v = sink.values
    assert np.isfinite(v).all()
    # steady state: constant input through unity STFT and a 2x resampler
    # stays ~constant (filter design is unity-DC)
    assert np.allclose(v[0, -2 * BLOCK :], v[0, -1], atol=1e-2)


def test_insert_two_width_changers_queued_back_to_back():
    """TWO width-changing inserts queued without waiting for each other:
    the downstream rebuild runs at EACH adoption against the live route
    (r5 self-review fix — a control-thread rebuild would use the stale
    pre-first-adopt processor list), so both land and the stream keeps
    flowing at the doubly-changed width."""
    import threading

    src = mock.Source(channels=1, value=1.0, interval=0.002)
    h = np.asarray(ops.design_lowpass(63, 4000, 44100))
    fir = ops.FIR(h)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(), processors=[fir.processor()],
            sink=sink.sink(),
        ),
    )
    p.start()
    _wait_samples(sink, BLOCK)
    base = p.block_index(0)
    # both at pos 0 (the source slot's width never changes), staggered
    # targets: the SECOND rebuild must see the first resampler in the
    # live route and re-size it for the doubled width
    h1 = p.insert_processor(
        0, 0, ops.Resampler(2, 1).processor(), at_block=base + 4
    )
    h2 = p.insert_processor(
        0, 0, ops.Resampler(2, 1).processor(), at_block=base + 8
    )
    assert h1.wait(60) and h1.error is None, h1.error
    assert h2.wait(60) and h2.error is None, h2.error
    before = sink.samples
    _wait_samples(sink, before + 8 * BLOCK)
    p.stop(60)
    v = sink.values[0]
    assert np.isfinite(v).all()
    # steady state: constant input through two unity-DC 2x resamplers and
    # the FIR stays ~1.0 (both banks and the FIR are unity at DC)
    assert np.allclose(v[-2 * BLOCK :], v[-1], atol=1e-2)


def test_insert_raced_by_width_change_refuses_cleanly():
    """An insert allocated for a slot whose input width an EARLIER
    width-changing surgery then changed must refuse at adoption (the
    stale component would corrupt the stream) — via the handle, leaving
    the run alive."""
    src = mock.Source(channels=1, value=1.0, interval=0.002)
    h = np.asarray(ops.design_lowpass(63, 4000, 44100))
    fir = ops.FIR(h)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(), processors=[fir.processor()],
            sink=sink.sink(),
        ),
    )
    p.start()
    _wait_samples(sink, BLOCK)
    base = p.block_index(0)
    h1 = p.insert_processor(
        0, 0, ops.Resampler(2, 1).processor(), at_block=base + 4
    )
    # allocated NOW for slot 1 at the old width; by its adoption the
    # resampler upstream has doubled the slot's width
    h2 = p.insert_processor(
        0, 1, ops.FIR(h).processor(), at_block=base + 8
    )
    assert h1.wait(60) and h1.error is None, h1.error
    assert h2.wait(60)
    assert h2.error is not None and "raced" in str(h2.error), h2.error
    # the run survives the refusal
    before = sink.samples
    _wait_samples(sink, before + 4 * BLOCK)
    p.stop(60)
    assert np.isfinite(sink.values).all()


def test_insert_width_changing_carries_downstream_params():
    """A live retune pushed BEFORE a width-changing insert survives the
    downstream re-allocation: params carry per key onto the replacement
    components (a rebuild that silently reset a pushed gain to its
    constructor value would desync the stream)."""
    src = mock.Source(channels=1, value=1.0, interval=0.005)
    gain = ops.Gain(1.0)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(),
            processors=[gain.processor()],
            sink=sink.sink(),
        ),
    )
    p.start()
    _wait_samples(sink, BLOCK)
    p.push(gain.set_gain(0.5))
    _wait_samples(sink, sink.samples + 4 * BLOCK)
    target = p.block_index(0) + 6
    hd = p.insert_processor(0, 0, ops.Resampler(2, 1).processor(), at_block=target)
    assert hd.wait(60) and hd.error is None, hd.error
    _wait_samples(sink, (target + 8) * BLOCK)
    p.stop(60)
    v = sink.values[0]
    # steady state after the adoption: still the PUSHED gain, not the
    # constructor's 1.0 (the resampler's startup ramp has settled)
    assert np.allclose(v[-4 * BLOCK :], 0.5, atol=1e-3), v[-8:]


def test_insert_width_changer_into_optimized_line_retunes_survive():
    """optimize=True lines store the FUSED allocators on the route, so a
    width-changing insert re-runs the fused stages at the new width —
    and a retune pushed through an ORIGINAL (pre-fusion) object after
    the insert still lands via its delegate."""
    src = mock.Source(channels=1, value=1.0, interval=0.003)
    h = np.asarray(ops.design_lowpass(63, 4000, 44100))
    f1, f2 = ops.FIR(h), ops.FIR(h)  # optimize fuses into one cascade
    g = ops.Gain(1.0)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(),
            processors=[f1.processor(), f2.processor(), g.processor()],
            sink=sink.sink(),
        ),
        optimize=True,
    )
    p.start()
    _wait_samples(sink, 2 * BLOCK)
    target = p.block_index(0) + 6
    hd = p.insert_processor(0, 0, ops.Resampler(2, 1).processor(), at_block=target)
    assert hd.wait(60) and hd.error is None, hd.error
    before = sink.samples
    _wait_samples(sink, before + 6 * BLOCK)
    # the retune through the ORIGINAL object must land on the re-allocated
    # fused cascade (delegate survives the rebuild)
    p.push(f2.set_taps(h * 0.5))
    _wait_samples(sink, sink.samples + 6 * BLOCK)
    p.stop(60)
    v = sink.values[0]
    assert np.isfinite(v).all()
    # DC gain halves after the retune: steady tail at ~0.5
    assert np.allclose(v[-2 * BLOCK :], 0.5, atol=1e-2), v[-4:]


def test_stale_target_does_not_fire_into_next_stream():
    """A restarted pipe is a NEW stream (reference pipe_test.go:108-131):
    an at_block push the previous stream never reached (it was stopped
    first) must NOT fire at that block index of the next stream."""
    gain = ops.Gain(1.0)
    src = mock.Source(channels=1, value=1.0, interval=0.001)  # unbounded
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(), processors=[gain.processor()], sink=sink.sink()
        ),
    )
    p.start()
    _wait_samples(sink, BLOCK)
    target = p.block_index(0) + 300  # the stream is stopped before this
    p.push(gain.set_gain(7.0), at_block=target)
    p.stop(60)
    assert np.all(sink.values == 1.0)

    # the second stream runs PAST the stale target block
    p.start(src.reset())
    _wait_samples(sink, sink.samples + (target + 20) * BLOCK)
    p.stop(60)
    assert np.all(sink.values == 1.0), "stale at_block fired into new stream"


def test_pending_window_bounded_under_split_dispatches():
    """Recurring targeted mutations split k-block dispatches into singles;
    the in-flight queue must stay bounded by lookahead (it used to grow
    without bound: each execute added budget entries, resolved one)."""
    gain = ops.Gain(1.0)
    src = mock.Source(channels=1, value=1.0, interval=0.001)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        64,
        pipe_tpu.Line(
            source=src.source(), processors=[gain.processor()], sink=sink.sink()
        ),
        lookahead=2,
        batch_blocks=4,
    )
    p.start()
    _wait_samples(sink, 64)
    le = p._exec_of_route[0]
    for i in range(30):  # a target every 2 blocks keeps every dispatch split
        p.push(gain.set_gain(1.0), at_block=le.blocks_dispatched + 2)
        time.sleep(0.004)
        assert len(le._pending) <= le.lookahead + le.batch_blocks
    _wait_samples(sink, sink.samples + 64 * 8)
    assert len(le._pending) <= le.lookahead + le.batch_blocks
    p.stop(60)


def test_target_arriving_during_blocked_feed_splits_batch():
    """r4 soak finding: with batch_blocks > 1, a target pushed while a
    feed call BLOCKS mid-collection must still split the batch — the
    budget computed at execute() entry is stale by then. Pre-fix the
    whole first 32-block batch dispatched with the old params and the
    target landed a full batch late."""
    import threading

    import numpy as np

    from pipe_tpu.components import Source
    from pipe_tpu.signal import SignalProperties

    BLOCK, N_BLOCKS, TARGET = 64, 64, 5
    data = np.ones((1, BLOCK * N_BLOCKS), np.float32)
    gate = threading.Event()
    pos = [0]

    def feed(n):
        gate.wait(60)  # the executor blocks HERE while the push arrives
        if pos[0] >= data.shape[1]:
            return None
        c = data[:, pos[0]:pos[0] + n]
        pos[0] += n
        return c

    def alloc(ctx, block):
        return Source(output=SignalProperties(44100.0, 1), feed=feed)

    gain = ops.Gain(1.0)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=alloc, processors=[gain.processor()],
                      sink=sink.sink()),
        batch_blocks=32,
    )
    p.start()
    p.push(gain.set_gain(2.0), at_block=TARGET)
    time.sleep(0.3)  # the control thread delivers while feed is gated
    gate.set()
    p.wait(60)
    v = sink.values[0]
    s = TARGET * BLOCK
    assert np.all(v[:s] == 1.0)
    assert np.all(v[s:] == 2.0), (
        f"target at block {TARGET} landed late: first 2.0 at sample "
        f"{int(np.argmax(v == 2.0))}, expected {s}"
    )


def test_target_inside_already_collected_batch_holds_blocks():
    """r4 review: a target pushed while the feed blocks MID-collection —
    after some blocks were already collected — must still land exactly:
    the executor dispatches only up to the target and parks the rest."""
    import threading

    import numpy as np

    from pipe_tpu.components import Source
    from pipe_tpu.signal import SignalProperties

    BLOCK, N_BLOCKS, TARGET = 64, 64, 5
    data = np.ones((1, BLOCK * N_BLOCKS), np.float32)
    gate = threading.Event()
    calls = [0]
    pos = [0]

    def feed(n):
        calls[0] += 1
        if calls[0] == 11:  # block AFTER 10 blocks were collected
            gate.wait(60)
        if pos[0] >= data.shape[1]:
            return None
        c = data[:, pos[0]:pos[0] + n]
        pos[0] += n
        return c

    def alloc(ctx, block):
        return Source(output=SignalProperties(44100.0, 1), feed=feed)

    gain = ops.Gain(1.0)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=alloc, processors=[gain.processor()],
                      sink=sink.sink()),
        batch_blocks=32,
    )
    p.start()
    while calls[0] < 11:
        time.sleep(0.005)
    p.push(gain.set_gain(2.0), at_block=TARGET)  # inside collected range
    time.sleep(0.3)
    gate.set()
    p.wait(60)
    v = sink.values[0]
    s = TARGET * BLOCK
    assert np.all(v[:s] == 1.0)
    assert np.all(v[s:] == 2.0), (
        f"target at block {TARGET} landed late: first 2.0 at sample "
        f"{int(np.argmax(v == 2.0))}, expected {s}"
    )
