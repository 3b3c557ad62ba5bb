"""Mesh-backed Pipe — the sharded execution path behind the SAME Line/Pipe
streaming API (VERDICT r1 item 1). Every reference runtime feature must hold
on a mesh: mutation push through the Pusher (pipe.go:243-247), live surgery
(pipe.go:259-365), EOF + partial-final-chunk protocol (pipe.go:404-406),
host feed/receive, start/flush lifecycle — while the per-chunk compute is
shard_map'ed over a (channels x time) mesh with halo exchange."""

import threading
import time

import numpy as np
import pytest
import scipy.signal

import jax

import pipe_tpu
from pipe_tpu import mock, ops, parallel
from pipe_tpu.components import Source
from pipe_tpu.signal import SignalProperties, snr_db

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def feed_source(data: np.ndarray, channels: int, sample_rate=44100.0):
    """A host-feed source streaming ``data`` (channels, N) then EOF."""
    pos = [0]

    def feed(n):
        if pos[0] >= data.shape[1]:
            return None
        c = data[:, pos[0] : pos[0] + n]
        pos[0] += n
        return c

    def alloc(ctx, block):
        return Source(output=SignalProperties(sample_rate, channels), feed=feed)

    return alloc


def run_pipe(p, timeout=120.0):
    p.start()
    p.wait(timeout)


def test_config5_chain_on_mesh(rng):
    """BASELINE config 5 — FIR + resample + merged psum mix — through the
    Pipe API on a 2x4 mesh, vs the sequential float64 oracle."""
    C, BLOCK = 8, 2352
    mesh = parallel.make_mesh(2, 4)
    data = rng.standard_normal((C, BLOCK * 4)).astype(np.float32)
    h = np.asarray(ops.design_lowpass(255, 4000, 44100))
    mixm = (np.ones((2, C)) / C).astype(np.float32)

    fir = parallel.sharded.FIR(h)
    rs = parallel.sharded.Resample(48000, 44100)
    mix = parallel.sharded.Mix(mixm)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[fir.processor(), rs.processor(), mix.processor()],
            sink=sink.sink(),
        ),
        mesh=mesh,
    )
    run_pipe(p)

    from tests.test_ops import _resample_oracle
    from pipe_tpu.ops.resample import polyphase_design

    fx = scipy.signal.lfilter(h, [1.0], data.astype(np.float64), axis=1)
    hp64 = polyphase_design(160, 147, 32)
    rx = _resample_oracle(fx, hp64, 160, 147)
    oracle = mixm.astype(np.float64) @ rx
    assert sink.values.shape == oracle.shape
    assert snr_db(oracle, sink.values) > 100


def test_mesh_matches_single_device_stream(rng):
    """Sharded output == the single-device streaming engine on the same
    stream (bit-for-structure parity of the two execution paths)."""
    C, BLOCK = 4, 2048
    data = rng.standard_normal((C, BLOCK * 3)).astype(np.float32)
    h = np.asarray(ops.design_lowpass(127, 3000, 44100))

    # single-device streaming path
    s_fir = ops.FIR(h)
    s_sink = mock.Sink()
    p1 = pipe_tpu.Pipe(
        512,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[s_fir.processor()],
            sink=s_sink.sink(),
        ),
    )
    run_pipe(p1)

    # mesh path
    mesh = parallel.make_mesh(2, 4)
    m_fir = parallel.sharded.FIR(h)
    m_sink = mock.Sink()
    p2 = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[m_fir.processor()],
            sink=m_sink.sink(),
        ),
        mesh=mesh,
    )
    run_pipe(p2)

    assert m_sink.values.shape == s_sink.values.shape
    np.testing.assert_allclose(m_sink.values, s_sink.values, atol=2e-5)


def test_mesh_mutation_push_no_recompile(rng):
    """A mid-stream set_taps push lands at a chunk boundary with ZERO
    recompiles (params are traced inputs of the shard_map'ed step)."""
    C, BLOCK = 2, 2048
    mesh = parallel.make_mesh(1, 4)
    h1 = np.asarray(ops.design_lowpass(63, 4000, 44100))
    h2 = np.asarray(ops.design_lowpass(63, 1000, 44100))

    fir = parallel.sharded.FIR(h1)
    sink = mock.Sink()
    src = mock.Source(channels=C, value=1.0, interval=0.002)  # unbounded
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(), processors=[fir.processor()], sink=sink.sink()
        ),
        mesh=mesh,
    )
    p.start()
    while sink.messages < 3:
        time.sleep(0.01)
    le = p._exec_of_route[0]
    compiled_before = le.compile_counts()
    p.push(fir.set_taps(h2))
    seen = sink.messages
    while sink.messages < seen + 4:
        time.sleep(0.01)
    assert le.compile_counts() == compiled_before  # zero recompiles
    p.stop(60)

    # DC gain flips from sum(h1) to sum(h2) at exactly one chunk boundary
    out = sink.values
    steady = out[:, BLOCK:]  # skip the fill-in of the first chunk
    g1, g2 = float(np.sum(h1)), float(np.sum(h2))
    # find the switch: values near g1 then near g2
    near1 = np.isclose(steady[0], g1, atol=1e-3)
    near2 = np.isclose(steady[0], g2, atol=1e-3)
    assert near1[0] and near2[-1]
    switch = np.argmax(near2)
    assert switch % BLOCK < 64  # lands at a chunk boundary (+ filter tail)


def test_mesh_insert_processor_at_chunk_boundary(rng):
    """Live InsertProcessor on a mesh line: the new stage is adopted at a
    chunk boundary (recompile between chunks), no sample lost."""
    C, BLOCK = 2, 1024
    mesh = parallel.make_mesh(1, 4)
    src = mock.Source(channels=C, value=1.0, interval=0.002)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=src.source(), sink=sink.sink()),
        mesh=mesh,
    )
    p.start()
    while sink.messages < 3:
        time.sleep(0.01)
    gain = parallel.sharded.Gain(2.0)
    handle = p.insert_processor(0, 0, gain.processor())
    assert handle.wait(60) and handle.error is None
    seen = sink.messages
    while sink.messages < seen + 3:
        time.sleep(0.01)
    p.stop(60)

    v = sink.values[0]
    assert v[0] == 1.0 and v[-1] == 2.0
    assert set(np.unique(v)) == {1.0, 2.0}
    sw = np.where(np.diff(v) != 0)[0]
    assert len(sw) == 1 and (sw[0] + 1) % BLOCK == 0  # exact chunk boundary
    # every sample accounted for: block-aligned capture
    assert v.shape[0] % BLOCK == 0


def test_mesh_partial_final_chunk(rng):
    """A stream whose length is not a multiple of the chunk ends with a
    masked partial chunk; the sink sees exactly N valid frames and the
    filtered samples match the oracle to the end."""
    C, BLOCK = 2, 2048
    N = BLOCK * 2 + 777  # partial final chunk of 777 frames
    mesh = parallel.make_mesh(1, 4)
    data = rng.standard_normal((C, N)).astype(np.float32)
    h = np.asarray(ops.design_lowpass(63, 4000, 44100))
    fir = parallel.sharded.FIR(h)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[fir.processor()],
            sink=sink.sink(),
        ),
        mesh=mesh,
    )
    run_pipe(p)
    assert sink.values.shape == (C, N)
    oracle = scipy.signal.lfilter(h, [1.0], data.astype(np.float64), axis=1)
    assert snr_db(oracle, sink.values) > 100


def test_mesh_device_source_counts(rng):
    """The mock device source works inside shard_map: exact message/sample
    counts, EOF at the limit (pipe_test.go:82-106 semantics on a mesh)."""
    C, BLOCK = 4, 1024
    n_blocks = 7
    mesh = parallel.make_mesh(2, 4)
    src = mock.Source(limit=n_blocks * BLOCK, channels=C, value=0.25)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=src.source(), sink=sink.sink()),
        mesh=mesh,
    )
    run_pipe(p)
    assert src.messages == n_blocks
    assert src.samples == n_blocks * BLOCK
    assert sink.values.shape == (C, n_blocks * BLOCK)
    assert np.all(sink.values == 0.25)


def test_mesh_device_source_channel_padding(rng):
    """A DEVICE-step source whose channel count doesn't divide the mesh
    channel axis: the step generates ceil(C/ch) local rows, the executor
    zeroes the pad rows by global index, the sink slices them off — the
    host-fed path's contract for all sources (r4 VERDICT item 6; the
    executor raise is gone)."""
    C, BLOCK = 3, 1024  # 3 channels on a 2-way channel axis -> pad to 4
    n_blocks = 5
    mesh = parallel.make_mesh(2, 4)
    src = mock.Source(limit=n_blocks * BLOCK, channels=C, value=0.5)
    h = np.asarray(ops.design_lowpass(63, 4000, 44100))
    fir = parallel.sharded.FIR(h)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(), processors=[fir.processor()], sink=sink.sink()
        ),
        mesh=mesh,
    )
    run_pipe(p)
    assert src.messages == n_blocks
    assert sink.values.shape == (C, n_blocks * BLOCK)
    oracle = scipy.signal.lfilter(
        h, [1.0], np.full((C, n_blocks * BLOCK), 0.5, np.float64), axis=1
    )
    assert snr_db(oracle, sink.values) > 100


def test_mesh_device_source_partial_final(rng):
    """Limit not divisible by the chunk: the final chunk is partial and
    masked; the sink captures exactly limit frames."""
    C, BLOCK = 2, 1024
    limit = 3 * BLOCK + 500
    mesh = parallel.make_mesh(1, 4)
    src = mock.Source(limit=limit, channels=C, value=1.0)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=src.source(), sink=sink.sink()),
        mesh=mesh,
    )
    run_pipe(p)
    assert sink.values.shape == (C, limit)
    assert np.all(sink.values == 1.0)


def test_mesh_add_line_live(rng):
    """Live add_line on a mesh pipe: the new line starts streaming on the
    mesh while the first keeps running."""
    C, BLOCK = 2, 1024
    mesh = parallel.make_mesh(1, 4)
    src1 = mock.Source(channels=C, value=1.0, interval=0.002)
    sink1 = mock.Sink(discard=True)
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=src1.source(), sink=sink1.sink()),
        mesh=mesh,
    )
    p.start()
    while sink1.messages < 2:
        time.sleep(0.01)
    src2 = mock.Source(limit=BLOCK * 3, channels=C, value=2.0)
    sink2 = mock.Sink()
    handle = p.add_line(
        pipe_tpu.Line(source=src2.source(), sink=sink2.sink())
    )
    assert handle.wait(60) and handle.error is None
    while sink2.messages < 3:
        time.sleep(0.01)
    p.stop(60)
    assert sink2.values.shape == (C, BLOCK * 3)
    assert np.all(sink2.values == 2.0)


def test_mesh_biquad_and_compressor_chain(rng):
    """Cross-device recurrences (IIR scan + envelope prefix) behind the
    Pipe API."""
    C, BLOCK = 2, 4096
    mesh = parallel.make_mesh(1, 4)
    data = (rng.standard_normal((C, BLOCK * 3)) * 0.5).astype(np.float32)
    sos = ops.design_peaking_eq(44100, freq=1000, q=1.0, gain_db=6.0)

    bq = parallel.sharded.Biquad(sos)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[bq.processor()],
            sink=sink.sink(),
        ),
        mesh=mesh,
    )
    run_pipe(p)
    oracle = scipy.signal.sosfilt(sos[None, :], data.astype(np.float64), axis=1)
    # the refined engine's boundary table (docs/PERF_NOTES.md) puts a
    # q=1.0 @ 1 kHz section comfortably above 100 dB; assert the real bound
    # so a silent loss of refinement on the mesh path fails here
    assert snr_db(oracle, sink.values) > 100


def test_mesh_biquad_extended_precision_pipe(rng):
    """precision='extended' END-TO-END through the mesh Pipe API (not just
    the BiquadStage): a 60 Hz section below the f32 kappa floor must stay
    >=100 dB with the dd carry crossing chunk and device boundaries."""
    C, BLOCK = 2, 4096
    mesh = parallel.make_mesh(1, 4)
    data = (rng.standard_normal((C, BLOCK * 3)) * 0.5).astype(np.float32)
    sos = ops.design_peaking_eq(44100, freq=60.0, q=0.7, gain_db=6.0)

    bq = parallel.sharded.Biquad(sos, precision="extended")
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[bq.processor()],
            sink=sink.sink(),
        ),
        mesh=mesh,
    )
    run_pipe(p)
    oracle = scipy.signal.sosfilt(sos[None, :], data.astype(np.float64), axis=1)
    snr = snr_db(oracle, sink.values)
    assert snr > 100, f"{snr:.1f} dB"


def test_mesh_any_block_size_aggregates(rng):
    """r4 (VERDICT r3 item 3): a block size that does not divide the time
    axis no longer builds-errors — the pipe aggregates the smallest
    multiple of the user block that fits the mesh (1001 * 4 here) and the
    stream is sample-exact. Off-grid at_block targets raise the grid
    error instead of landing elsewhere."""
    mesh = parallel.make_mesh(1, 4)
    C, BLOCK = 2, 1001
    data = rng.standard_normal((C, BLOCK * 8)).astype(np.float32)
    g = parallel.sharded.Gain(0.5)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[g.processor()],
            sink=sink.sink(),
        ),
        mesh=mesh,
    )
    assert p._agg == 4
    p.start()
    with pytest.raises(ValueError, match="dispatch grid"):
        p.push(g.set_gain(0.25), at_block=5)  # not a multiple of 4
    p.wait(60)
    out = sink.values
    assert out.shape == (C, BLOCK * 8)
    assert snr_db(0.5 * data.astype(np.float64), out) > 130


def test_mesh_weird_shape_matrix(rng):
    """VERDICT r3 item 3 'Done' criterion: 6 channels, block 1000, 2x4
    mesh, 44.1k -> 48k polyphase resample builds (block aggregation finds
    a = 147) and matches the streaming engine >= 100 dB."""
    from tests.test_ops import stream_through

    mesh = parallel.make_mesh(2, 4)
    C, BLOCK = 6, 1000
    N = 147000 + 4 * 1000  # one aggregated dispatch + a partial tail
    data = rng.standard_normal((C, N)).astype(np.float32)
    h = ops.design_lowpass(63, 4000.0, 44100.0)
    fir = parallel.sharded.FIR(h)
    rs = parallel.sharded.Resample(48000, 44100)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[fir.processor(), rs.processor()],
            sink=sink.sink(),
        ),
        mesh=mesh,
    )
    assert p._agg == 147  # 44.1k->48k phase rule at block 1000, T=4
    run_pipe(p)
    out = sink.values

    streamed = stream_through(
        [ops.FIR(h).processor(), ops.Resampler(48000, 44100).processor()],
        data, block=1000,
    )
    n = min(out.shape[1], streamed.shape[1])
    assert n >= N * 160 // 147 - 160
    snr = snr_db(streamed[:, :n].astype(np.float64), out[:, :n])
    assert snr > 100, f"{snr:.1f} dB"


def test_mesh_channel_padding_line(rng):
    """Channels that do not divide the mesh channel axis ride zero pad
    rows: 6 channels on a 4-way channel axis (pad to 8), per-channel
    2-D taps, sliced back to 6 at the sink."""
    mesh = parallel.make_mesh(4, 2)
    C, BLOCK = 6, 2048
    data = rng.standard_normal((C, BLOCK * 4)).astype(np.float32)
    taps2d = np.stack(
        [np.asarray(ops.design_lowpass(63, 2000.0 + 500 * c, 44100.0))
         for c in range(C)]
    ).astype(np.float32)
    fir = parallel.sharded.FIR(taps2d)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[fir.processor()],
            sink=sink.sink(),
        ),
        mesh=mesh,
    )
    run_pipe(p)
    out = sink.values
    assert out.shape == (C, BLOCK * 4)
    oracle = np.stack([
        scipy.signal.lfilter(taps2d[c].astype(np.float64), [1.0],
                             data[c].astype(np.float64))
        for c in range(C)
    ])
    snr = snr_db(oracle, out)
    assert snr > 100, f"{snr:.1f} dB"


def test_mesh_spectral_weird_block_aggregates(rng):
    """The STFT grid (hop 256) on a non-dividing block (1000) makes the
    pipe aggregate 64 user blocks per dispatch; output matches the
    hop-aligned streaming engine exactly up to the inherent EOF trailing
    edge (the final W-hop window is a partial reconstruction on BOTH
    engines, in legitimately different ways — the documented real-time
    STFT edge)."""
    from tests.test_ops import stream_through

    C, BLOCK, W, HOP = 2, 1000, 1024, 256
    N = 128000 + 3000  # one aggregated dispatch + a partial tail
    x = rng.standard_normal((C, N)).astype(np.float32)
    sg = parallel.sharded.SpectralGain(W, HOP)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=feed_source(x, C),
                      processors=[sg.processor()], sink=sink.sink()),
        mesh=parallel.make_mesh(1, 2),
    )
    assert p._agg == 64  # lcm of the hop grid and the time axis
    run_pipe(p, 300)
    out = sink.values
    streamed = stream_through(
        [ops.SpectralGain(W, HOP).processor()], x, W
    )
    n = min(out.shape[1], streamed.shape[1]) - 2 * W  # exclude the edge
    sn = snr_db(streamed[:, :n].astype(np.float64), out[:, :n])
    assert sn > 100, f"{sn:.1f} dB"


def test_mesh_channel_padding_live_retune(rng):
    """Self-review r4: a live per-channel retune on a channel-padded line
    must pad its value to the built channel count — an unpadded (6, T)
    array swapped into the (8, T) param would change the traced shape
    mid-stream and abort the run."""
    import time

    mesh = parallel.make_mesh(4, 2)
    C, BLOCK = 6, 1024
    taps = np.stack(
        [np.asarray(ops.design_lowpass(31, 3000.0, 44100.0))] * C
    ).astype(np.float32)
    fir = parallel.sharded.FIR(taps)
    g = parallel.sharded.Gain(np.ones(C, np.float32))
    data = rng.standard_normal((C, BLOCK * 40)).astype(np.float32)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=feed_source(data, C),
                      processors=[fir.processor(), g.processor()],
                      sink=sink.sink()),
        mesh=mesh,
    )
    p.start()
    while sink.messages < 2:
        time.sleep(0.01)
    le = p._exec_of_route[0]
    compiled = le.compile_counts()
    taps2 = (taps * 0.5).astype(np.float32)
    p.push(fir.set_taps(taps2), g.set_gain(2.0 * np.ones(C, np.float32)))
    p.wait(120)
    assert le.compile_counts() == compiled  # padded retune, no recompile
    out = sink.values
    assert out.shape == data.shape
    # the combined retune is gain-neutral (0.5 * 2) up to the FIR tail
    oracle = scipy.signal.lfilter(
        taps[0].astype(np.float64), [1.0], data.astype(np.float64), axis=1
    )
    assert snr_db(oracle[:, -BLOCK:], out[:, -BLOCK:]) > 80


def test_mesh_channel_changing_stage_rejected_on_padded_line():
    """A channel-count-changing stage (Channelizer) with pad rows in its
    output is rejected at BUILD with a clear error (the downstream
    allocator would otherwise mismatch the actual tensor at trace)."""
    mesh = parallel.make_mesh(4, 2)
    chz = parallel.sharded.Channelizer(4)
    sink = mock.Sink(discard=True)
    data = np.zeros((6, 2048), np.float32)
    with pytest.raises(Exception, match="channel count"):
        pipe_tpu.Pipe(
            1024,
            pipe_tpu.Line(source=feed_source(data, 6),
                          processors=[chz.processor()],
                          sink=sink.sink()),
            mesh=mesh,
        )


def test_mesh_stateful_component_needs_spec():
    """A stateful component without declared shardings is rejected on a
    time-sharded mesh (its local-tail math would be silently wrong)."""
    mesh = parallel.make_mesh(1, 4)
    h = np.asarray(ops.design_lowpass(63, 4000, 44100))
    fir = ops.FIR(h)  # the STREAMING (local-state) FIR — not mesh-aware
    src = mock.Source(channels=2, value=1.0, limit=4096)
    sink = mock.Sink(discard=True)
    p = pipe_tpu.Pipe(
        2048,
        pipe_tpu.Line(
            source=src.source(), processors=[fir.processor()], sink=sink.sink()
        ),
        mesh=mesh,
    )
    with pytest.raises(Exception, match="state_spec"):
        run_pipe(p)


def test_mesh_echo_limiter_chain_with_pushes(rng):
    """The new dynamics kit behind the Pipe API: feedback echo + limiter on
    a time-sharded mesh, with live set_feedback / set pushes."""
    C, BLOCK = 2, 4096
    mesh = parallel.make_mesh(1, 4)
    data = (rng.standard_normal((C, BLOCK * 3)) * 0.5).astype(np.float32)

    echo = parallel.sharded.Delay(256, feedback=0.5, wet=0.5, dry=1.0)
    lim = parallel.sharded.Limiter(threshold_db=-6.0)
    gate = parallel.sharded.Gate(threshold_db=-60.0)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[echo.processor(), gate.processor(), lim.processor()],
            sink=sink.sink(),
        ),
        mesh=mesh,
    )
    p.start()
    p.push(echo.set_feedback(0.3), at_block=2)
    p.push(lim.set(threshold_db=-3.0), at_block=2)
    p.wait(120)
    out = sink.values
    assert out.shape == data.shape
    assert np.isfinite(out).all()
    # the limiter must actually bound the envelope tail
    assert np.abs(out[:, BLOCK:]).max() < 1.5


def test_mesh_channelizer_via_pipe(rng):
    """Channelizer through the mesh Pipe: rate change K down, channel
    expansion to C*2*(K//2+1), matching the streaming engine."""
    K, C, BLOCK = 8, 2, 4096
    data = rng.standard_normal((C, BLOCK * 2)).astype(np.float32)

    s_ch = ops.Channelizer(K, taps_per_branch=8)
    s_sink = mock.Sink()
    p1 = pipe_tpu.Pipe(
        512,
        pipe_tpu.Line(
            source=feed_source(data, C, sample_rate=48000.0),
            processors=[s_ch.processor()],
            sink=s_sink.sink(),
        ),
    )
    run_pipe(p1)

    mesh = parallel.make_mesh(1, 4)
    m_ch = parallel.sharded.Channelizer(K, taps_per_branch=8)
    m_sink = mock.Sink()
    p2 = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C, sample_rate=48000.0),
            processors=[m_ch.processor()],
            sink=m_sink.sink(),
        ),
        mesh=mesh,
    )
    run_pipe(p2)
    assert m_sink.values.shape == s_sink.values.shape
    np.testing.assert_allclose(m_sink.values, s_sink.values, atol=2e-5)


def test_mesh_pipe_checkpoint_roundtrip(rng):
    """Checkpoint/restore works on mesh-backed lines: sharded component
    state (FIR tail, biquad carry) survives snapshot -> restore into a
    fresh mesh pipe, and the resumed stream equals the uninterrupted one."""
    from pipe_tpu import checkpoint

    C, BLOCK = 4, 2048
    sos = ops.design_peaking_eq(44100, freq=600, q=1.5, gain_db=3.0)
    h = np.asarray(ops.design_lowpass(127, 3000, 44100))
    data = rng.standard_normal((C, BLOCK * 4)).astype(np.float32)

    def make(data_part, sink):
        mesh = parallel.make_mesh(2, 4)
        fir = parallel.sharded.FIR(h)
        bq = parallel.sharded.Biquad(sos)
        return pipe_tpu.Pipe(
            BLOCK,
            pipe_tpu.Line(
                source=feed_source(data_part, C),
                processors=[fir.processor(), bq.processor()],
                sink=sink.sink(),
            ),
            mesh=mesh,
        )

    sink_full = mock.Sink()
    run_pipe(make(data, sink_full))

    sink_a = mock.Sink()
    pa = make(data[:, : 2 * BLOCK], sink_a)
    run_pipe(pa)
    ck = checkpoint.snapshot(pa)

    sink_b = mock.Sink()
    pb = make(data[:, 2 * BLOCK :], sink_b)
    checkpoint.restore(pb, ck)
    run_pipe(pb)

    resumed = np.concatenate([sink_a.values, sink_b.values], axis=1)
    assert resumed.shape == sink_full.values.shape
    np.testing.assert_allclose(resumed, sink_full.values, atol=2e-5)


def test_mesh_pipe_checkpoint_r3_carries(rng):
    """Checkpoint/restore covers the r3 carry layouts: the BIN-SHARDED
    distributed-FDL OLS carry (P(None,None,ch,time)), the compressor's dd
    env_lo word, and a feedback-delay history — snapshot -> restore into a
    fresh mesh pipe resumes the exact stream."""
    from pipe_tpu import checkpoint

    C, BLOCK = 2, 4096
    P_ir = 6000  # > n_local=1024 -> distributed FDL
    ir = rng.standard_normal(P_ir) * np.exp(-np.arange(P_ir) / 1200.0)
    data = (rng.standard_normal((C, BLOCK * 4)) * 0.5).astype(np.float32)

    def make(data_part, sink):
        mesh = parallel.make_mesh(1, 4)
        ols = parallel.sharded.OLS(ir)
        comp = parallel.sharded.Compressor(threshold_db=-12.0, ratio=3.0,
                                           attack_ms=5.0, release_ms=80.0)
        echo = parallel.sharded.Delay(300, feedback=0.4, wet=0.3, dry=1.0)
        return pipe_tpu.Pipe(
            BLOCK,
            pipe_tpu.Line(
                source=feed_source(data_part, C),
                processors=[
                    ols.processor(), comp.processor(), echo.processor()
                ],
                sink=sink.sink(),
            ),
            mesh=mesh,
        )

    sink_full = mock.Sink()
    run_pipe(make(data, sink_full))

    sink_a = mock.Sink()
    pa = make(data[:, : 2 * BLOCK], sink_a)
    run_pipe(pa)
    ck = checkpoint.snapshot(pa)

    sink_b = mock.Sink()
    pb = make(data[:, 2 * BLOCK :], sink_b)
    checkpoint.restore(pb, ck)
    run_pipe(pb)

    resumed = np.concatenate([sink_a.values, sink_b.values], axis=1)
    assert resumed.shape == sink_full.values.shape
    np.testing.assert_allclose(resumed, sink_full.values, atol=2e-5)


def test_mesh_pipe_checkpoint_r4_ring_carries(rng):
    """Checkpoint/restore covers the r4 TIME-SHARDED BLOCK RING delay
    carries (P(ch, time) — the pure multi-hop ring, the free-feedback
    ring at D >= chunk, AND the r5 wave-DAG feedback ring at
    n_local < D < chunk): snapshot -> restore into a fresh mesh pipe
    resumes the exact stream."""
    from pipe_tpu import checkpoint

    C, BLOCK = 2, 4096
    data = (rng.standard_normal((C, BLOCK * 4)) * 0.5).astype(np.float32)

    def make(data_part, sink):
        mesh = parallel.make_mesh(1, 4)
        pure = parallel.sharded.Delay(9000, wet=1.0, dry=0.5)  # D > 2*chunk
        echo = parallel.sharded.Delay(5000, feedback=0.5, wet=0.4,
                                      dry=1.0)  # ring feedback, D >= chunk
        wave = parallel.sharded.Delay(2500, feedback=0.4, wet=0.3,
                                      dry=1.0)  # wave-DAG: n_local < D < N
        return pipe_tpu.Pipe(
            BLOCK,
            pipe_tpu.Line(
                source=feed_source(data_part, C),
                processors=[
                    pure.processor(), echo.processor(), wave.processor()
                ],
                sink=sink.sink(),
            ),
            mesh=mesh,
        )

    sink_full = mock.Sink()
    run_pipe(make(data, sink_full))

    sink_a = mock.Sink()
    pa = make(data[:, : 2 * BLOCK], sink_a)
    run_pipe(pa)
    ck = checkpoint.snapshot(pa)

    sink_b = mock.Sink()
    pb = make(data[:, 2 * BLOCK :], sink_b)
    checkpoint.restore(pb, ck)
    run_pipe(pb)

    resumed = np.concatenate([sink_a.values, sink_b.values], axis=1)
    assert resumed.shape == sink_full.values.shape
    np.testing.assert_allclose(resumed, sink_full.values, atol=2e-5)


def test_mesh_stats_recorder(rng):
    """StatsRecorder counts blocks/frames for mesh-backed lines too."""
    import pipe_tpu.profiling as profiling

    C, BLOCK = 4, 2048
    data = rng.standard_normal((C, BLOCK * 3)).astype(np.float32)
    stats = profiling.StatsRecorder()
    fir = parallel.sharded.FIR(np.asarray(ops.design_lowpass(63, 3000, 44100)))
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[fir.processor()],
            sink=sink.sink(),
        ),
        mesh=parallel.make_mesh(2, 4),
        stats=stats,
    )
    run_pipe(p)
    ls = stats.lines["line0"]
    # 3 data blocks + one EOF-probe dispatch; frames is dispatch-derived
    # by design (profiling.py: no device sync per block)
    assert ls.blocks == 4
    assert ls.frames == ls.blocks * BLOCK
    assert ls.wall_s > 0


def test_mesh_optimize_fuse_sharded_pair(rng):
    """optimize.fuse collapses sharded FIR+Resample into the fused sharded
    stage; output matches the unfused chain and set_taps on the original
    FIR object routes through the fused component (delegate)."""
    import pipe_tpu.optimize as optimize

    C, BLOCK = 4, 147 * 16
    data = rng.standard_normal((C, BLOCK * 2)).astype(np.float32)
    h = np.asarray(ops.design_lowpass(63, 3000, 44100))

    outs = {}
    for do_fuse in (False, True):
        fir = parallel.sharded.FIR(h)
        rs = parallel.sharded.Resample(48000, 44100, taps_per_phase=16)
        sink = mock.Sink()
        line = pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[fir.processor(), rs.processor()],
            sink=sink.sink(),
        )
        if do_fuse:
            line = optimize.fuse(line)
            assert len(line.processors) == 1
        p = pipe_tpu.Pipe(BLOCK, line, mesh=parallel.make_mesh(2, 4))
        run_pipe(p)
        outs[do_fuse] = sink.values
        if do_fuse:
            # delegate routing: set_taps on the ORIGINAL object targets the
            # fused component's taps param
            m = fir.set_taps(h * 0.5)
            m.apply()
            assert np.allclose(
                np.asarray(fir._delegate._component.params["taps"]), h * 0.5
            )

    assert outs[True].shape == outs[False].shape
    np.testing.assert_allclose(outs[True], outs[False], atol=3e-5)


def test_run_driver_with_mesh(rng):
    """The one-shot sync driver accepts a mesh, mirroring Pipe(mesh=)."""
    C, BLOCK = 4, 2048
    data = rng.standard_normal((C, BLOCK * 2)).astype(np.float32)
    h = np.asarray(ops.design_lowpass(63, 3000, 44100))
    fir = parallel.sharded.FIR(h)
    sink = mock.Sink()
    pipe_tpu.run(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data, C),
            processors=[fir.processor()],
            sink=sink.sink(),
        ),
        mesh=parallel.make_mesh(2, 4),
    )
    import scipy.signal

    oracle = scipy.signal.lfilter(h, [1.0], data.astype(np.float64), axis=1)
    assert snr_db(oracle, sink.values) > 100


def test_mesh_dispatch_noop_preserves_state(rng):
    """The multi-host exit-path padding must not corrupt stream state: the
    no-op dispatches run on donated COPIES and discard outputs, so carries
    (FIR tail, biquad s) are bit-identical before and after."""
    C, BLOCK = 4, 2048
    data = rng.standard_normal((C, BLOCK * 8)).astype(np.float32)
    h = np.asarray(ops.design_lowpass(127, 3000, 44100))
    sos = ops.design_peaking_eq(44100, 800, 2.0, 4.0)
    fir = parallel.sharded.FIR(h)
    bq = parallel.sharded.Biquad(sos)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=feed_source(data[:, : BLOCK * 2], C),
            processors=[fir.processor(), bq.processor()],
            sink=sink.sink(),
        ),
        mesh=parallel.make_mesh(2, 4),
    )
    run_pipe(p)
    le = p._exec_of_route[0]
    import jax as _jax

    before = _jax.device_get(le._states())
    n0 = le.blocks_dispatched
    le.dispatch_noop_to(n0 + 3)
    assert le.blocks_dispatched == n0 + 3
    after = _jax.device_get(le._states())
    for a, b in zip(_jax.tree.leaves(before), _jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    # sink received nothing extra
    assert sink.values.shape == (C, BLOCK * 2)


def test_mesh_insert_width_changing_resampler_exact(rng):
    """Width-changing live inserts now work on MESH lines too (r5): the
    downstream allocators re-run at the new width on the SAME dispatch
    grid/shardings, state carried where shapes match — here the sharded
    FIR's halo tail continues exactly across the adoption. Landing is
    chunk-exact and the whole output matches the float64 oracle
    >= 100 dB."""
    import threading

    C, BLOCK = 2, 588  # n_local=147 satisfies the resampler's phase rule
    N_CHUNKS = 10
    N = N_CHUNKS * BLOCK
    data = rng.standard_normal((C, N)).astype(np.float32)
    pos = [0]
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
    fir = parallel.sharded.FIR(h)
    rs = parallel.sharded.Resample(48000, 44100)
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
        mesh=parallel.make_mesh(1, 4),
    )
    p.start()
    target = 4
    hd = p.insert_processor(0, 0, rs.processor(), at_block=target)
    le = p._exec_of_route[0]
    deadline = time.time() + 60
    while le._next_target(0) != target:
        assert time.time() < deadline, "surgery target never delivered"
        time.sleep(0.002)
    target_queued.set()
    assert hd.wait(60) and hd.error is None, hd.error
    p.wait(120)

    # oracle: raw to the cut, polyphase-resampled after (fresh resampler
    # state at adoption), ONE continuous FIR (the sharded halo tail
    # carries across the downstream re-allocation)
    from pipe_tpu.ops.resample import polyphase_design

    cut = target * BLOCK
    L, M = 160, 147
    hp64 = polyphase_design(L, M, 32)
    K = hp64.shape[1]
    tail = data.astype(np.float64)[:, cut:]
    n_out = -(-tail.shape[1] * L // M)
    j = np.arange(n_out)
    p_, n0 = (j * M) % L, (j * M) // L
    nidx = n0[:, None] - np.arange(K)[None, :]
    valid = (nidx >= 0) & (nidx < tail.shape[1])
    xg = np.where(valid[None], tail[:, np.clip(nidx, 0, tail.shape[1] - 1)], 0.0)
    res = np.einsum("cok,ok->co", xg, hp64[p_])
    stream = np.concatenate([data.astype(np.float64)[:, :cut], res], axis=1)
    oracle = scipy.signal.lfilter(h, [1.0], stream, axis=1)
    assert sink.values.shape == oracle.shape, (sink.values.shape, oracle.shape)
    assert snr_db(oracle, sink.values) > 100


def test_mesh_insert_width_changer_violating_shape_rule_refused(rng):
    """A width-changing insert whose NEW width breaks a downstream
    stage's shape rule on the mesh refuses loudly (re-aggregating
    mid-run would change the at_block grid under the stream)."""
    C, BLOCK = 2, 588
    src = mock.Source(channels=C, value=1.0, interval=0.002)
    # downstream STFT sized for the 588 width; post-resample width 640
    # breaks its grid on this mesh (window 147 does not divide 160)
    sg = parallel.sharded.SpectralGain(147, 49)
    sink = mock.Sink(discard=True)
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=src.source(), processors=[sg.processor()],
            sink=sink.sink(),
        ),
        mesh=parallel.make_mesh(1, 4),
    )
    p.start()
    h = p.insert_processor(
        0, 0, parallel.sharded.Resample(48000, 44100).processor()
    )
    assert h.wait(30)
    assert h.error is not None and "shape rule" in str(h.error), h.error
    p.stop(30)


def _chunky_feed_source(data: np.ndarray, channels: int, seed: int = 7):
    """A host feed returning random-length short reads (1..n frames per
    call) — the reference's accept-any-length SourceFunc contract
    (``pipe.go:404-406``, ``mock/mock.go:95-105``)."""
    pos = [0]
    r = np.random.default_rng(seed)
    N = data.shape[1]

    def feed(n):
        if pos[0] >= N:
            return None
        take = min(int(r.integers(1, n + 1)), N - pos[0])
        c = data[:, pos[0] : pos[0] + take]
        pos[0] += take
        return c

    def alloc(ctx, block):
        return Source(output=SignalProperties(44100.0, channels), feed=feed)

    return alloc


def test_mesh_midstream_short_reads_rechunked(rng):
    """The reference's short-read protocol now holds on mesh lines: a feed
    returning random-length chunks mid-stream is re-chunked host-side into
    full dispatch blocks (exact — repacking changes no sample values), and
    the output matches the float64 oracle >= 100 dB end to end, partial
    final chunk included (r4 VERDICT item 1 — the last short-read gap)."""
    C, BLOCK = 2, 1024
    N = BLOCK * 5 + 311
    data = rng.standard_normal((C, N)).astype(np.float32)
    h = np.asarray(ops.design_lowpass(63, 3000, 44100))
    fir = parallel.sharded.FIR(h)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=_chunky_feed_source(data, C),
            processors=[fir.processor()],
            sink=sink.sink(),
        ),
        mesh=parallel.make_mesh(2, 4),
    )
    run_pipe(p)
    assert sink.values.shape == (C, N)
    oracle = scipy.signal.lfilter(h, [1.0], data.astype(np.float64), axis=1)
    assert snr_db(oracle, sink.values) > 100


def test_mesh_feed_over_returning_packets(rng):
    """A feed that IGNORES the requested count and returns fixed
    700-frame packets (more than asked, the other direction of the
    short-read contract): the re-chunker parks the surplus and splits it
    across block boundaries — exact, partial final chunk included."""
    C, BLOCK = 2, 512
    N = 700 * 11  # not a BLOCK multiple
    data = rng.standard_normal((C, N)).astype(np.float32)
    pos = [0]

    def feed(n):
        if pos[0] >= N:
            return None
        c = data[:, pos[0] : pos[0] + 700]
        pos[0] += c.shape[1]
        return c

    def alloc(ctx, block):
        return Source(output=SignalProperties(44100.0, C), feed=feed)

    h = np.asarray(ops.design_lowpass(63, 3000, 44100))
    fir = parallel.sharded.FIR(h)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=alloc, processors=[fir.processor()], sink=sink.sink()
        ),
        mesh=parallel.make_mesh(1, 4),
    )
    run_pipe(p)
    assert sink.values.shape == (C, N)
    oracle = scipy.signal.lfilter(h, [1.0], data.astype(np.float64), axis=1)
    assert snr_db(oracle, sink.values) > 100


def test_mesh_feed_empty_reads_skipped(rng):
    """Zero-length reads (a non-blocking source with nothing ready) are
    skipped by the re-chunker — the feed is simply asked again; stream
    content is unaffected."""
    C, BLOCK = 1, 512
    N = BLOCK * 3 + 100
    data = rng.standard_normal((C, N)).astype(np.float32)
    pos, call = [0], [0]

    def feed(n):
        call[0] += 1
        if call[0] % 3 == 0:
            return np.zeros((C, 0), np.float32)  # nothing ready yet
        if pos[0] >= N:
            return None
        c = data[:, pos[0] : pos[0] + min(n, 300)]
        pos[0] += c.shape[1]
        return c

    def alloc(ctx, block):
        return Source(output=SignalProperties(44100.0, C), feed=feed)

    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=alloc, sink=sink.sink()),
        mesh=parallel.make_mesh(1, 4),
    )
    run_pipe(p)
    assert sink.values.shape == (C, N)
    np.testing.assert_allclose(sink.values, data, atol=0)


def test_mesh_short_reads_batched_with_target(rng):
    """Short-read re-chunking composes with dispatch batching AND exact
    mutation landing: under batch_blocks=4 a retune pushed at a block
    target still lands on that exact chunk while the feed dribbles
    random-length reads."""
    C, BLOCK = 2, 1024
    n_blocks = 12
    data = rng.standard_normal((C, BLOCK * n_blocks)).astype(np.float32)
    h1 = np.asarray(ops.design_lowpass(63, 3000, 44100))
    h2 = np.asarray(ops.design_lowpass(63, 9000, 44100))
    fir = parallel.sharded.FIR(h1)
    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(
            source=_chunky_feed_source(data, C, seed=11),
            processors=[fir.processor()],
            sink=sink.sink(),
        ),
        mesh=parallel.make_mesh(2, 4),
        batch_blocks=4,
    )
    AT = 6
    p.start()
    p.push(fir.set_taps(h2), at_block=AT)
    p.wait(120)
    assert sink.values.shape == (C, BLOCK * n_blocks)
    # The FIR carries its INPUT tail, so after the retune h2 sees the true
    # input history: the oracle is lfilter(h1) before the cut stitched
    # with lfilter(h2) (full history) after it.
    cut = AT * BLOCK
    z1 = scipy.signal.lfilter(h1, [1.0], data.astype(np.float64), axis=1)
    z2 = scipy.signal.lfilter(h2, [1.0], data.astype(np.float64), axis=1)
    oracle = np.concatenate([z1[:, :cut], z2[:, cut:]], axis=1)
    assert snr_db(oracle, sink.values) > 100
