"""Randomized cross-checks (seeded): sweeps of op parameters, channel
counts, block sizes, and stream lengths against float64 oracles, plus
blocking invariance on randomly composed chains. The fixed golden tests
pin known configurations; this battery walks the parameter space the way
users will (the reference relies on `--race` + a fixed matrix; breadth
here is the blocked-engine analog)."""

import numpy as np
import pytest
import scipy.signal

from pipe_tpu import ops
from pipe_tpu.signal import snr_db

from tests.test_ops import stream_through


def test_fuzz_fir_random_taps_blocks(rng):
    """Random tap counts (odd/even, incl. 1), shared and per-channel,
    random blockings with partial tails, vs lfilter float64."""
    for case in range(6):
        T = int(rng.integers(1, 258))
        C = int(rng.integers(1, 5))
        N = int(rng.integers(900, 5000))
        block = int(rng.integers(64, 1025))
        per_channel = bool(rng.integers(0, 2))
        shape = (C, T) if per_channel else (T,)
        h = rng.standard_normal(shape) / max(T, 4)
        x = rng.standard_normal((C, N)).astype(np.float32)
        out = stream_through([ops.FIR(h).processor()], x, block=block)
        x64 = x.astype(np.float64)
        if per_channel:
            oracle = np.stack(
                [
                    scipy.signal.lfilter(h[c], [1.0], x64[c])
                    for c in range(C)
                ]
            )
        else:
            oracle = scipy.signal.lfilter(h, [1.0], x64, axis=1)
        s = snr_db(oracle, out)
        assert s > 100, f"case {case}: T={T} C={C} block={block}: {s:.1f}"


def test_fuzz_biquad_random_stable_sections(rng):
    """Random stable cascades (pole radius up to 0.98, random zeros),
    random blockings, vs sosfilt float64 — the refinement pass must hold
    100 dB across the space, not just at the golden configs."""
    for case in range(6):
        S = int(rng.integers(1, 4))
        rows = []
        for _ in range(S):
            rp = rng.uniform(0.1, 0.98)
            th = rng.uniform(0.05, np.pi - 0.05)
            a1, a2 = -2 * rp * np.cos(th), rp * rp
            rz = rng.uniform(0.0, 1.2)
            tz = rng.uniform(0.0, np.pi)
            b = np.array([1.0, -2 * rz * np.cos(tz), rz * rz])
            b = b * rng.uniform(0.2, 1.5)
            rows.append([b[0], b[1], b[2], 1.0, a1, a2])
        sos = np.asarray(rows)
        C = int(rng.integers(1, 4))
        N = int(rng.integers(1500, 6000))
        block = int(rng.integers(96, 769))
        x = rng.standard_normal((C, N)).astype(np.float32)
        out = stream_through([ops.Biquad(sos).processor()], x, block=block)
        oracle = scipy.signal.sosfilt(sos, x.astype(np.float64), axis=1)
        s = snr_db(oracle, out)
        assert s > 100, f"case {case}: S={S} block={block}: {s:.1f}"


def test_fuzz_delay_echo(rng):
    """Random delay/feedback/mix vs the direct numpy recurrence."""
    for case in range(7):
        block = int(rng.integers(64, 513))
        if case < 3:
            D = int(rng.integers(1, block))  # r3: short-delay echo
        else:
            D = int(block * rng.integers(1, 4))
        fb = float(rng.uniform(-0.6, 0.6))
        wet = float(rng.uniform(0.2, 1.0))
        dry = float(rng.uniform(0.0, 1.0))
        C = int(rng.integers(1, 3))
        N = int(rng.integers(2000, 6000))
        x = rng.standard_normal((C, N)).astype(np.float32)
        out = stream_through(
            [ops.Delay(D, feedback=fb, wet=wet, dry=dry).processor()],
            x, block=block,
        )
        x64 = x.astype(np.float64)
        s = np.zeros((C, N + D))
        for n in range(N):
            s[:, n + D] = x64[:, n] + fb * s[:, n]
        oracle = dry * x64 + wet * s[:, :N]
        sn = snr_db(oracle, out)
        assert sn > 100, f"case {case}: D={D} fb={fb:.2f}: {sn:.1f}"


def test_fuzz_distributed_fdl_random_configs(rng):
    """Random (IR length, mesh shape, chunk, channels, shared/per-channel)
    sweeps of the bin-sharded OLS FDL vs fftconvolve — the >=100 dB bar
    across the space, not just at golden configs."""
    import jax
    import scipy.signal
    from pipe_tpu import parallel

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    for case in range(6):
        ch, t = [(1, 2), (1, 4), (2, 4), (1, 8)][int(rng.integers(0, 4))]
        n_local = int(rng.integers(96, 600))
        chunk = n_local * t
        C = ch * int(rng.integers(1, 3))
        P = int(rng.integers(n_local + 1, n_local * 12))
        per_channel = bool(rng.integers(0, 2))
        shape = (C, P) if per_channel else (P,)
        ir = rng.standard_normal(shape) * np.exp(
            -np.arange(P) / (P / 4.0)
        )
        n_chunks = int(rng.integers(1, 4))
        x = rng.standard_normal((C, chunk * n_chunks)).astype(np.float32)
        chain = parallel.ShardedChain(
            parallel.make_mesh(ch, t), [parallel.OLSStage(ir)],
            channels=C, chunk_frames=chunk,
        )
        out = chain.process(x)
        if per_channel:
            oracle = np.stack([
                scipy.signal.fftconvolve(
                    x[c].astype(np.float64), ir[c]
                )[: x.shape[1]]
                for c in range(C)
            ])
        else:
            oracle = scipy.signal.fftconvolve(
                x.astype(np.float64), ir[None, :], axes=1
            )[:, : x.shape[1]]
        sn = snr_db(oracle, out)
        assert sn > 100, (
            f"case {case}: mesh {ch}x{t} n_local={n_local} P={P} "
            f"per_channel={per_channel}: {sn:.1f} dB"
        )


def test_fuzz_sharded_delay_random_configs(rng):
    """Random delay/feedback sweeps of the sharded DelayStage (short,
    non-dividing, and longer-than-chunk delays) vs the recurrence."""
    import jax
    from pipe_tpu import parallel

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    for case in range(6):
        t = [2, 4, 8][int(rng.integers(0, 3))]
        n_local = int(rng.integers(128, 700))
        chunk = n_local * t
        C = int(rng.integers(1, 3))
        D = int(rng.integers(1, int(2.5 * n_local)))
        fb = float(rng.uniform(-0.5, 0.5)) if rng.integers(0, 2) else 0.0
        wet = float(rng.uniform(0.2, 1.0))
        dry = float(rng.uniform(0.0, 1.0))
        n_chunks = int(rng.integers(1, 4))
        x = rng.standard_normal((C, chunk * n_chunks)).astype(np.float32)
        st = parallel.DelayStage(D, feedback=fb, wet=wet, dry=dry)
        chain = parallel.ShardedChain(
            parallel.make_mesh(1, t), [st], channels=C, chunk_frames=chunk
        )
        out = chain.process(x)
        x64 = x.astype(np.float64)
        N = x64.shape[1]
        s = np.zeros((C, N + D))
        for n in range(N):
            s[:, n + D] = x64[:, n] + fb * s[:, n]
        oracle = dry * x64 + wet * s[:, :N]
        sn = snr_db(oracle, out)
        assert sn > 95, (
            f"case {case}: T={t} n_local={n_local} D={D} fb={fb:.2f}: "
            f"{sn:.1f} dB"
        )


_POOL = [
    lambda r: ops.FIR(r.standard_normal(int(r.integers(3, 130))) / 16),
    # freq >= 1 kHz keeps the section's noise-gain floor comfortably
    # above the 100 dB mutual bar (docs/PERF_NOTES.md: below that the
    # 1/A(z) amplification of f32 rounding noise caps ANY realization —
    # a sample-rate problem, not an implementation one)
    lambda r: ops.Biquad(
        ops.design_peaking_eq(
            44100, float(r.uniform(1000, 8000)), float(r.uniform(0.5, 4.0)),
            float(r.uniform(-9, 9)),
        )
    ),
    lambda r: ops.Gain(float(r.uniform(0.2, 2.0))),
    lambda r: ops.Compressor(
        threshold_db=float(r.uniform(-30, -6)),
        ratio=float(r.uniform(1.5, 8.0)),
        attack_ms=float(r.uniform(0.5, 10.0)),
        release_ms=float(r.uniform(20, 200)),
    ),
    lambda r: ops.NoiseGate(
        threshold_db=float(r.uniform(-70, -30)),
        range_db=float(r.uniform(20, 60)),
    ),
]


def test_fuzz_random_chain_blocking_invariance(rng):
    """Randomly composed chains are blocking-invariant: two random
    blockings of the same stream agree to f32 noise."""
    for case in range(5):
        chain_ops = [
            _POOL[int(rng.integers(0, len(_POOL)))](rng)
            for _ in range(int(rng.integers(2, 5)))
        ]
        C = int(rng.integers(1, 3))
        N = int(rng.integers(3000, 7000))
        b1, b2 = (int(rng.integers(64, 1025)) for _ in range(2))
        x = rng.standard_normal((C, N)).astype(np.float32)
        outs = []
        for b in (b1, b2):
            procs = [op.processor() for op in chain_ops]
            outs.append(stream_through(procs, x, block=b))
        s = snr_db(outs[0].astype(np.float64), outs[1])
        assert s > 100, f"case {case}: blocks {b1}/{b2}: {s:.1f}"


def test_iir_noise_gain_floor_documented(rng):
    """The precision model for near-DC poles (docs/PERF_NOTES.md): white
    ~2^-24-relative rounding noise injected into the recurrence comes out
    amplified by the L2 noise gain of 1/A(z), capping achievable SNR near
    -20*log10(2^-24 * ||1/A||_2) regardless of realization. The refined
    engine must sit within ~8 dB of that cap (the raw associative/tile
    error is far worse)."""
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    for f, q in [(100, 0.5), (150, 2.0), (400, 2.0)]:
        sos = ops.design_peaking_eq(44100, f, q, 6.0)
        imp = np.zeros(200_000)
        imp[0] = 1.0
        hinv = scipy.signal.lfilter([1.0], [1.0, sos[4], sos[5]], imp)
        noise_gain = float(np.sqrt(np.sum(hinv**2)))
        floor_db = -20 * np.log10(noise_gain * 2.0**-24)
        out = stream_through([ops.Biquad(sos).processor()], x, block=512)
        oracle = scipy.signal.sosfilt(sos[None], x.astype(np.float64), axis=1)
        s = snr_db(oracle, out)
        assert s > floor_db - 8, f"f={f}: {s:.1f} vs floor {floor_db:.1f}"


def test_fuzz_weird_shape_mesh_lines(rng):
    """r4 any-shape matrix: random (channels, block, mesh) combinations —
    non-dividing channels ride pad rows, non-dividing blocks aggregate —
    must match the streaming engine >=100 dB."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    import pipe_tpu
    from pipe_tpu import mock, ops, parallel
    from pipe_tpu.components import Source
    from pipe_tpu.signal import SignalProperties

    from tests.test_ops import stream_through

    for case in range(5):
        ch_s, t_s = [(1, 4), (2, 4), (4, 2), (2, 2)][int(rng.integers(0, 4))]
        C = int(rng.integers(1, 7))
        block = int(rng.integers(200, 900))
        n_blocks = int(rng.integers(6, 12))
        D = int(rng.integers(1, 2000))
        T = int(rng.integers(5, 40)) | 1
        x = rng.standard_normal((C, block * n_blocks)).astype(np.float32)
        h = ops.design_lowpass(T, 5000.0, 44100.0)

        pos = [0]

        def feed(n):
            if pos[0] >= x.shape[1]:
                return None
            c = x[:, pos[0]:pos[0] + n]
            pos[0] += n
            return c

        def src(ctx, bs):
            return Source(output=SignalProperties(44100.0, C), feed=feed)

        fir = parallel.sharded.FIR(h)
        dly = parallel.sharded.Delay(D, wet=0.5, dry=1.0)
        g = parallel.sharded.Gain(0.7)
        sink = mock.Sink()
        p = pipe_tpu.Pipe(
            block,
            pipe_tpu.Line(source=src,
                          processors=[fir.processor(), g.processor(),
                                      dly.processor()],
                          sink=sink.sink()),
            mesh=parallel.make_mesh(ch_s, t_s),
            optimize=bool(rng.integers(0, 2)),  # fusion under padding too
        )
        p.start()
        p.wait(120)
        out = sink.values

        streamed = stream_through(
            [ops.FIR(h).processor(), ops.Gain(0.7).processor(),
             ops.Delay(D, wet=0.5, dry=1.0).processor()],
            x, block,
        )
        assert out.shape == streamed.shape, (
            f"case {case}: mesh {ch_s}x{t_s} C={C} block={block} "
            f"(agg={p._agg}): {out.shape} vs {streamed.shape}"
        )
        sn = snr_db(streamed.astype(np.float64), out)
        assert sn > 100, (
            f"case {case}: mesh {ch_s}x{t_s} C={C} block={block} D={D} "
            f"T={T} agg={p._agg}: {sn:.1f} dB"
        )


def test_fuzz_live_width_insert_knob_invariance(rng):
    """r5 fuzz: a width-changing processor LIVE-INSERTED at a block
    target produces the identical stream under different
    lookahead/batch_blocks knobs — random base chains, insert kinds, and
    positions. Pins both the deterministic landing and the exactness of
    the downstream re-allocation + state carry."""
    import threading
    import time as _time

    import pipe_tpu
    from pipe_tpu import mock
    from pipe_tpu.components import Source
    from pipe_tpu.signal import SignalProperties

    BLOCK = 256
    h = ops.design_lowpass(63, 5000, 44100)
    sos = ops.design_peaking_eq(44100, freq=800, q=1.0, gain_db=2.0)
    bases = [
        lambda: [ops.FIR(h).processor()],
        lambda: [ops.Gain(0.8).processor(), ops.FIR(h).processor()],
        lambda: [ops.Biquad(sos).processor(), ops.Gain(1.1).processor()],
    ]
    inserts = [
        lambda: ops.Resampler(2, 1),
        lambda: ops.Resampler(160, 147),
        lambda: ops.SpectralGain(240, 48),
    ]
    for case in range(3):
        C = int(rng.integers(1, 3))
        data = rng.standard_normal((C, BLOCK * 24 + 77)).astype(np.float32)
        base = bases[int(rng.integers(0, len(bases)))]
        mk_ins = inserts[int(rng.integers(0, len(inserts)))]
        n_procs = len(base())
        pos = int(rng.integers(0, n_procs + 1))
        target = 5

        def run(lookahead, batch_blocks):
            fpos = [0]
            gate = threading.Event()

            def feed(n):
                if fpos[0] >= 2 * BLOCK:
                    gate.wait(60)
                if fpos[0] >= data.shape[1]:
                    return None
                c = data[:, fpos[0] : fpos[0] + n]
                fpos[0] += n
                return c

            sink = mock.Sink()
            p = pipe_tpu.Pipe(
                BLOCK,
                pipe_tpu.Line(
                    source=lambda ctx, b: Source(
                        output=SignalProperties(44100.0, C), feed=feed
                    ),
                    processors=base(),
                    sink=sink.sink(),
                ),
                lookahead=lookahead,
                batch_blocks=batch_blocks,
            )
            p.start()
            hd = p.insert_processor(
                0, pos, mk_ins().processor(), at_block=target
            )
            le = p._exec_of_route[0]
            deadline = _time.time() + 60
            while le._next_target(0) != target:
                assert _time.time() < deadline, "target never delivered"
                _time.sleep(0.002)
            gate.set()
            assert hd.wait(60) and hd.error is None, hd.error
            p.wait(120)
            return sink.values

        ya = run(1, 1)
        yb = run(8, 8)
        assert ya.shape == yb.shape, (
            f"case {case}: pos {pos}: {ya.shape} vs {yb.shape}"
        )
        np.testing.assert_allclose(
            ya, yb, atol=1e-6,
            err_msg=f"case {case}: pos {pos} knobs (1,1) vs (8,8)",
        )


def test_fuzz_mixed_width_chain_block_invariance(rng):
    """r4: random chains through width-changing ops (STFT, resampler,
    gate) at two random block sizes produce the same stream — the
    capacity threading + hop/phase residue carries make chunking
    transparent for ANY block size."""
    from tests.test_ops import stream_through

    chains = [
        lambda D: [ops.SpectralGain(512, 128).processor(),
                   ops.Delay(D).processor(), ops.Gain(0.5).processor()],
        lambda D: [ops.Resampler(160, 147).processor(),
                   ops.Delay(D).processor()],
        lambda D: [ops.FIR(ops.design_lowpass(63, 5000, 44100)).processor(),
                   ops.SpectralGain(256, 64).processor()],
        lambda D: [ops.Resampler(48000, 32000).processor(),
                   ops.SpectralGate(256, 64, threshold=1e-4).processor()],
    ]
    for case in range(4):
        C = int(rng.integers(1, 4))
        x = rng.standard_normal((C, 16000)).astype(np.float32)
        b1, b2 = (int(rng.integers(90, 1300)) for _ in range(2))
        D = int(rng.integers(1, 3000))
        mk = chains[case]
        ya = stream_through(mk(D), x, b1)
        yb = stream_through(mk(D), x, b2)
        n = min(ya.shape[1], yb.shape[1])
        sn = snr_db(yb[:, :n].astype(np.float64), ya[:, :n])
        assert sn > 110, (
            f"case {case}: blocks {b1}/{b2} C={C} D={D}: {sn:.1f} dB"
        )
