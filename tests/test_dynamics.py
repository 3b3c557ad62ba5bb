"""Dynamics ops (delay/echo, compressor, gate) vs float64 sample-loop
oracles."""

import numpy as np
import pytest

import pipe_tpu
from pipe_tpu import ops
from pipe_tpu.signal import snr_db

from tests.test_ops import stream_through, SNR_TARGET


def _envelope_oracle(x_abs, rc, ac, raw0=0.0, env0=0.0):
    """Sequential float64 envelope: release max-decay + attack one-pole."""
    raw = np.zeros_like(x_abs, dtype=np.float64)
    env = np.zeros_like(x_abs, dtype=np.float64)
    r, e = raw0, env0
    for n in range(x_abs.shape[-1]):
        r = max(x_abs[..., n], rc * r)
        e = ac * e + (1.0 - ac) * r
        raw[..., n], env[..., n] = r, e
    return raw, env


def test_pure_delay(rng):
    C, N, block, D = 2, 4096, 512, 300
    x = rng.standard_normal((C, N)).astype(np.float32)
    d = ops.Delay(D)
    y = stream_through([d.processor()], x, block)
    oracle = np.zeros_like(x)
    oracle[:, D:] = x[:, :-D]
    assert snr_db(oracle.astype(np.float64), y) >= SNR_TARGET


def test_delay_wet_dry_mix(rng):
    C, N, block, D = 1, 2048, 256, 100
    x = rng.standard_normal((C, N)).astype(np.float32)
    d = ops.Delay(D, wet=0.4, dry=0.6)
    y = stream_through([d.processor()], x, block)
    delayed = np.zeros_like(x)
    delayed[:, D:] = x[:, :-D]
    oracle = 0.6 * x + 0.4 * delayed
    assert snr_db(oracle.astype(np.float64), y) >= SNR_TARGET


def _stream_chunks(proc_allocs, x, block, chunks):
    """Like ``stream_through`` but the source emits the given chunk
    lengths in order (short mid-stream chunks = partial blocks)."""
    import pipe_tpu as pt
    from pipe_tpu import mock as _mock
    from pipe_tpu.components import Source
    from pipe_tpu.signal import SignalProperties

    C, N = x.shape
    assert sum(chunks) == N
    state = {"pos": 0, "i": 0}

    def feed(block_size):
        if state["i"] >= len(chunks):
            return None
        n = chunks[state["i"]]
        assert n <= block_size
        state["i"] += 1
        chunk = x[:, state["pos"] : state["pos"] + n]
        state["pos"] += n
        return chunk

    def src_alloc(mctx, block_size):
        return Source(
            output=SignalProperties(sample_rate=44100.0, channels=C),
            feed=feed,
        )

    sink = _mock.Sink()
    line = pt.Line(
        source=src_alloc, processors=list(proc_allocs), sink=sink.sink()
    )
    pt.run(block, line)
    return sink.values


def test_pure_delay_ring_unaligned(rng):
    """ADVICE r3 (high): ``D >= block`` with ``D % block != 0`` makes the
    mirrored-ring write wrap mid-block (pos cycles through every residue
    of L) — the repaired third write must keep the canonical low indices
    fresh. Pre-fix this measured 9.5 dB."""
    C, N, block, D = 2, 16384, 512, 600
    x = rng.standard_normal((C, N)).astype(np.float32)
    d = ops.Delay(D)
    y = stream_through([d.processor()], x, block)
    oracle = np.zeros_like(x)
    oracle[:, D:] = x[:, :-D]
    assert snr_db(oracle.astype(np.float64), y) >= SNR_TARGET


def test_pure_delay_ring_mastering_shape(rng):
    """The examples/mastering_chain.py shape (D=11025, block 512) drives
    the same wrapped-write path."""
    C, N, block, D = 1, 3 * 11025 + 640, 512, 11025
    x = rng.standard_normal((C, N)).astype(np.float32)
    d = ops.Delay(D, wet=1.0, dry=0.0)
    y = stream_through([d.processor()], x, block)
    oracle = np.zeros_like(x)
    oracle[:, D:] = x[:, :-D]
    assert snr_db(oracle.astype(np.float64), y) >= SNR_TARGET


def test_pure_delay_ring_partial_midstream_block(rng):
    """A short mid-stream chunk advances pos by a non-block stride —
    every later write wraps at a new residue; history must stay exact."""
    C, block, D = 2, 512, 1024
    chunks = [512, 300, 512, 512, 129, 512, 512, 512, 77]
    N = sum(chunks)
    x = rng.standard_normal((C, N)).astype(np.float32)
    d = ops.Delay(D)
    y = _stream_chunks([d.processor()], x, block, chunks)
    oracle = np.zeros_like(x)
    oracle[:, D:] = x[:, :-D]
    assert y.shape == (C, N)
    assert snr_db(oracle.astype(np.float64), y) >= SNR_TARGET


def test_feedback_echo_ring_unaligned(rng):
    """Feedback variant of the wrapped-ring regression (pre-fix 8.8 dB):
    the recurrence reads the same canonical window it must repair."""
    C, N, block, D, fb = 1, 16384, 512, 600, 0.5
    x = rng.standard_normal((C, N)).astype(np.float32)
    d = ops.Delay(D, feedback=fb, wet=1.0, dry=0.3)
    y = stream_through([d.processor()], x, block)
    s = np.zeros(N)
    out = np.zeros(N)
    for n in range(N):
        dtap = s[n - D] if n >= D else 0.0
        s[n] = x[0, n] + fb * dtap
        out[n] = 0.3 * x[0, n] + 1.0 * dtap
    assert snr_db(out, y[0]) >= 110


def test_feedback_echo(rng):
    C, N, block, D = 1, 8192, 512, 1024
    x = np.zeros((C, N), np.float32)
    x[:, 0] = 1.0  # impulse -> echoes at D, 2D, 3D...
    d = ops.Delay(D, feedback=0.5, wet=1.0, dry=1.0)
    y = stream_through([d.processor()], x, block)
    # oracle: s[n] = x[n] + fb*s[n-D]; out = x + s[n-D]
    s = np.zeros(N)
    out = np.zeros(N)
    for n in range(N):
        dtap = s[n - D] if n >= D else 0.0
        s[n] = x[0, n] + 0.5 * dtap
        out[n] = x[0, n] + dtap
    assert snr_db(out, y[0]) >= SNR_TARGET
    # audible check: geometric echo train
    assert out[D] == pytest.approx(1.0)
    assert out[2 * D] == pytest.approx(0.5)
    assert out[3 * D] == pytest.approx(0.25)


def test_feedback_echo_short_delay(rng):
    """r3: feedback echo with D < block_size — the in-block recurrence
    runs as lane-parallel one-pole scans (formerly a documented
    structural rejection)."""
    C, N, block, D, fb = 1, 8192, 512, 100, 0.6
    x = rng.standard_normal((C, N)).astype(np.float32)
    d = ops.Delay(D, feedback=fb, wet=0.7, dry=0.3)
    y = stream_through([d.processor()], x, block)
    s = np.zeros(N)
    out = np.zeros(N)
    for n in range(N):
        dtap = s[n - D] if n >= D else 0.0
        s[n] = x[0, n] + fb * dtap
        out[n] = 0.3 * x[0, n] + 0.7 * dtap
    assert snr_db(out, y[0]) >= 110  # docs/PERF_NOTES.md "Feedback echo"


def test_feedback_echo_short_delay_partial_final_block(rng):
    """The short-delay recurrence carries correctly through a partial
    final block (the EOF tail)."""
    C, N, block, D, fb = 1, 512 * 3 + 77, 512, 130, 0.5
    x = rng.standard_normal((C, N)).astype(np.float32)
    d = ops.Delay(D, feedback=fb)
    y = stream_through([d.processor()], x, block)
    s = np.zeros(N)
    out = np.zeros(N)
    for n in range(N):
        dtap = s[n - D] if n >= D else 0.0
        s[n] = x[0, n] + fb * dtap
        out[n] = dtap
    assert y.shape == (C, N)
    assert snr_db(out, y[0]) >= 110


def test_feedback_echo_high_fb_long_stream_floor(rng):
    """VERDICT r3 item 1: the echo's measured precision floor. At
    fb=0.95 (kappa = 1/(1-fb) = 20, far past any musical echo) over a
    256-block stream the recurrence still holds ~134 dB because each
    lane is revisited only every D samples and the per-visit f32
    rounding is unamplified relative noise (docs/PERF_NOTES.md
    "Feedback echo precision"). The 100 dB bar holds with >25 dB
    margin; no dd treatment is needed."""
    C, N, block, D, fb = 1, 131072, 512, 100, 0.95
    x = rng.standard_normal((C, N)).astype(np.float32)
    d = ops.Delay(D, feedback=fb, wet=0.7, dry=0.3)
    y = stream_through([d.processor()], x, block)
    import scipy.signal

    a = np.zeros(D + 1)
    a[0], a[D] = 1.0, -fb
    s = scipy.signal.lfilter([1.0], a, x.astype(np.float64), axis=1)
    delayed = np.concatenate([np.zeros((C, D)), s[:, :-D]], axis=1)
    out = 0.3 * x.astype(np.float64) + 0.7 * delayed
    assert snr_db(out, y) > 125


def test_envelope_block_matches_sequential(rng):
    import jax
    import jax.numpy as jnp
    from pipe_tpu.ops.dynamics import envelope_block

    C, B = 2, 1000
    x = np.abs(rng.standard_normal((C, B))).astype(np.float32)
    rc, ac = 0.999, 0.9
    env0 = jnp.zeros((C, 2), jnp.float32)
    new0, new_lo, env = jax.jit(envelope_block)(
        env0, jnp.asarray(x), jnp.asarray(B, jnp.int32),
        jnp.asarray(rc, jnp.float32), jnp.asarray(1.0 - ac, jnp.float32),
    )
    for c in range(C):
        raw_o, env_o = _envelope_oracle(x[c].astype(np.float64), rc, ac)
        # refined attack smoother: the residual f32 noise is the release
        # follower's unamplified rounding (~116 dB here), not the attack
        # recursion (formerly the 80 dB bound)
        assert snr_db(env_o, np.asarray(env[c])) >= 110
        assert float(new0[c, 0]) == pytest.approx(raw_o[-1], rel=1e-5)
        assert float(new0[c, 1]) == pytest.approx(env_o[-1], rel=1e-5)


def test_envelope_streaming_continuity(rng):
    """Blocked envelope == one-shot envelope (state carries across blocks)."""
    import jax
    import jax.numpy as jnp
    from pipe_tpu.ops.dynamics import envelope_block

    C, B = 1, 2048
    x = np.abs(rng.standard_normal((C, B))).astype(np.float32)
    rc = jnp.asarray(0.995, jnp.float32)
    ao = jnp.asarray(1.0 - 0.8, jnp.float32)
    f = jax.jit(envelope_block)

    _, _, whole = f(jnp.zeros((C, 2), jnp.float32), jnp.asarray(x),
                    jnp.asarray(B, jnp.int32), rc, ao)
    st = jnp.zeros((C, 2), jnp.float32)
    lo = jnp.zeros((C,), jnp.float32)
    parts = []
    for i in range(4):
        blk = jnp.asarray(x[:, i * 512:(i + 1) * 512])
        st, lo, e = f(st, blk, jnp.asarray(512, jnp.int32), rc, ao, lo)
        parts.append(np.asarray(e))
    assert snr_db(np.asarray(whole), np.concatenate(parts, axis=1)) >= 110


def test_dd_coefficient_split_survives_jit():
    """The laundered (1 - oma) hi/lo split must keep its error channel
    under jit: a plain two_sum(1.0, -oma) gets constant-folded to lo == 0
    by XLA (measured — this is how the envelope refinement silently lost
    its coefficient correction before r3)."""
    import jax
    import jax.numpy as jnp
    from pipe_tpu.ops.biquad import _opaque_one

    def split(oma):
        one = _opaque_one(oma)
        hi = (1.0 - oma) * one
        lo = ((1.0 - hi) * one - oma) * one
        return hi, lo

    oma32 = np.float32(7.558578e-05)  # a 300 ms attack at 44.1 kHz
    hi, lo = jax.jit(split)(jnp.asarray(oma32))
    true_lo = (1.0 - np.float64(oma32)) - np.float64(np.float32(1.0 - np.float64(oma32)))
    assert float(lo) != 0.0
    assert float(np.float64(hi) + np.float64(lo)) == 1.0 - np.float64(oma32)
    assert float(lo) == pytest.approx(true_lo, rel=1e-6)


def test_compressor_slow_attack_holds_100db(rng):
    """VERDICT r2 item 4: a SLOW attack (50 ms, kappa ~ 4400 — the plain
    f32 one-pole sits near 93 dB there) must clear 100 dB vs a sequential
    float64 oracle through the streaming engine."""
    C, N, block = 2, 32768, 1024
    x = (0.5 * rng.standard_normal((C, N))).astype(np.float32)
    att, rel, thr, ratio = 50.0, 120.0, -15.0, 4.0
    comp = ops.Compressor(threshold_db=thr, ratio=ratio,
                          attack_ms=att, release_ms=rel)
    y = stream_through([comp.processor()], x, block)

    from tests.test_parallel import _envelope64

    env = _envelope64(x, attack_ms=att, release_ms=rel)
    env_db = 20.0 * np.log10(np.maximum(env, 1e-8))
    over = np.maximum(env_db - thr, 0.0)
    g = 10.0 ** ((-over * (1.0 - 1.0 / ratio)) / 20.0)
    snr = snr_db(x.astype(np.float64) * g, y)
    assert snr > 100, f"{snr:.1f} dB"


def test_compressor_attenuates_above_threshold(rng):
    C, N, block = 1, 44100, 512
    t = np.arange(N) / 44100.0
    x = (0.9 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :]
    comp = ops.Compressor(threshold_db=-20.0, ratio=4.0,
                          attack_ms=1.0, release_ms=100.0)
    y = stream_through([comp.processor()], x, block)
    # steady state: envelope ~0.9 => -0.9 dB; over = 19.1 dB; gain = -14.3 dB
    tail_in = np.abs(x[0, -8000:]).max()
    tail_out = np.abs(y[0, -8000:]).max()
    gain_db = 20 * np.log10(tail_out / tail_in)
    expect = -(20 * np.log10(0.9) + 20.0) * (1 - 1 / 4.0)  # about -14.3 dB
    assert gain_db == pytest.approx(expect, abs=0.5)


def test_limiter_infinite_ratio(rng):
    C, N, block = 1, 22050, 512
    x = (0.9 * np.ones((C, N))).astype(np.float32)
    lim = ops.Compressor(threshold_db=-12.0, ratio=np.inf, attack_ms=0.5,
                         release_ms=50.0)
    y = stream_through([lim.processor()], x, block)
    peak_db = 20 * np.log10(np.abs(y[0, -4000:]).max())
    assert peak_db == pytest.approx(-12.0, abs=0.3)


def test_compressor_below_threshold_unity(rng):
    C, N, block = 1, 8192, 512
    x = (0.01 * rng.standard_normal((C, N))).astype(np.float32)  # ~-40 dB
    comp = ops.Compressor(threshold_db=-20.0, ratio=4.0)
    y = stream_through([comp.processor()], x, block)
    assert snr_db(x.astype(np.float64), y) >= 60  # ~unity passthrough


def test_compressor_live_mutation(rng):
    """Threshold push mid-stream takes effect without recompiling."""
    import time
    from pipe_tpu import mock

    comp = ops.Compressor(threshold_db=0.0, ratio=np.inf, attack_ms=0.01,
                          release_ms=0.01)
    src = mock.Source(channels=1, value=0.5, limit=512 * 200, interval=0.002)
    sink = mock.Sink()
    line = pipe_tpu.Line(
        source=src.source(),
        processors=pipe_tpu.Processors(comp.processor()),
        sink=sink.sink(),
    )
    p = pipe_tpu.Pipe(512, line)
    p.start()
    time.sleep(0.1)
    p.push(comp.set(threshold_db=-20.0))  # clamp 0.5 (-6 dB) down to -20 dB
    p.wait(60)
    vals = sink.values[0]
    assert vals.max() == pytest.approx(0.5, abs=1e-3)
    assert vals.min() == pytest.approx(10 ** (-20 / 20), abs=5e-3)


def test_noise_gate_gates_quiet_passes_loud(rng):
    C, N, block = 1, 44100, 512
    x = np.zeros((C, N), np.float32)
    x[0, :20000] = 0.5  # loud
    x[0, 30000:] = 1e-4  # quiet (-80 dB)
    gate = ops.NoiseGate(threshold_db=-50.0, range_db=80.0,
                         attack_ms=0.5, release_ms=5.0)
    y = stream_through([gate.processor()], x, block)
    assert np.abs(y[0, 1000:19000]).max() == pytest.approx(0.5, abs=1e-3)
    assert np.abs(y[0, -4000:]).max() < 1e-7  # attenuated by 80 dB


def test_delay_set_feedback_live(rng):
    """Feedback enabled by mutation on a line long enough for it; raises on
    a short line (structural capability)."""
    import jax
    import jax.numpy as jnp
    from pipe_tpu import mutable
    from pipe_tpu.signal import Signal, SignalProperties

    d = ops.Delay(1024, feedback=0.0, wet=1.0, dry=1.0)
    comp = d.processor()(mutable.mutable(), 512, SignalProperties(44100.0, 1))
    step = jax.jit(comp.step)

    impulse = np.zeros((1, 512), np.float32)
    impulse[0, 0] = 1.0
    sig = Signal(jnp.asarray(impulse), jnp.asarray(512, jnp.int32))
    zero = Signal(jnp.zeros((1, 512), jnp.float32), jnp.asarray(512, jnp.int32))

    st, _ = step(comp.state, comp.params, sig)
    d._component.state = st
    d.set_feedback(0.5).apply()  # live enable — must NOT be a no-op
    st, y1 = step(st, comp.params, zero)   # echo at n=1024 -> block 2
    st, y2 = step(st, comp.params, zero)
    st, y3 = step(st, comp.params, zero)   # 2nd echo at n=2048 -> block 4
    st, y4 = step(st, comp.params, zero)
    assert float(np.asarray(y2.data)[0, 0]) == pytest.approx(1.0)
    assert float(np.asarray(y4.data)[0, 0]) == pytest.approx(0.5)

    short = ops.Delay(100, feedback=0.0)
    short.processor()(mutable.mutable(), 512, SignalProperties(44100.0, 1))
    with pytest.raises(ValueError, match="cannot do feedback"):
        short.set_feedback(0.3)


def test_fused_set_bank_after_fuse(rng):
    """optimize.fuse delegates Resampler.set_bank as well as FIR.set_taps."""
    from pipe_tpu.graph import Line as _Line
    import pipe_tpu.optimize

    fir = ops.FIR(ops.design_lowpass(63, 4000.0, 44100.0))
    rs = ops.Resampler(160, 147)
    line = _Line(source=None, sink=None,
                 processors=[fir.processor(), rs.processor()])
    fused_line = pipe_tpu.optimize.fuse(line)
    from tests.test_ops import stream_through

    x = rng.standard_normal((1, 147 * 10)).astype(np.float32)
    stream_through(fused_line.processors, x, 588)
    m1 = fir.set_taps(ops.design_lowpass(63, 1000.0, 44100.0))
    m2 = rs.set_bank(ops.resample.polyphase_design(160, 147, 32))
    assert m1 is not None and m2 is not None
