"""Spectral (STFT/OLA) golden tests.

Perfect reconstruction, block-size invariance, partial-block handling, and
the spectral gate vs a float64 numpy oracle — the SNR-bound discipline of
``tests/test_ops.py`` applied to the frequency-domain engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pipe_tpu import ops
from pipe_tpu.ops.spectral import (
    SpectralGain,
    SpectralGate,
    design_stft_window,
    spectral_block,
    spectral_init_state,
)
from pipe_tpu.signal import snr_db
from tests.test_ops import stream_through, SNR_TARGET


def stream_blocks(x, window_size, hop, transform, block):
    """Drive spectral_block directly over full blocks; return (C, N)."""
    wa, ws = design_stft_window(window_size, hop)
    wa, ws = jnp.asarray(wa), jnp.asarray(ws)
    C, N = x.shape
    state = spectral_init_state(C, window_size, hop)
    outs = []
    for i in range(0, N, block):
        blk = x[:, i : i + block]
        frames = blk.shape[1]
        if frames < block:
            blk = np.pad(blk, ((0, 0), (0, block - frames)))
        state, (y, out_frames) = spectral_block(
            state,
            jnp.asarray(blk),
            jnp.int32(frames),
            transform,
            wa,
            ws,
            hop,
        )
        outs.append(np.asarray(y)[:, : int(out_frames)])
    return np.concatenate(outs, axis=1)


def oracle_stft_identity(x, window_size, hop):
    """Float64 weighted-OLA reconstruction oracle (identity transform)."""
    wa, ws = design_stft_window(window_size, hop)
    wa, ws = wa.astype(np.float64), ws.astype(np.float64)
    C, N = x.shape
    L = window_size - hop
    ext = np.concatenate([np.zeros((C, L)), x], axis=1)
    y = np.zeros((C, N + window_size))
    for s in range(0, N, hop):
        win = ext[:, s : s + window_size]
        if win.shape[1] < window_size:
            break
        spec = np.fft.rfft(win * wa, axis=-1)
        y[:, s : s + window_size] += np.fft.irfft(spec, n=window_size) * ws
    return y[:, :N]


def test_window_design_exact_cola():
    for W, H in [(512, 128), (256, 64), (256, 128), (64, 16), (128, 128)]:
        wa, ws = design_stft_window(W, H)
        prod = (wa.astype(np.float64) * ws.astype(np.float64)).reshape(W // H, H)
        np.testing.assert_allclose(prod.sum(axis=0), 1.0, atol=1e-12)


def test_window_design_validates():
    with pytest.raises(ValueError):
        design_stft_window(512, 100)  # not a divisor
    with pytest.raises(ValueError):
        design_stft_window(0, 1)


def test_perfect_reconstruction(rng):
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    W, H = 512, 128
    y = stream_blocks(x, W, H, lambda re, im: (re, im), block=512)
    L = W - H
    # output is the input delayed by W-H; compare the steady region
    assert snr_db(x[:, : 4096 - L].astype(np.float64), y[:, L:]) > 110


def test_matches_float64_oracle(rng):
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    W, H = 256, 64
    y = stream_blocks(x, W, H, lambda re, im: (re, im), block=256)
    ref = oracle_stft_identity(x.astype(np.float64), W, H)
    # same coordinates (both start from zero history); skip the trailing edge
    assert snr_db(ref[:, : 2048 - W], y[:, : 2048 - W]) > SNR_TARGET


def test_block_size_invariance(rng):
    x = rng.standard_normal((2, 3072)).astype(np.float32)
    W, H = 256, 64
    y1 = stream_blocks(x, W, H, lambda re, im: (re, im), block=256)
    y2 = stream_blocks(x, W, H, lambda re, im: (re, im), block=1024)
    np.testing.assert_allclose(y1, y2, atol=1e-5)


def test_partial_block_hop_aligned(rng):
    """A mid-stream partial block (frames % hop == 0) is exact: deferred
    windows re-run once their samples arrive."""
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    W, H = 256, 64
    full = stream_blocks(x, W, H, lambda re, im: (re, im), block=512)

    wa, ws = design_stft_window(W, H)
    wa, ws = jnp.asarray(wa), jnp.asarray(ws)
    state = spectral_init_state(2, W, H)
    outs = []
    # feed 512-sample blocks but with the second block only 256 valid
    feed = [(512, 512), (512, 256), (512, 512), (512, 512), (512, 256)]
    pos = 0
    for block, frames in feed:
        blk = np.zeros((2, block), np.float32)
        blk[:, :frames] = x[:, pos : pos + frames]
        state, (y, out_frames) = spectral_block(
            state, jnp.asarray(blk), jnp.int32(frames),
            lambda re, im: (re, im), wa, ws, H,
        )
        outs.append(np.asarray(y)[:, : int(out_frames)])
        pos += frames
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, full[:, :pos], atol=1e-5)


def test_spectral_gain_processor(rng):
    """SpectralGain in a real line: unity gains reconstruct (delayed)."""
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    sg = SpectralGain(window_size=512, hop=128)
    y = stream_through([sg.processor()], x, block=512)
    L = sg.latency
    assert y.shape == (2, 4096)
    assert snr_db(x[:, : 4096 - L].astype(np.float64), y[:, L:]) > 110


def test_spectral_gain_shapes_spectrum(rng):
    """Zeroing high bins acts as a (time-varying-capable) lowpass."""
    sr = 8000.0
    n = 8192
    t = np.arange(n) / sr
    lo = np.sin(2 * np.pi * 200.0 * t)
    hi = np.sin(2 * np.pi * 3000.0 * t)
    x = (lo + hi).astype(np.float32)[None, :]
    W, H = 512, 128
    gains = np.ones(W // 2 + 1, np.float32)
    cut_bin = int(1000.0 / sr * W)
    gains[cut_bin:] = 0.0
    sg = SpectralGain(W, H, gains)
    y = stream_through([sg.processor()], x, block=512, sr=sr)
    L = sg.latency
    steady = y[0, L + W : n - W]
    ref = lo[W : n - W - L]
    # the 3 kHz tone is gone, the 200 Hz tone survives
    err = steady - ref
    assert np.sqrt(np.mean(err**2)) < 0.02
    assert np.sqrt(np.mean(steady**2)) > 0.5


def test_spectral_gain_validates():
    with pytest.raises(ValueError):
        SpectralGain(512, 128, gains=np.ones(5, np.float32))
    sg = SpectralGain(512, 128, gains=np.ones((3, 257), np.float32))
    x = np.zeros((2, 512), np.float32)
    import pipe_tpu

    with pytest.raises(pipe_tpu.AllocationError):
        stream_through([sg.processor()], x, block=512)


def test_spectral_gate_vs_oracle(rng):
    """Gate output matches a float64 numpy re-implementation >= 100 dB."""
    sr = 8000.0
    n = 4096
    t = np.arange(n) / sr
    tone = np.sin(2 * np.pi * 500.0 * t)
    noise = 0.01 * rng.standard_normal(n)
    x = (tone + noise).astype(np.float32)[None, :]
    W, H = 256, 64
    thr, red_db, knee = 0.5, -60.0, 6.0

    def gate(re, im):
        mag = jnp.sqrt(re * re + im * im) + 1e-30
        over_db = 20.0 * jnp.log10(mag / thr)
        frac = jnp.clip(over_db / knee + 0.5, 0.0, 1.0)
        floor = 10.0 ** (red_db / 20.0)
        g = floor + (1.0 - floor) * frac
        return re * g, im * g

    y = stream_blocks(x, W, H, gate, block=512)

    # float64 oracle of the same algorithm
    wa, ws = design_stft_window(W, H)
    wa64, ws64 = wa.astype(np.float64), ws.astype(np.float64)
    L = W - H
    ext = np.concatenate([np.zeros((1, L)), x.astype(np.float64)], axis=1)
    ref = np.zeros((1, n + W))
    for s in range(0, n, H):
        win = ext[:, s : s + W]
        if win.shape[1] < W:
            break
        spec = np.fft.rfft(win * wa64, axis=-1)
        mag = np.abs(spec) + 1e-30
        over_db = 20.0 * np.log10(mag / thr)
        frac = np.clip(over_db / knee + 0.5, 0.0, 1.0)
        floor = 10.0 ** (red_db / 20.0)
        spec *= floor + (1.0 - floor) * frac
        ref[:, s : s + W] += np.fft.irfft(spec, n=W) * ws64
    ref = ref[:, :n]
    assert snr_db(ref[:, L : n - W], y[:, L : n - W]) > SNR_TARGET


def test_spectral_gate_denoises(rng):
    """The gate actually removes broadband noise under a tone."""
    sr = 8000.0
    n = 8192
    t = np.arange(n) / sr
    tone = np.sin(2 * np.pi * 500.0 * t)
    noise = 0.003 * rng.standard_normal(n)
    x = (tone + noise).astype(np.float32)[None, :]
    W, H = 512, 128
    gate = SpectralGate(W, H, threshold=1.0, reduction_db=-80.0)
    y = stream_through([gate.processor()], x, block=512, sr=sr)
    L = gate.latency
    steady = y[0, L + W : n - W]
    ref_tone = tone[W : n - W - L]
    resid = steady - ref_tone
    noise_in = np.sqrt(np.mean(noise**2))
    resid_rms = np.sqrt(np.mean(resid**2))
    # residual (noise suriving the gate + tone distortion) well under input noise
    assert resid_rms < 0.5 * noise_in


def test_spectral_gate_live_mutation(rng):
    """Threshold/reduction are live params (mutation between run calls)."""
    x = rng.standard_normal((1, 1024)).astype(np.float32)
    gate = SpectralGate(256, 64, threshold=1e-6, reduction_db=-80.0)
    y_open = stream_through([gate.processor()], x, block=256)
    # tiny threshold: everything passes -> reconstruction
    L = gate.latency
    assert snr_db(x[:, : 1024 - L].astype(np.float64), y_open[:, L:]) > 60

    gate2 = SpectralGate(256, 64, threshold=1e9, reduction_db=-80.0)
    y_shut = stream_through([gate2.processor()], x, block=256)
    # huge threshold: fully attenuated
    assert np.sqrt(np.mean(y_shut[:, L:] ** 2)) < 1e-3 * np.sqrt(np.mean(x**2))


def test_any_block_size_streaming(rng):
    """r4: a block size that is NOT a hop multiple streams exactly — the
    hop grid anchors to the stream, short-of-a-hop samples ride the
    residue carry, and output emits in whole hops (catching up across
    blocks). Identical to the hop-aligned run except emission timing."""
    x = rng.standard_normal((2, 9000)).astype(np.float32)
    W, H = 256, 64
    aligned = stream_blocks(x, W, H, lambda re, im: (re, im), block=512)
    for block in (100, 300, 509):
        got = stream_blocks(x, W, H, lambda re, im: (re, im), block=block)
        n = min(got.shape[1], aligned.shape[1])
        np.testing.assert_allclose(
            got[:, :n], aligned[:, :n], atol=1e-5,
            err_msg=f"block={block}",
        )


def test_any_partial_frames_midstream(rng):
    """Mid-stream partial blocks with frame counts NOT hop-aligned
    (previously only hop-multiples were exact)."""
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    W, H = 256, 64
    full = stream_blocks(x, W, H, lambda re, im: (re, im), block=512)

    wa, ws = design_stft_window(W, H)
    wa, ws = jnp.asarray(wa), jnp.asarray(ws)
    state = spectral_init_state(2, W, H)
    outs = []
    feed = [(512, 512), (512, 301), (512, 512), (512, 77), (512, 512),
            (512, 512), (512, 450)]
    pos = 0
    for block, frames in feed:
        blk = np.zeros((2, block), np.float32)
        blk[:, :frames] = x[:, pos : pos + frames]
        state, (y, out_frames) = spectral_block(
            state, jnp.asarray(blk), jnp.int32(frames),
            lambda re, im: (re, im), wa, ws, H,
        )
        outs.append(np.asarray(y)[:, : int(out_frames)])
        pos += frames
    got = np.concatenate(outs, axis=1)
    n = got.shape[1]  # emitted whole hops <= pos
    assert pos - n < H
    np.testing.assert_allclose(got, full[:, :n], atol=1e-5)


def test_spectral_gain_processor_odd_block(rng):
    """SpectralGain through the streaming runtime at block 500 (not a
    hop-256 multiple): reconstructs the delayed input like the aligned
    engine."""
    x = rng.standard_normal((2, 20000)).astype(np.float32)
    W, H = 1024, 256
    sg = ops.SpectralGain(W, H)
    y = stream_through([sg.processor()], x, 500)
    ref = ops.SpectralGain(W, H)
    y2 = stream_through([ref.processor()], x, 1024)
    n = min(y.shape[1], y2.shape[1])
    assert snr_db(y2[:, :n].astype(np.float64), y[:, :n]) > 130
    # and against the float64 oracle (delayed identity)
    L = W - H
    oracle = np.concatenate(
        [np.zeros((2, L)), x.astype(np.float64)], axis=1
    )[:, :n]
    assert snr_db(oracle, y[:, :n]) >= SNR_TARGET


def test_width_changing_chain_composition(rng):
    """r4 review: width-changing ops thread their out_capacity to
    downstream allocators, so mixed chains compose at ANY block size —
    [SpectralGain -> Delay] at an odd block and [Resampler -> Delay]
    (the latter was broken for width-sensitive downstream ops even
    before the spectral generalization)."""
    x = rng.standard_normal((2, 20000)).astype(np.float32)
    W, H, D = 1024, 256, 500

    y = stream_through(
        [ops.SpectralGain(W, H).processor(), ops.Delay(D).processor()],
        x, 500,
    )
    L = W - H
    oracle = np.zeros((2, y.shape[1]))
    src = np.concatenate([np.zeros((2, L + D)), x.astype(np.float64)], axis=1)
    oracle = src[:, : y.shape[1]]
    assert snr_db(oracle, y) >= SNR_TARGET

    # resampler -> delay: downstream sized to the resampler's B_out
    y2 = stream_through(
        [ops.Resampler(160, 147).processor(), ops.Delay(700).processor()],
        x[:, : 147 * 100], 588,
    )
    from tests.test_ops import _resample_oracle
    from pipe_tpu.ops.resample import polyphase_design

    rx = _resample_oracle(
        x[:, : 147 * 100].astype(np.float64),
        polyphase_design(160, 147, 32), 160, 147,
    )
    d = np.concatenate([np.zeros((2, 700)), rx], axis=1)[:, : y2.shape[1]]
    assert snr_db(d, y2) >= SNR_TARGET


def test_insert_width_changing_processor_live(rng):
    """Live-inserting a width-changing processor (resampler/STFT) into a
    STREAMING line now succeeds (r5, VERDICT r4 item 5): the downstream
    allocators re-run at the new width at the adoption boundary. The
    stream keeps flowing afterwards; exact-landing parity is pinned in
    test_block_mutations.py. (Mesh lines accept fitting widths too and
    refuse only on a downstream shape-rule break — test_mesh_pipe.py.)"""
    import time as _time

    import pipe_tpu
    from pipe_tpu import mock

    src = mock.Source(channels=1, value=1.0, interval=0.002)
    sink = mock.Sink(discard=True)
    p = pipe_tpu.Pipe(
        512,
        pipe_tpu.Line(source=src.source(), sink=sink.sink()),
    )
    p.start()
    # hop 48 does not divide block 512 -> out capacity 528 != 512: the
    # sink is re-allocated for 528-frame blocks at adoption
    h = p.insert_processor(0, 0, ops.SpectralGain(240, 48).processor())
    assert h.wait(30) and h.error is None, h.error
    before = sink.samples
    deadline = _time.time() + 30
    while sink.samples < before + 4 * 528:
        assert _time.time() < deadline, "stream stalled after insert"
        _time.sleep(0.005)
    # a width-preserving hop (64 | 512) still inserts with no rebuild
    h2 = p.insert_processor(0, 0, ops.SpectralGain(256, 64).processor())
    assert h2.wait(30) and h2.error is None
    p.stop(30)
