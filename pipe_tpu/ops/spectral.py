"""Streaming STFT processing — windowed overlap-add spectral ops.

The reference ships no spectral machinery (it ships no DSP at all —
components live out-of-tree, reference ``doc.go:30-33``); this module adds
the frequency-domain half of a complete DSP kit: a streaming STFT ->
per-bin transform -> weighted-OLA resynthesis engine with *exact* COLA
normalization, plus two processors built on it (a per-bin gain curve and a
spectral noise gate).

TPU mapping. All ``B/hop`` analysis windows of a block are framed with one
gather into a ``(C, F, W)`` tensor, transformed by ONE batched ``rfft``
(XLA lowers FFTs natively on TPU), per-bin math runs as planar f32 re/im
arithmetic (complex arithmetic is second-class on some TPU runtimes — same
policy as ``pipe_tpu/ops/ols.py``), and the overlap-add fold is a static
``W/hop``-step shift-and-add over hop-sized panes. No per-window host loop,
no dynamic shapes.

Streaming contract. The engine has the inherent real-time STFT latency of
``W - hop`` samples: output sample ``n`` reconstructs input sample
``n - (W - hop)``. Mid-stream partial blocks are exact when ``frames`` is a
multiple of ``hop`` (incomplete windows are deferred: their samples stay in
the carried history and are re-framed when the rest arrives); the final
(EOF) partial block has the usual real-time STFT trailing edge. Per-window
transforms must be memoryless across windows (deferred windows are
re-processed when completed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pipe_tpu.components import Processor
from pipe_tpu.signal import Signal


def design_stft_window(window_size: int, hop: int):
    """Periodic-Hann analysis/synthesis window pair with exact weighted-OLA
    normalization.

    Returns float32 ``(w_analysis, w_synthesis)`` of shape ``(W,)`` such
    that for any per-bin gain of 1 the resynthesis is exact:
    ``sum_j w_a[t - j*hop] * w_s[t - j*hop] == 1`` for every steady-state
    ``t``. Designed host-side in float64 (control-plane, same policy as
    ``design_lowpass``).
    """
    W, H = int(window_size), int(hop)
    if W <= 0 or H <= 0 or W % H != 0:
        raise ValueError("window_size must be a positive multiple of hop")
    n = np.arange(W, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / W)  # periodic Hann
    if W == H:  # rectangular degenerate case: no overlap
        w = np.ones(W, np.float64)
    # norm[r] = sum_j w[r + j*H]^2 — constant per residue class mod H.
    norm = w.reshape(W // H, H) ** 2
    den = norm.sum(axis=0)
    if np.any(den <= 0):
        raise ValueError("window/hop pair is not invertible (zero overlap sum)")
    w_s = w / np.tile(den, W // H)
    return w.astype(np.float32), w_s.astype(np.float32)


def frame_hops(ext, window_size: int, hop: int, n_frames: int):
    """Frame ``ext`` (C, W-H + F*H) into (C, F, W) hop-aligned windows.

    ``W % hop == 0``, so window f = ext[:, f*H : f*H + W] decomposes into
    ``K = W/H`` hop-sized panes — built as K shifted reshapes concatenated
    on the last axis (pure slice+reshape dataflow; a general gather with a
    (F, W) index array lowers poorly on TPU).
    """
    C = ext.shape[0]
    W, H, F = window_size, hop, n_frames
    K = W // H
    panes = [
        ext[:, k * H : k * H + F * H].reshape(C, F, H) for k in range(K)
    ]
    return jnp.concatenate(panes, axis=-1)


def stft_frames(hist, x, window, hop: int):
    """Frame ``concat([hist, x])`` into hop-aligned windows and analyze.

    ``hist``: (C, W-H) carried samples; ``x``: (C, B) with ``B % hop == 0``.
    Returns ``(re, im)`` planes of shape (C, F, bins), F = B // hop.
    """
    C, B = x.shape
    W = window.shape[0]
    F = B // hop
    ext = jnp.concatenate([hist, x], axis=1)  # (C, W-H+B)
    wins = frame_hops(ext, W, hop, F) * window  # (C, F, W)
    spec = jnp.fft.rfft(wins, axis=-1)
    return jnp.real(spec).astype(jnp.float32), jnp.imag(spec).astype(jnp.float32)


def _ola_fold(out, hop: int):
    """Overlap-add windows back to samples.

    ``out``: (C, F, W) synthesis-windowed frames, frame f at offset f*hop.
    Returns (C, F*hop + W - hop) accumulated samples. Static ``W/hop``-step
    shift-and-add — each step is one full-block vector add, no scatter.
    """
    C, F, W = out.shape
    K = W // hop
    panes = out.reshape(C, F, K, hop)
    acc = jnp.zeros((C, F + K - 1, hop), out.dtype)
    for k in range(K):  # K is small and static (e.g. 4 for 75% overlap)
        acc = acc.at[:, k : k + F].add(panes[:, :, k])
    return acc.reshape(C, (F + K - 1) * hop)


def spectral_block(state, x, frames, transform, window_a, window_s, hop: int):
    """One streaming spectral block: STFT -> ``transform`` -> weighted OLA.

    Args:
      state: dict with ``hist`` (C, W-H) input history and ``tail``
        (C, W-H) pending overlap-add output.
      x: (C, B) input block, valid up to ``frames`` (traced int32).
      transform: ``(re, im) -> (re, im)`` over (C, F, bins) planes;
        must be memoryless across windows.
      window_a / window_s: (W,) analysis / synthesis windows
        (see :func:`design_stft_window`).
      hop: hop size; requires ``B % hop == 0``.

    Returns ``(new_state, y)`` with y (C, B), latency ``W - hop`` samples.
    """
    C, B = x.shape
    W = window_a.shape[0]
    H = hop
    L = W - H
    if B % H != 0:
        raise ValueError(f"block size {B} must be a multiple of hop {H}")
    F = B // H
    idx = jnp.arange(B, dtype=jnp.int32)[None, :]
    xm = jnp.where(idx < frames, x, 0.0)

    re, im = stft_frames(state["hist"], xm, window_a, H)
    re, im = transform(re, im)
    spec = lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
    out = jnp.fft.irfft(spec, n=W, axis=-1).astype(jnp.float32) * window_s

    # Defer windows whose newest sample is past the valid region: their
    # inputs are still masked zeros; they re-run next block once complete
    # (hist advances by `frames`, keeping hop alignment when
    # frames % hop == 0).
    win_ok = (jnp.arange(F, dtype=jnp.int32) + 1) * H <= frames
    out = jnp.where(win_ok[None, :, None], out, 0.0)

    acc = _ola_fold(out, H)  # (C, B + L)
    if L > 0:
        acc = acc.at[:, :L].add(state["tail"])
        ext = jnp.concatenate([state["hist"], xm], axis=1)
        new_hist = lax.dynamic_slice(ext, (0, frames), (C, L))
        new_tail = lax.dynamic_slice(acc, (0, frames), (C, L))
    else:
        new_hist = state["hist"]
        new_tail = state["tail"]
    return {"hist": new_hist, "tail": new_tail}, acc[:, :B]


def spectral_init_state(channels: int, window_size: int, hop: int):
    """Zero state: input history + pending OLA tail, each (C, W-H)."""
    L = window_size - hop
    return {
        "hist": jnp.zeros((channels, L), jnp.float32),
        "tail": jnp.zeros((channels, L), jnp.float32),
    }


class _SpectralBase:
    """Shared allocator plumbing for STFT processors."""

    def __init__(self, window_size: int, hop: int):
        self.window_size = int(window_size)
        self.hop = int(hop)
        self._wa, self._ws = design_stft_window(self.window_size, self.hop)
        self._component = None
        self.context = None

    @property
    def bins(self) -> int:
        return self.window_size // 2 + 1

    @property
    def latency(self) -> int:
        """Group delay in samples (W - hop)."""
        return self.window_size - self.hop

    def _make_processor(self, props, block_size, params, transform):
        if block_size % self.hop != 0:
            raise ValueError(
                f"block size {block_size} must be a multiple of hop {self.hop}"
            )
        wa, ws = jnp.asarray(self._wa), jnp.asarray(self._ws)
        hop = self.hop

        def step(state, p, sig: Signal):
            new_state, y = spectral_block(
                state,
                sig.data,
                sig.frames,
                lambda re, im: transform(re, im, p),
                wa,
                ws,
                hop,
            )
            return new_state, sig.with_data(y)

        self._component = Processor(
            output=props,
            step=step,
            state=spectral_init_state(props.channels, self.window_size, hop),
            params=params,
        )
        return self._component


class SpectralGain(_SpectralBase):
    """Per-bin gain curve applied in the STFT domain.

    ``gains`` is ``(bins,)`` shared or ``(C, bins)`` per-channel, a live
    parameter (mutations never recompile). With ``gains == 1`` the engine
    reconstructs the input exactly (up to f32/FFT rounding) delayed by
    ``window_size - hop`` samples — the perfect-reconstruction invariant the
    golden tests pin.
    """

    def __init__(self, window_size: int, hop: int, gains=None):
        super().__init__(window_size, hop)
        if gains is None:
            gains = np.ones(self.bins, np.float32)
        g = jnp.asarray(gains, jnp.float32)
        if g.ndim not in (1, 2) or g.shape[-1] != self.bins:
            raise ValueError(f"gains must be (bins,) or (C, bins) with bins={self.bins}")
        self._init_gains = g

    def processor(self):
        def alloc(mctx, block_size, props):
            g = self._init_gains
            if g.ndim == 2 and g.shape[0] != props.channels:
                raise ValueError(
                    f"per-channel gains for {g.shape[0]} channels, "
                    f"line has {props.channels}"
                )
            self.context = mctx

            def transform(re, im, p):
                gg = p["gains"]
                gg = gg[None, None, :] if gg.ndim == 1 else gg[:, None, :]
                return re * gg, im * gg

            return self._make_processor(
                props, block_size, {"gains": g}, transform
            )

        return alloc

    def set_gains(self, gains):
        """Swap the bin-gain curve mid-stream (shape-compatible)."""
        g = jnp.asarray(gains, jnp.float32)

        def fn():
            self._component.set_param("gains", g)

        return self.context.mutate(fn)


class SpectralGate(_SpectralBase):
    """Per-bin noise gate (downward spectral expander).

    Bins whose magnitude falls below ``threshold`` (linear amplitude) are
    attenuated by ``reduction_db``, with a smooth knee of ``knee_db`` around
    the threshold to avoid hard-switching artifacts. Both threshold and
    reduction are live parameters. Per-window gains are memoryless (the
    deferred-window re-processing rule), so gating is deterministic in the
    stream, independent of block size.
    """

    def __init__(
        self,
        window_size: int,
        hop: int,
        threshold: float,
        reduction_db: float = -80.0,
        knee_db: float = 6.0,
    ):
        super().__init__(window_size, hop)
        self._init_params = {
            "threshold": jnp.float32(threshold),
            "reduction_db": jnp.float32(reduction_db),
        }
        self.knee_db = float(knee_db)

    def processor(self):
        def alloc(mctx, block_size, props):
            self.context = mctx
            knee = max(self.knee_db, 1e-3)

            def transform(re, im, p):
                mag = jnp.sqrt(re * re + im * im) + 1e-30
                over_db = 20.0 * jnp.log10(mag / p["threshold"])
                # 0 -> reduction, 1 -> unity across the knee
                frac = jnp.clip(over_db / knee + 0.5, 0.0, 1.0)
                floor = 10.0 ** (p["reduction_db"] / 20.0)
                gain = floor + (1.0 - floor) * frac
                return re * gain, im * gain

            return self._make_processor(
                props, block_size, dict(self._init_params), transform
            )

        return alloc

    def set_threshold(self, threshold: float):
        def fn():
            self._component.set_param("threshold", jnp.float32(threshold))

        return self.context.mutate(fn)

    def set_reduction(self, reduction_db: float):
        def fn():
            self._component.set_param("reduction_db", jnp.float32(reduction_db))

        return self.context.mutate(fn)
