"""Streaming FIR filtering (benchmark config 3: 255-tap lowpass).

The reference leaves filter tails inside component closures (SURVEY.md §5
'long-context': no inter-buffer overlap mechanism exists). Here the tail is
explicit state — ``(C, T-1)`` trailing samples — which is exactly what makes
time-block sharding possible later: the tail is the halo that ``ppermute``
exchanges between neighboring block owners (``pipe_tpu.parallel.halo``).

The hot path lowers to ``lax.conv_general_dilated``, which XLA maps onto the
MXU. Dynamic ``frames`` (partial blocks) are handled by masking the invalid
region before the conv (causal FIR output ``y[i]`` only reads inputs
``<= i``, so valid outputs never see masked garbage) and advancing the tail
by a dynamic slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pipe_tpu.components import Processor
from pipe_tpu.signal import Signal


def fir_init_tail(channels: int, num_taps: int, dtype=jnp.float32):
    """Zero tail state ``(C, T-1)``."""
    return jnp.zeros((channels, max(num_taps - 1, 0)), dtype=dtype)


def _conv_valid(buf, taps_rev):
    """Depthwise valid 1D correlation.

    ``buf``: (C, L). ``taps_rev``: (T,) shared or (C, T) per-channel,
    already reversed so the correlation computes the causal convolution
    ``y[n] = sum_k h[k] x[n-k]``.
    """
    C = buf.shape[0]
    if taps_rev.ndim == 1:
        # shared filter: batch over channels
        lhs = buf[:, None, :]  # (C, 1, L)
        rhs = taps_rev[None, None, :]  # (1, 1, T)
        out = lax.conv_general_dilated(
            lhs,
            rhs,
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )
        return out[:, 0, :]  # (C, B)
    # per-channel filters: grouped conv
    lhs = buf[None, :, :]  # (1, C, L)
    rhs = taps_rev[:, None, :]  # (C, 1, T)
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        feature_group_count=C,
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out[0]  # (C, B)


def fir_block(tail, x, frames, taps):
    """One streaming FIR block.

    Args:
      tail: ``(C, T-1)`` carried history.
      x: ``(C, B)`` input block (only ``[:, :frames]`` valid).
      frames: traced int32 valid-frame count.
      taps: ``(T,)`` shared or ``(C, T)`` per-channel coefficients.

    Returns ``(new_tail, y)`` with ``y`` of shape ``(C, B)``; outputs beyond
    ``frames`` are garbage the caller must mask/ignore (same contract as the
    input).
    """
    C, B = x.shape
    T = taps.shape[-1]
    idx = jnp.arange(B, dtype=jnp.int32)[None, :]
    xm = jnp.where(idx < frames, x, 0.0)
    buf = jnp.concatenate([tail, xm], axis=1)  # (C, T-1+B)
    y = _conv_valid(buf, jnp.flip(taps, -1))
    # The stream's last T-1 valid samples start at offset `frames` into buf.
    new_tail = lax.dynamic_slice(buf, (0, frames), (C, T - 1))
    return new_tail, y


class FIR:
    """FIR processor factory. ``taps`` may be ``(T,)`` (shared across
    channels) or ``(C, T)`` (per-channel). Coefficients are a live parameter
    (tap shape must stay fixed across mutations)."""

    def __init__(self, taps):
        self._init_taps = jnp.asarray(taps, jnp.float32)
        if self._init_taps.ndim not in (1, 2):
            raise ValueError("taps must be (T,) or (C, T)")
        self._component = None
        self.context = None

    def processor(self):
        def alloc(mctx, block_size, props):
            taps = self._init_taps
            if taps.ndim == 2 and taps.shape[0] != props.channels:
                raise ValueError(
                    f"per-channel taps for {taps.shape[0]} channels, "
                    f"line has {props.channels}"
                )
            self.context = mctx
            T = taps.shape[-1]

            def step(state, params, sig: Signal):
                new_tail, y = fir_block(
                    state["tail"], sig.data, sig.frames, params["taps"]
                )
                return {"tail": new_tail}, sig.with_data(y)

            self._component = Processor(
                output=props,
                step=step,
                state={"tail": fir_init_tail(props.channels, T)},
                params={"taps": taps},
            )
            return self._component

        return alloc

    def set_taps(self, taps):
        t = jnp.asarray(taps, jnp.float32)

        def fn():
            self._component.set_param("taps", t)

        return self.context.mutate(fn)


def design_lowpass(num_taps: int, cutoff: float, sample_rate: float) -> np.ndarray:
    """Windowed-sinc (Hamming) lowpass design, float64 on the host.

    Filter *design* happens host-side in float64 (it's control-plane, not
    hot-path); only the application runs on TPU in f32.
    """
    if num_taps < 1:
        raise ValueError("num_taps must be >= 1")
    fc = cutoff / sample_rate
    n = np.arange(num_taps, dtype=np.float64) - (num_taps - 1) / 2.0
    h = 2.0 * fc * np.sinc(2.0 * fc * n)
    h *= np.hamming(num_taps)
    h /= np.sum(h)
    return h
