"""Fused FIR -> polyphase-resample stage (graph-level operator fusion).

A FIR filter followed by an L/M polyphase resampler is mathematically one
polyphase bank: with ``h`` the FIR taps and ``hp[p]`` the resampler's
phase-``p`` subfilter, the combined bank is the per-phase convolution

    hc[p] = conv(hp[p], h)            (K_c = K + T - 1 taps per phase)

because resampling commutes the input-rate FIR into the upsampled-rate
prototype: ``H(z^L) * Hrs(z)`` decomposes phase-wise to exactly this.
Validated to 2.2e-15 max error against the sequential float64 oracle
(docs/PERF_NOTES.md).

Fusing removes one HBM round trip of the intermediate signal (~8% on the
flagship chain) and collapses two graph stages into one; padded-MXU FLOPs
are nearly unchanged because the supercycle matmul's 147->256 / 160->256
padding already covers the wider bank (PERF_NOTES: taps up to the padding
boundary are free).

The combination happens INSIDE jit from the traced tap vector and bank, so
``set_taps`` / ``set_bank`` mutations remain retrace-free, preserving the
framework's mutation-without-recompile guarantee (SURVEY.md §2 C2/C3
mapping).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from pipe_tpu.components import Processor
from pipe_tpu.signal import Signal, SignalProperties
from pipe_tpu.ops.resample import _reduce_ratio, polyphase_design

from pipe_tpu import config


def combine_bank(taps, hp):
    """Combined polyphase bank ``hc[p] = conv(hp[p], taps)``.

    Args:
      taps: ``(T,)`` traced FIR taps (shared across channels).
      hp: ``(L, K)`` traced polyphase bank.

    Returns ``(L, K + T - 1)``. Pure traced ops — safe to call inside jit
    with live (mutated) values.
    """
    T = taps.shape[-1]
    out = lax.conv_general_dilated(
        hp[:, None, :],
        jnp.flip(taps)[None, None, :],
        window_strides=(1,),
        padding=((T - 1, T - 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )
    return out[:, 0, :]  # (L, K + T - 1)


class FIRResampler:
    """Fused FIR + L/M resampler processor.

    Drop-in for ``Processors(FIR(taps).processor(), Resampler(up, down)
    .processor())`` with identical output (to f32 rounding) and one fewer
    stage. Both the FIR taps and the resampler bank stay live parameters.
    """

    def __init__(self, taps, up: int, down: int, taps_per_phase: int = 32):
        self._taps = jnp.asarray(taps, jnp.float32)
        if self._taps.ndim != 1:
            raise ValueError("FIRResampler uses shared (T,) taps")
        if up <= 0 or down <= 0:
            raise ValueError("up/down must be positive")
        self.up, self.down = _reduce_ratio(up, down)
        self.taps_per_phase = taps_per_phase
        self._hp = jnp.asarray(
            polyphase_design(self.up, self.down, taps_per_phase), jnp.float32
        )
        self._component = None
        self.context = None

    def processor(self):
        from pipe_tpu.ops.resample import Resampler

        L, M = self.up, self.down
        T = self._taps.shape[0]
        Kc = self.taps_per_phase + T - 1

        def alloc(mctx, block_size, props: SignalProperties):
            self.context = mctx
            C = props.channels
            # reuse the Resampler's streaming step machinery with the
            # combined bank; the bank is rebuilt inside jit each block from
            # the live taps/hp params (cheap: (L, K) x (T,) conv)
            inner = Resampler.__new__(Resampler)
            inner.up, inner.down = L, M
            inner.taps_per_phase = Kc
            inner._hp = combine_bank(self._taps, self._hp)
            inner._component = None
            inner.context = None
            inner_alloc = inner.processor()
            comp = inner_alloc(mctx, block_size, props)

            # swap the step to recombine from live taps each block
            base_step = comp.step

            def step(state, params, sig: Signal):
                hc = combine_bank(params["taps"], params["hp_base"])
                return base_step(state, {"hp": hc}, sig)

            self._component = Processor(
                output=comp.output,
                step=step,
                state=comp.state,
                params={"taps": self._taps, "hp_base": self._hp},
                start=comp.start,
                flush=comp.flush,
            )
            return self._component

        return alloc

    def set_taps(self, taps):
        """Mutate the FIR taps (same length); retrace-free."""
        t = jnp.asarray(taps, jnp.float32)

        def fn():
            self._component.set_param("taps", t)

        return self.context.mutate(fn)

    def set_bank(self, hp):
        """Mutate the resampler prototype bank (same shape); retrace-free."""
        b = jnp.asarray(hp, jnp.float32)

        def fn():
            self._component.set_param("hp_base", b)

        return self.context.mutate(fn)


def fused_apply(hist, x, taps, hp, up: int, down: int):
    """Functional fused full-block path for chunk runners: ``hist`` is
    ``(C, K+T-2)`` input history; returns ``(C, B*up//down)``."""
    from pipe_tpu.ops.resample import resample_apply

    hc = combine_bank(taps, hp)
    return resample_apply(hist, x, hc, up, down)
