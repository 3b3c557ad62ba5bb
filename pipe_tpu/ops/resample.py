"""Streaming polyphase resampler (benchmark config 3: 44.1k -> 48k).

Rate change L/M with a polyphase FIR bank. For output index ``j`` at
upsampled position ``u = j*M``: phase ``p = u % L`` selects the subfilter
and ``n0 = u // L`` the newest input sample:

    y[j] = sum_i hp[p, i] * x[n0 - i]        (hp: (L, K) polyphase bank)

Because L/M is rational and blocks are fixed-size, the number of outputs per
input block varies by +-1; the output :class:`~pipe_tpu.signal.Signal` has a
static capacity of ``ceil(B*L/M)`` frames with a dynamic ``frames`` count —
the framework's partial-block protocol mid-stream. Downstream stateful ops
(FIR, OLS) advance their tails by the dynamic frame count, so chains like
FIR -> resample -> FIR are sample-exact.

The inner gather+einsum is TPU-friendly (one gather of (C, Bout, K) then a
contraction); a Pallas scalar-prefetch kernel is the next optimization rung.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax import lax

from pipe_tpu.components import Processor
from pipe_tpu.signal import Signal, SignalProperties
from pipe_tpu.ops.fir import design_lowpass


def polyphase_design(
    up: int, down: int, taps_per_phase: int = 32, beta: float = 12.0
) -> np.ndarray:
    """Design the polyphase bank ``(L, K)`` for an L/M rate change,
    float64 host-side.

    The prototype is a Kaiser-windowed sinc lowpass at the upsampled rate.
    ``beta = 12`` gives ~-120 dB stopband; the cutoff sits at 94% of the
    smaller Nyquist so the transition band stays inside the guard region
    rather than folding aliases onto the passband edge.
    """
    import scipy.signal

    L, M = up, down
    K = taps_per_phase
    # Units where the input rate is 1: the upsampled rate is L and the
    # cutoff is just below the smaller of the input/output Nyquists.
    cutoff = 0.94 * min(0.5, L / (2.0 * M))
    h = scipy.signal.firwin(K * L, cutoff, window=("kaiser", beta), fs=float(L))
    h = np.asarray(h, np.float64) * L
    return h.reshape(K, L).T.copy()  # hp[p, i] = h[i*L + p]


def _reduce_ratio(up: int, down: int):
    g = math.gcd(up, down)
    return up // g, down // g


class Resampler:
    """Polyphase resampling processor: input rate * up/down."""

    def __init__(self, up: int, down: int, taps_per_phase: int = 32):
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
        L, M = self.up, self.down
        K = self.taps_per_phase
        hp_init = self._hp

        def alloc(mctx, block_size, props: SignalProperties):
            self.context = mctx
            C = props.channels
            B = block_size
            B_out = -(-B * L // M)  # ceil: max outputs per full input block

            def step(state, params, sig: Signal):
                hist, off = state["hist"], state["off"]
                f = sig.frames
                idx = jnp.arange(B, dtype=jnp.int32)[None, :]
                xm = jnp.where(idx < f, sig.data, 0.0)
                ctx = jnp.concatenate([hist, xm], axis=1)  # (C, K-1+B)

                # outputs with upsampled position u = off + t*M < f*L
                t = jnp.arange(B_out, dtype=jnp.int32)
                u = off + t * M
                n_out = jnp.maximum(
                    0, (f * L - off + (M - 1)) // M
                )  # ceil((f*L - off)/M), 0 if off >= f*L
                p = u % L
                n0 = u // L
                ii = jnp.arange(K, dtype=jnp.int32)
                gidx = (K - 1 + n0)[:, None] - ii[None, :]  # (B_out, K)
                gidx = jnp.clip(gidx, 0, ctx.shape[1] - 1)
                windows = ctx[:, gidx]  # (C, B_out, K) gather
                coefs = params["hp"][p]  # (B_out, K)
                y = jnp.einsum(
                    "cbk,bk->cb", windows, coefs, preferred_element_type=jnp.float32
                )
                new_state = {
                    "hist": lax.dynamic_slice(ctx, (0, f), (C, K - 1)),
                    "off": off + n_out * M - f * L,
                }
                return new_state, Signal(y, n_out.astype(jnp.int32))

            self._component = Processor(
                output=SignalProperties(
                    sample_rate=props.sample_rate * L / M, channels=C
                ),
                step=step,
                state={
                    "hist": jnp.zeros((C, K - 1), jnp.float32),
                    "off": jnp.asarray(0, jnp.int32),
                },
                params={"hp": hp_init},
            )
            return self._component

        return alloc
