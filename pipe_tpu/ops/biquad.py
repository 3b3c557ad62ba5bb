"""Biquad IIR EQ via parallel (associative) scan (benchmark config 4's 'EQ
chain').

A direct-form biquad is a sequential recurrence — poison for a vector
machine. Rewritten as an affine recurrence over 2-vectors,

    s[n] = A s[n-1] + u[n],   A = [[-a1, -a2], [1, 0]],
    u[n] = (b0 x[n] + b1 x[n-1] + b2 x[n-2], 0),

the whole block is evaluated with ``jax.lax.associative_scan`` over
(matrix, vector) pairs in O(log B) depth — the TPU-native formulation of an
IIR filter. The FIR part of u[n] is a 3-tap streaming FIR reusing the same
tail mechanics as :mod:`pipe_tpu.ops.fir`.

Numerics: f32 associative composition of 2x2 matrices loses precision for
very high-Q poles; for |pole| < ~0.99 the SNR against a float64 oracle
stays well above 80 dB. Cascades are applied section by section.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pipe_tpu.components import Processor
from pipe_tpu.signal import Signal


def _affine_combine(left, right):
    """Compose affine maps: (A2, u2) after (A1, u1) = (A2@A1, A2@u1 + u2).

    Shapes carry leading batch dims (..., 2, 2) and (..., 2).
    """
    A1, u1 = left
    A2, u2 = right
    hi = lax.Precision.HIGHEST
    A = jnp.einsum("...ij,...jk->...ik", A2, A1, precision=hi)
    u = jnp.einsum("...ij,...j->...i", A2, u1, precision=hi) + u2
    return A, u


def biquad_section_block(state, x, frames, coefs):
    """One block through one biquad section.

    Args:
      state: dict with ``x_tail`` (C, 2) and ``s`` (C, 2) = (y[n-1], y[n-2]).
      x: (C, B) input, valid to ``frames``.
      frames: traced int32.
      coefs: (6,) array [b0, b1, b2, 1, a1, a2] (a0 normalized to 1).

    Returns (new_state, y).
    """
    C, B = x.shape
    b0, b1, b2 = coefs[0], coefs[1], coefs[2]
    a1, a2 = coefs[4], coefs[5]
    idx = jnp.arange(B, dtype=jnp.int32)[None, :]
    xm = jnp.where(idx < frames, x, 0.0)

    # FIR part v[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2] with carried tail
    buf = jnp.concatenate([state["x_tail"], xm], axis=1)  # (C, B+2)
    v = b0 * buf[:, 2:] + b1 * buf[:, 1:-1] + b2 * buf[:, :-2]  # (C, B)

    # Affine recurrence via associative scan over the time axis.
    A = jnp.stack(
        [jnp.stack([-a1, -a2]), jnp.stack([jnp.ones_like(a1), jnp.zeros_like(a1)])]
    )  # (2, 2)
    As = jnp.broadcast_to(A, (B, 2, 2))
    us = jnp.stack([v, jnp.zeros_like(v)], axis=-1)  # (C, B, 2)

    def combine(l, r):
        return _affine_combine(l, r)

    # scan over axis 0 => put time first: (B, C, 2)
    us_t = jnp.swapaxes(us, 0, 1)
    As_b = jnp.broadcast_to(As[:, None], (B, C, 2, 2))
    P, q = lax.associative_scan(combine, (As_b, us_t), axis=0)
    # s[n] = P[n] @ s_init + q[n]
    s_init = state["s"]  # (C, 2)
    s_all = (
        jnp.einsum("bcij,cj->bci", P, s_init, precision=lax.Precision.HIGHEST)
        + q
    )  # (B, C, 2)
    y = jnp.swapaxes(s_all[..., 0], 0, 1)  # (C, B)

    # next state: s after the last VALID frame. s_at[k] = state after k
    # valid frames, so index by `frames` (k=0 keeps the carried state).
    s_at = jnp.concatenate([s_init[None], s_all], axis=0)  # (B+1, C, 2)
    new_s = lax.dynamic_index_in_dim(s_at, frames, axis=0, keepdims=False)  # (C, 2)
    new_x_tail = lax.dynamic_slice(buf, (0, frames), (C, 2))
    return {"x_tail": new_x_tail, "s": new_s}, y


def biquad_block(state, x, frames, sections):
    """Cascade of biquad sections. ``sections``: (S, 6) SOS matrix (scipy
    layout, a0 == 1). ``state``: list of per-section dicts."""
    new_states = []
    y = x
    for i in range(sections.shape[0]):
        st, y = biquad_section_block(state[i], y, frames, sections[i])
        new_states.append(st)
    return new_states, y


def biquad_init_state(channels: int, n_sections: int):
    return [
        {
            "x_tail": jnp.zeros((channels, 2), jnp.float32),
            "s": jnp.zeros((channels, 2), jnp.float32),
        }
        for _ in range(n_sections)
    ]


class Biquad:
    """Biquad cascade processor from an SOS matrix (scipy ``sosfilt``
    layout: rows [b0 b1 b2 a0 a1 a2], a0 normalized to 1). Coefficients are
    a live parameter (section count fixed)."""

    def __init__(self, sos):
        sos = np.asarray(sos, np.float64)
        if sos.ndim == 1:
            sos = sos[None, :]
        if sos.shape[-1] != 6:
            raise ValueError("sos rows must be [b0 b1 b2 a0 a1 a2]")
        # normalize a0
        sos = sos / sos[:, 3:4]
        self._sos = jnp.asarray(sos, jnp.float32)
        self._component = None
        self.context = None

    def processor(self):
        def alloc(mctx, block_size, props):
            self.context = mctx
            S = self._sos.shape[0]

            def step(state, params, sig: Signal):
                new_state, y = biquad_block(
                    state, sig.data, sig.frames, params["sos"]
                )
                return new_state, sig.with_data(y)

            self._component = Processor(
                output=props,
                step=step,
                state=biquad_init_state(props.channels, S),
                params={"sos": self._sos},
            )
            return self._component

        return alloc

    def set_sos(self, sos):
        sos = np.asarray(sos, np.float64)
        if sos.ndim == 1:
            sos = sos[None, :]
        sos = sos / sos[:, 3:4]
        s = jnp.asarray(sos, jnp.float32)

        def fn():
            self._component.set_param("sos", s)

        return self.context.mutate(fn)


def design_peaking_eq(
    sample_rate: float, freq: float, q: float, gain_db: float
) -> np.ndarray:
    """RBJ cookbook peaking EQ, one SOS row, float64 host-side."""
    A = 10.0 ** (gain_db / 40.0)
    w0 = 2.0 * np.pi * freq / sample_rate
    alpha = np.sin(w0) / (2.0 * q)
    b0 = 1 + alpha * A
    b1 = -2 * np.cos(w0)
    b2 = 1 - alpha * A
    a0 = 1 + alpha / A
    a1 = -2 * np.cos(w0)
    a2 = 1 - alpha / A
    return np.array([b0 / a0, b1 / a0, b2 / a0, 1.0, a1 / a0, a2 / a0])
