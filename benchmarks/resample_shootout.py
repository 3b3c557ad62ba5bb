"""Polyphase resample formulation shootout (r4, VERDICT r3 item 6).

The shipped supercycle conv pads 147 -> 256 and 160 -> 256 onto the MXU —
a 2.8x FLOP tax baked into the 44.1k/48k rate-ratio dims (PERF_NOTES
"Polyphase resample"). Candidates here attack the tax by splitting the
supercycle's 160 outputs into q-groups whose INPUT SPAN fits one 128
tile (two groups of 80: spans 104/105), so the padded contraction is
2x(128) instead of 2x(256):

  conv_g1        — the shipped formulation (baseline)
  qsplit_dot     — materialize per-group 128-wide input windows (one
                   strided reshape each), one (128, 80) dot per group
  qsplit_conv    — per-group windows via stride-147 spatial conv with
                   in-features=1 (no materialization; XLA's im2col)
  overlap_split  — current-frame-only conv (147 contraction) + a small
                   (31 x ~34) boundary correction matmul

Run on the real TPU (default env):  python benchmarks/resample_shootout.py
Marginal step time over a dispatch-pipelined loop, same protocol as the
PERF_NOTES tables. Each candidate is SNR-checked against the shipped
path before timing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pipe_tpu import config
from pipe_tpu.ops.resample import polyphase_design, resample_apply

L, M, K = 160, 147, 32
C = 64
B = 147 * 2048  # ~301k frames, the PERF_NOTES protocol


def build_W(hp, GM, GL):
    q = jnp.arange(GL)
    ph = (q * M) % L
    n0 = (q * M) // L
    j = jnp.arange(K - 1 + GM)
    kidx = (K - 1 + n0)[None, :] - j[:, None]
    valid = (kidx >= 0) & (kidx < K)
    return jnp.where(valid, hp[ph[None, :], jnp.clip(kidx, 0, K - 1)], 0.0)


def conv_g1(hist, x, hp):
    return resample_apply(hist, x, hp, L, M)


def _qsplit_groups(span_budget=128):
    """Split [0, L) outputs into groups whose input span fits the budget.
    Returns [(q0, q1, o, span)] with o the window-row offset."""
    groups = []
    q0 = 0
    while q0 < L:
        q1 = q0
        o = (q0 * M) // L  # first input row this group touches
        while q1 < L and ((q1 * M) // L + K) - o <= span_budget:
            q1 += 1
        span = ((q1 - 1) * M) // L + K - o
        groups.append((q0, q1, o, span))
        q0 = q1
    return groups


GROUPS = _qsplit_groups()


def qsplit_dot(hist, x, hp):
    """Materialized per-group windows + one dot per group."""
    Cc, Bn = x.shape
    n_g = Bn // M
    xp = jnp.concatenate([hist, x], axis=1)  # (C, K-1+B)
    W = build_W(hp, M, L)  # (K-1+M, L)
    outs = []
    for q0, q1, o, span in GROUPS:
        # windows: xp[:, g*M + o : g*M + o + span] for each supercycle g
        idx = (jnp.arange(n_g)[:, None] * M + o) + jnp.arange(span)[None, :]
        win = xp[:, idx]  # (C, n_g, span)
        Wg = W[o : o + span, q0:q1]  # (span, q1-q0)
        y = jnp.einsum(
            "cgs,sq->cgq", win, Wg,
            preferred_element_type=jnp.float32,
            precision=config.matmul_precision(),
        )
        outs.append(y)
    return jnp.concatenate(outs, axis=2).reshape(Cc, n_g * L)


def qsplit_conv(hist, x, hp):
    """Per-group windows via a stride-M spatial conv (no materialization)."""
    Cc, Bn = x.shape
    n_g = Bn // M
    xp = jnp.concatenate([hist, x], axis=1)[:, None, :]  # (C, 1, K-1+B)
    W = build_W(hp, M, L)
    outs = []
    for q0, q1, o, span in GROUPS:
        Wg = W[o : o + span, q0:q1]  # (span, nq)
        rhs = jnp.transpose(Wg, (1, 0))[:, None, :]  # (nq, 1, span)
        lhs = xp[:, :, o : o + (n_g - 1) * M + span]
        y = lax.conv_general_dilated(
            lhs, rhs, window_strides=(M,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
            precision=config.matmul_precision(),
        )  # (C, nq, n_g)
        outs.append(jnp.transpose(y, (0, 2, 1)))
    return jnp.concatenate(outs, axis=2).reshape(Cc, n_g * L)


def overlap_split(hist, x, hp):
    """Current-frame conv (147-row contraction, width-1 kernel) plus a
    small boundary matmul for the outputs that read the K-1 overlap."""
    Cc, Bn = x.shape
    n_g = Bn // M
    W = build_W(hp, M, L)  # (K-1+M, L): rows [0,K-1) prev tail, rest cur
    W_cur = W[K - 1 :, :]  # (M, L)
    W_prev = W[: K - 1, :]  # (K-1, L) — nonzero only for small q
    frames = x.reshape(Cc, n_g, M)
    y_main = jnp.einsum(
        "cgm,mq->cgq", frames, W_cur,
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )
    # boundary: previous frame's last K-1 samples
    prev = jnp.concatenate(
        [hist[:, None, :], frames[:, :-1, -(K - 1):]], axis=1
    )  # (C, n_g, K-1)
    y_fix = jnp.einsum(
        "cgk,kq->cgq", prev, W_prev,
        preferred_element_type=jnp.float32,
        precision=config.matmul_precision(),
    )
    return (y_main + y_fix).reshape(Cc, n_g * L)


def time_fn(fn, hp, reps=20, warm=4):
    """bench.py protocol: steps CHAIN through carried state so they
    serialize on-device, and every timed run ends with a scalar READBACK
    (block_until_ready alone does not reliably wait on tunneled TPU
    runtimes). Marginal slope between a short and a long run."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, B)), jnp.float32)
    hist0 = jnp.zeros((C, K - 1), jnp.float32)

    def step(hist, x, hp):
        y = fn(hist, x, hp)
        return y[:, -(K - 1):] * 1e-6, y  # chained carry (timing dep)

    f = jax.jit(step)
    hist, y = f(hist0, x, hp)
    float(y[0, -1])  # compile + settle
    times = {}
    for n in (warm, warm + reps):
        hist = hist0
        t0 = time.perf_counter()
        for _ in range(n):
            hist, y = f(hist, x, hp)
        float(y[0, -1])  # readback probe forces the chain
        times[n] = time.perf_counter() - t0
    dt = (times[warm + reps] - times[warm]) / reps
    y = jax.jit(fn)(hist0, x, hp)
    return dt, y


def main():
    print(f"devices: {jax.devices()}", flush=True)
    print(f"q-groups (span<=128): {GROUPS}", flush=True)
    hp = jnp.asarray(polyphase_design(L, M, K), jnp.float32)
    base_dt, base_y = time_fn(conv_g1, hp)
    base = np.asarray(base_y, np.float64)
    print(
        f"conv_g1 (shipped): {base_dt*1e3:8.2f} ms  "
        f"{C*B/base_dt/1e9:6.2f} Gsamp/s",
        flush=True,
    )
    for name, fn in [
        ("qsplit_dot", qsplit_dot),
        ("qsplit_conv", qsplit_conv),
        ("overlap_split", overlap_split),
    ]:
        dt, y = time_fn(fn, hp)
        err = np.asarray(y, np.float64) - base
        snr = 10 * np.log10(
            np.sum(base**2) / max(np.sum(err**2), 1e-300)
        )
        print(
            f"{name:>14s}: {dt*1e3:8.2f} ms  {C*B/dt/1e9:6.2f} Gsamp/s  "
            f"(vs shipped {base_dt/dt:5.2f}x, parity {snr:.0f} dB)",
            flush=True,
        )


if __name__ == "__main__":
    main()
