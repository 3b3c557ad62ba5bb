"""Polyphase DFT filterbank channelizer (critically sampled analysis
bank) — the SDR workhorse: splits a wideband stream into K uniformly
spaced subbands, each lowpass-filtered and decimated by K, for the cost
of one polyphase FIR per branch plus one K-point FFT per output frame.

Math (standard polyphase decomposition): the k-th channel is
``y_k[m] = sum_n x[n] e^{-j2πkn/K} h[mK - n]``. Writing ``n = rK + p``,

    u_p[m] = sum_r x[rK + p] * g_p[m - r],   g_p[s] = h[sK - p]
    y[k, m] = DFT_K over p of u_p[m]

so the bank is K branch FIRs (the prototype's polyphase components on the
K-fold decimated input phases) followed by an FFT across branches. For
real input only the first K/2+1 bins are unique (Hermitian symmetry) —
the rfft across branches yields them directly.

TPU mapping: the branch FIRs run as ONE grouped conv over C*K branches
(few taps each — VPU work); the FFT batches over output frames. Complex
values exist only at the FFT output and are immediately split into re/im
float32 planes (complex arithmetic is unimplemented on some TPU
runtimes, see ``pipe_tpu.ops.ols``).

Signal layout: a channelized stream doesn't fit the framework's
``(channels, frames)`` model as complex subbands, so the Processor emits
``C * 2 * (K//2+1)`` output channels at rate ``sr/K``, ordered
``[c0_bin0_re, c0_bin0_im, c0_bin1_re, ..., c1_bin0_re, ...]`` —
:func:`split_bins` reassembles ``(C, K//2+1, M)`` complex on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pipe_tpu.components import Processor
from pipe_tpu.signal import Signal, SignalProperties


def design_prototype(num_channels: int, taps_per_branch: int = 16,
                     beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc prototype lowpass for a K-channel bank,
    cutoff at the channel Nyquist (1/(2K)); float64 host-side."""
    import scipy.signal

    K = num_channels
    n = K * taps_per_branch
    h = scipy.signal.firwin(n, 1.0 / K, window=("kaiser", beta))
    return np.asarray(h, np.float64)


def polyphase_branches(h: np.ndarray, num_channels: int) -> np.ndarray:
    """Branch filters ``g_p[s] = h[sK - p]`` as a ``(K, S)`` array
    (``S = taps_per_branch + 1``, zero-padded where sK - p is out of
    range)."""
    K = num_channels
    P = h.shape[0]
    S = -(-P // K) + 1
    g = np.zeros((K, S), np.float64)
    for p in range(K):
        for s in range(S):
            idx = s * K - p
            if 0 <= idx < P:
                g[p, s] = h[idx]
    return g


def channelize_block(hist, x, gp, num_channels: int):
    """One full block through the bank.

    Args:
      hist: ``(C, K*(S-1))`` carried input samples (branch FIR tails in
        input-sample form).
      x: ``(C, B)`` with ``B % K == 0``.
      gp: ``(K, S)`` traced branch filters.
      num_channels: K.

    Returns ``(new_hist, re, im)`` with re/im ``(C, K//2+1, B//K)``.
    """
    K = num_channels
    C, B = x.shape
    S = gp.shape[1]
    if B % K:
        raise ValueError(f"block must be a multiple of K={K}, got {B}")
    M = B // K
    ctx = jnp.concatenate([hist, x], axis=1)  # (C, K*(S-1) + B)
    # phase decompose: u_p input x_p[r] = ctx[rK + p]; frame r spans history
    frames = ctx.reshape(C, S - 1 + M, K)  # frames[c, r, p] = ctx[rK+p]
    # branch FIR: u_p[m] = sum_s x_p[m - s] g_p[s]
    #           = sum_s frames[c, (S-1) + m - s, p] * gp[p, s]
    # One conv over the frame axis with K feature groups:
    lhs = jnp.transpose(frames, (0, 2, 1))  # (C, K, S-1+M)
    rhs = jnp.flip(gp, -1)[:, None, :]  # (K, 1, S) grouped
    u = lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1,),
        padding="VALID",
        feature_group_count=K,
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (C, K, M)
    Y = jnp.fft.rfft(jnp.transpose(u, (0, 2, 1)), axis=-1)  # (C, M, K//2+1)
    Y = jnp.transpose(Y, (0, 2, 1))  # (C, K//2+1, M)
    new_hist = x[:, B - K * (S - 1):]
    return new_hist, jnp.real(Y), jnp.imag(Y)


def split_bins(data: np.ndarray, num_channels: int) -> np.ndarray:
    """Host helper: reassemble the Processor's stacked-channel output
    ``(C*2*(K//2+1), M)`` into complex ``(C, K//2+1, M)``."""
    K = num_channels
    bins = K // 2 + 1
    C = data.shape[0] // (2 * bins)
    d = data.reshape(C, bins, 2, -1)
    return d[:, :, 0, :] + 1j * d[:, :, 1, :]


class Channelizer:
    """K-channel analysis filterbank processor. The prototype filter is a
    live parameter (same length across mutations)."""

    def __init__(self, num_channels: int, taps_per_branch: int = 16):
        if num_channels < 2 or num_channels % 2:
            raise ValueError("num_channels must be even and >= 2")
        self.num_channels = num_channels
        self.taps_per_branch = taps_per_branch
        self._gp = jnp.asarray(
            polyphase_branches(
                design_prototype(num_channels, taps_per_branch), num_channels
            ),
            jnp.float32,
        )
        self._component = None
        self.context = None

    def processor(self):
        K = self.num_channels
        gp_init = self._gp
        S = int(gp_init.shape[1])
        bins = K // 2 + 1

        def alloc(mctx, block_size, props: SignalProperties):
            if block_size % K:
                raise ValueError(
                    f"block_size {block_size} must be a multiple of K={K}"
                )
            self.context = mctx
            C = props.channels

            def step(state, params, sig: Signal):
                # mask invalid frames, emit floor(frames/K) subband frames
                idx = jnp.arange(sig.block_size, dtype=jnp.int32)[None, :]
                xm = jnp.where(idx < sig.frames, sig.data, 0.0)
                new_hist, re, im = channelize_block(
                    state["hist"], xm, params["gp"], K
                )
                # advance history by the valid samples only
                buf = jnp.concatenate([state["hist"], xm], axis=1)
                new_hist = lax.dynamic_slice(
                    buf, (0, sig.frames), (C, K * (S - 1))
                )
                out = jnp.stack([re, im], axis=2)  # (C, bins, 2, M)
                out = out.reshape(C * bins * 2, sig.block_size // K)
                return {"hist": new_hist}, Signal(out, sig.frames // K)

            self._component = Processor(
                output=SignalProperties(
                    sample_rate=props.sample_rate / K,
                    channels=C * bins * 2,
                ),
                step=step,
                state={"hist": jnp.zeros((C, K * (S - 1)), jnp.float32)},
                params={"gp": gp_init},
            )
            return self._component

        return alloc

    def set_prototype(self, h):
        """Swap the prototype lowpass mid-stream (same length)."""
        gp = jnp.asarray(
            polyphase_branches(np.asarray(h, np.float64), self.num_channels),
            jnp.float32,
        )

        def fn():
            self._component.set_param("gp", gp)

        return self.context.mutate(fn)
