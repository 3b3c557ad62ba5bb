"""The flagship graph: 64-channel FIR(255) -> 44.1k->48k polyphase resample
-> merged mix (BASELINE.json configs 3/5 — the headline benchmark chain).

Provides a *pure, single-chip* chunk function (for compile checks and
single-chip benchmarking) built from the same functional kernels the
streaming runtime and the sharded chain use, so all three paths compute the
same numbers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pipe_tpu.ops.fir import design_lowpass, fir_apply, fir_init_tail
from pipe_tpu.ops.resample import polyphase_design, resample_apply

from pipe_tpu import config

FIR_TAPS = 255
RS_UP, RS_DOWN = 160, 147  # 44.1 kHz -> 48 kHz
RS_K = 32  # taps per polyphase phase
SAMPLE_RATE = 44100.0


def make_flagship(
    channels: int = 64, chunk: int = 147 * 64, mix_out: int = 2,
    fused: bool = True,
):
    """Build ``(fn, init_state, example_x)``.

    ``fn(state, x) -> (state, y)`` processes one ``(channels, chunk)`` input
    chunk into ``(mix_out, chunk*160//147)`` output, carrying filter
    history. ``chunk`` must be a multiple of 147 so the resampler emits a
    static output count. ``fused=True`` (default) runs FIR+resample as one
    combined polyphase bank (``pipe_tpu.ops.fused``, ~8% faster: one fewer
    HBM round trip); ``fused=False`` keeps the two-stage path.
    """
    if chunk % RS_DOWN:
        raise ValueError(f"chunk must be a multiple of {RS_DOWN}")
    h = jnp.asarray(design_lowpass(FIR_TAPS, 4000.0, SAMPLE_RATE), jnp.float32)
    hp = jnp.asarray(polyphase_design(RS_UP, RS_DOWN, RS_K), jnp.float32)
    mix = jnp.asarray(np.ones((mix_out, channels)) / channels, jnp.float32)

    if fused:
        from pipe_tpu.ops.fused import fused_apply

        Kc = RS_K + FIR_TAPS - 1

        def fn(state, x):
            (hist,) = state
            z = fused_apply(hist, x, h, hp, RS_UP, RS_DOWN)
            out = jnp.dot(
                mix, z, preferred_element_type=jnp.float32,
                precision=config.matmul_precision(),
            )
            return (x[:, -(Kc - 1):],), out

        init_state = (jnp.zeros((channels, Kc - 1), jnp.float32),)
    else:
        def fn(state, x):
            fir_tail, rs_hist = state
            y = fir_apply(fir_tail, x, h)
            fir_tail2 = x[:, -(FIR_TAPS - 1):]

            # polyphase resample, phase 0 at every chunk boundary
            z = resample_apply(rs_hist, y, hp, RS_UP, RS_DOWN)
            rs_hist2 = y[:, -(RS_K - 1):]

            out = jnp.dot(
                mix, z, preferred_element_type=jnp.float32,
                precision=config.matmul_precision(),
            )
            return (fir_tail2, rs_hist2), out

        init_state = (
            fir_init_tail(channels, FIR_TAPS),
            jnp.zeros((channels, RS_K - 1), jnp.float32),
        )
    rng = np.random.default_rng(0)
    example_x = jnp.asarray(
        rng.standard_normal((channels, chunk)), jnp.float32
    )
    return fn, init_state, example_x
