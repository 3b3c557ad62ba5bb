"""Offline (array-in, array-out) processing convenience.

The streaming runtime is the product; this wrapper runs a processor chain
over a whole in-memory signal with the same components, states, and
block protocol — handy for tests, notebooks, and batch jobs:

    y = pipe_tpu.process(x, [fir.processor(), rs.processor()],
                         block_size=4096)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from pipe_tpu.graph import Line
from pipe_tpu.runtime.driver import run


def process(
    x,
    processors: Sequence,
    block_size: int = 4096,
    sample_rate: float = 44100.0,
    lookahead: int = 8,
) -> np.ndarray:
    """Run ``(channels, N)`` samples through a processor chain; returns the
    processed ``(channels, M)`` array (M differs when rates change)."""
    import jax
    import jax.numpy as jnp

    from pipe_tpu.components import Sink, Source
    from pipe_tpu.signal import Signal, SignalProperties

    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    C, total = x.shape
    arr = jnp.asarray(x)

    def src_alloc(mctx, block):
        padded = jnp.pad(arr, ((0, 0), (0, block)))

        def step(state, params):
            pos = state["pos"]
            left = total - pos
            read = jnp.clip(left, 0, block)
            blk = jax.lax.dynamic_slice(padded, (0, pos), (C, block))
            return {"pos": pos + read}, Signal(blk, read), read <= 0

        return Source(
            output=SignalProperties(sample_rate=sample_rate, channels=C),
            step=step,
            state={"pos": jnp.asarray(0, jnp.int32)},
            params={},
        )

    captured: list[np.ndarray] = []

    def sink_alloc(mctx, block, props):
        return Sink(receive=captured.append)

    run(
        block_size,
        Line(source=src_alloc, processors=list(processors), sink=sink_alloc),
        lookahead=lookahead,
    )
    if not captured:
        return np.zeros((C, 0), np.float32)
    return np.concatenate(captured, axis=1)
