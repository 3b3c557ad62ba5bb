"""Gain — the simplest mutable processor (benchmark config 1/2,
BASELINE.json)."""

from __future__ import annotations

import jax.numpy as jnp

from pipe_tpu.components import Processor
from pipe_tpu.signal import Signal


def gain_block(x, g):
    """``x * g`` with ``g`` scalar or per-channel ``(C,)`` / ``(C, 1)``."""
    g = jnp.asarray(g)
    if g.ndim == 1:
        g = g[:, None]
    return x * g


class Gain:
    """Gain processor factory. ``gain`` may be a scalar or per-channel
    vector; :meth:`set_gain` returns a mutation for live adjustment (the
    'mutable gain pushed mid-stream' of benchmark config 2)."""

    def __init__(self, gain=1.0):
        self._init_gain = gain
        self._component = None
        self._delegate = None  # set by pipe_tpu.optimize.fuse
        self.context = None

    def processor(self):
        def alloc(mctx, block_size, props):
            self.context = mctx

            def step(state, params, sig: Signal):
                return state, sig.with_data(gain_block(sig.data, params["gain"]))

            self._component = Processor(
                output=props,
                step=step,
                state={},
                params={"gain": jnp.asarray(self._init_gain, jnp.float32)},
            )
            return self._component

        alloc.fusion_tag = ("gain", self)
        return alloc

    def set_gain(self, gain):
        if self._delegate is not None:  # folded away by optimize.fuse
            return self._delegate.set_gain(gain)

        def fn():
            self._component.set_param("gain", jnp.asarray(gain, jnp.float32))

        return self.context.mutate(fn)

    @property
    def gain(self):
        if self._component is None:
            return self._init_gain
        return self._component.get_param("gain")
