"""Device mesh construction.

One canonical mesh shape: ``(channel_shards, time_shards)`` with axis names
:data:`CH_AXIS` and :data:`TIME_AXIS`. On a multi-host pod slice the time
axis should ride ICI (neighbor halo exchange is nearest-neighbor traffic)
and the channel axis can span DCN (its only collective is the final mixer
psum) — `jax.make_mesh` orders axes so the innermost axis maps to the
fastest interconnect, so declare time last.
"""

from __future__ import annotations

import jax

CH_AXIS = "ch"
TIME_AXIS = "time"


def make_mesh(channel_shards: int = 1, time_shards: int = 1, devices=None):
    """Build a ``(ch, time)`` mesh over the given (or all) devices."""
    n = channel_shards * time_shards
    if devices is None:
        devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"mesh {channel_shards}x{time_shards} needs {n} devices, "
            f"have {len(devices)}"
        )
    return jax.make_mesh(
        (channel_shards, time_shards),
        (CH_AXIS, TIME_AXIS),
        devices=devices[:n],
    )
