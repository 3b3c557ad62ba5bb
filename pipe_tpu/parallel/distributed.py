"""Multi-host execution — DCN process group + global mesh construction.

The reference is strictly single-process (SURVEY.md §2: its inter-stage
"backend" is Go channels). Scaling past one host here is the standard JAX
multi-controller recipe: every host runs the same program,
``jax.distributed.initialize`` forms the process group over DCN, and the
mesh spans the *global* device set — collectives (the halo ``ppermute``,
the mixer ``psum``) then ride ICI within a slice and DCN across slices.

Topology guidance (see ``pipe_tpu.parallel.mesh``): declare the time axis
last so it maps to the fastest interconnect — halo exchange is
nearest-neighbor traffic and wants ICI; the channel axis's only collective
is the final mixer reduction, which tolerates DCN.

Usage (same program on every host)::

    from pipe_tpu import parallel
    parallel.initialize()                       # no-op on a single host
    mesh = parallel.make_global_mesh(channel_shards=8, time_shards=4)
    chain = parallel.ShardedChain(mesh, stages, channels=64,
                                  chunk_frames=...)
    # feed per-host shards with jax.make_array_from_process_local_data

On a single host both calls degrade gracefully, so the code is portable
from a laptop CPU mesh to a pod slice unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax

from pipe_tpu.parallel.mesh import CH_AXIS, TIME_AXIS

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Form the multi-host process group (idempotent; no-op single-host).

    With no arguments, relies on the TPU environment's auto-detection
    (JAX reads the pod metadata); arguments override for manual clusters.
    """
    global _initialized
    if _initialized:
        return
    if num_processes is None and coordinator_address is None:
        # Single process with no cluster env: nothing to form.
        env_hints = jax.process_count() > 1
        if not env_hints:
            _initialized = True
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def make_global_mesh(channel_shards: int = 1, time_shards: int = 1):
    """A ``(ch, time)`` mesh over the GLOBAL device set (all hosts).

    Uses ``jax.make_mesh``, which picks a device permutation that keeps the
    trailing (time) axis on the fastest links of the physical topology.
    """
    n = channel_shards * time_shards
    total = jax.device_count()
    if total < n:
        raise ValueError(
            f"global mesh {channel_shards}x{time_shards} needs {n} devices, "
            f"cluster has {total}"
        )
    return jax.make_mesh((channel_shards, time_shards), (CH_AXIS, TIME_AXIS))


def shard_host_chunk(mesh, x_local):
    """Assemble a global ``(channels, chunk)`` array from per-host local
    shards (each host passes its slice of the channel x time block grid)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(CH_AXIS, TIME_AXIS)), x_local
    )
