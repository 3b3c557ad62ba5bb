"""Mesh allocation scope.

Component allocators have the reference signature ``alloc(ctx, block_size,
props)`` (``line.go:24-35``) — no mesh argument. When a :class:`Pipe` is
placed on a device mesh, it binds the mesh here for the duration of graph
construction (and of live-surgery allocation on the control thread), so
mesh-aware allocators from :mod:`pipe_tpu.parallel.components` can pick up
the topology without changing the allocator contract.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

_tls = threading.local()


@contextlib.contextmanager
def mesh_scope(mesh):
    """Bind ``mesh`` as the current allocation mesh on this thread."""
    prev = getattr(_tls, "mesh", None)
    _tls.mesh = mesh
    try:
        yield mesh
    finally:
        _tls.mesh = prev


def current_mesh():
    """The mesh bound by the enclosing :func:`mesh_scope`, or None."""
    return getattr(_tls, "mesh", None)


def require_mesh():
    mesh = current_mesh()
    if mesh is None:
        raise RuntimeError(
            "this component requires a device mesh: construct the Pipe with "
            "mesh=parallel.make_mesh(...) (sharded allocators only run "
            "inside a mesh-placed pipe)"
        )
    return mesh
