"""Checkpoint / resume — snapshot and restore live stream state.

The reference has no checkpointing (SURVEY.md §5); its closest feature is
restartable pipes with initializer mutations (``pipe_test.go:108-131``).
Because this rebuild keeps every component's stream state as an explicit
device pytree (filter tails, resampler phase, counters) and its parameters
as traced inputs, snapshot/restore falls out naturally:

    ckpt = pipe_tpu.checkpoint.snapshot(p)     # p not running, or paused
    ckpt.save("stream.ckpt.npz")
    ...
    ckpt = pipe_tpu.checkpoint.load("stream.ckpt.npz")
    pipe_tpu.checkpoint.restore(p2, ckpt)      # structurally identical pipe
    p2.start()                                  # resumes mid-stream

Leaves are stored as a flat npz (key = ``r{route}/c{component}/{kind}/{i}``);
``restore`` unflattens against the *target pipe's* own tree structure, so a
checkpoint only round-trips into a structurally identical graph — the same
contract as restarting the reference pipe with the same lines. Host-side
component state (open files, sink captures) is the component's own business:
components with host resources resume via their ``start`` hooks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import numpy as np


@dataclasses.dataclass
class Checkpoint:
    """Flat leaf store: ``leaves[key] = np.ndarray``. Keys encode route,
    component, and kind (state/params) plus the leaf index in tree order."""

    leaves: Dict[str, np.ndarray]
    block_size: int

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, __block_size__=np.asarray(self.block_size), **self.leaves
        )


def load(path: str) -> Checkpoint:
    with np.load(path) as z:
        leaves = {k: z[k] for k in z.files if k != "__block_size__"}
        block_size = int(z["__block_size__"])
    return Checkpoint(leaves=leaves, block_size=block_size)


def _iter_components(pipe):
    for r, route in enumerate(pipe.routes):
        for c, comp in enumerate(route.components()):
            yield r, c, comp


def _to_host(leaf) -> np.ndarray:
    """Device leaf -> host numpy. On a multi-process mesh a sharded leaf is
    not fully addressable from one host; gather the global value instead
    (collective: every process must snapshot together — they each hold the
    pipe anyway, and each then writes a complete, self-contained
    checkpoint)."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(leaf)


def snapshot(pipe) -> Checkpoint:
    """Capture every component's device state and params as host numpy.

    Call while the pipe is not running (before ``start`` or after ``wait``)
    — mid-flight state is owned by executor threads, exactly like the
    reference's rule that mutations only run in the owning goroutine.
    """
    if getattr(pipe, "_running", False):
        raise RuntimeError("snapshot requires a stopped pipe")
    leaves: Dict[str, np.ndarray] = {}
    for r, c, comp in _iter_components(pipe):
        for kind, tree in (("state", comp.state), ("params", comp.params)):
            flat, _ = jax.tree.flatten(tree)
            for i, leaf in enumerate(flat):
                leaves[f"r{r}/c{c}/{kind}/{i}"] = _to_host(leaf)
    return Checkpoint(leaves=leaves, block_size=pipe.block_size)


def restore(pipe, ckpt: Checkpoint) -> None:
    """Write a checkpoint's leaves back into a structurally identical pipe.

    Raises ``ValueError`` on any structural mismatch (missing/extra leaves,
    shape or block-size disagreement) rather than partially restoring.
    """
    if getattr(pipe, "_running", False):
        raise RuntimeError("restore requires a stopped pipe")
    if pipe.block_size != ckpt.block_size:
        raise ValueError(
            f"checkpoint block_size {ckpt.block_size} != pipe {pipe.block_size}"
        )

    # Validate everything first: restore is all-or-nothing.
    plan: List = []
    seen = set()
    for r, c, comp in _iter_components(pipe):
        for kind, tree in (("state", comp.state), ("params", comp.params)):
            flat, treedef = jax.tree.flatten(tree)
            new_flat = []
            for i, leaf in enumerate(flat):
                key = f"r{r}/c{c}/{kind}/{i}"
                if key not in ckpt.leaves:
                    raise ValueError(f"checkpoint missing leaf {key}")
                seen.add(key)
                stored = ckpt.leaves[key]
                want = np.shape(leaf)
                if tuple(stored.shape) != tuple(want):
                    raise ValueError(
                        f"leaf {key}: checkpoint shape {stored.shape} != "
                        f"pipe shape {want}"
                    )
                new_flat.append(
                    jax.numpy.asarray(stored, dtype=np.asarray(leaf).dtype)
                )
            plan.append((comp, kind, treedef, new_flat))
    extra = set(ckpt.leaves) - seen
    if extra:
        raise ValueError(f"checkpoint has extra leaves: {sorted(extra)[:5]}")

    for comp, kind, treedef, new_flat in plan:
        tree = jax.tree.unflatten(treedef, new_flat)
        if kind == "state":
            comp.state = tree
        else:
            comp.params = tree
