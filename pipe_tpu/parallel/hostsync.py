"""Cross-host failure detection for multi-process streaming pipes.

The reference's failure story is single-process: first error wins, the
context cancels every goroutine (``merger.go:33-41``, ``pipe.go:230-239``).
Across hosts there is no shared memory to cancel through, and a host that
simply stops participating leaves its peers hung inside the next DCN/ICI
collective. The protocol here keeps the reference's first-error-wins
semantics with an aligned, out-of-band health exchange:

- every host's executor thread calls :meth:`HostSync.check` at the same
  deterministic dispatch indices (every ``every`` dispatches);
- a host that fails (or is stopped) makes ONE final ``check(flag=1)`` call
  — joining the same collective round its peers are about to enter — and
  exits;
- peers see the nonzero flag and raise :class:`PeerAbortError`, which the
  pipe's merger turns into the run's first error (without re-syncing,
  since the flagging peer is gone).

EOF needs no special case: every host streams the same block sequence, so
all of them stop issuing checks at the same round.
"""

from __future__ import annotations

import numpy as np


class PeerAbortError(RuntimeError):
    """Another host in the process group failed or stopped the pipe."""


class HostSync:
    """Aligned health allgather over the process group (see module doc).

    ``every`` is the dispatch period between checks; all hosts must use the
    same value. Single-process groups never construct this.
    """

    def __init__(self, every: int = 16):
        self.every = max(1, int(every))
        self._since = 0

    def due(self) -> bool:
        """Advance the dispatch counter; True when a check round is due."""
        self._since += 1
        if self._since >= self.every:
            self._since = 0
            return True
        return False

    def remaining_to_round(self) -> int:
        """Dispatch calls left until the next aligned health round — the
        number of dummy dispatches an aborting host must pad with so its
        peers' cross-host chunks complete (see the module doc)."""
        return self.every - self._since

    def check(self, flag: int = 0) -> None:
        """Join the group's health round contributing ``flag`` (0 = healthy,
        1 = aborting). Raises :class:`PeerAbortError` when any OTHER host
        flagged. Must be called collectively — by every process in the
        group — the same number of times."""
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([flag], np.int32)
        )
        total = int(np.sum(flags))
        if total - int(flag) > 0:
            raise PeerAbortError(
                "a peer host aborted the pipe (first-error-wins across the "
                "process group)"
            )
