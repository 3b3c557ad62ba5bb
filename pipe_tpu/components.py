"""Components — Source, Processor, Sink (reference ``pipe.go:32-87``).

A component is data: a pure *step function* over pytrees plus its initial
``state`` (device pytree), host-owned ``params`` (traced jit inputs — the
mutation surface), host lifecycle hooks, and a mutable context.

Step contracts (all jit-traceable):

- Source:    ``step(state, params) -> (state, Signal, eof)`` where ``eof`` is
  a traced bool scalar. ``eof=True`` means "no message this block" and the
  stream is done — mirroring ``io.EOF`` from a ``SourceFunc``
  (``pipe.go:46-47``). A partial final block is a normal message with
  ``Signal.frames < block_size`` followed by an ``eof`` step.
- Processor: ``step(state, params, sig) -> (state, sig_out)``
- Sink:      ``step(state, params, sig) -> state``

The executor gates every state update on ``not eof`` so a step traced past
EOF cannot advance counters or filter tails — the structural analog of the
reference never delivering a message after EOF.

Host-boundary components:

- A Source may instead (or additionally) have ``feed(block_size) ->
  np.ndarray | None``: a host callable producing ``(channels, n)`` samples per
  block (n <= block_size; short = final partial; None = EOF). This is how
  file/network readers enter the device stream.
- A Sink may have ``receive(np.ndarray)``: a host callable given the valid
  ``(channels, frames)`` output each block. This is how data leaves the
  device stream (writers, capture).
- Any component may have ``host_pre() -> None``, called on the executor
  thread before each block — the seam for host-side checks and fault
  injection (the mock kit's ``ErrorOnCall`` uses it).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from pipe_tpu import mutable
from pipe_tpu.signal import Signal, SignalProperties

# Type aliases for documentation; structural typing is used throughout.
SourceStepFn = Callable[..., Tuple[Any, Signal, Any]]
ProcessStepFn = Callable[..., Tuple[Any, Signal]]
SinkStepFn = Callable[..., Any]
HookFn = Callable[[], None]

Params = Dict[str, Any]


@dataclasses.dataclass
class _Component:
    """Shared component plumbing: identity, params, state, lifecycle."""

    state: Any = None
    params: Params = dataclasses.field(default_factory=dict)
    start: Optional[HookFn] = None
    flush: Optional[HookFn] = None
    host_pre: Optional[HookFn] = None
    # Set by the allocation machinery (reference line.go:128-153 assigns the
    # component context after the allocator returns).
    context: mutable.Context = mutable.IMMUTABLE

    def set_param(self, name: str, value) -> None:
        """Update a traced parameter. Values must keep shape/dtype to avoid
        retracing; this is the mutation fast path."""
        self.params[name] = value

    def get_param(self, name: str):
        return self.params[name]

    def update_state(self, fn: Callable[[Any], Any]) -> None:
        """Replace the live state pytree via ``fn(old) -> new``. Must preserve
        the tree structure and leaf shapes/dtypes. Only call from a mutation
        (executor thread) or before the pipe starts."""
        self.state = fn(self.state)


@dataclasses.dataclass
class Source(_Component):
    """Origin of signal (``pipe.go:35-47``)."""

    output: SignalProperties = None  # type: ignore[assignment]
    step: Optional[SourceStepFn] = None
    feed: Optional[Callable[[int], Optional[np.ndarray]]] = None

    def __post_init__(self):
        if self.output is None:
            raise ValueError("Source requires output SignalProperties")
        if self.step is None and self.feed is None:
            raise ValueError("Source requires a step fn or a host feed fn")


@dataclasses.dataclass
class Processor(_Component):
    """Signal manipulator (``pipe.go:52-64``). ``output`` declares the
    processor's output stream properties (a resampler changes sample_rate, a
    mixer may change channels).

    ``out_capacity`` (optional) declares the processor's static output
    block WIDTH when it differs from its input width — a resampler emits
    ``ceil(B*L/M)`` frames, the STFT engine whole hops covering B, the
    channelizer decimated groups. The route builder threads it as the
    next allocator's ``block_size`` so downstream stateful ops size their
    buffers for what actually arrives (``None`` = width-preserving)."""

    output: SignalProperties = None  # type: ignore[assignment]
    step: ProcessStepFn = None  # type: ignore[assignment]
    out_capacity: Optional[int] = None

    def __post_init__(self):
        if self.output is None:
            raise ValueError("Processor requires output SignalProperties")
        if self.step is None:
            raise ValueError("Processor requires a step fn")


@dataclasses.dataclass
class Sink(_Component):
    """Destination of signal (``pipe.go:69-81``)."""

    step: Optional[SinkStepFn] = None
    receive: Optional[Callable[[np.ndarray], None]] = None

    def __post_init__(self):
        if self.step is None and self.receive is None:
            raise ValueError("Sink requires a device step fn or a host receive fn")


# Allocator function types (reference line.go:24-35). Python being
# structurally typed these are aliases; the signatures are the contract:
#   SourceAllocatorFunc(mctx, block_size) -> Source
#   ProcessorAllocatorFunc(mctx, block_size, input: SignalProperties) -> Processor
#   SinkAllocatorFunc(mctx, block_size, input: SignalProperties) -> Sink
# Allocators pre-build state pytrees and close over resources; they may raise
# to abort pipe construction (wrapped into AllocationError by the router).
SourceAllocatorFunc = Callable[[mutable.Context, int], Source]
ProcessorAllocatorFunc = Callable[[mutable.Context, int, SignalProperties], Processor]
SinkAllocatorFunc = Callable[[mutable.Context, int, SignalProperties], Sink]
