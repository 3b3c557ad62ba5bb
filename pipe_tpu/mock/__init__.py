"""Mock components — the test kit (reference ``mock/mock.go:15-192``).

Deterministic generators, pass-through processors, and capture sinks with
message/sample counters, hook spies, and the full fault-injection matrix
(``error_on_make`` / ``error_on_call`` / ``error_on_start`` /
``error_on_flush``), proving the component extension API from outside the
core package.

Counters for Source/Processor live *on device* inside the component state
(they must advance inside the jitted block-step); the mock objects expose
them as host properties. The Sink is a host-boundary component, so its
counters and captured values are plain host state — mirroring the reference
where sinks are where data leaves the pipeline.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from pipe_tpu import mutable
from pipe_tpu.components import Processor as ProcessorComponent
from pipe_tpu.components import Sink as SinkComponent
from pipe_tpu.components import Source as SourceComponent
from pipe_tpu.signal import Signal, SignalProperties


@dataclasses.dataclass
class Hooks:
    """Start/flush hook spies with error injection
    (``mock/mock.go:23-33,49-58``)."""

    started: bool = False
    flushed: bool = False
    error_on_start: Optional[Exception] = None
    error_on_flush: Optional[Exception] = None

    def start(self):
        self.started = True
        if self.error_on_start is not None:
            raise self.error_on_start

    def flush(self):
        self.flushed = True
        if self.error_on_flush is not None:
            raise self.error_on_flush


class _MockBase:
    """Shared mock plumbing: hook spies, mutation spy, fault injection."""

    def __init__(self, *, error_on_start=None, error_on_flush=None, error_on_call=None, error_on_make=None):
        self.hooks = Hooks(error_on_start=error_on_start, error_on_flush=error_on_flush)
        self.error_on_call = error_on_call
        self.error_on_make = error_on_make
        self.mutated = False
        self.context: mutable.Context = mutable.IMMUTABLE
        self._component = None

    # hook spies
    @property
    def started(self) -> bool:
        return self.hooks.started

    @property
    def flushed(self) -> bool:
        return self.hooks.flushed

    def mock_mutation(self) -> mutable.Mutation:
        """A mutation that flips a host-side spy flag
        (``mock/mock.go:121-127``)."""

        def fn():
            self.mutated = True

        return self.context.mutate(fn)

    def _host_pre(self):
        if self.error_on_call is not None:
            raise self.error_on_call


class Source(_MockBase):
    """Constant-value generator with a frame limit
    (``mock/mock.go:61-109``).

    Produces ``value`` on every channel until ``limit`` frames have been
    generated; the final block is partial if ``limit % block_size != 0``;
    the next step reports EOF without a message — exactly the reference's
    SourceFunc contract. ``interval`` sleeps on the host per block for
    timing tests (``mock/mock.go:66,93``).
    """

    def __init__(
        self,
        *,
        value: float = 0.0,
        channels: int = 1,
        sample_rate: float = 44100.0,
        limit: Optional[int] = None,
        interval: float = 0.0,
        error_on_call=None,
        error_on_make=None,
        error_on_start=None,
        error_on_flush=None,
    ):
        super().__init__(
            error_on_start=error_on_start,
            error_on_flush=error_on_flush,
            error_on_call=error_on_call,
            error_on_make=error_on_make,
        )
        self.value = value
        self.channels = channels
        self.sample_rate = sample_rate
        self.limit = limit
        self.interval = interval

    def source(self):
        """Returns a SourceAllocatorFunc (``mock/mock.go:76-109``)."""

        def alloc(mctx: mutable.Context, block_size: int) -> SourceComponent:
            if self.error_on_make is not None:
                raise self.error_on_make
            self.context = mctx
            limit = self.limit
            channels = self.channels
            # On a mesh-placed pipe the step runs inside shard_map: generate
            # this device's LOCAL shard (the constant value is the same
            # everywhere; counters stay replicated scalars).
            from pipe_tpu.parallel.meshctx import current_mesh

            mesh = current_mesh()
            gen_channels, gen_block = channels, block_size
            if mesh is not None:
                from pipe_tpu.parallel.mesh import CH_AXIS, TIME_AXIS

                # ceil: a channel count that doesn't divide the axis pads
                # up; the executor zeroes the pad rows after the step and
                # the sink slices them off (device-source channel padding)
                ch = mesh.shape[CH_AXIS]
                gen_channels = -(-channels // ch)
                gen_block = block_size // mesh.shape[TIME_AXIS]

            def step(state, params):
                produced = state["produced"]
                if limit is None:
                    read = jnp.asarray(block_size, jnp.int32)
                    eof = jnp.asarray(False)
                else:
                    left = jnp.asarray(limit, jnp.int32) - produced
                    read = jnp.minimum(jnp.asarray(block_size, jnp.int32), left)
                    eof = read <= 0
                    read = jnp.maximum(read, 0)
                data = jnp.full(
                    (gen_channels, gen_block), params["value"], dtype=jnp.float32
                )
                new_state = {
                    "produced": produced + read,
                    "messages": state["messages"]
                    + jnp.where(read > 0, 1, 0).astype(jnp.int32),
                }
                return new_state, Signal(data, read), eof

            host_pre = None
            if self.error_on_call is not None or self.interval > 0:

                def host_pre():
                    if self.interval > 0:
                        time.sleep(self.interval)
                    self._host_pre()

            comp = SourceComponent(
                output=SignalProperties(
                    sample_rate=self.sample_rate, channels=channels
                ),
                step=step,
                state={
                    "produced": jnp.asarray(0, jnp.int32),
                    "messages": jnp.asarray(0, jnp.int32),
                },
                params={"value": jnp.asarray(self.value, jnp.float32)},
                start=self.hooks.start,
                flush=self.hooks.flush,
                host_pre=host_pre,
            )
            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                comp.state_spec = {"produced": P(), "messages": P()}
                comp.param_spec = {"value": P()}
            self._component = comp
            return comp

        return alloc

    @property
    def messages(self) -> int:
        return int(self._component.state["messages"])

    @property
    def samples(self) -> int:
        return int(self._component.state["produced"])

    def reset(self) -> mutable.Mutation:
        """Mutation resetting the counters (``mock/mock.go:112-118``), used
        as a restart initializer."""

        def fn():
            self._component.update_state(
                lambda s: {k: jnp.zeros_like(v) for k, v in s.items()}
            )

        return self.context.mutate(fn)

    def set_value(self, value: float) -> mutable.Mutation:
        """Mutation changing the generated value mid-stream — the canonical
        'no retrace' parameter push."""

        def fn():
            self._component.set_param("value", jnp.asarray(value, jnp.float32))

        return self.context.mutate(fn)


class Processor(_MockBase):
    """Pass-through processor counting frames (``mock/mock.go:130-157``)."""

    def __init__(self, *, error_on_call=None, error_on_make=None, error_on_start=None, error_on_flush=None):
        super().__init__(
            error_on_start=error_on_start,
            error_on_flush=error_on_flush,
            error_on_call=error_on_call,
            error_on_make=error_on_make,
        )

    def processor(self):
        """Returns a ProcessorAllocatorFunc (``mock/mock.go:139-157``)."""

        def alloc(
            mctx: mutable.Context, block_size: int, props: SignalProperties
        ) -> ProcessorComponent:
            if self.error_on_make is not None:
                raise self.error_on_make
            self.context = mctx

            def step(state, params, sig: Signal):
                new_state = {
                    "messages": state["messages"] + jnp.asarray(1, jnp.int32),
                    "samples": state["samples"] + sig.frames,
                }
                return new_state, sig

            comp = ProcessorComponent(
                output=props,
                step=step,
                state={
                    "messages": jnp.asarray(0, jnp.int32),
                    "samples": jnp.asarray(0, jnp.int32),
                },
                params={},
                start=self.hooks.start,
                flush=self.hooks.flush,
                host_pre=self._host_pre if self.error_on_call is not None else None,
            )
            self._component = comp
            return comp

        return alloc

    @property
    def messages(self) -> int:
        return int(self._component.state["messages"])

    @property
    def samples(self) -> int:
        return int(self._component.state["samples"])


class Sink(_MockBase):
    """Capture-or-discard sink (``mock/mock.go:160-192``). Host-boundary:
    counters and captured values are host state."""

    def __init__(self, *, discard: bool = False, error_on_call=None, error_on_make=None, error_on_start=None, error_on_flush=None):
        super().__init__(
            error_on_start=error_on_start,
            error_on_flush=error_on_flush,
            error_on_call=error_on_call,
            error_on_make=error_on_make,
        )
        self.discard = discard
        self.messages = 0
        self.samples = 0
        self._values: List[np.ndarray] = []

    def sink(self):
        """Returns a SinkAllocatorFunc (``mock/mock.go:170-192``)."""

        def alloc(
            mctx: mutable.Context, block_size: int, props: SignalProperties
        ) -> SinkComponent:
            if self.error_on_make is not None:
                raise self.error_on_make
            self.context = mctx

            def receive(block: np.ndarray):
                if self.error_on_call is not None:
                    raise self.error_on_call
                if not self.discard:
                    self._values.append(np.array(block))
                self.messages += 1
                self.samples += block.shape[1]

            comp = SinkComponent(
                receive=receive,
                start=self.hooks.start,
                flush=self.hooks.flush,
            )
            self._component = comp
            return comp

        return alloc

    @property
    def values(self) -> np.ndarray:
        """Captured samples as ``(channels, total_frames)``."""
        if not self._values:
            return np.zeros((0, 0), dtype=np.float32)
        return np.concatenate(self._values, axis=1)
