"""Executors — the per-block hot path.

The reference executes one buffer per component per sweep, with goroutines
and channels between stages (``run.go:38-52``, ``pipe.go:381-471``). Here the
whole ``Source -> Processors -> Sink`` sweep for one block is ONE jitted XLA
computation built by :meth:`LineExecutor._build_step`: XLA fuses the stage
chain, so the inter-stage "transport" is HBM/VMEM dataflow, not channels.

EOF protocol: the source step returns a traced ``eof`` bool. The executor
gates every component's state update on ``not eof`` inside the jitted step
(so a traced-past-EOF block is a no-op) and reads the flag back on the host
to terminate the stream — the analog of ``io.EOF`` propagating through the
line sweep (``run.go:44-47``).

:class:`MultiLineExecutor` round-robins several line executors in one driver
thread, flushing and splicing out lines as they hit EOF, exactly as the
reference's sync mode does (``run.go:113-132``).
"""

from __future__ import annotations

import threading
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pipe_tpu import mutable
from pipe_tpu.errors import FlushError, StartError, ret_exec_errors
from pipe_tpu.graph import Route
from pipe_tpu.signal import Signal


class _EOF:
    """Sentinel returned by ``execute`` when the stream is done."""

    def __repr__(self):
        return "EOF"


EOF = _EOF()


def _gate(valid, new_tree, old_tree):
    """Select ``new_tree`` where ``valid`` else ``old_tree`` leafwise —
    the structural guard that nothing advances past EOF."""
    return jax.tree.map(lambda n, o: jnp.where(valid, n, o), new_tree, old_tree)


class LineExecutor:
    """Executes one bound line, one block per :meth:`execute` call.

    Keeps the live component states (device pytrees) and host-owned params;
    rebuilds + recompiles its fused step when the route changes (live
    InsertProcessor) — the recompile happens at a block boundary so no sample
    is lost or duplicated.
    """

    def __init__(self, route: Route, block_size: int, stats=None, lookahead: int = 1,
                 batch_blocks: int = 1, mesh=None):
        self.route = route
        self.block_size = block_size
        # Device mesh: when set, the fused line step is shard_map'ed over it
        # (channels x time) and component state/params shard by each
        # component's declared PartitionSpec trees — the sharded-execution
        # path behind the same Line/Pipe API (SURVEY §2 parallelism table).
        self.mesh = mesh
        self.started = 0  # how many components started, for rollback flush
        self._step = None  # compiled step, built lazily
        self._zero_feed: Optional[np.ndarray] = None
        # Destination assigned by the runtime for async lines (the sync-group
        # destination lives on the MultiLineExecutor).
        self.dest: Optional[mutable.Destination] = None
        # Opt-in per-block timing (pipe_tpu.profiling.LineStats); None = off.
        self.stats = stats
        # Dispatch pipelining: keep up to `lookahead` blocks in flight before
        # forcing the EOF flag / sink output of the oldest one. JAX dispatch
        # is async, so with lookahead > 1 the host round-trip per block
        # overlaps with device compute — essential when the device is remote.
        # Safe to speculate past EOF: every state update is gated on ~eof
        # inside the jitted step, so extra blocks are no-ops. A pushed
        # mutation still lands at a block boundary, but up to `lookahead`
        # blocks later than the reference's next-buffer guarantee — hence
        # the default of 1 (exact reference semantics).
        self.lookahead = max(1, lookahead)
        # Dispatch batching: compile a lax.scan over `batch_blocks` blocks so
        # ONE dispatch advances the stream by k blocks — amortizes per-call
        # overhead (dominant on remote/tunneled devices). Only applies to
        # device-source lines (a host `feed` callback must run per block);
        # mutation granularity coarsens to k blocks, like lookahead. k=1 is
        # exact reference semantics.
        self.batch_blocks = max(1, batch_blocks)
        self._pending: list = []  # in-flight resolution entries, oldest first

    # -- step construction ------------------------------------------------

    def _invalidate(self):
        self._step = None

    # -- mesh (sharded) step -------------------------------------------------

    @staticmethod
    def _spec_like(tree, explicit):
        """A PartitionSpec tree for ``tree``: the component's declared spec,
        or fully replicated when none is declared."""
        from jax.sharding import PartitionSpec as P

        if explicit is not None:
            return explicit
        return jax.tree.map(lambda _: P(), tree)

    def _component_specs(self):
        comps = self.route.components()
        state_specs = []
        param_specs = []
        for c in comps:
            state_specs.append(self._spec_like(c.state, getattr(c, "state_spec", None)))
            param_specs.append(self._spec_like(c.params, getattr(c, "param_spec", None)))
        src_s, *proc_s, sink_s = state_specs
        src_p, *proc_p, sink_p = param_specs
        return (
            (src_s, tuple(proc_s), sink_s),
            (src_p, tuple(proc_p), sink_p),
        )

    def _validate_mesh_route(self):
        from pipe_tpu.parallel.mesh import CH_AXIS, TIME_AXIS

        t_shards = self.mesh.shape[TIME_AXIS]
        ch_shards = self.mesh.shape[CH_AXIS]
        if self.block_size % t_shards:
            raise ValueError(
                f"block_size {self.block_size} not divisible by the mesh "
                f"time axis ({t_shards})"
            )
        cin = self.route.source.output.channels
        if cin % ch_shards:
            raise ValueError(
                f"source channels {cin} not divisible by the mesh channel "
                f"axis ({ch_shards})"
            )
        if t_shards > 1:
            for c in self.route.components():
                if jax.tree.leaves(c.state) and not hasattr(c, "state_spec"):
                    raise ValueError(
                        f"stateful component {c!r} has no state_spec: on a "
                        "time-sharded mesh, stream state must declare its "
                        "sharding (use the pipe_tpu.parallel.components kit "
                        "or set state_spec/param_spec explicitly)"
                    )

    def _place_states(self):
        """Pre-place component states with their run-time NamedSharding so
        the first step's donation can alias them (a freshly-created
        unsharded array cannot back a sharded output buffer)."""
        from jax.sharding import NamedSharding

        for c in self.route.components():
            spec = self._spec_like(c.state, getattr(c, "state_spec", None))
            leaves, treedef = jax.tree.flatten(c.state)
            if not leaves:
                continue
            specs = treedef.flatten_up_to(spec)
            c.state = treedef.unflatten(
                [
                    jax.device_put(l, NamedSharding(self.mesh, s))
                    for l, s in zip(leaves, specs)
                ]
            )

    def _build_step_mesh(self):
        """One jitted, shard_map'ed chunk step for the whole line: the same
        fused Source -> Processors -> Sink sweep as :meth:`_build_step`, but
        with the time axis of every block sharded over the mesh and stream
        state crossing device boundaries as halos inside each component's
        step (``pipe_tpu.parallel`` stage mechanics)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from pipe_tpu.parallel.mesh import CH_AXIS, TIME_AXIS

        self._validate_mesh_route()
        self._place_states()

        mesh = self.mesh
        src = self.route.source
        procs = list(self.route.processors)
        sink = self.route.sink
        has_feed = src.feed is not None
        want_out = sink.receive is not None
        has_dev_sink = sink.step is not None
        t_shards = mesh.shape[TIME_AXIS]
        n_local_in = self.block_size // t_shards

        state_specs, param_specs = self._component_specs()
        # the signal is channel-sharded until a channel-reducing stage
        # (psum mixer) replicates it over the channel axis
        out_ch = CH_AXIS
        for p in procs:
            if getattr(p, "reduces_channels", False):
                out_ch = None
        sig_in_spec = (P(CH_AXIS, TIME_AXIS), P())
        out_spec = (P(out_ch, TIME_AXIS), P()) if want_out else None

        def inner(states, params, fed):
            src_state, proc_states, sink_state = states
            src_params, proc_params, sink_params = params

            if has_feed:
                data, frames = fed
                eof = jnp.asarray(False)
            else:
                new_src_state, sig, eof = src.step(src_state, src_params)
                data, frames = sig.data, sig.frames
                eof = jnp.asarray(eof, bool)
                src_state = _gate(~eof, new_src_state, src_state)

            # EOF / partial-final-chunk protocol: zero everything past the
            # global valid count so stage math past the stream end is inert.
            # Each device masks by its GLOBAL positions.
            start = jax.lax.axis_index(TIME_AXIS) * n_local_in
            idx = start + jnp.arange(data.shape[1], dtype=jnp.int32)
            data = jnp.where(idx[None, :] < frames, data, 0.0)
            sig = Signal(data, frames)

            valid = ~eof
            new_proc_states = []
            for proc, pstate, pparams in zip(procs, proc_states, proc_params):
                new_pstate, sig = proc.step(pstate, pparams, sig)
                new_proc_states.append(_gate(valid, new_pstate, pstate))

            if has_dev_sink:
                new_sink_state = sink.step(sink_state, sink_params, sig)
                sink_state = _gate(valid, new_sink_state, sink_state)

            out = (sig.data, sig.frames) if want_out else None
            return (src_state, tuple(new_proc_states), sink_state), out, eof

        k = self.batch_blocks
        if k > 1 and not has_feed:
            def scanned(states, params, fed):
                def body(carry, _):
                    new_states, out, eof = inner(carry, params, None)
                    return new_states, (out if out is not None else (), eof)

                states, (outs, eofs) = jax.lax.scan(body, states, None, length=k)
                return states, outs, eofs

            mapped = shard_map(
                scanned,
                mesh=mesh,
                in_specs=(state_specs, param_specs, None),
                out_specs=(
                    state_specs,
                    ((P(None, out_ch, TIME_AXIS), P()) if want_out else ()),
                    P(),
                ),
                check_vma=False,
            )
            return jax.jit(mapped, donate_argnums=(0,))

        mapped = shard_map(
            inner,
            mesh=mesh,
            in_specs=(
                state_specs,
                param_specs,
                sig_in_spec if has_feed else None,
            ),
            out_specs=(state_specs, out_spec, P()),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=(0,))

    def _build_step(self):
        if self.mesh is not None:
            return self._build_step_mesh()
        src = self.route.source
        procs = list(self.route.processors)
        sink = self.route.sink
        has_feed = src.feed is not None
        want_out = sink.receive is not None
        has_dev_sink = sink.step is not None
        block = self.block_size

        def step(states, params, fed: Optional[Signal]):
            src_state, proc_states, sink_state = states
            src_params, proc_params, sink_params = params

            if has_feed:
                sig = fed
                eof = jnp.asarray(False)
            else:
                new_src_state, sig, eof = src.step(src_state, src_params)
                eof = jnp.asarray(eof, bool)
                src_state = _gate(~eof, new_src_state, src_state)

            valid = ~eof
            new_proc_states = []
            for proc, pstate, pparams in zip(procs, proc_states, proc_params):
                new_pstate, sig = proc.step(pstate, pparams, sig)
                new_proc_states.append(_gate(valid, new_pstate, pstate))

            if has_dev_sink:
                new_sink_state = sink.step(sink_state, sink_params, sig)
                sink_state = _gate(valid, new_sink_state, sink_state)

            out = sig if want_out else None
            return (src_state, tuple(new_proc_states), sink_state), out, eof

        k = self.batch_blocks
        if k > 1 and not has_feed:
            # scan k blocks per dispatch; outputs stack on a leading axis.
            # States are gated on ~eof inside `step`, so blocks scanned past
            # EOF are no-ops and the host drops them at resolution.
            def scan_step(states, params, fed):
                def body(carry, _):
                    new_states, out, eof = step(carry, params, None)
                    out_leaves = (
                        (out.data, out.frames) if out is not None else ()
                    )
                    return new_states, (out_leaves, eof)

                states, (outs, eofs) = jax.lax.scan(
                    body, states, None, length=k
                )
                return states, outs, eofs

            # Old states are dead after the step: donate their buffers so
            # large carried state (OLS FDL planes can be MBs) is updated in
            # place instead of copied every dispatch (the pool-allocator
            # analog, reference pipe.go:490-492).
            return jax.jit(scan_step, donate_argnums=(0,))
        return jax.jit(step, donate_argnums=(0,))

    def _states(self):
        return (
            self.route.source.state,
            tuple(p.state for p in self.route.processors),
            self.route.sink.state,
        )

    def _params(self):
        return (
            self.route.source.params,
            tuple(p.params for p in self.route.processors),
            self.route.sink.params,
        )

    def _writeback(self, states):
        src_state, proc_states, sink_state = states
        self.route.source.state = src_state
        for p, s in zip(self.route.processors, proc_states):
            p.state = s
        self.route.sink.state = sink_state

    # -- hot path ----------------------------------------------------------

    def execute(self):
        """Run one block through the line. Returns :data:`EOF` when the
        stream is done, else None. Raises on component failure."""
        if self.stats is None:
            return self._execute()
        from pipe_tpu.profiling import _Timer

        with _Timer(self.stats):
            return self._execute()

    def _execute(self):
        src = self.route.source
        sink = self.route.sink

        # Host-side pre hooks in stage order (fault injection, pacing).
        for comp in self.route.components():
            if comp.host_pre is not None:
                comp.host_pre()

        fed = None
        fed_frames = 0
        if src.feed is not None:
            data = src.feed(self.block_size)
            if data is None:
                # host EOF: resolve everything still in flight first so the
                # trailing blocks reach the sink, then end the stream.
                self.drain()
                return EOF
            data = np.asarray(data)
            if data.ndim == 1:
                data = data[None, :]
            fed_frames = data.shape[1]
            if fed_frames < self.block_size:
                pad = np.zeros(
                    (data.shape[0], self.block_size - fed_frames), dtype=data.dtype
                )
                data = np.concatenate([data, pad], axis=1)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from pipe_tpu.parallel.mesh import CH_AXIS, TIME_AXIS

                fed = (
                    jax.device_put(
                        np.asarray(data, np.float32),
                        NamedSharding(self.mesh, P(CH_AXIS, TIME_AXIS)),
                    ),
                    jax.device_put(
                        np.asarray(fed_frames, np.int32),
                        NamedSharding(self.mesh, P()),
                    ),
                )
            else:
                fed = Signal(
                    jnp.asarray(data, jnp.float32), jnp.asarray(fed_frames, jnp.int32)
                )

        if self._step is None:
            self._step = self._build_step()
        scanned = self.batch_blocks > 1 and src.feed is None

        states, out, eof = self._step(self._states(), self._params(), fed)
        self._writeback(states)

        if scanned:
            # out = (data[k,...], frames[k]) or (); eof = eofs[k]
            self._pending.append((out if out else None, eof, True))
            if self.stats is not None:
                self.stats.blocks += self.batch_blocks - 1
        else:
            if out is not None and isinstance(out, Signal):
                out = (out.data, out.frames)
            self._pending.append((out, eof, False))
        if len(self._pending) >= self.lookahead:
            # Resolve half the window in ONE host transfer: fetching each
            # block's flag individually would cost one device->host round
            # trip per block, which defeats the pipelining on remote TPUs.
            return self._resolve_batch(max(1, self.lookahead // 2))
        return None

    def _resolve_batch(self, k: int):
        """Force the ``k`` oldest in-flight entries with a single
        ``jax.device_get``, then deliver outputs/EOF in stream order. An
        entry is one block, or ``batch_blocks`` stacked blocks from a
        scanned dispatch."""
        sink = self.route.sink
        batch, self._pending = self._pending[:k], self._pending[k:]
        want_out = sink.receive is not None
        fetched = jax.device_get([(out, eof) for out, eof, _ in batch])
        for (out, eof), (_, _, stacked) in zip(fetched, batch):
            if not stacked:
                blocks = [(bool(eof), out)]
            else:
                n_blk = np.shape(eof)[0]
                blocks = [
                    (
                        bool(eof[j]),
                        (out[0][j], out[1][j]) if out is not None else None,
                    )
                    for j in range(n_blk)
                ]
            for done, blk in blocks:
                if done:
                    # blocks dispatched/scanned after EOF are gated no-ops
                    self._pending.clear()
                    return EOF
                if want_out and blk is not None:
                    data, frames = blk
                    n = int(frames)
                    if n > 0:
                        sink.receive(data[:, :n])
        return None

    def drain(self):
        """Resolve every in-flight block (normal end-of-stream and flush
        path) so no sample is lost. Returns EOF if one was found."""
        res = None
        while self._pending:
            r = self._resolve_batch(len(self._pending))
            if r is EOF:
                res = EOF
        return res

    # -- lifecycle (reference run.go:54-74) --------------------------------

    def start_hook(self):
        """Start components in order; stop at the first failure, remembering
        how many started so only those get flushed (``run.go:64-74``)."""
        for comp in self.route.components():
            if comp.start is not None:
                comp.start()  # raises -> caller handles rollback
            self.started += 1

    def flush_hook(self):
        """Flush the started components in order, collecting every error
        (``run.go:54-62``). In-flight lookahead blocks are resolved first so
        a clean stop never drops delivered samples (on the error/cancel path
        resolution failures join the flush error set)."""
        errors = []
        try:
            self.drain()
        except Exception as e:  # noqa: BLE001 - fan-in semantics
            errors.append(e)
        for comp in self.route.components()[: self.started]:
            if comp.flush is not None:
                try:
                    comp.flush()
                except Exception as e:  # noqa: BLE001 - fan-in semantics
                    errors.append(e)
        # Reset for restart (a Pipe can be started again after completion,
        # reference pipe_test.go:108-131) and to make double-flush a no-op.
        self.started = 0
        err = ret_exec_errors(errors)
        if err is not None:
            raise FlushError(str(err)) from err

    # -- live surgery -------------------------------------------------------

    def insert_processor(self, pos: int, proc) -> None:
        """Splice a started processor into the route at ``pos`` and recompile
        at the next block boundary (the TPU-native form of the reference's
        two-phase handoff, ``pipe.go:297-365`` / ``run.go:146-169``)."""
        self.route.processors.insert(pos, proc)
        self.started += 1
        self._invalidate()

    def apply_mutations(self, ms: mutable.Mutations) -> None:
        """Apply a delivered batch to this line's components in stage order
        (the reference applies in-band per stage, ``pipe.go:384-392,433,465``;
        block-boundary application is the same ordering at our buffer
        granularity)."""
        seen = set()
        for comp in self.route.components():
            if comp.context in seen:
                continue
            seen.add(comp.context)
            ms.apply_to(comp.context)


class MultiLineExecutor:
    """Round-robins multiple line executors in one driver thread
    (``run.go:28-34,113-132``). All lines share one mutable context and one
    mutation destination."""

    def __init__(
        self,
        context: mutable.Context = mutable.IMMUTABLE,
        dest: Optional[mutable.Destination] = None,
        executors: Optional[List[LineExecutor]] = None,
    ):
        self.context = context
        self.dest = dest
        self.executors: List[LineExecutor] = executors or []

    def start_hook(self):
        """Start every line; on failure flush everything already started and
        raise (``run.go:78-99``)."""
        start_err = None
        for le in self.executors:
            try:
                le.start_hook()
            except Exception as e:  # noqa: BLE001
                start_err = e
                break
        if start_err is None:
            return
        err = StartError(f"error starting lines: {start_err}")
        err.__cause__ = start_err
        try:
            self.flush_hook()
        except Exception as flush_err:  # noqa: BLE001
            err = StartError(
                f"error flushing lines: {flush_err} during start error: {start_err}"
            )
            err.__cause__ = flush_err
        raise err

    def flush_hook(self):
        errors = []
        for le in self.executors:
            try:
                le.flush_hook()
            except Exception as e:  # noqa: BLE001
                errors.append(e)
        err = ret_exec_errors(errors)
        if err is not None:
            raise err

    def execute(self):
        """One sweep over all live lines; EOF'd lines are flushed and spliced
        out; returns EOF once no lines remain (``run.go:113-132``)."""
        i = 0
        while i < len(self.executors):
            res = self.executors[i].execute()  # raises on error
            if res is EOF:
                self.executors[i].flush_hook()  # raises -> becomes the error
                del self.executors[i]
                if self.executors:
                    continue
                return EOF
            i += 1
        return None

    def apply_mutations(self, ms: mutable.Mutations) -> None:
        for le in self.executors:
            le.apply_mutations(ms)

    def adopt_line(self, le: LineExecutor) -> None:
        """Start and append a new line at a block boundary (the analog of
        ``multiLineExecutor.addRoute``, ``run.go:134-144``)."""
        le.start_hook()  # raises -> delivered as executor error
        self.executors.append(le)
