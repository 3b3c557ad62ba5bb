"""Graph optimization passes over Lines.

The builder composes stage step-functions into one jitted block-step, so
XLA already fuses elementwise work. This module handles *algebraic* fusion
XLA cannot see: adjacent stages that are mathematically one operator.

Currently: FIR -> Resampler collapses into a single combined polyphase
bank (``pipe_tpu.ops.fused``, exact identity; one fewer stage, one fewer
HBM round trip, one fused sharding halo).

Usage::

    line = pipe_tpu.Line(source=..., processors=pipe_tpu.Processors(
        fir.processor(), rs.processor(), gain.processor()), sink=...)
    line = pipe_tpu.optimize.fuse(line)     # FIR+Resampler -> one stage
    pipe_tpu.run(block, line)

Mutations keep working through the ORIGINAL factory objects: fusion
installs a delegate, so ``fir.set_taps(...)`` after ``fuse()`` routes to
the fused component's taps parameter.
"""

from __future__ import annotations

import dataclasses
from typing import List

from pipe_tpu.graph import Line


def fuse(line: Line) -> Line:
    """Return a Line with adjacent fusible processor pairs collapsed.

    Processor allocators advertise fusibility via a ``fusion_tag``
    attribute (set by the op factories); unknown allocators pass through
    untouched. Currently fuses ``('fir', f)`` followed by
    ``('resample', r)`` when the FIR has shared (1-D) taps.
    """
    from pipe_tpu.ops.fused import FIRResampler
    from pipe_tpu.parallel import sharded

    def _fuse_pair(fir_obj, rs_obj):
        if isinstance(fir_obj, sharded.FIR):
            # sharded pair -> sharded fused stage (one halo, one matmul)
            if fir_obj._taps.ndim != 1:
                return None
            fused = sharded.FIRResample(
                fir_obj._taps, *rs_obj._args
            )
            fir_obj._delegate = fused
            return fused
        if fir_obj._init_taps.ndim != 1:
            return None
        fused = FIRResampler(
            fir_obj._init_taps,
            rs_obj.up,
            rs_obj.down,
            taps_per_phase=rs_obj.taps_per_phase,
        )
        # route future set_taps / set_bank pushes through the fused stage
        fir_obj._delegate = fused
        rs_obj._delegate = fused
        return fused

    procs: List = list(line.processors)
    out: List = []
    i = 0
    while i < len(procs):
        a = procs[i]
        b = procs[i + 1] if i + 1 < len(procs) else None
        ta = getattr(a, "fusion_tag", None)
        tb = getattr(b, "fusion_tag", None)
        fused = None
        if (
            ta is not None
            and tb is not None
            and ta[0] == "fir"
            and tb[0] == "resample"
            and isinstance(ta[1], sharded.FIR) == isinstance(tb[1], sharded.Resample)
        ):
            fused = _fuse_pair(ta[1], tb[1])
        if fused is not None:
            out.append(fused.processor())
            i += 2
        else:
            out.append(a)
            i += 1
    return dataclasses.replace(line, processors=out)
