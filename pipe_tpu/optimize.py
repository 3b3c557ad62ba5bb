"""Graph optimization passes over Lines.

The builder composes stage step-functions into one jitted block-step, so
XLA already fuses elementwise work. This module handles *algebraic* fusion
XLA cannot see: adjacent stages that are mathematically one operator.

Rewrites (streaming AND sharded backends):

- **FIR + Resampler** -> one combined polyphase bank
  (``pipe_tpu.ops.fused.FIRResampler`` / ``parallel.sharded.FIRResample``):
  exact identity, one fewer stage, one HBM round trip and one sharding
  halo saved.
- **Biquad cascade**: a run of adjacent Biquads (matching ``refine`` /
  ``precision``) collapses into ONE multi-section cascade component
  (``ops.fused.BiquadCascade`` / ``sharded.BiquadCascade``) — one
  ``biquad_block`` sweep over stacked SOS rows instead of a component per
  filter.
- **FIR cascade** (r4): a run of adjacent FIRs collapses into one
  component whose combined taps ``conv(t_0, ..., t_{n-1})`` are rebuilt
  inside jit from the traced member taps — exact (convolution is
  associative), n-1 fewer HBM round trips, one sharding halo of
  ``sum(T_i - 1)``; each original ``FIR`` retunes its own slot. The last
  FIR of a run is left out when a fusable Resampler follows, so the
  FIR+Resampler combined-bank rewrite still fires on it.
- **Gain folding**: a Gain adjacent to a FIR folds into the taps
  (``taps * g`` — T mults instead of an N-sample pass; exact, since
  per-channel convolution commutes with per-channel scaling); a Gain
  adjacent to a ChannelMix/Mix folds into the matrix (columns for an
  upstream gain, rows for a downstream one); a Gain adjacent to an
  OLSConvolve folds into the stage output (r4; exact by linearity — the
  win is one fewer graph component).

  Steady-state output is identical for either order. One transient
  caveat: a LIVE ``set_gain`` on a folded ``gain -> FIR`` pair applies
  the new gain at the OUTPUT from exactly sample ``N*block`` (the folded
  form is ``g * (h * x)``), whereas the unfused pair would carry the old
  gain through the filter's (T-1)-sample tail. For ``FIR -> gain``, mix
  folding (memoryless), and the biquad cascade, retune semantics are
  bit-for-bit those of the unfused graph.

Usage::

    line = pipe_tpu.Line(source=..., processors=pipe_tpu.Processors(
        fir.processor(), rs.processor(), gain.processor()), sink=...)
    line = pipe_tpu.optimize.fuse(line)
    pipe_tpu.run(block, line)

or opt in at build and let the runtime run the fixpoint on every line::

    pipe_tpu.run(block, line, optimize=True)
    pipe_tpu.Pipe(block, line, optimize=True)

Mutations keep working through the ORIGINAL factory objects: every
rewrite installs a delegate, so e.g. ``fir.set_taps(...)``,
``gain.set_gain(...)``, or ``eq.set_sos(...)`` after ``fuse()`` routes to
the fused component's parameters — all retrace-free (the fused steps
rebuild their effective coefficients inside jit from the traced values).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from pipe_tpu.graph import Line


def _tag(proc):
    return getattr(proc, "fusion_tag", None)


def _is_sharded(obj) -> bool:
    from pipe_tpu.parallel.components import ShardedOp

    return isinstance(obj, ShardedOp)


def _bq_key(obj) -> tuple:
    """(backend, refine, extended) — biquads fuse only within one key."""
    extended = (
        obj._precision == "extended"
        if _is_sharded(obj)
        else obj._extended
    )
    return _is_sharded(obj), getattr(obj, "_refine", True), extended


def _fuse_biquad_run(procs: List, i: int) -> Optional[tuple]:
    """A maximal run of >=2 adjacent same-backend biquads with matching
    refine/precision -> one cascade."""
    t = _tag(procs[i])
    if t is None or t[0] != "biquad":
        return None
    first = t[1]
    key = _bq_key(first)
    run = [first]
    j = i + 1
    while j < len(procs):
        tj = _tag(procs[j])
        if tj is None or tj[0] != "biquad" or _bq_key(tj[1]) != key:
            break
        run.append(tj[1])
        j += 1
    if len(run) < 2:
        return None
    if key[0]:
        from pipe_tpu.parallel import sharded

        fused = sharded.BiquadCascade(run)
    else:
        from pipe_tpu.ops.fused import BiquadCascade

        fused = BiquadCascade(run)
    for p in run:
        p._delegate = fused
    return fused, j - i


def _fuse_fir_resample(procs: List, i: int) -> Optional[tuple]:
    if i + 1 >= len(procs):
        return None
    ta, tb = _tag(procs[i]), _tag(procs[i + 1])
    if ta is None or tb is None or ta[0] != "fir" or tb[0] != "resample":
        return None
    fir_obj, rs_obj = ta[1], tb[1]
    if _is_sharded(fir_obj) != _is_sharded(rs_obj):
        return None
    if _is_sharded(fir_obj):
        from pipe_tpu.parallel import sharded

        if fir_obj._taps.ndim != 1:
            return None
        fused = sharded.FIRResample(fir_obj._taps, *rs_obj._args)
        fir_obj._delegate = fused
        return fused, 2
    from pipe_tpu.ops.fused import FIRResampler

    if fir_obj._init_taps.ndim != 1:
        return None
    fused = FIRResampler(
        fir_obj._init_taps,
        rs_obj.up,
        rs_obj.down,
        taps_per_phase=rs_obj.taps_per_phase,
    )
    fir_obj._delegate = fused
    rs_obj._delegate = fused
    return fused, 2


def _gain_value(gain_obj):
    return (
        gain_obj._gain if _is_sharded(gain_obj) else gain_obj._init_gain
    )


def _fir_taps(fir_obj):
    return fir_obj._taps if _is_sharded(fir_obj) else fir_obj._init_taps


def _fuse_gain_fir(procs: List, i: int) -> Optional[tuple]:
    """(gain, fir) or (fir, gain) -> FIR with folded gain (they commute
    per channel)."""
    if i + 1 >= len(procs):
        return None
    ta, tb = _tag(procs[i]), _tag(procs[i + 1])
    if ta is None or tb is None:
        return None
    kinds = (ta[0], tb[0])
    if kinds == ("gain", "fir"):
        gain_obj, fir_obj = ta[1], tb[1]
        # don't starve the bigger rewrite: if the FIR is followed by a
        # same-backend Resampler AND the FIR+Resampler rule can actually
        # fire (1-D taps only), let it fuse first (the gain then stays a
        # cheap standalone stage, as before this rule existed). Deferring
        # on 2-D per-channel taps would drop BOTH rewrites (ADVICE r3).
        if i + 2 < len(procs):
            tc = _tag(procs[i + 2])
            if (
                tc is not None
                and tc[0] == "resample"
                and _is_sharded(tc[1]) == _is_sharded(fir_obj)
                and _fir_taps(fir_obj).ndim == 1
            ):
                return None
    elif kinds == ("fir", "gain"):
        fir_obj, gain_obj = ta[1], tb[1]
    else:
        return None
    if _is_sharded(gain_obj) != _is_sharded(fir_obj):
        return None
    if _is_sharded(gain_obj):
        from pipe_tpu.parallel import sharded

        fused = sharded.FIRGain(_fir_taps(fir_obj), _gain_value(gain_obj))
    else:
        from pipe_tpu.ops.fused import FIRWithGain

        fused = FIRWithGain(_fir_taps(fir_obj), _gain_value(gain_obj))
    gain_obj._delegate = fused
    fir_obj._delegate = fused
    return fused, 2


def _fuse_fir_run(procs: List, i: int) -> Optional[tuple]:
    """A maximal run of >=2 adjacent same-backend FIRs -> one cascade
    (combined taps conv'd inside jit; per-slot retunes stay live). The
    LAST FIR of the run is left out when a same-backend resampler with
    1-D-fusable taps follows, so the bigger FIR+Resampler combined-bank
    rewrite still fires on it."""
    t = _tag(procs[i])
    if t is None or t[0] != "fir":
        return None
    backend = _is_sharded(t[1])
    run = [t[1]]
    j = i + 1
    while j < len(procs):
        tj = _tag(procs[j])
        if tj is None or tj[0] != "fir" or _is_sharded(tj[1]) != backend:
            break
        run.append(tj[1])
        j += 1
    if j < len(procs):
        tn = _tag(procs[j])
        if (
            tn is not None
            and tn[0] == "resample"
            and _is_sharded(tn[1]) == backend
            and _fir_taps(run[-1]).ndim == 1
        ):
            run = run[:-1]
            j -= 1
    if len(run) < 2:
        return None
    if backend:
        from pipe_tpu.parallel import sharded

        fused = sharded.FIRCascade(run)
    else:
        from pipe_tpu.ops.fused import FIRCascade

        fused = FIRCascade(run)
    for part in run:
        # a per-part handle: part.set_taps routes to its own cascade slot
        part._delegate = fused.handle_for(part)
    return fused, j - i


def _fuse_gain_ols(procs: List, i: int) -> Optional[tuple]:
    """(gain, ols) or (ols, gain) -> OLS with folded gain (convolution is
    linear, so they commute per channel)."""
    if i + 1 >= len(procs):
        return None
    ta, tb = _tag(procs[i]), _tag(procs[i + 1])
    if ta is None or tb is None:
        return None
    kinds = (ta[0], tb[0])
    if kinds == ("gain", "ols"):
        gain_obj, ols_obj = ta[1], tb[1]
    elif kinds == ("ols", "gain"):
        ols_obj, gain_obj = ta[1], tb[1]
    else:
        return None
    if _is_sharded(gain_obj) != _is_sharded(ols_obj):
        return None
    if _is_sharded(gain_obj):
        from pipe_tpu.parallel import sharded

        fused = sharded.OLSGain(ols_obj._ir, _gain_value(gain_obj))
    else:
        from pipe_tpu.ops.fused import OLSWithGain

        fused = OLSWithGain(ols_obj._ir, _gain_value(gain_obj))
    gain_obj._delegate = fused
    ols_obj._delegate = fused
    return fused, 2


def _fuse_gain_mix(procs: List, i: int) -> Optional[tuple]:
    """(gain, mix) folds into the matrix columns; (mix, gain) into the
    rows."""
    if i + 1 >= len(procs):
        return None
    ta, tb = _tag(procs[i]), _tag(procs[i + 1])
    if ta is None or tb is None:
        return None
    kinds = (ta[0], tb[0])
    if kinds == ("gain", "mix"):
        gain_obj, mix_obj, side = ta[1], tb[1], "in"
    elif kinds == ("mix", "gain"):
        mix_obj, gain_obj, side = ta[1], tb[1], "out"
    else:
        return None
    if _is_sharded(gain_obj) != _is_sharded(mix_obj):
        return None
    if _is_sharded(gain_obj):
        from pipe_tpu.parallel import sharded

        fused = sharded.MixGain(mix_obj._m, _gain_value(gain_obj), side)
    else:
        from pipe_tpu.ops.fused import MixWithGain

        fused = MixWithGain(
            mix_obj._init_matrix, _gain_value(gain_obj), side
        )
    gain_obj._delegate = fused
    mix_obj._delegate = fused
    return fused, 2


_RULES = (
    _fuse_biquad_run,
    _fuse_fir_run,
    _fuse_fir_resample,
    _fuse_gain_fir,
    _fuse_gain_mix,
    _fuse_gain_ols,
)


def _fuse_pass(procs: List) -> Optional[List]:
    for i in range(len(procs)):
        for rule in _RULES:
            hit = rule(procs, i)
            if hit is not None:
                fused, consumed = hit
                return procs[:i] + [fused.processor()] + procs[i + consumed :]
    return None


def fuse(line: Line) -> Line:
    """Return a Line with every applicable rewrite applied (to fixpoint).

    Processor allocators advertise fusibility via a ``fusion_tag``
    attribute (set by the op factories); unknown allocators pass through
    untouched. Rules only fire when both parties are on the same backend
    (streaming or sharded)."""
    procs: List = list(line.processors)
    while True:
        new = _fuse_pass(procs)
        if new is None:
            return dataclasses.replace(line, processors=procs)
        procs = new
