"""Global numerics knobs.

TPU MXUs multiply natively in bfloat16; float32 matmul fidelity comes from
multi-pass emulation selected by ``lax.Precision``: ``DEFAULT`` is one
bf16 pass (~50 dB SNR — unusable for the 100 dB bar), ``HIGH`` is three
passes, ``HIGHEST`` is six passes (full f32 products). On CPU all three
are identical, so this knob only changes TPU numerics.

The *non-recursive* linear ops (FIR, polyphase resample, fused bank, OLS
convolution, mixer, channelizer) consult :func:`matmul_precision` at trace
time. Recursive kernels (the biquad's pole feedback and its cross-device
affine prefix) stay pinned at ``HIGHEST`` regardless — their rounding
error compounds per sample, and they are not matmul-bound anyway.

The default is ``'highest'``: the SNR-first setting behind the framework's
130–140 dB golden numbers. ``set_matmul_precision('high')`` halves the
emulation passes for the convolution matmuls (measured speedup and SNR
floor in ``docs/PERF_NOTES.md``) while keeping well above the 100 dB bar.

The value is read when a computation is *traced*; set it before building
pipes / jitting chunk functions. Already-compiled executables keep the
precision they were compiled with.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Union

from jax import lax

_NAMED = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    # per-operand asymmetric emulation: one operand at 3-term bf16 split,
    # the other at 2-term — ~4 MXU passes instead of 6, measured ~106 dB
    # on dense f32 products (vs ~97 dB for 'high', ~131 dB for 'highest')
    "mixed": (lax.Precision.HIGHEST, lax.Precision.HIGH),
    "highest": lax.Precision.HIGHEST,
}

_matmul_precision = lax.Precision.HIGHEST


def set_matmul_precision(p) -> None:
    """Set the matmul/conv precision for non-recursive linear ops.

    Accepts ``'default' | 'high' | 'mixed' | 'highest'``, a
    ``lax.Precision``, or a per-operand ``(lhs, rhs)`` tuple of them.
    Applies to computations traced after the call.
    """
    global _matmul_precision
    if isinstance(p, str):
        try:
            p = _NAMED[p.lower()]
        except KeyError:
            raise ValueError(
                f"unknown precision {p!r}; expected one of {sorted(_NAMED)}"
            ) from None
    if isinstance(p, tuple):
        if len(p) != 2 or not all(isinstance(q, lax.Precision) for q in p):
            raise TypeError(f"precision tuple must be 2 lax.Precision, got {p!r}")
    elif not isinstance(p, lax.Precision):
        raise TypeError(f"expected str or lax.Precision, got {type(p)!r}")
    _matmul_precision = p


def matmul_precision() -> lax.Precision:
    """The current matmul/conv precision for non-recursive linear ops."""
    return _matmul_precision


@contextmanager
def matmul_precision_scope(
    p: Union[str, lax.Precision],
) -> Iterator[None]:
    """Temporarily override the matmul precision (trace-time scope)."""
    old = _matmul_precision
    set_matmul_precision(p)
    try:
        yield
    finally:
        set_matmul_precision(old)
