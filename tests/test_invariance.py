"""Block-size invariance: the defining streaming property. The same chain
over the same samples must produce identical output regardless of how the
stream is chopped into blocks — this exercises filter tails, partial final
blocks, resampler phase carry, envelope continuity, and delay-line state in
one property (the reference gets this for free from per-sample semantics;
the blocked engine must earn it)."""

import numpy as np
import pytest

from pipe_tpu import ops
from pipe_tpu.signal import snr_db

from tests.test_ops import stream_through


def _chain(kind):
    if kind == "fir":
        return [ops.FIR(ops.design_lowpass(97, 3000.0, 44100.0)).processor()]
    if kind == "biquad":
        return [ops.Biquad(
            ops.design_peaking_eq(44100, freq=800, q=2.0, gain_db=6.0)
        ).processor()]
    if kind == "dynamics":
        return [
            ops.Compressor(threshold_db=-15.0, ratio=3.0, attack_ms=2.0,
                           release_ms=40.0).processor(),
            ops.Delay(64, wet=0.5, dry=0.5).processor(),
        ]
    if kind == "resample":
        return [ops.Resampler(48000, 44100, taps_per_phase=16).processor()]
    if kind == "mixed":
        return [
            ops.FIR(ops.design_lowpass(33, 5000.0, 44100.0)).processor(),
            ops.Gain(0.8).processor(),
            ops.NoiseGate(threshold_db=-60.0, range_db=40.0).processor(),
        ]
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["fir", "biquad", "dynamics", "resample", "mixed"])
@pytest.mark.parametrize("blocks", [(512, 128), (512, 379)])
def test_block_size_invariance(kind, blocks, rng):
    """Output is identical (to f32 noise) for different blockings,
    including a block size that never divides the stream length."""
    C = 2
    N = 7321  # deliberately not a multiple of anything
    x = rng.standard_normal((C, N)).astype(np.float32)

    outs = []
    for b in blocks:
        outs.append(stream_through(_chain(kind), x, b))

    a, b = outs
    m = min(a.shape[1], b.shape[1])
    # resampler emits per-block ceil counts; totals may differ by < K blocks'
    # worth of boundary frames only for the rational-rate chain
    if kind == "resample":
        assert abs(a.shape[1] - b.shape[1]) <= 2
    else:
        assert a.shape == b.shape
    # IIR recursion accumulates f32 roundoff differently per tiling, so the
    # two blockings agree to ~recursion noise (the biquad's own oracle bound
    # is 80 dB); FIR/dynamics paths agree to reassociation noise only.
    bound = 80 if kind == "biquad" else 120
    assert snr_db(a[:, :m].astype(np.float64), b[:, :m]) >= bound


def test_single_block_equals_streamed(rng):
    """One giant block == many small blocks (ultimate partial-block test)."""
    C, N = 1, 4096
    x = rng.standard_normal((C, N)).astype(np.float32)
    chain = lambda: [
        ops.FIR(ops.design_lowpass(65, 4000.0, 44100.0)).processor(),
        ops.Compressor(threshold_db=-12.0, ratio=4.0).processor(),
    ]
    whole = stream_through(chain(), x, 4096)
    parts = stream_through(chain(), x, 100)  # 40 blocks + 96-frame partial
    assert whole.shape == parts.shape
    assert snr_db(whole.astype(np.float64), parts) >= 120
