"""Soak test: a long-running async pipe under a barrage of live mutations
and graph surgery — the integration stress the reference's race-detector
CI provides implicitly (SURVEY.md §5: our analog is structural + this)."""

import time

import numpy as np
import pytest

import pipe_tpu
from pipe_tpu import mock, ops


def test_soak_mutations_and_surgery(rng):
    """Run ~200 blocks while pushing dozens of mutations, inserting two
    processors, and adding a line mid-flight; assert stream integrity."""
    block = 256
    total = block * 200
    gain = ops.Gain(1.0)
    src = mock.Source(channels=1, value=1.0, limit=total, interval=0.004)
    sink = mock.Sink()
    line = pipe_tpu.Line(
        source=src.source(),
        processors=pipe_tpu.Processors(gain.processor()),
        sink=sink.sink(),
    )
    p = pipe_tpu.Pipe(block, line)
    p.start()

    # barrage of gain mutations
    for i in range(25):
        p.push(gain.set_gain(1.0 + (i % 5) * 0.25))
        time.sleep(0.01)

    # splice two processors into the running line
    g2 = ops.Gain(2.0)
    h1 = p.insert_processor(0, 1, g2.processor())
    assert h1.wait(60) and h1.error is None
    bq = ops.Biquad(ops.design_peaking_eq(44100, freq=500, q=0.7, gain_db=0.0))
    h2 = p.insert_processor(0, 0, bq.processor())
    assert h2.wait(60) and h2.error is None

    # grow the graph with a second line while running
    src2 = mock.Source(channels=1, value=-1.0, limit=block * 40)
    sink2 = mock.Sink()
    h3 = p.add_line(
        pipe_tpu.Line(
            source=src2.source(),
            processors=pipe_tpu.Processors(),
            sink=sink2.sink(),
        )
    )
    assert h3.wait(60) and h3.error is None

    # more mutations after surgery, through the spliced component too
    for i in range(10):
        p.push(g2.set_gain(1.0 + i * 0.1))
        time.sleep(0.005)

    p.wait(240)

    out = sink.values
    assert out.shape == (1, total)  # no samples lost through all surgery
    assert np.isfinite(out).all()
    # mutations land at block boundaries only: values are piecewise-constant
    # per block (source is constant, chain is memoryless after settle)
    out2 = sink2.values
    assert out2.shape == (1, block * 40)
    assert np.allclose(out2, -1.0)
