"""Sync driver integration tests — the lifecycle matrix of
``pipe_test.go:191-459`` (start-error rollback, EOF splice-out, flush
guarantees, exact buffer-count arithmetic)."""

import dataclasses

import numpy as np
import pytest

import pipe_tpu
from pipe_tpu import mock
from pipe_tpu.errors import AllocationError, ErrorRun, StartError

BLOCK = 512


class MockError(Exception):
    pass


@dataclasses.dataclass
class MockLine:
    source: mock.Source
    processor: mock.Processor
    sink: mock.Sink

    def line(self) -> pipe_tpu.Line:
        return pipe_tpu.Line(
            source=self.source.source(),
            processors=pipe_tpu.Processors(self.processor.processor()),
            sink=self.sink.sink(),
        )


def mock_line(limit, **kwargs) -> MockLine:
    return MockLine(
        source=mock.Source(limit=limit, channels=1, **kwargs),
        processor=mock.Processor(),
        sink=mock.Sink(discard=True),
    )


def assert_line(m: MockLine, messages, samples):
    assert m.source.messages == messages
    assert m.processor.messages == messages
    assert m.sink.messages == messages
    assert m.source.samples == samples
    assert m.processor.samples == samples
    assert m.sink.samples == samples


# -- allocation failures (pipe_test.go:21-80) --------------------------------

def test_binding_fail_source():
    boom = MockError("binding error")
    line = pipe_tpu.Line(
        source=mock.Source(error_on_make=boom).source(),
        processors=pipe_tpu.Processors(mock.Processor().processor()),
        sink=mock.Sink().sink(),
    )
    with pytest.raises(AllocationError, match="source"):
        pipe_tpu.run(BLOCK, line)


def test_binding_fail_processor():
    boom = MockError("binding error")
    line = pipe_tpu.Line(
        source=mock.Source(limit=4).source(),
        processors=pipe_tpu.Processors(
            mock.Processor(error_on_make=boom).processor()
        ),
        sink=mock.Sink().sink(),
    )
    with pytest.raises(AllocationError, match="processor"):
        pipe_tpu.run(BLOCK, line)


def test_binding_fail_sink():
    boom = MockError("binding error")
    line = pipe_tpu.Line(
        source=mock.Source(limit=4).source(),
        processors=pipe_tpu.Processors(mock.Processor().processor()),
        sink=mock.Sink(error_on_make=boom).sink(),
    )
    with pytest.raises(AllocationError, match="sink"):
        pipe_tpu.run(BLOCK, line)


# -- lifecycle matrix (pipe_test.go:191-459) -----------------------------------

def test_single_line_ok():
    m = mock_line(1040)
    pipe_tpu.run(BLOCK, m.line())
    assert m.source.flushed and m.processor.flushed and m.sink.flushed
    assert_line(m, 3, 1040)  # 1040 @ 512 => [512, 512, 16]


def test_two_lines_ok():
    m1, m2 = mock_line(1040), mock_line(1640)
    pipe_tpu.run(BLOCK, m1.line(), m2.line())
    assert_line(m1, 3, 1040)
    assert_line(m2, 4, 1640)
    for m in (m1, m2):
        assert m.source.flushed and m.processor.flushed and m.sink.flushed


def test_three_lines_ok():
    m1, m2, m3 = mock_line(3048), mock_line(1640), mock_line(4096)
    pipe_tpu.run(BLOCK, m1.line(), m2.line(), m3.line())
    assert_line(m1, 6, 3048)
    assert_line(m2, 4, 1640)
    assert_line(m3, 8, 4096)


def test_single_line_processor_start_error():
    """Start failure: earlier components of the failing line flush; the
    failing component and everything after do not (pipe_test.go:307-329)."""
    m = mock_line(1040)
    m.processor.hooks.error_on_start = MockError("start")
    with pytest.raises(StartError):
        pipe_tpu.run(BLOCK, m.line())
    assert m.source.started and m.processor.started and not m.sink.started
    assert m.source.flushed
    assert not m.processor.flushed  # started++ happens only after success
    assert not m.sink.flushed


def test_two_lines_processor_start_error():
    """Line 1 started fully and is rollback-flushed when line 2 fails to
    start (pipe_test.go:273-306)."""
    m1, m2 = mock_line(1040), mock_line(1040)
    m2.processor.hooks.error_on_start = MockError("start")
    with pytest.raises(StartError):
        pipe_tpu.run(BLOCK, m1.line(), m2.line())
    assert m1.source.started and m1.processor.started and m1.sink.started
    assert m1.source.flushed and m1.processor.flushed and m1.sink.flushed
    assert m2.source.started and m2.processor.started and not m2.sink.started
    assert m2.source.flushed
    assert not m2.processor.flushed and not m2.sink.flushed


def test_two_lines_start_error_and_flush_error():
    """pipe_test.go:227-272: flush error during start rollback."""
    m1, m2 = mock_line(1040), mock_line(1040)
    m1.source.hooks.error_on_flush = MockError("flush")
    m2.processor.hooks.error_on_start = MockError("start")
    with pytest.raises(StartError):
        pipe_tpu.run(BLOCK, m1.line(), m2.line())
    assert m1.source.flushed and m1.processor.flushed and m1.sink.flushed
    assert m2.source.flushed
    assert not m2.processor.flushed and not m2.sink.flushed


def test_runtime_processor_error_still_flushes_everything():
    """pipe_test.go:437-457."""
    m = mock_line(1040)
    boom = MockError("mock error")
    m.processor.error_on_call = boom
    with pytest.raises(ErrorRun) as exc_info:
        pipe_tpu.run(BLOCK, m.line())
    assert exc_info.value.is_(MockError)
    assert m.source.flushed and m.processor.flushed and m.sink.flushed


def test_sink_runtime_error():
    m = mock_line(1040)
    m.sink.error_on_call = MockError("sink error")
    with pytest.raises(ErrorRun) as exc_info:
        pipe_tpu.run(BLOCK, m.line())
    assert exc_info.value.is_(MockError)
    assert m.source.flushed and m.processor.flushed and m.sink.flushed


def test_flush_error_after_clean_run():
    """A flush error at EOF splice-out surfaces as the run's error — the
    reference returns it from multiLineExecutor.execute (run.go:126-128), so
    it lands in the exec slot of ErrorRun, not the flush slot."""
    m = mock_line(1040)
    m.sink.hooks.error_on_flush = MockError("flush error")
    with pytest.raises(ErrorRun) as exc_info:
        pipe_tpu.run(BLOCK, m.line())
    assert exc_info.value.is_(MockError)
    assert m.sink.flushed


def test_per_line_eof_at_different_counts():
    """Lines EOF at different sweeps; each is flushed at its own EOF and the
    rest keep running (pipe_test.go:386-436, run.go:113-132)."""
    m1, m2 = mock_line(BLOCK * 2), mock_line(BLOCK * 5)
    pipe_tpu.run(BLOCK, m1.line(), m2.line())
    assert_line(m1, 2, BLOCK * 2)
    assert_line(m2, 5, BLOCK * 5)
    assert m1.sink.flushed and m2.sink.flushed


def test_values_flow_through():
    """End-to-end data correctness: constant source value arrives at the
    sink unchanged, partial final block included."""
    src = mock.Source(value=0.5, channels=2, limit=10)
    snk = mock.Sink()
    line = pipe_tpu.Line(
        source=src.source(),
        processors=pipe_tpu.Processors(mock.Processor().processor()),
        sink=snk.sink(),
    )
    pipe_tpu.run(4, line)
    assert snk.values.shape == (2, 10)
    import numpy as np

    np.testing.assert_allclose(snk.values, 0.5)


def test_lookahead_preserves_stream():
    """Dispatch pipelining (lookahead > 1) must not change counts, values,
    or the partial-final-block protocol."""
    import numpy as np

    from pipe_tpu import mock
    import pipe_tpu

    for lookahead in (1, 4, 32):
        src = mock.Source(value=2.5, channels=2, limit=11 * 64 + 17)
        sink = mock.Sink()
        pipe_tpu.run(
            64,
            pipe_tpu.Line(source=src.source(), sink=sink.sink()),
            lookahead=lookahead,
        )
        assert sink.samples == 11 * 64 + 17, lookahead
        assert sink.messages == 12, lookahead
        assert np.all(sink.values == 2.5)


def test_lookahead_async_pipe_with_resampler(rng):
    """Lookahead through an async pipe with variable output counts."""
    import numpy as np

    import pipe_tpu
    from pipe_tpu import mock, ops

    src = mock.Source(value=1.0, channels=1, limit=147 * 32)
    sink = mock.Sink()
    r = ops.Resampler(48000, 44100)
    p = pipe_tpu.Pipe(
        147,
        pipe_tpu.Line(
            source=src.source(), sink=sink.sink(), processors=[r.processor()]
        ),
        lookahead=8,
    )
    p.start()
    p.wait(60)
    assert sink.samples == 160 * 32


def test_offline_process_matches_streaming(rng):
    """pipe_tpu.process == the streaming runtime over the same chain."""
    import numpy as np

    import pipe_tpu
    from pipe_tpu import ops

    h = ops.design_lowpass(127, cutoff=3000, sample_rate=44100)
    x = rng.standard_normal((2, 10_000)).astype(np.float32)
    y = pipe_tpu.process(x, [ops.FIR(h).processor(), ops.Gain(0.5).processor()],
                         block_size=1024)
    import scipy.signal

    ref = 0.5 * scipy.signal.lfilter(h, [1.0], x.astype(np.float64), axis=1)
    from pipe_tpu.signal import snr_db

    assert y.shape == x.shape
    assert snr_db(ref, y) > 100


def test_offline_process_rate_change(rng):
    import numpy as np

    import pipe_tpu
    from pipe_tpu import ops

    x = rng.standard_normal((1, 147 * 40)).astype(np.float32)
    y = pipe_tpu.process(x, [ops.Resampler(48000, 44100).processor()],
                         block_size=147 * 4)
    assert y.shape == (1, 160 * 40)


def test_batch_blocks_matches_unbatched(rng):
    """batch_blocks=k (scan dispatch) produces the identical stream,
    including EOF on a limit that is not a multiple of k*block."""
    import pipe_tpu
    from pipe_tpu import mock, ops

    limit = 512 * 10 + 137  # partial final block, mid-scan EOF
    outs = []
    for k in (1, 4):
        src = mock.Source(channels=2, value=1.0, limit=limit)
        sink = mock.Sink()
        fir = ops.FIR(ops.design_lowpass(63, 4000.0, 44100.0))
        line = pipe_tpu.Line(
            source=src.source(),
            processors=pipe_tpu.Processors(fir.processor()),
            sink=sink.sink(),
        )
        pipe_tpu.run(512, line, lookahead=4, batch_blocks=k)
        outs.append(sink.values)
    assert outs[0].shape == (2, limit)
    assert outs[0].shape == outs[1].shape
    # scan vs unrolled compile to different (equally valid) fusions, so
    # agreement is to f32 rounding, not bit-exact
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=1e-6)


def test_batch_blocks_async_pipe_with_mutation(rng):
    """Scan batching in the async Pipe: mutations still land (within k
    blocks) and the stream completes exactly."""
    import time as _time

    import pipe_tpu
    from pipe_tpu import mock, ops

    gain = ops.Gain(1.0)
    # interval paces the host per dispatch (one dispatch = batch_blocks
    # blocks), so the whole 120-block stream takes >= 30 * 10ms = 300ms.
    src = mock.Source(channels=1, value=1.0, limit=512 * 120, interval=0.01)
    sink = mock.Sink()
    line = pipe_tpu.Line(
        source=src.source(),
        processors=pipe_tpu.Processors(gain.processor()),
        sink=sink.sink(),
    )
    p = pipe_tpu.Pipe(512, line, lookahead=4, batch_blocks=4)
    p.start()
    # Progress-gated push (not a blind sleep): wait until the sink has
    # actually consumed a couple of dispatches, then push while >= 100
    # paced blocks of stream remain — the mutation routes in ~ms.
    deadline = _time.monotonic() + 30.0
    while sink.messages < 8 and _time.monotonic() < deadline:
        _time.sleep(0.001)
    assert sink.messages >= 8, "stream made no progress"
    p.push(gain.set_gain(0.5))
    p.wait(60)
    vals = sink.values
    assert vals.shape == (1, 512 * 120)
    u = np.unique(np.round(vals, 6)).tolist()
    assert 0.5 in u and 1.0 in u
    # the switch happens at a block boundary
    switch = np.nonzero(np.diff(vals[0]))[0]
    assert len(switch) == 1 and (switch[0] + 1) % 512 == 0
