"""Mock kit unit tests — drive the mock step functions directly, without a
pipe, mirroring the buffer-count arithmetic of ``mock/mock_test.go:19-210``."""

import numpy as np
import pytest

from pipe_tpu import mock, mutable
from pipe_tpu.signal import SignalProperties, Signal


def drive_source(src: mock.Source, block_size: int, max_steps=10_000):
    """Run the source step until EOF; returns list of per-block frame counts.

    The step is jitted: eager per-op dispatch is prohibitively slow in this
    environment (~4ms/op) while jitted calls are ~30us."""
    import jax

    comp = src.source()(mutable.mutable(), block_size)
    step = jax.jit(comp.step)
    frames = []
    for _ in range(max_steps):
        state, sig, eof = step(comp.state, comp.params)
        if bool(eof):
            return frames, comp
        comp.state = state
        frames.append(int(sig.frames))
    raise AssertionError("source never EOF'd")


@pytest.mark.parametrize(
    "limit,block,expected_calls,expected_frames",
    [
        (11, 5, 3, [5, 5, 1]),  # mock_test.go:71-83
        (2500, 5, 500, [5] * 500),  # mock_test.go:84-95
        (10, 5, 2, [5, 5]),
        (0, 5, 0, []),
    ],
)
def test_source_buffer_count_math(limit, block, expected_calls, expected_frames):
    src = mock.Source(value=1.0, channels=2, limit=limit)
    frames, comp = drive_source(src, block)
    assert len(frames) == expected_calls
    assert frames == expected_frames
    assert src.messages == expected_calls
    assert src.samples == limit


def test_source_value_injection():
    import jax

    src = mock.Source(value=0.75, channels=2, limit=4)
    comp = src.source()(mutable.mutable(), 4)
    state, sig, eof = jax.jit(comp.step)(comp.state, comp.params)
    assert not bool(eof)
    np.testing.assert_allclose(np.asarray(sig.data), 0.75)


def test_source_unlimited_never_eofs():
    import jax

    src = mock.Source(value=1.0, channels=1)
    comp = src.source()(mutable.mutable(), 8)
    step = jax.jit(comp.step)
    for _ in range(5):
        comp.state, sig, eof = step(comp.state, comp.params)
        assert not bool(eof)
        assert int(sig.frames) == 8
    assert src.samples == 40


def test_processor_passthrough_and_counts():
    """mock_test.go:103-157: pass-through copy counting frames."""
    proc = mock.Processor()
    comp = proc.processor()(
        mutable.mutable(), 4, SignalProperties(sample_rate=44100, channels=2)
    )
    import jax.numpy as jnp

    import jax

    step = jax.jit(comp.step)
    x = Signal(jnp.arange(8, dtype=jnp.float32).reshape(2, 4), jnp.asarray(4))
    comp.state, out = step(comp.state, comp.params, x)
    np.testing.assert_array_equal(np.asarray(out.data), np.asarray(x.data))
    comp.state, out = step(comp.state, comp.params, out.with_frames(3))
    assert proc.messages == 2
    assert proc.samples == 7


def test_sink_capture():
    """mock_test.go:159-198: capture-or-discard."""
    snk = mock.Sink()
    comp = snk.sink()(
        mutable.mutable(), 4, SignalProperties(sample_rate=44100, channels=2)
    )
    comp.receive(np.ones((2, 4), np.float32))
    comp.receive(np.full((2, 2), 2.0, np.float32))
    assert snk.messages == 2
    assert snk.samples == 6
    np.testing.assert_array_equal(
        snk.values, np.concatenate([np.ones((2, 4)), np.full((2, 2), 2.0)], axis=1)
    )


def test_sink_discard():
    snk = mock.Sink(discard=True)
    comp = snk.sink()(
        mutable.mutable(), 4, SignalProperties(sample_rate=44100, channels=1)
    )
    comp.receive(np.ones((1, 4), np.float32))
    assert snk.messages == 1
    assert snk.values.size == 0


def test_error_injection_on_make():
    boom = RuntimeError("make failed")
    src = mock.Source(value=1.0, limit=4, error_on_make=boom)
    with pytest.raises(RuntimeError):
        src.source()(mutable.mutable(), 4)


def test_error_injection_on_call_sink():
    boom = RuntimeError("call failed")
    snk = mock.Sink(error_on_call=boom)
    comp = snk.sink()(
        mutable.mutable(), 4, SignalProperties(sample_rate=44100, channels=1)
    )
    with pytest.raises(RuntimeError):
        comp.receive(np.ones((1, 4), np.float32))


def test_hooks_spies():
    """mock_test.go:200-210."""
    src = mock.Source(value=1.0, limit=4)
    comp = src.source()(mutable.mutable(), 4)
    assert not src.started and not src.flushed
    comp.start()
    assert src.started
    comp.flush()
    assert src.flushed


def test_hook_error_injection():
    boom = RuntimeError("start failed")
    src = mock.Source(value=1.0, limit=4, error_on_start=boom)
    comp = src.source()(mutable.mutable(), 4)
    with pytest.raises(RuntimeError):
        comp.start()
    assert src.started  # spy flips before raising, like the reference


def test_source_reset_mutation():
    src = mock.Source(value=1.0, channels=1, limit=8)
    frames, comp = drive_source(src, 4)
    assert src.samples == 8
    src._component = comp
    src.reset().apply()
    assert src.samples == 0
    assert src.messages == 0


def test_mock_mutation_spy():
    src = mock.Source(value=1.0, limit=4)
    src.source()(mutable.mutable(), 4)
    assert not src.mutated
    src.mock_mutation().apply()
    assert src.mutated
