"""Signal buffer unit tests (L0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pipe_tpu import signal as sig


def test_silence():
    s = sig.silence(2, 8)
    assert s.channels == 2
    assert s.block_size == 8
    assert int(s.frames) == 8
    np.testing.assert_array_equal(np.asarray(s.data), np.zeros((2, 8)))


def test_from_array_1d_and_2d():
    s = sig.from_array([1.0, 2.0, 3.0])
    assert s.channels == 1 and s.block_size == 3 and int(s.frames) == 3
    s2 = sig.from_array(np.ones((2, 4)), frames=3)
    assert s2.channels == 2 and int(s2.frames) == 3


def test_from_array_bad_rank():
    with pytest.raises(ValueError):
        sig.from_array(np.zeros((2, 2, 2)))


def test_mask_partial():
    s = sig.from_array(np.ones((2, 6)), frames=4)
    m = np.asarray(s.mask())
    np.testing.assert_array_equal(m, [[1, 1, 1, 1, 0, 0]])
    masked = np.asarray(s.masked().data)
    np.testing.assert_array_equal(masked[:, 4:], 0)
    np.testing.assert_array_equal(masked[:, :4], 1)


def test_to_numpy_valid_frames_only():
    s = sig.from_array(np.arange(8, dtype=np.float32)[None, :], frames=5)
    out = sig.to_numpy(s)
    np.testing.assert_array_equal(out, [[0, 1, 2, 3, 4]])


def test_signal_is_pytree():
    s = sig.silence(1, 4)
    leaves = jax.tree.leaves(s)
    assert len(leaves) == 2  # data + frames

    @jax.jit
    def f(x: sig.Signal):
        return x.with_data(x.data + 1.0)

    out = f(s)
    np.testing.assert_array_equal(np.asarray(out.data), np.ones((1, 4)))


def test_properties_validation():
    with pytest.raises(ValueError):
        sig.SignalProperties(sample_rate=44100, channels=0)
    with pytest.raises(ValueError):
        sig.SignalProperties(sample_rate=-1, channels=1)


def test_snr_db():
    ref = np.sin(np.linspace(0, 10, 1000))
    assert sig.snr_db(ref, ref) == float("inf")
    noisy = ref + 1e-6 * np.ones_like(ref)
    v = sig.snr_db(ref, noisy)
    assert 100 < v < 130
    assert sig.snr_db(ref, np.zeros_like(ref)) == 0.0
