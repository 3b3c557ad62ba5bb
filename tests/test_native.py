"""Native runtime layer: C++ ring buffer, WAV codec, and the WavSource /
WavSink file components (built with g++ on first use; these tests exercise
the real shared library when a toolchain is present — the CI analog of the
reference testing its transport/fitting layer)."""

import threading

import numpy as np
import pytest

import pipe_tpu
from pipe_tpu import native
from pipe_tpu.io import WavSink, WavSource
from pipe_tpu import mock, ops
from pipe_tpu.signal import snr_db


def test_native_builds():
    """The C++ library must build in this environment (g++ is available);
    the pure-Python fallback is for toolchain-less installs only."""
    assert native.available(), native.build_error()


def test_ringbuf_push_pop_wrap():
    rb = native.RingBuffer(capacity_frames=16, channels=2)
    a = np.arange(24, dtype=np.float32).reshape(12, 2)
    assert rb.push(a) == 12
    assert len(rb) == 12
    got = rb.pop(8)
    np.testing.assert_array_equal(got, a[:8])
    # wrap-around: push 10 more into the freed space
    b = np.arange(100, 120, dtype=np.float32).reshape(10, 2)
    assert rb.push(b) == 10
    got2 = rb.pop(14)
    np.testing.assert_array_equal(got2, np.concatenate([a[8:], b], axis=0))
    assert len(rb) == 0


def test_ringbuf_backpressure_and_close():
    rb = native.RingBuffer(capacity_frames=4, channels=1)
    x = np.ones((6, 1), np.float32)
    assert rb.push(x) == 4  # only capacity accepted
    assert rb.push(x) == 0
    rb.close()
    assert rb.closed
    assert rb.pop(10).shape[0] == 4


def test_ringbuf_threaded_stream():
    """Producer/consumer on separate threads move 100k frames intact."""
    rb = native.RingBuffer(capacity_frames=256, channels=2)
    n_total = 100_000
    data = np.random.default_rng(0).standard_normal((n_total, 2)).astype(np.float32)

    def produce():
        pos = 0
        while pos < n_total:
            pos += rb.push(data[pos : pos + 128])
        rb.close()

    out = []
    t = threading.Thread(target=produce)
    t.start()
    got = 0
    while got < n_total:
        chunk = rb.pop(128)
        if chunk.shape[0] == 0:
            if rb.closed and len(rb) == 0:
                break
            continue
        out.append(chunk)
        got += chunk.shape[0]
    t.join()
    result = np.concatenate(out, axis=0)
    np.testing.assert_array_equal(result, data)


@pytest.mark.parametrize("bits", [16, 32])
def test_wav_roundtrip(tmp_path, bits):
    path = tmp_path / "t.wav"
    rng = np.random.default_rng(1)
    frames = rng.uniform(-0.9, 0.9, size=(1000, 2)).astype(np.float32)
    w = native.WavWriter(str(path), channels=2, sample_rate=48000, bits=bits)
    w.write(frames[:400])
    w.write(frames[400:])
    w.close()

    r = native.WavReader(str(path))
    assert r.channels == 2
    assert r.sample_rate == 48000
    assert r.total_frames == 1000
    got = np.concatenate([r.read(256) for _ in range(5)], axis=0)
    r.close()
    assert got.shape == (1000, 2)
    tol = 1e-4 if bits == 16 else 1e-7
    assert np.max(np.abs(got - frames)) < tol


def test_wav_reader_rejects_garbage(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"this is not a wav file at all........")
    with pytest.raises(IOError):
        native.WavReader(str(p))


def test_wav_source_sink_pipeline(tmp_path):
    """File -> gain -> file through the streaming runtime; contents scale
    exactly, prefetch/writer threads start and flush cleanly."""
    src_path = tmp_path / "in.wav"
    dst_path = tmp_path / "out.wav"
    rng = np.random.default_rng(2)
    x = rng.uniform(-0.5, 0.5, size=(2, 4096)).astype(np.float32)
    w = native.WavWriter(str(src_path), channels=2, sample_rate=44100, bits=32)
    w.write(np.ascontiguousarray(x.T))
    w.close()

    src = WavSource(str(src_path))
    assert src.channels == 2 and src.total_frames == 4096
    dst = WavSink(str(dst_path), bits=32)
    g = ops.Gain(0.5)
    pipe_tpu.run(
        512,
        pipe_tpu.Line(
            source=src.source(), sink=dst.sink(), processors=[g.processor()]
        ),
    )
    r = native.WavReader(str(dst_path))
    got = r.read(5000)
    r.close()
    assert got.shape == (4096, 2)
    assert snr_db((0.5 * x).astype(np.float64), got.T) > 120


def test_wav_source_partial_final_block(tmp_path):
    """total_frames % block_size != 0 -> final partial message then EOF."""
    src_path = tmp_path / "p.wav"
    x = np.linspace(-0.5, 0.5, 1000, dtype=np.float32)[None, :]
    w = native.WavWriter(str(src_path), channels=1, sample_rate=8000, bits=32)
    w.write(np.ascontiguousarray(x.T))
    w.close()
    sink = mock.Sink()
    pipe_tpu.run(
        256,
        pipe_tpu.Line(source=WavSource(str(src_path)).source(), sink=sink.sink()),
    )
    assert sink.samples == 1000
    np.testing.assert_allclose(sink.values, x, atol=1e-7)


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_py_wav_fallback_honors_bits(tmp_path, bits):
    """The toolchain-less Python writer must honor the requested bit depth
    (it used to clip everything to PCM16, silently losing 80+ dB)."""
    from pipe_tpu.native import _PyWavReader, _PyWavWriter

    rng = np.random.default_rng(7)
    x = rng.uniform(-0.9, 0.9, (1000, 2)).astype(np.float32)
    path = tmp_path / f"py{bits}.wav"
    w = _PyWavWriter(str(path), channels=2, sample_rate=48000, bits=bits)
    w.write(x)
    w.close()
    r = _PyWavReader(str(path))
    got = r.read(2000)
    r.close()
    assert got.shape == x.shape
    floor = {16: 80, 24: 120, 32: 150}[bits]
    assert snr_db(x, got) > floor


def test_py_wav_fallback_rejects_bad_bits(tmp_path):
    from pipe_tpu.native import _PyWavWriter

    with pytest.raises(ValueError):
        _PyWavWriter(str(tmp_path / "x.wav"), 1, 8000, bits=8)
