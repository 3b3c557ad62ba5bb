"""File I/O components — the data-loader edge of the pipeline.

``WavSource`` streams a WAV file into the pipe through the native reader
(``native/wavio.cpp``) with a *prefetch thread*: disk reads run ahead of
the device stream, filling a lock-free SPSC ring (``native/ringbuf.cpp``),
and the component's ``feed`` callback only pops ready frames — the block
dispatcher never waits on disk unless the reader genuinely falls behind.

``WavSink`` writes the device stream back to a WAV file through the native
writer on a background thread fed by a second ring, so file writes overlap
with compute.

This mirrors the role of the wav codec packages in the reference's
ecosystem (pipelined.dev/wav feeding pipe Sources/Sinks), implemented
native-first per the runtime design; both fall back to pure Python
(stdlib ``wave``) when no C++ toolchain is present.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import numpy as np

from pipe_tpu import native
from pipe_tpu.components import Sink as SinkComponent
from pipe_tpu.components import Source as SourceComponent
from pipe_tpu.signal import SignalProperties


class WavSource:
    """Streaming WAV file source with native prefetch.

    Args:
      path: WAV file (PCM16/24/32 or float32).
      prefetch_blocks: ring capacity in blocks (read-ahead depth).
    """

    def __init__(self, path: str, prefetch_blocks: int = 8):
        self.path = str(path)
        self.prefetch_blocks = prefetch_blocks
        rdr = native.WavReader(self.path)  # validate eagerly
        self.channels = rdr.channels
        self.sample_rate = rdr.sample_rate
        self.total_frames = rdr.total_frames
        rdr.close()
        self._thread: Optional[threading.Thread] = None
        self._ring: Optional[native.RingBuffer] = None
        self._stop = threading.Event()

    def source(self):
        def alloc(mctx, block_size: int) -> SourceComponent:
            ring = native.RingBuffer(
                max(self.prefetch_blocks, 2) * block_size, self.channels
            )
            self._ring = ring
            stop = self._stop

            def reader():
                rdr = native.WavReader(self.path)
                try:
                    while not stop.is_set():
                        chunk = rdr.read(block_size)
                        if chunk.shape[0] == 0:
                            break
                        # busy-backoff when the ring is full
                        pushed = 0
                        while pushed < chunk.shape[0] and not stop.is_set():
                            n = ring.push(chunk[pushed:])
                            if n == 0:
                                time.sleep(0.0005)
                            pushed += n
                finally:
                    rdr.close()
                    ring.close()

            def start():
                self._stop.clear()
                self._thread = threading.Thread(
                    target=reader, name="wav-prefetch", daemon=True
                )
                self._thread.start()

            def flush():
                stop.set()
                if self._thread is not None:
                    self._thread.join(timeout=5)
                    self._thread = None

            def feed(n: int) -> Optional[np.ndarray]:
                # pop up to n frames; wait while the reader is behind
                while True:
                    got = ring.pop(n)
                    if got.shape[0] > 0:
                        return got.T  # (channels, frames)
                    if ring.closed:
                        return None
                    time.sleep(0.0005)

            return SourceComponent(
                output=SignalProperties(
                    sample_rate=float(self.sample_rate), channels=self.channels
                ),
                feed=feed,
                start=start,
                flush=flush,
            )

        return alloc


class WavSink:
    """Streaming WAV file sink with a background native writer thread."""

    def __init__(self, path: str, bits: int = 32, buffer_blocks: int = 8):
        self.path = str(path)
        self.bits = bits
        self.buffer_blocks = buffer_blocks
        self._thread: Optional[threading.Thread] = None
        self._done = threading.Event()
        self.frames_written = 0

    def sink(self):
        def alloc(mctx, block_size: int, props: SignalProperties) -> SinkComponent:
            ring = native.RingBuffer(
                max(self.buffer_blocks, 2) * block_size, props.channels
            )
            done = self._done
            err: list[BaseException] = []

            def writer():
                w = native.WavWriter(
                    self.path, props.channels, int(props.sample_rate), self.bits
                )
                try:
                    while True:
                        chunk = ring.pop(block_size)
                        if chunk.shape[0] == 0:
                            if ring.closed:
                                break
                            time.sleep(0.0005)
                            continue
                        w.write(chunk)
                        self.frames_written += chunk.shape[0]
                except BaseException as e:  # noqa: BLE001 — surfaced on flush
                    err.append(e)
                finally:
                    w.close()
                    done.set()

            def start():
                done.clear()
                self.frames_written = 0
                self._thread = threading.Thread(
                    target=writer, name="wav-writer", daemon=True
                )
                self._thread.start()

            def flush():
                ring.close()
                if self._thread is not None:
                    self._thread.join(timeout=30)
                    self._thread = None
                if err:
                    raise err[0]

            def receive(block: np.ndarray):
                frames = np.ascontiguousarray(block.T, np.float32)
                pushed = 0
                while pushed < frames.shape[0]:
                    n = ring.push(frames[pushed:])
                    if n == 0:
                        time.sleep(0.0005)
                    pushed += n

            return SinkComponent(receive=receive, start=start, flush=flush)

        return alloc
