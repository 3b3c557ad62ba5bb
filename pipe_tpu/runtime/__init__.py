"""Runtime — executors, drivers, and the Pipe lifecycle (reference L4:
``run.go``, ``merger.go``, runtime half of ``pipe.go``)."""

from pipe_tpu.runtime.executor import LineExecutor, MultiLineExecutor, EOF
from pipe_tpu.runtime.driver import run, run_executor
from pipe_tpu.runtime.pipe import Pipe, wait

__all__ = [
    "LineExecutor",
    "MultiLineExecutor",
    "EOF",
    "run",
    "run_executor",
    "Pipe",
    "wait",
]
