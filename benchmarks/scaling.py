"""Weak-scaling harness for the sharded flagship chain.

Measures samples/s at increasing mesh sizes with PER-DEVICE work held
constant, and reports efficiency vs the single-device rate — the
BASELINE.md "≥80% scaling 1 chip → 1 host → 4 hosts" metric. On a real
pod slice this measures ICI/DCN halo + psum overhead; on a CPU host run

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python benchmarks/scaling.py

to exercise the harness itself (CPU "devices" share cores, so efficiency
numbers are only meaningful on real hardware).

One JSON line per mesh size:
  {"devices": N, "mesh": "CxT", "samples_per_s": ..., "efficiency": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# a sitecustomize may have imported jax before JAX_PLATFORMS took effect;
# honor a virtual-device request explicitly (same dance as __graft_entry__)
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from pipe_tpu import ops, parallel

CH_PER_DEVICE = 16
BLOCKS_PER_DEVICE = 256  # x147 frames


def mesh_shapes(n: int):
    """(ch, time) factorizations to test at n devices, channel-major."""
    out = []
    for ch in (1, 2, 4, 8):
        if ch <= n and n % ch == 0:
            out.append((ch, n // ch))
    return out


def measure(ch: int, t: int) -> float:
    n = ch * t
    mesh = parallel.make_mesh(ch, t)
    C = CH_PER_DEVICE * ch
    chunk = 147 * BLOCKS_PER_DEVICE * t
    h = ops.design_lowpass(255, 4000, 44100)
    chain = parallel.ShardedChain(
        mesh,
        [
            parallel.FIRResampleStage(h, 48000, 44100),
            parallel.MixStage(np.ones((2, C), np.float32) / C),
        ],
        channels=C,
        chunk_frames=chunk,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((C, chunk)).astype(np.float32)

    probe_val = None

    def probe(y):
        return float(np.asarray(jax.device_get(y))[0, -1])

    y = chain.step(x)
    probe_val = probe(y)  # compile + settle
    times = {}
    for steps in (4, 20):
        t0 = time.perf_counter()
        for _ in range(steps):
            y = chain.step(x)
        probe(y)
        times[steps] = time.perf_counter() - t0
    dt = (times[20] - times[4]) / 16
    return C * chunk / dt


def main():
    total = len(jax.devices())
    sizes = sorted({1, 2, total // 2 if total >= 4 else total, total})
    base = None
    for n in sizes:
        if n < 1 or total % n:
            continue
        ch, t = mesh_shapes(n)[-1] if n > 1 else (1, 1)
        sps = measure(ch, t)
        per_dev = sps / n
        if base is None:
            base = per_dev
        print(
            json.dumps(
                {
                    "devices": n,
                    "mesh": f"{ch}x{t}",
                    "samples_per_s": round(sps, 1),
                    "per_device": round(per_dev, 1),
                    "efficiency": round(per_dev / base, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
