"""Benchmark: samples/s/chip on the 64-channel FIR(255) + 44.1k->48k
polyphase resample + merged mix chain (BASELINE.md headline config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}

``value`` is input samples (frames x channels) processed per wall second in
steady state on one chip. The reference publishes no performance numbers
(BASELINE.md: 'The reference publishes none'), so ``vs_baseline`` reports
the multiple of REAL-TIME for this chain (64 ch x 44100 Hz = 2.8224 Msamples/s)
— i.e. how many live 64-channel pipelines one chip can sustain.

Chunks are device-resident and steps are dispatched back-to-back without
host syncs (state carries the dependency chain), so dispatch latency over
the TPU tunnel overlaps with compute.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from pipe_tpu.flagship import make_flagship, SAMPLE_RATE

    channels = int(os.environ.get("BENCH_CHANNELS", "64"))
    chunk = 147 * int(os.environ.get("BENCH_CHUNK_BLOCKS", "2048"))
    steps = int(os.environ.get("BENCH_STEPS", "64"))
    warmup = 3

    fn, state, x = make_flagship(channels=channels, chunk=chunk)
    step = jax.jit(fn, donate_argnums=(0,))

    x = jax.device_put(x)
    state = jax.device_put(state)

    # warmup / compile
    for _ in range(warmup):
        state, y = step(state, x)
    jax.block_until_ready((state, y))

    t0 = time.perf_counter()
    for _ in range(steps):
        state, y = step(state, x)
    jax.block_until_ready((state, y))
    dt = time.perf_counter() - t0

    in_samples = steps * chunk * channels
    sps = in_samples / dt
    realtime = channels * SAMPLE_RATE
    print(
        json.dumps(
            {
                "metric": "samples_per_s_per_chip_64ch_fir255_resample_mix",
                "value": round(sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(sps / realtime, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
