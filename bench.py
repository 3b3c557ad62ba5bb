"""Benchmark: samples/s/chip on the 64-channel FIR(255) + 44.1k->48k
polyphase resample + merged mix chain (BASELINE.md headline config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}

``value`` is input samples (frames x channels) processed per wall second in
steady state on one chip. The reference publishes no performance numbers
(BASELINE.md: 'The reference publishes none'), so ``vs_baseline`` reports
the multiple of REAL-TIME for this chain (64 ch x 44100 Hz = 2.8224 Msamples/s)
— i.e. how many live 64-channel pipelines one chip can sustain.

Methodology: steps chain through carried state (donated), so they serialize
on-device without host syncs; each timed run ends with a scalar readback
probe that forces completion (``block_until_ready`` alone does not reliably
wait on tunneled TPU runtimes). The reported time is the MARGINAL slope
between a short and a long run, which cancels the fixed dispatch/readback
round trip (~28 ms over the tunnel).
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
    n_long = int(os.environ.get("BENCH_STEPS", "64"))
    n_short = max(2, n_long // 8)

    fn, state, x = make_flagship(channels=channels, chunk=chunk)
    step = jax.jit(fn, donate_argnums=(0,))
    probe = jax.jit(lambda s, y: y[0, -1] + s[0][0, 0])

    x = jax.device_put(x)
    state = jax.device_put(state)

    # warmup / compile (includes the probe)
    for _ in range(3):
        state, y = step(state, x)
    float(probe(state, y))

    times = {}
    for n in (n_short, n_long):
        t0 = time.perf_counter()
        for _ in range(n):
            state, y = step(state, x)
        float(probe(state, y))  # forces the whole chain via the state dep
        times[n] = time.perf_counter() - t0
    dt = (times[n_long] - times[n_short]) / (n_long - n_short)

    sps = chunk * channels / dt
    realtime = channels * SAMPLE_RATE

    # Per-config table (r5, VERDICT r4 item 2): every BASELINE.md config
    # re-measured on the SAME hardware in the SAME run as the headline,
    # embedded in the one JSON line so BENCH_r{N}.json carries all five.
    configs = {}
    if os.environ.get("BENCH_CONFIGS", "1") != "0":
        from benchmarks import configs as cfg

        cfg.QUIET = True
        for key in sorted(cfg.ALL):
            try:
                for rec in cfg.ALL[key]() or []:
                    configs[rec.pop("config")] = rec
            except Exception as e:  # noqa: BLE001 - one config must not
                # take down the headline metric
                configs[f"config{key}"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    print(
        json.dumps(
            {
                "metric": "samples_per_s_per_chip_64ch_fir255_resample_mix",
                "value": round(sps, 1),
                "unit": "samples/s",
                "vs_baseline": round(sps / realtime, 2),
                "configs": configs,
            }
        )
    )


if __name__ == "__main__":
    main()
