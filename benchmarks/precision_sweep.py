"""Measure the speed/SNR tradeoff of `config.set_matmul_precision` on the
flagship chain (64ch FIR-255 + 44.1k->48k resample + mix) on the real chip.

For each precision setting, reports:
  - SNR of the TPU output vs the CPU float32 reference (same graph, same
    inputs; CPU matmuls are true f32, so this isolates the TPU emulation
    error — the CPU-f32-vs-f64-oracle gap is separately ~135 dB, see
    docs/PERF_NOTES.md)
  - marginal step time / throughput (same short-vs-long-run methodology
    as bench.py)

Usage: python benchmarks/precision_sweep.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from pipe_tpu import config
from pipe_tpu.flagship import make_flagship


def run_steps(step, state, x, n, device):
    state = jax.device_put(state, device)
    x = jax.device_put(x, device)
    outs = []
    for _ in range(n):
        state, y = step(state, x)
        outs.append(y)
    return np.concatenate([np.asarray(o) for o in outs], axis=1)


def timed(step, state, x, n):
    xd = jax.device_put(x, jax.devices()[0])

    def fresh():  # new buffers every run: step donates its state argument
        return jax.tree.map(lambda a: jnp.array(np.asarray(a)), state)

    s = fresh()
    for _ in range(2):  # warmup
        s, y = step(s, xd)
    float(jnp.sum(y))  # force
    s = fresh()
    t0 = time.perf_counter()
    for _ in range(n):
        s, y = step(s, xd)
    float(jnp.sum(y))
    return time.perf_counter() - t0


def snr_db(ref, out):
    ref = np.asarray(ref, np.float64)
    out = np.asarray(out, np.float64)
    err = out - ref
    return 10 * np.log10(np.sum(ref**2) / max(np.sum(err**2), 1e-300))


def main():
    import os
    channels, chunk, n_check = 64, 147 * int(os.environ.get("SWEEP_CHUNK_BLOCKS", "256")), 4
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    fn, state, x = make_flagship(channels=channels, chunk=chunk)
    cpu_step = jax.jit(fn, device=cpu)
    ref = run_steps(cpu_step, state, x, n_check, cpu)

    n_long, n_short = 48, 6
    for prec in ("highest", "mixed", "high", "default"):
        with config.matmul_precision_scope(prec):
            fnp, st, xx = make_flagship(channels=channels, chunk=chunk)
            step = jax.jit(fnp, donate_argnums=(0,))
            out = run_steps(jax.jit(fnp), st, xx, n_check, tpu)
            s = snr_db(ref, out)
            print(f"{prec:8s}  snr_vs_cpu_f32 = {s:7.1f} dB", flush=True)
            t_long = timed(step, st, xx, n_long)
            t_short = timed(step, st, xx, n_short)
            dt = (t_long - t_short) / (n_long - n_short)
            sps = channels * chunk / dt
            print(
                f"{prec:8s}  snr_vs_cpu_f32 = {s:7.1f} dB   "
                f"step = {dt*1e3:6.2f} ms   {sps/1e9:6.2f} Gsamp/s"
            )


if __name__ == "__main__":
    main()
