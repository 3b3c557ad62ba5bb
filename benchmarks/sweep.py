"""One-off perf sweep on the real chip: isolate FIR / resample / mix costs
and sweep tuning knobs (FIR frame size S, resampler supercycle group G).

Not part of the test suite; run manually: ``python benchmarks/sweep.py``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pipe_tpu.ops.fir import design_lowpass, fir_apply, fir_init_tail
from pipe_tpu.ops.resample import polyphase_design, resample_apply

C = 64
B = 147 * 2048  # 301056


def timeit(fn, *args, steps=10, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, B)), jnp.float32)
    h = jnp.asarray(design_lowpass(255, 4000.0, 44100.0), jnp.float32)
    hp = jnp.asarray(polyphase_design(160, 147, 32), jnp.float32)
    tail = fir_init_tail(C, 255)
    hist = jnp.zeros((C, 31), jnp.float32)

    dt = timeit(lambda x: fir_apply(tail, x, h), x)
    print(f"FIR-255 (default S): {C*B/dt/1e9:.2f} Gsamples/s ({dt*1e3:.2f} ms)")

    for G in (1, 2, 4, 8, 16):
        if (B // 147) % G:
            continue
        dt = timeit(lambda x, G=G: resample_apply(hist, x, hp, 160, 147, group=G), x)
        print(f"resample G={G:2d}: {C*B/dt/1e9:.2f} Gsamples/s ({dt*1e3:.2f} ms)")

    from pipe_tpu.flagship import make_flagship

    for G in (None,):
        fn, state, xx = make_flagship(channels=C, chunk=B)
        step = jax.jit(fn, donate_argnums=(0,))
        state2, y = step(state, xx)
        jax.block_until_ready(y)
        st = jax.device_put(state)
        t0 = time.perf_counter()
        steps = 10
        for _ in range(steps):
            st, y = step(st, xx)
        jax.block_until_ready((st, y))
        dt = (time.perf_counter() - t0) / steps
        print(f"flagship chain: {C*B/dt/1e9:.2f} Gsamples/s ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
