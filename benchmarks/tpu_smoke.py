"""TPU op smoke: run every op's device block-function on the attached
TPU and check finiteness — catches backend gaps (e.g. the complex64
arithmetic hole that broke OLS) before they reach a benchmark.

Run: ``python benchmarks/tpu_smoke.py``; prints one OK/FAIL line per op.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pipe_tpu import ops
    from pipe_tpu.ops import biquad as bq
    from pipe_tpu.ops import dynamics as dyn
    from pipe_tpu.ops import fir as fir_m
    from pipe_tpu.ops import fused as fused_m
    from pipe_tpu.ops import ols as ols_m
    from pipe_tpu.ops import resample as rs_m

    rng = np.random.default_rng(0)
    C, B = 4, 2048
    x = jnp.asarray(rng.standard_normal((C, B)), jnp.float32)
    frames = jnp.asarray(B, jnp.int32)
    results = []

    def check(name, fn):
        try:
            out = jax.jit(fn)()
            ok = bool(jnp.isfinite(jnp.ravel(out)[-1]))
            results.append((name, "OK" if ok else "NONFINITE"))
        except Exception as e:  # noqa: BLE001 - report any backend failure
            results.append((name, f"FAIL {type(e).__name__}: {str(e)[:80]}"))

    check("gain", lambda: ops.gain_block(x, jnp.asarray(0.5)))
    check("mix", lambda: ops.channel_mix_block(
        x, jnp.asarray(np.ones((2, C), np.float32))))

    h = jnp.asarray(ops.design_lowpass(255, 4000.0, 44100.0), jnp.float32)
    tail = fir_m.fir_init_tail(C, 255)
    check("fir", lambda: fir_m.fir_block(tail, x, frames, h)[1])

    hp = jnp.asarray(rs_m.polyphase_design(160, 147, 16), jnp.float32)
    hist = jnp.zeros((C, 15), jnp.float32)
    x147 = x[:, : (B // 147) * 147]
    check("resample", lambda: rs_m.resample_apply(hist, x147, hp, 160, 147))

    check("fused", lambda: fused_m.fused_apply(
        jnp.zeros((C, 15 + 254), jnp.float32), x147, h, hp, 160, 147))

    spec = jnp.asarray(ols_m.partition_ir(
        rng.standard_normal(5000) * np.exp(-np.arange(5000) / 800), B))
    ost = ols_m.ols_init_state(C, B, spec.shape[1])
    check("ols", lambda: ols_m.ols_block(ost, x, frames, spec)[1])

    sos = jnp.asarray(np.asarray(
        ops.design_peaking_eq(44100, freq=1000, q=1.0, gain_db=3.0)[None, :],
        np.float32))
    bst = bq.biquad_init_state(C, 1)
    check("biquad(pallas)", lambda: bq.biquad_block(bst, x, frames, sos)[1])

    env0 = jnp.zeros((C, 2), jnp.float32)
    check("envelope", lambda: dyn.envelope_block(
        env0, jnp.abs(x), frames,
        jnp.asarray(0.999, jnp.float32), jnp.asarray(0.1, jnp.float32))[2])
    check("comp_gain", lambda: dyn.compressor_gain(
        jnp.abs(x), jnp.asarray(-18.0), jnp.asarray(4.0), jnp.asarray(0.0)))

    from pipe_tpu.ops import channelizer as chn

    gp = jnp.asarray(chn.polyphase_branches(chn.design_prototype(8, 12), 8), jnp.float32)
    chist = jnp.zeros((C, 8 * (gp.shape[1] - 1)), jnp.float32)
    check("channelizer", lambda: chn.channelize_block(chist, x, gp, 8)[1])

    from pipe_tpu.ops import spectral as sp

    wa, ws = sp.design_stft_window(512, 128)
    sst = sp.spectral_init_state(C, 512, 128)
    check("spectral", lambda: sp.spectral_block(
        sst, x, frames, lambda re, im: (re * 0.5, im * 0.5),
        jnp.asarray(wa), jnp.asarray(ws), 128)[1][0])

    from pipe_tpu.ops.demod import osc_block, _rationalize

    num, den = _rationalize(440.0, 44100.0)
    check("oscillator", lambda: osc_block(
        jnp.asarray(0, jnp.int32), num, den, B)[0])

    # r4-rewritten STREAMING carry paths on the device, via the public
    # Pipe with an awkward block size: STFT hop-residue carry (hop does
    # not divide the block), channelizer pend carry (block not a K
    # multiple), block-ring feedback delay (D > block), partial final
    # block included (limit % block != 0)
    def stream_check(name, make_procs, channels=2, block=500, blocks=12):
        try:
            import pipe_tpu
            from pipe_tpu import mock

            src = mock.Source(
                value=0.5, channels=channels, limit=block * blocks + 123
            )
            sink = mock.Sink()
            pipe_tpu.run(
                block,
                pipe_tpu.Line(
                    source=src.source(), processors=make_procs(),
                    sink=sink.sink(),
                ),
            )
            ok = sink.values.size > 0 and bool(
                np.isfinite(sink.values).all()
            )
            results.append((name, "OK" if ok else "NONFINITE"))
        except Exception as e:  # noqa: BLE001 - report any backend failure
            results.append((name, f"FAIL {type(e).__name__}: {str(e)[:80]}"))

    from pipe_tpu import ops as _ops

    stream_check(
        "stream_stft_hop_residue",
        lambda: [_ops.SpectralGain(240, 48).processor()],
    )
    stream_check(
        "stream_channelizer_pend", lambda: [_ops.Channelizer(8).processor()]
    )
    stream_check(
        "stream_ring_delay_fb",
        lambda: [_ops.Delay(1234, feedback=0.4, wet=0.5, dry=0.5).processor()],
    )

    width = max(len(n) for n, _ in results)
    failed = False
    for name, status in results:
        print(f"{name:{width}s}  {status}")
        failed |= status != "OK"
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
