"""Static collective-traffic regression tests (VERDICT r2 item 7).

Compiles each stage's sharded chunk step on the 2x4 virtual mesh, walks the
optimized SPMD HLO, and asserts the per-device collective-bytes : payload
ratio against a checked-in bound (the measured value plus slack). A stage
that silently starts over-communicating — say a refactor that all-gathers
its input — fails here instead of landing as a scaling regression on real
hardware. The bounds mirror the table in docs/PERF_NOTES.md; the
measurement convention (raw collective OUTPUT bytes per device per chunk)
is documented in ``benchmarks/scaling.py::collective_bytes``.
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

from pipe_tpu import ops, parallel as par  # noqa: E402

from benchmarks.scaling import collective_bytes  # noqa: E402


def _ratio(stages, channels, chunk):
    mesh = par.make_mesh(2, 4)
    chain = par.ShardedChain(mesh, stages, channels=channels, chunk_frames=chunk)
    x = np.zeros((channels, chunk), np.float32)
    txt = (
        chain._step.lower(chain.carries, chain.params(), x).compile().as_text()
    )
    coll = collective_bytes(txt)
    n_local = chunk // mesh.shape["time"]
    c_local = channels // mesh.shape["ch"]
    payload = c_local * n_local * 4
    return sum(coll.values()) / payload, coll


# (name, stage factory, chunk, max ratio). Bounds = measured + ~15% slack.
CASES = [
    ("gain", lambda: [par.GainStage(0.5)], 32768, 0.0),
    (
        "fir255",
        lambda: [par.FIRStage(ops.design_lowpass(255, 4000, 44100))],
        32768,
        0.2,
    ),
    (
        "fir_resample",
        lambda: [
            par.FIRResampleStage(
                ops.design_lowpass(255, 4000, 44100), 48000, 44100
            )
        ],
        147 * 256 * 4,
        0.05,
    ),
    (
        "ols_64k_distributed_fdl",
        lambda: [
            par.OLSStage(
                np.random.default_rng(0).standard_normal(65536)
                * np.exp(-np.arange(65536) / 8000.0)
            )
        ],
        32768,
        4.5,  # two spectrum transposes: the family floor is 4.0
    ),
    (
        "biquad_refined",
        lambda: [
            par.BiquadStage(
                ops.design_peaking_eq(44100, freq=1000, q=10.0, gain_db=6.0)
            )
        ],
        32768,
        0.01,
    ),
    ("compressor", lambda: [par.CompressorStage()], 32768, 0.005),
    (
        "spectral_gain",
        lambda: [par.SpectralGainStage(1024, 256)],
        32768,
        1.1,
    ),
    (
        "mix_psum",
        lambda: [par.MixStage(np.ones((2, 16), np.float32) / 16)],
        32768,
        0.3,
    ),
    # Delay (r4, VERDICT r3 item 2): time-sharded block ring — the tap
    # moves EXACTLY the needed D-or-n-wide window slices; the carry
    # update is a local roll (zero collectives). Measured 0.037.
    ("delay_pure_300", lambda: [par.DelayStage(300, wet=1.0)], 32768, 0.05),
    # one-hop, D-wide slice: ratio = D/n_local = 0.61 (was 3.05 with the
    # replicated-history design)
    (
        "delay_pure_5000",
        lambda: [par.DelayStage(5000, wet=1.0)],
        32768,
        0.75,
    ),
    # D > n_local (n_local = 8192 here): the MULTI-HOP regime — two
    # exact-window slices totalling n samples: ratio = 1.0 exactly
    # (was 6.0 with two whole-block permutes + the full-chunk gather)
    (
        "delay_pure_20000_multihop",
        lambda: [par.DelayStage(20000, wet=1.0)],
        32768,
        1.2,
    ),
    # feedback, D < chunk: the offsets-only ladder moves
    # (log2(T)+1)=3 (C, D) copies + one psum carry rebroadcast;
    # ratio = 4*D/n_local. Measured 0.146 (was 0.26 when the (D,) gains
    # and the rotation rode the ladder and the carry was all_gathered).
    (
        "delay_feedback_300",
        lambda: [par.DelayStage(300, feedback=0.5)],
        32768,
        0.2,
    ),
    # feedback, the ladder's worst remaining corner (D just under
    # n_local; D > n_local is the wave-DAG's band since r5): bounded by
    # 4*D/n_local with D <= n_local. Measured 2.441 — bound tightened
    # 2.9 -> 2.6 with the band now closed (VERDICT r4 item 7).
    (
        "delay_feedback_5000",
        lambda: [par.DelayStage(5000, feedback=0.5)],
        32768,
        2.6,
    ),
    # feedback, n_local < D < N: the r5 WAVE-DAG — ceil(N/D) elementwise
    # waves of exact-slice fetches. Measured 3.00 at D=12000 (W=3; the
    # ladder measured 5.86 here) and 2.00 at D=0.7N (ladder: 11.20) —
    # benchmarks/delay_wave_dag.py has the full shootout.
    (
        "delay_feedback_12000_wave",
        lambda: [par.DelayStage(12000, feedback=0.5)],
        32768,
        3.4,
    ),
    (
        "delay_feedback_22937_wave",
        lambda: [par.DelayStage(22937, feedback=0.5)],
        32768,
        2.3,
    ),
    # feedback, D >= chunk: structurally FREE — the ring stores the
    # summed stream and the recurrence never crosses devices in-chunk;
    # same exact-slice traffic as a pure delay (<= 1.0; the aligned hop
    # here is even local). Measured 0.883.
    (
        "delay_feedback_40000",
        lambda: [par.DelayStage(40000, feedback=0.5)],
        32768,
        1.0,
    ),
]


@pytest.mark.parametrize("name,stages,chunk,bound", CASES, ids=[c[0] for c in CASES])
def test_stage_collective_ratio(name, stages, chunk, bound):
    ratio, coll = _ratio(stages(), 16, chunk)
    assert ratio <= bound, (
        f"{name}: collective ratio {ratio:.3f} > bound {bound} ({coll}); "
        "a stage started over-communicating (or the bound needs a "
        "deliberate, documented update in docs/PERF_NOTES.md)"
    )


def test_delay_ring_carry_is_time_sharded():
    """The Delay block ring must stay time-sharded (memory /T): a
    regression to the r3 replicated (C, D) history would multiply state
    memory by the time-axis size AND force the full-chunk gather back."""
    from jax.sharding import PartitionSpec as P
    from pipe_tpu.parallel.mesh import CH_AXIS, TIME_AXIS

    for D, fb in ((20000, 0.0), (40000, 0.5)):
        st = par.DelayStage(D, feedback=fb, wet=1.0)
        st.time_shards = 4
        st.build(16, 8, 8192)
        assert st.carry_spec == {"ring": P(CH_AXIS, TIME_AXIS)}
        kc = -(-D // 32768)
        # per-device share = kc blocks of n_local, NOT O(D) replicated
        assert st.carry["ring"].shape == (16, kc * 32768)
    # D < chunk with feedback: the replicated history is bounded by D
    st = par.DelayStage(5000, feedback=0.5)
    st.time_shards = 4
    st.build(16, 8, 8192)
    assert st.carry["hist"].shape == (16, 5000)


def test_ols_distributed_fdl_carry_is_sharded():
    """The FDL carry must stay bin-sharded (memory /T): a regression to a
    replicated carry would multiply state memory by the time-axis size."""
    from jax.sharding import PartitionSpec as P
    from pipe_tpu.parallel.mesh import CH_AXIS, TIME_AXIS

    st = par.OLSStage(np.ones(65536, np.float32))
    st.time_shards = 4
    st.build(16, 8, 8192)
    assert st.carry_spec == {"zfdl": P(None, None, CH_AXIS, TIME_AXIS)}
    K = st._K
    assert st.carry["zfdl"].shape[0] == K
    # bins padded to T equal slices; per-device share is binsP // T
    assert st._bins_pad % 4 == 0
