"""optimize.fuse rewrites beyond FIR+Resample (VERDICT r2 item 8):
biquad-cascade fusion and gain folding, streaming and sharded, with
delegate mutation routing and the zero-recompile-retune guarantee."""

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

import pipe_tpu
import pipe_tpu.optimize as optimize
from pipe_tpu import mock, ops, parallel
from pipe_tpu.graph import Line as _Line
from pipe_tpu.signal import Signal, SignalProperties, snr_db

from tests.test_ops import stream_through


def _count(procs):
    return len(procs)


# -- streaming: biquad cascade ------------------------------------------------


def test_fuse_biquad_run_streaming_parity_and_routing(rng):
    """Three adjacent Biquads collapse into ONE cascade; output matches the
    unfused line; set_sos on each ORIGINAL object mutates its own rows."""
    C, N, block = 2, 8192, 512
    x = rng.standard_normal((C, N)).astype(np.float32)
    rows = [
        ops.design_peaking_eq(44100, freq=f, q=q, gain_db=g)
        for f, q, g in ((500, 1.0, 3.0), (2000, 2.0, -4.0), (7000, 0.7, 2.0))
    ]
    eqs = [ops.Biquad(r) for r in rows]
    line = _Line(source=None, sink=None,
                 processors=[e.processor() for e in eqs])
    fused_line = optimize.fuse(line)
    assert _count(fused_line.processors) == 1
    y_fused = stream_through(fused_line.processors, x, block)

    eqs_ref = [ops.Biquad(r) for r in rows]
    y_seq = stream_through([e.processor() for e in eqs_ref], x, block)
    assert snr_db(y_seq.astype(np.float64), y_fused) > 110

    # routing: the MIDDLE original object's set_sos updates only its row
    new_row = ops.design_peaking_eq(44100, freq=2000, q=2.0, gain_db=0.0)
    m = eqs[1].set_sos(new_row)
    m.apply()
    comp = eqs[1]._delegate._component
    sos_now = np.asarray(comp.get_param("sos"))
    assert np.allclose(sos_now[1], (new_row / new_row[3]).astype(np.float32))
    assert np.allclose(
        sos_now[0], (rows[0] / rows[0][3]).astype(np.float32)
    )


def test_fuse_biquad_cascade_no_retrace(rng):
    """A per-part set_sos retune on the fused cascade does not retrace."""
    from pipe_tpu import mutable

    C, block = 1, 512
    rows = [
        ops.design_peaking_eq(44100, freq=500, q=1.0, gain_db=3.0),
        ops.design_peaking_eq(44100, freq=3000, q=1.0, gain_db=-3.0),
    ]
    eqs = [ops.Biquad(r) for r in rows]
    line = optimize.fuse(
        _Line(source=None, sink=None, processors=[e.processor() for e in eqs])
    )
    comp = line.processors[0](mutable.mutable(), block, SignalProperties(44100.0, C))

    traces = [0]
    base = comp.step

    def counting(state, params, sig):
        traces[0] += 1
        return base(state, params, sig)

    step = jax.jit(counting)
    sig = Signal(jnp.ones((C, block), jnp.float32), jnp.asarray(block, jnp.int32))
    st, y1 = step(comp.state, comp.params, sig)
    n = traces[0]
    eqs[0].set_sos(
        ops.design_peaking_eq(44100, freq=500, q=1.0, gain_db=-6.0)
    ).apply()
    st, y2 = step(st, comp.params, sig)
    assert traces[0] == n
    assert not np.allclose(np.asarray(y1.data), np.asarray(y2.data))


def test_fuse_biquad_mismatched_precision_not_fused():
    eq1 = ops.Biquad(ops.design_peaking_eq(44100, 500, 1.0, 3.0))
    eq2 = ops.Biquad(
        ops.design_peaking_eq(44100, 900, 1.0, 3.0), precision="extended"
    )
    line = optimize.fuse(_Line(
        source=None, sink=None,
        processors=[eq1.processor(), eq2.processor()],
    ))
    assert _count(line.processors) == 2


# -- streaming: gain folding --------------------------------------------------


def test_fuse_gain_into_fir_both_orders(rng):
    C, N, block = 2, 4096, 512
    x = rng.standard_normal((C, N)).astype(np.float32)
    h = np.asarray(ops.design_lowpass(63, 4000.0, 44100.0))
    oracle = 0.5 * scipy.signal.lfilter(h, [1.0], x.astype(np.float64), axis=1)

    for order in ("gf", "fg"):
        g = ops.Gain(0.5)
        f = ops.FIR(h)
        procs = (
            [g.processor(), f.processor()]
            if order == "gf"
            else [f.processor(), g.processor()]
        )
        line = optimize.fuse(_Line(source=None, sink=None, processors=procs))
        assert _count(line.processors) == 1
        y = stream_through(line.processors, x, block)
        assert snr_db(oracle, y) > 120

        # both retunes route through the fused component
        assert g._delegate is not None and f._delegate is not None


def test_fuse_gain_fir_live_retune_routing(rng):
    """set_gain on the ORIGINAL Gain after fusion lands mid-stream at a
    block boundary without recompiling."""
    g = ops.Gain(1.0)
    f = ops.FIR(np.asarray([1.0, 0.0, 0.0], np.float32))  # identity-ish FIR
    src = mock.Source(channels=1, value=1.0, interval=0.005)
    sink = mock.Sink()
    line = optimize.fuse(pipe_tpu.Line(
        source=src.source(),
        processors=[g.processor(), f.processor()],
        sink=sink.sink(),
    ))
    assert len(line.processors) == 1
    p = pipe_tpu.Pipe(256, line)
    p.start()
    import time

    while sink.samples < 256:
        time.sleep(0.005)
    le = p._exec_of_route[0]
    compiled = le.compile_counts()
    p.push(g.set_gain(2.0))
    while sink.samples < 256 * 8:
        time.sleep(0.005)
    p.stop(60)
    assert le.compile_counts() == compiled  # zero recompiles on retune
    v = sink.values[0]
    sw = np.where(np.diff(v) != 0)[0]
    assert len(sw) == 1 and (sw[0] + 1) % 256 == 0
    assert v[-1] == 2.0


def test_fuse_gain_into_mix_both_sides(rng):
    C, N, block = 4, 2048, 256
    x = rng.standard_normal((C, N)).astype(np.float32)
    m = rng.standard_normal((2, C)).astype(np.float32)
    gv = np.asarray([0.5, 1.5, 1.0, 2.0], np.float32)  # per-channel, C_in

    # upstream per-channel gain -> column scaling
    g = ops.Gain(gv)
    mx = ops.ChannelMix(m)
    line = optimize.fuse(_Line(
        source=None, sink=None, processors=[g.processor(), mx.processor()]
    ))
    assert _count(line.processors) == 1
    y = stream_through(line.processors, x, block)
    oracle = (m.astype(np.float64) * gv.astype(np.float64)[None, :]) @ x.astype(np.float64)
    assert snr_db(oracle, y) > 120

    # downstream scalar gain -> row scaling
    g2 = ops.Gain(0.25)
    mx2 = ops.ChannelMix(m)
    line2 = optimize.fuse(_Line(
        source=None, sink=None, processors=[mx2.processor(), g2.processor()]
    ))
    assert _count(line2.processors) == 1
    y2 = stream_through(line2.processors, x, block)
    assert snr_db(0.25 * m.astype(np.float64) @ x.astype(np.float64), y2) > 120
    # mutation routing after fusion
    assert g2._delegate is not None and mx2._delegate is not None
    g2.set_gain(1.0)
    mx2.set_matrix(m)


def test_fuse_gain_fir_does_not_starve_fir_resample(rng):
    """[Gain, FIR, Resampler]: the FIR+Resampler combined-bank rewrite
    (the bigger win) must still fire; the gain stays standalone."""
    g = ops.Gain(0.5)
    f = ops.FIR(ops.design_lowpass(63, 4000.0, 44100.0))
    rs = ops.Resampler(160, 147)
    line = optimize.fuse(_Line(
        source=None, sink=None,
        processors=[g.processor(), f.processor(), rs.processor()],
    ))
    assert _count(line.processors) == 2  # [Gain, FIRResampler]
    from pipe_tpu.ops.fused import FIRResampler

    assert isinstance(f._delegate, FIRResampler)
    assert isinstance(rs._delegate, FIRResampler)
    assert g._delegate is None  # gain NOT folded (delegate-free)

    # parity: fused == oracle
    x = rng.standard_normal((1, 147 * 20)).astype(np.float32)
    y = stream_through(line.processors, x, 588)
    from tests.test_ops import _resample_oracle
    from pipe_tpu.ops.resample import polyphase_design

    h64 = np.asarray(ops.design_lowpass(63, 4000.0, 44100.0))
    fx = scipy.signal.lfilter(h64, [1.0], 0.5 * x.astype(np.float64), axis=1)
    oracle = _resample_oracle(fx, polyphase_design(160, 147, 32), 160, 147)
    assert snr_db(oracle, y) > 100


def test_fuse_gain_fir_2d_taps_before_resampler_still_folds(rng):
    """[Gain, FIR(2-D per-channel taps), Resampler]: FIR+Resampler cannot
    fire (1-D taps only), so deferring the gain fold would drop BOTH
    rewrites (ADVICE r3 low). The gain must fold into the FIR."""
    C = 2
    taps2d = np.stack([
        np.asarray(ops.design_lowpass(63, 4000.0, 44100.0)),
        np.asarray(ops.design_lowpass(63, 6000.0, 44100.0)),
    ]).astype(np.float32)
    g = ops.Gain(0.5)
    f = ops.FIR(taps2d)
    rs = ops.Resampler(160, 147)
    line = optimize.fuse(_Line(
        source=None, sink=None,
        processors=[g.processor(), f.processor(), rs.processor()],
    ))
    assert _count(line.processors) == 2  # [FIRWithGain, Resampler]
    from pipe_tpu.ops.fused import FIRWithGain

    assert isinstance(g._delegate, FIRWithGain)
    assert isinstance(f._delegate, FIRWithGain)
    assert rs._delegate is None

    x = rng.standard_normal((C, 147 * 20)).astype(np.float32)
    y = stream_through(line.processors, x, 588)
    from tests.test_ops import _resample_oracle
    from pipe_tpu.ops.resample import polyphase_design

    fx = np.stack([
        scipy.signal.lfilter(taps2d[c].astype(np.float64), [1.0],
                             0.5 * x[c].astype(np.float64))
        for c in range(C)
    ])
    oracle = _resample_oracle(fx, polyphase_design(160, 147, 32), 160, 147)
    assert snr_db(oracle, y) > 100


def test_fuse_mix_gain_length_mismatch_rejected():
    """A per-channel gain whose length doesn't match the folded matrix
    dimension fails at construction, not as a mid-stream XLA error."""
    from pipe_tpu.ops.fused import MixWithGain

    m = np.ones((2, 4), np.float32)
    with pytest.raises(ValueError, match="cannot fold"):
        MixWithGain(m, np.ones(3, np.float32), side="in")
    with pytest.raises(ValueError, match="cannot fold"):
        MixWithGain(m, np.ones(4, np.float32), side="out")
    with pytest.raises(ValueError, match="cannot fold"):
        parallel.MixGainStage(m, np.ones(3, np.float32), side="in")
    # matching lengths construct fine
    MixWithGain(m, np.ones(4, np.float32), side="in")
    parallel.MixGainStage(m, np.ones(2, np.float32), side="out")

    # FIRWithGain validates per-channel gain length at alloc
    from pipe_tpu import mutable
    from pipe_tpu.ops.fused import FIRWithGain

    fw = FIRWithGain(np.ones(9, np.float32), np.ones(3, np.float32))
    with pytest.raises(ValueError, match="cannot fold"):
        fw.processor()(mutable.mutable(), 256, SignalProperties(44100.0, 2))


def test_fuse_gain_fir_retune_transient_contract(rng):
    """Pins the documented retune semantics of a folded gain->FIR pair: a
    live set_gain applies to the OUTPUT stream from exactly its landing
    sample (g * (h*x)), not through the filter tail."""
    BLOCK, T = 256, 33
    h = np.asarray(ops.design_lowpass(T, 5000.0, 44100.0))
    g = ops.Gain(1.0)
    f = ops.FIR(h)
    data = rng.standard_normal((1, BLOCK * 12)).astype(np.float32)
    pos = [0]

    def feed(n):
        if pos[0] >= data.shape[1]:
            return None
        c = data[:, pos[0] : pos[0] + n]
        pos[0] += n
        return c

    from pipe_tpu.components import Source

    sink = mock.Sink()
    line = optimize.fuse(pipe_tpu.Line(
        source=lambda ctx, b: Source(
            output=SignalProperties(44100.0, 1), feed=feed
        ),
        processors=[g.processor(), f.processor()],
        sink=sink.sink(),
    ))
    p = pipe_tpu.Pipe(BLOCK, line)
    p.start()
    SW = 6
    p.push(g.set_gain(2.0), at_block=SW)
    p.wait(60)

    y = scipy.signal.lfilter(h, [1.0], data.astype(np.float64), axis=1)
    gcurve = np.ones(data.shape[1])
    gcurve[SW * BLOCK :] = 2.0
    assert snr_db(y * gcurve, sink.values) > 110


# -- sharded twins ------------------------------------------------------------

pytestmark_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytestmark_mesh
def test_fuse_sharded_biquad_cascade_and_gain_fir(rng):
    """Sharded fusion behind the mesh Pipe API: a biquad run collapses to
    one cascade stage and a gain folds into the sharded FIR; parity vs the
    float64 oracle; targeted per-part retune lands exactly."""
    from tests.test_mesh_pipe import feed_source, run_pipe

    C, BLOCK = 2, 4096
    mesh = parallel.make_mesh(1, 4)
    x = rng.standard_normal((C, BLOCK * 3)).astype(np.float32)
    h = np.asarray(ops.design_lowpass(63, 4000.0, 44100.0))
    r1 = ops.design_peaking_eq(44100, freq=800, q=1.0, gain_db=4.0)
    r2 = ops.design_peaking_eq(44100, freq=3000, q=1.5, gain_db=-3.0)

    g = parallel.sharded.Gain(0.5)
    f = parallel.sharded.FIR(h)
    b1 = parallel.sharded.Biquad(r1)
    b2 = parallel.sharded.Biquad(r2)
    sink = mock.Sink()
    line = optimize.fuse(pipe_tpu.Line(
        source=feed_source(x, C),
        processors=[
            g.processor(), f.processor(), b1.processor(), b2.processor()
        ],
        sink=sink.sink(),
    ))
    # gain+fir -> 1, biquad run -> 1
    assert len(line.processors) == 2
    p = pipe_tpu.Pipe(BLOCK, line, mesh=mesh)
    run_pipe(p)

    y = scipy.signal.lfilter(h, [1.0], 0.5 * x.astype(np.float64), axis=1)
    y = scipy.signal.sosfilt(np.vstack([r1, r2]), y, axis=1)
    assert snr_db(y, sink.values) > 100
    assert b1._delegate is not None and g._delegate is not None


@pytestmark_mesh
def test_fuse_sharded_mix_gain(rng):
    from tests.test_mesh_pipe import feed_source, run_pipe

    C, BLOCK = 4, 2048
    mesh = parallel.make_mesh(2, 2)
    x = rng.standard_normal((C, BLOCK * 2)).astype(np.float32)
    m = rng.standard_normal((2, C)).astype(np.float32)

    g = parallel.sharded.Gain(0.5)
    mx = parallel.sharded.Mix(m)
    sink = mock.Sink()
    line = optimize.fuse(pipe_tpu.Line(
        source=feed_source(x, C),
        processors=[g.processor(), mx.processor()],
        sink=sink.sink(),
    ))
    assert len(line.processors) == 1
    p = pipe_tpu.Pipe(BLOCK, line, mesh=mesh)
    run_pipe(p)
    oracle = 0.5 * m.astype(np.float64) @ x.astype(np.float64)
    assert snr_db(oracle, sink.values) > 100


# -- r4: FIR cascade, Gain+OLS, and the optimize=True knob --------------------


def test_fuse_fir_run_streaming_parity_and_retune(rng):
    """Three adjacent FIRs collapse into one cascade; each original object
    retunes its own slot with zero recompiles."""
    h1 = ops.design_lowpass(63, 8000.0, 44100.0)
    h2 = ops.design_lowpass(31, 6000.0, 44100.0)
    h3 = ops.design_lowpass(15, 4000.0, 44100.0)
    f1, f2, f3 = ops.FIR(h1), ops.FIR(h2), ops.FIR(h3)
    line = optimize.fuse(_Line(
        source=None, sink=None,
        processors=[f1.processor(), f2.processor(), f3.processor()],
    ))
    assert _count(line.processors) == 1
    from pipe_tpu.ops.fused import FIRCascade

    assert isinstance(f2._delegate._cascade, FIRCascade)

    x = rng.standard_normal((2, 8192)).astype(np.float32)
    y = stream_through(line.processors, x, 512)
    o = x.astype(np.float64)
    for h in (h1, h2, h3):
        o = scipy.signal.lfilter(np.asarray(h), [1.0], o, axis=1)
    assert snr_db(o, y) > 100

    # per-slot retune through the ORIGINAL object
    h2b = ops.design_lowpass(31, 2000.0, 44100.0)
    m = f2.set_taps(h2b)
    assert m is not None
    m.apply()
    y2 = stream_through(line.processors, x, 512)  # fresh run, new taps
    o2 = x.astype(np.float64)
    for h in (h1, h2b, h3):
        o2 = scipy.signal.lfilter(np.asarray(h), [1.0], o2, axis=1)
    assert snr_db(o2, y2) > 100
    with pytest.raises(ValueError, match="shape"):
        f3.set_taps(np.ones(16, np.float32))  # wrong length


def test_fuse_fir_run_leaves_last_for_resampler(rng):
    """[FIR, FIR, Resampler]: the run rule leaves the last FIR for the
    combined-bank FIR+Resampler rewrite; 3 stages -> 2."""
    h1 = ops.design_lowpass(63, 8000.0, 44100.0)
    h2 = ops.design_lowpass(63, 4000.0, 44100.0)
    f1, f2 = ops.FIR(h1), ops.FIR(h2)
    rs = ops.Resampler(160, 147)
    line = optimize.fuse(_Line(
        source=None, sink=None,
        processors=[f1.processor(), f2.processor(), rs.processor()],
    ))
    assert _count(line.processors) == 2
    from pipe_tpu.ops.fused import FIRResampler

    assert isinstance(f2._delegate, FIRResampler)
    assert f1._delegate is None

    x = rng.standard_normal((1, 147 * 20)).astype(np.float32)
    y = stream_through(line.processors, x, 588)
    from tests.test_ops import _resample_oracle
    from pipe_tpu.ops.resample import polyphase_design

    o = x.astype(np.float64)
    for h in (h1, h2):
        o = scipy.signal.lfilter(np.asarray(h), [1.0], o, axis=1)
    oracle = _resample_oracle(o, polyphase_design(160, 147, 32), 160, 147)
    assert snr_db(oracle, y) > 100


def test_fuse_gain_ols_both_orders(rng):
    """Gain folds into an adjacent OLS (either order): exact by
    linearity; retunes through both originals still land."""
    P = 2000
    ir = (rng.standard_normal(P) * np.exp(-np.arange(P) / 300.0)).astype(
        np.float64
    )
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    for order in ("gain_first", "ols_first"):
        g = ops.Gain(0.5)
        conv = ops.OLSConvolve(ir)
        procs = (
            [g.processor(), conv.processor()]
            if order == "gain_first"
            else [conv.processor(), g.processor()]
        )
        line = optimize.fuse(_Line(source=None, sink=None, processors=procs))
        assert _count(line.processors) == 1, order
        from pipe_tpu.ops.fused import OLSWithGain

        assert isinstance(g._delegate, OLSWithGain)
        assert isinstance(conv._delegate, OLSWithGain)
        y = stream_through(line.processors, x, 512)
        oracle = 0.5 * scipy.signal.lfilter(
            ir, [1.0], x.astype(np.float64), axis=1
        )
        assert snr_db(oracle, y) > 100, order
        assert g.set_gain(0.25) is not None
        assert conv.set_ir(ir * 0.5) is not None


def test_fuse_sharded_fir_run_and_gain_ols(rng):
    """Sharded twins: FIR run -> FIRCascade stage; Gain+OLS -> OLSGain,
    parity on a 1x4 mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pipe_tpu import parallel

    mesh = parallel.make_mesh(1, 4)
    h1 = ops.design_lowpass(63, 8000.0, 44100.0)
    h2 = ops.design_lowpass(31, 4000.0, 44100.0)
    x = rng.standard_normal((2, 8192)).astype(np.float32)

    f1, f2 = parallel.sharded.FIR(h1), parallel.sharded.FIR(h2)
    g = parallel.sharded.Gain(0.5)
    P = 1500
    ir = (rng.standard_normal(P) * np.exp(-np.arange(P) / 250.0)).astype(
        np.float64
    )
    conv = parallel.sharded.OLS(ir)
    line = optimize.fuse(_Line(
        source=None, sink=None,
        processors=[f1.processor(), f2.processor(), g.processor(),
                    conv.processor()],
    ))
    # [FIRCascade, OLSGain]
    assert _count(line.processors) == 2
    from tests.test_mesh_pipe import feed_source

    sink = mock.Sink()
    p = pipe_tpu.Pipe(
        2048,
        pipe_tpu.Line(source=feed_source(x, 2),
                      processors=list(line.processors), sink=sink.sink()),
        mesh=mesh,
    )
    p.start()
    p.wait(120)
    o = x.astype(np.float64)
    for h in (h1, h2):
        o = scipy.signal.lfilter(np.asarray(h), [1.0], o, axis=1)
    oracle = scipy.signal.lfilter(ir, [1.0], 0.5 * o, axis=1)
    assert snr_db(oracle, sink.values) > 100
    # per-slot sharded retune routes through the cascade delegate
    assert f2.set_taps(ops.design_lowpass(31, 2000.0, 44100.0)) is not None
    assert g.set_gain(0.25) is not None
    assert conv.set_ir(ir * 2) is not None


def test_run_and_pipe_optimize_flag(rng):
    """run(..., optimize=True) / Pipe(..., optimize=True) apply the
    fusion fixpoint at build; output parity and live retunes hold."""
    h1 = ops.design_lowpass(63, 8000.0, 44100.0)
    h2 = ops.design_lowpass(31, 4000.0, 44100.0)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    f1, f2, g = ops.FIR(h1), ops.FIR(h2), ops.Gain(0.5)

    from tests.test_ops import stream_through as _st  # noqa: F401
    from pipe_tpu.components import Source
    from pipe_tpu.signal import SignalProperties

    pos = [0]

    def feed(n):
        if pos[0] >= x.shape[1]:
            return None
        c = x[:, pos[0]:pos[0] + n]
        pos[0] += n
        return c

    def src(ctx, block):
        return Source(output=SignalProperties(44100.0, 2), feed=feed)

    sink = mock.Sink()
    pipe_tpu.run(
        512,
        pipe_tpu.Line(source=src,
                      processors=[f1.processor(), f2.processor(),
                                  g.processor()],
                      sink=sink.sink()),
        optimize=True,
    )
    # FIR+FIR cascaded (the gain stays standalone after the cascade
    # consumes its neighbor's tag); retunes still route
    from pipe_tpu.ops.fused import FIRCascade  # noqa: F401

    assert f1._delegate is not None
    assert f2._delegate is not None
    o = x.astype(np.float64)
    for h in (h1, h2):
        o = scipy.signal.lfilter(np.asarray(h), [1.0], o, axis=1)
    assert snr_db(0.5 * o, sink.values) > 100
