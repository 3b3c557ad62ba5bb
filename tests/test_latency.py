"""End-to-end streaming latency budget (VERDICT r3 item 9).

The budget, as documented in docs/PERF_NOTES.md "Latency budget": a
sample fed at block ``i`` reaches the sink no later than
``lookahead * batch_blocks`` blocks after its block is dispatched, plus
up to ``batch_blocks - 1`` blocks of host-side batch collection — i.e.

    latency_blocks <= (lookahead + 1) * batch_blocks

(seconds: ``* block_size / sample_rate``; on an aggregated mesh pipe the
unit is ``a`` user blocks). Defaults (1, 1) reproduce the reference's
1-buffer skid (``fitting.go:56-60``). These tests measure the worst
observed feed->sink lag through the real executor for
lookahead in {1, 8, 32} and a batched case, and pin it to the budget.
"""

import numpy as np
import pytest

import pipe_tpu
from pipe_tpu.components import Sink, Source
from pipe_tpu.signal import SignalProperties


def _measure_lag(lookahead: int, batch_blocks: int, n_blocks: int = 64,
                 block: int = 128):
    """Max (blocks fed) - (blocks received) observed at any sink receive."""
    C = 1
    data = np.arange(C * n_blocks * block, dtype=np.float32).reshape(
        C, n_blocks * block
    )
    fed = [0]
    received = [0]
    max_lag = [0]
    pos = [0]

    def feed(n):
        if pos[0] >= data.shape[1]:
            return None
        c = data[:, pos[0]:pos[0] + n]
        pos[0] += n
        fed[0] += -(-c.shape[1] // block)
        return c

    def receive(arr):
        received[0] += arr.shape[1] / block
        max_lag[0] = max(max_lag[0], fed[0] - received[0])

    def src(ctx, bs):
        return Source(output=SignalProperties(44100.0, C), feed=feed)

    def snk(ctx, bs, props):
        return Sink(receive=receive)

    pipe_tpu.run(
        block,
        pipe_tpu.Line(source=src, sink=snk),
        lookahead=lookahead,
        batch_blocks=batch_blocks,
    )
    assert received[0] == n_blocks  # nothing lost
    return max_lag[0]


@pytest.mark.parametrize("lookahead", [1, 8, 32])
def test_latency_budget_lookahead(lookahead):
    lag = _measure_lag(lookahead, 1)
    assert lag <= (lookahead + 1) * 1, (
        f"lookahead={lookahead}: worst feed->sink lag {lag} blocks "
        f"exceeds the documented budget"
    )
    # and the budget is TIGHT at the default: 1-block skid like the
    # reference's cap-1 fitting
    if lookahead == 1:
        assert lag <= 2


def test_latency_budget_batched():
    lag = _measure_lag(lookahead=2, batch_blocks=8)
    assert lag <= (2 + 1) * 8, f"worst lag {lag} blocks"


def test_latency_budget_mesh_units():
    """On an aggregated mesh pipe the latency unit is a user blocks: the
    budget formula applies with block := a * block_size."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pipe_tpu import parallel

    mesh = parallel.make_mesh(1, 4)
    C, BLOCK, NB = 1, 100, 80  # agg a = 1001? no: 100*4 -> a=1? 100%4=0
    # force aggregation: block 100 not divisible by 4? it is. use 101.
    BLOCK = 101  # a = 4
    data = np.arange(C * NB * BLOCK, dtype=np.float32).reshape(C, -1)
    fed, received, max_lag, pos = [0], [0], [0], [0]

    def feed(n):
        if pos[0] >= data.shape[1]:
            return None
        c = data[:, pos[0]:pos[0] + n]
        pos[0] += n
        fed[0] += c.shape[1] / BLOCK
        return c

    def receive(arr):
        received[0] += arr.shape[1] / BLOCK
        max_lag[0] = max(max_lag[0], fed[0] - received[0])

    def src(ctx, bs):
        return Source(output=SignalProperties(44100.0, C), feed=feed)

    def snk(ctx, bs, props):
        return Sink(receive=receive)

    p = pipe_tpu.Pipe(
        BLOCK,
        pipe_tpu.Line(source=src, sink=snk),
        mesh=mesh,
        lookahead=1,
    )
    assert p._agg == 4
    p.start()
    p.wait(120)
    assert received[0] == NB
    # budget: (lookahead + 1) dispatches of a=4 user blocks each
    assert max_lag[0] <= (1 + 1) * 4, f"worst lag {max_lag[0]} user blocks"
