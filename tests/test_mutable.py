"""Mutability unit tests — port of the reference behavioral spec
(``mutable/mutable_test.go``, ``mutable/pusher_test.go``)."""

import pytest

from pipe_tpu import mutable


class Mock:
    """Counter mutated via closures (mutable_test.go:11-24)."""

    def __init__(self):
        self.context = mutable.mutable()
        self.value = 0

    def add_delta(self, delta):
        def fn():
            self.value += delta

        return self.context.mutate(fn)


# -- put/apply (mutable_test.go:26-77) --------------------------------------

@pytest.mark.parametrize(
    "ops_expected",
    [
        [(1, 10)],
        [(2, 20)],
        [(3, 30), (4, 40)],
    ],
)
def test_put_mutations(ops_expected):
    mocks = [Mock() for _ in ops_expected]
    ms = mutable.Mutations()
    for mock, (ops, _) in zip(mocks, ops_expected):
        for _ in range(ops):
            ms.put(mock.add_delta(10))
    for mock, (_, expected) in zip(mocks, ops_expected):
        ms.apply_to(mock.context)
        assert mock.value == expected
        assert mock.context.is_mutable()


def test_apply_to_removes_entry():
    mock = Mock()
    ms = mutable.Mutations().put(mock.add_delta(10))
    ms.apply_to(mock.context)
    assert mock.value == 10
    ms.apply_to(mock.context)  # second apply: entry gone, no-op
    assert mock.value == 10


def test_apply_to_error_keeps_entry():
    """First error stops the run and leaves the entry (mutable.go:79-94
    returns before the delete)."""
    mock = Mock()
    boom = RuntimeError("boom")

    def bad():
        raise boom

    ms = mutable.Mutations()
    ms.put(mock.context.mutate(bad))
    ms.put(mock.add_delta(10))
    with pytest.raises(RuntimeError):
        ms.apply_to(mock.context)
    assert mock.value == 0
    assert len(ms) == 2  # entry retained


# -- append (mutable_test.go:79-119) -----------------------------------------

@pytest.mark.parametrize("ops_expected", [[(1, 10)], [(2, 20), (3, 30)]])
def test_append_mutations(ops_expected):
    mocks = [Mock() for _ in ops_expected]
    ms = mutable.Mutations()
    for mock, (ops, _) in zip(mocks, ops_expected):
        for _ in range(ops):
            other = mutable.Mutations().put(mock.add_delta(10))
            ms.append(other)
    for mock, (_, expected) in zip(mocks, ops_expected):
        ms.apply_to(mock.context)
        assert mock.value == expected


def test_append_none():
    ms = mutable.Mutations()
    assert ms.append(None) is ms


# -- detach (mutable_test.go:121-180) ----------------------------------------

@pytest.mark.parametrize(
    "ops_expected", [[(1, 10)], [(2, 20), (3, 30)], [(4, 40), (0, 0)]]
)
def test_detach_mutations(ops_expected):
    mocks = [Mock() for _ in ops_expected]
    ms = mutable.Mutations()
    for mock, (ops, _) in zip(mocks, ops_expected):
        for _ in range(ops):
            ms.put(mock.add_delta(10))
    for mock, (_, expected) in zip(mocks, ops_expected):
        d = ms.detach(mock.context)
        ms.apply_to(mock.context)
        assert mock.value == 0  # detached: applying the original is a no-op
        if d is not None:
            d.apply_to(mock.context)
        assert mock.value == expected


# -- mutability predicate (mutable_test.go:182-199) ---------------------------

def test_mutability():
    assert not mutable.immutable().is_mutable()
    assert mutable.mutable().is_mutable()
    with pytest.raises(mutable.ImmutableContextError):
        mutable.immutable().mutate(lambda: None)
    mock = Mock()
    mock.add_delta(10).apply()
    assert mock.value == 10


def test_put_immutable_is_noop():
    ms = mutable.Mutations()
    m = mutable.Mutation(mutable.IMMUTABLE, lambda: None)
    ms.put(m)
    assert len(ms) == 0


def test_context_identity():
    a, b = mutable.mutable(), mutable.mutable()
    assert a != b
    assert a == a
    assert len({a, b, mutable.IMMUTABLE}) == 3


# -- pusher (pusher_test.go:10-31) --------------------------------------------

def test_pusher():
    p = mutable.Pusher()
    ctx1 = mutable.mutable()
    d = mutable.new_destination()
    p.add_destination(ctx1, d)

    hits = []
    p.put(ctx1.mutate(lambda: hits.append(1)))
    p.push()
    ms = d.take()
    assert ms is not None
    ms.apply_to(ctx1)
    assert hits == [1]

    with pytest.raises(mutable.UnknownContextError):
        ctx2 = mutable.mutable()
        p.put(ctx2.mutate(lambda: None))


def test_destination_merges_batches():
    d = mutable.new_destination()
    hits = []
    ctx = mutable.mutable()
    d.put(mutable.Mutations().put(ctx.mutate(lambda: hits.append(1))))
    d.put(mutable.Mutations().put(ctx.mutate(lambda: hits.append(2))))
    ms = d.take()
    ms.apply_to(ctx)
    assert hits == [1, 2]  # delivery preserves push order
    assert d.take() is None
