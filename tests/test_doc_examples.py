"""Documentation examples as golden tests — the analog of the reference's
``Example`` functions with ``// Output:`` blocks
(``mutable/example_mutable_test.go:22-40``, ``doc.go:48-79``). Every code
sample here mirrors README.md; if these fail, the docs lie."""

import numpy as np

import pipe_tpu
from pipe_tpu import mock, mutable, ops


def test_example_mutation():
    """Mirror of Example_mutation: creating a mutation does not apply it;
    Apply does (``example_mutable_test.go:22-40``)."""

    class Component:
        def __init__(self):
            self.context = mutable.mutable()
            self.parameter = 0

        def set_parameter(self, value):
            def fn():
                self.parameter = value

            return self.context.mutate(fn)

    component = Component()
    outputs = [component.parameter]  # 0

    mutation = component.set_parameter(10)
    outputs.append(component.parameter)  # still 0: not applied yet

    mutation.apply()
    outputs.append(component.parameter)  # 10

    assert outputs == [0, 0, 10]


def test_example_doc_walkthrough():
    """The doc.go build-then-run walkthrough (``doc.go:48-79``) in
    pipe_tpu terms: define a Line, bind with Pipe, Start, Wait."""
    src = mock.Source(channels=2, value=0.5, limit=512 * 10)
    sink = mock.Sink()
    g = ops.Gain(2.0)

    l1 = pipe_tpu.Line(
        source=src.source(),
        processors=pipe_tpu.Processors(g.processor()),
        sink=sink.sink(),
    )

    p = pipe_tpu.Pipe(512, l1)  # binds: allocators run here
    p.start()
    p.wait(60)

    out = sink.values
    assert out.shape == (2, 512 * 10)
    assert np.allclose(out, 1.0)  # 0.5 * gain 2.0


def test_example_readme_quickstart():
    """README 'Quick start': source -> FIR -> gain -> sink, one-shot run."""
    src = mock.Source(channels=1, value=1.0, limit=2048)
    fir = ops.FIR(ops.design_lowpass(101, 4000.0, 44100.0))
    g = ops.Gain(0.5)
    sink = mock.Sink()

    line = pipe_tpu.Line(
        source=src.source(),
        processors=pipe_tpu.Processors(fir.processor(), g.processor()),
        sink=sink.sink(),
    )
    pipe_tpu.run(512, line)

    out = sink.values
    assert out.shape == (1, 2048)
    # DC gain of the normalized lowpass is 1.0; steady state = 1.0 * 0.5
    assert np.allclose(out[0, 200:], 0.5, atol=1e-3)
