"""Dynamic graph / tape (Level-4 twin) tests."""

import numpy as np

import jax.numpy as jnp

from ccv_tpu.nn import optimizers
from ccv_tpu.nn.dynamic import DynamicGraph


def test_exec_and_backward():
    g = DynamicGraph()
    rng = np.random.default_rng(0)
    x = g.variable(rng.standard_normal((3, 4)).astype(np.float32))
    w = g.variable(rng.standard_normal((4, 2)).astype(np.float32))
    y = g.exec(lambda a, b: a @ b, x, w)
    loss = g.exec(lambda v: jnp.sum(v * v), y)
    dw, = g.backward(loss, (w,))
    # analytic: d/dw sum((xw)^2) = 2 x^T (x w)
    expect = 2 * x.numpy().T @ (x.numpy() @ w.numpy())
    np.testing.assert_allclose(np.asarray(dw), expect, rtol=1e-5)


def test_backward_multiple_wrt_and_seed():
    g = DynamicGraph()
    a = g.variable(np.float32(3.0))
    b = g.variable(np.float32(4.0))
    c = g.exec(lambda u, v: u * v, a, b)
    d = g.exec(lambda u: u + 1.0, c)
    da, db = g.backward(d, (a, b), dy=2.0)
    assert float(da) == 8.0 and float(db) == 6.0


def test_no_grad_skips_tape():
    g = DynamicGraph()
    a = g.variable(np.float32(2.0))
    with g.no_grad():
        b = g.exec(lambda u: u * 10.0, a)
    assert len(g._tape) == 0
    assert float(b.value) == 20.0


def test_minimize_converges():
    g = DynamicGraph()
    w = g.variable(np.float32(5.0))
    opt = optimizers.sgd(rate=0.2, momentum=0.0)
    state = None
    for _ in range(30):
        g.reset_tape()
        loss = g.exec(lambda v: (v - 1.0) ** 2, w)
        state = g.minimize(loss, opt, (w,), state)
    assert abs(float(w.value) - 1.0) < 1e-2


def test_dot_output():
    g = DynamicGraph()
    a = g.variable(np.float32(1.0))
    g.exec(jnp.sin, a)
    assert "sin" in g.dot()


def test_while_loop_forward_and_grad():
    import jax
    import jax.numpy as jnp

    from ccv_tpu.nn.control_flow import while_loop

    # unbounded form
    out = while_loop(lambda c: c[0] < 10.0,
                     lambda c: (c[0] * 2.0, c[1] + 1),
                     (jnp.float32(1.0), jnp.int32(0)))
    assert float(out[0]) == 16.0 and int(out[1]) == 4

    # bounded (scan) form is reverse-differentiable: d/dx of x*2^4
    def f(x):
        out = while_loop(lambda c: c < 10.0, lambda c: c * 2.0, x,
                         max_iter=8)
        return out

    assert float(f(jnp.float32(1.0))) == 16.0
    assert float(jax.grad(f)(jnp.float32(1.0))) == 16.0


def test_case_of_branches_and_grad():
    import jax
    import jax.numpy as jnp

    from ccv_tpu.nn.control_flow import case_of

    x = jnp.float32(3.0)
    br = [lambda v: v * 2.0, lambda v: v * v, lambda v: -v]
    assert float(case_of(1, br, x)) == 9.0
    assert float(case_of(0, br, x)) == 6.0
    g = jax.grad(lambda v: case_of(1, br, v))(x)
    assert float(g) == 6.0

    # jit + traced index (the case_of expression form)
    @jax.jit
    def pick(i, v):
        return case_of(i, br, v)

    assert float(pick(jnp.int32(2), x)) == -3.0
