"""while / case_of forward AND backward coverage — the twin of the
reference's test/unit/nnc/{while,case.of}.tests.c and the while/case_of
sections of autograd.tests.c (backward-through-control-flow via tape,
lib/nnc/ccv_nnc_tensor_tape.c). Here the tape is jax's scan residuals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccv_tpu.nn.control_flow import case_of, while_loop


# ---------------------------------------------------------------------------
# while: forward
# ---------------------------------------------------------------------------

def test_while_counts_to_five():
    out = while_loop(lambda c: c[0] < 5,
                     lambda c: (c[0] + 1, c[1] * 2.0),
                     (jnp.int32(0), jnp.float32(1.0)))
    assert int(out[0]) == 5
    assert float(out[1]) == 32.0


def test_while_tensor_carry():
    # the reference's while tests iterate a graph over a tensor carry
    x = jnp.ones((2, 2))
    out = while_loop(lambda c: jnp.sum(c) < 20.0, lambda c: c + c, x)
    np.testing.assert_allclose(np.asarray(out), 8.0)


def test_while_zero_iterations():
    out = while_loop(lambda c: c < 0, lambda c: c + 1, jnp.int32(3))
    assert int(out) == 3


def test_while_max_iter_matches_unbounded():
    init = jnp.float32(1.0)
    unbounded = while_loop(lambda c: c < 100.0, lambda c: c * 3.0, init)
    bounded = while_loop(lambda c: c < 100.0, lambda c: c * 3.0, init,
                         max_iter=10)
    assert float(unbounded) == float(bounded)


def test_while_max_iter_truncates():
    out = while_loop(lambda c: c < 1e9, lambda c: c + 1.0, jnp.float32(0.0),
                     max_iter=7)
    assert float(out) == 7.0


def test_while_under_jit():
    f = jax.jit(lambda x: while_loop(lambda c: jnp.max(c) < 10.0,
                                     lambda c: c * 2.0, x))
    np.testing.assert_allclose(np.asarray(f(jnp.full((3,), 1.5))), 12.0)


# ---------------------------------------------------------------------------
# while: backward (scan-lowered form; autograd.tests.c while-grad analog)
# ---------------------------------------------------------------------------

def test_while_backward_power():
    # y = x * 2^k where the loop runs k=4 times (cond: c < 16*x0 with x0=1)
    def f(x):
        return while_loop(lambda c: c < 15.9, lambda c: c * 2.0, x,
                          max_iter=8)

    g = jax.grad(f)(jnp.float32(1.0))
    # 1 -> 2 -> 4 -> 8 -> 16: four doublings, d out/d in = 16
    assert float(f(jnp.float32(1.0))) == 16.0
    np.testing.assert_allclose(float(g), 16.0)


def test_while_backward_data_dependent_trip_count():
    # gradient reflects the ACTUAL trip count of each input
    def f(x):
        return while_loop(lambda c: c < 10.0, lambda c: c * 2.0, x,
                          max_iter=16)

    # x=1: 1,2,4,8,16 -> 4 iters, grad 16;  x=3: 3,6,12 -> 2 iters, grad 4
    np.testing.assert_allclose(float(jax.grad(f)(jnp.float32(1.0))), 16.0)
    np.testing.assert_allclose(float(jax.grad(f)(jnp.float32(3.0))), 4.0)


def test_while_backward_tensor_carry():
    w = jnp.asarray([[0.5, 0.1], [0.2, 0.4]], jnp.float32)

    def f(x):
        out = while_loop(lambda c: jnp.sum(c * c) < 4.0,
                         lambda c: w @ c, x, max_iter=6)
        return jnp.sum(out)

    g = jax.grad(f)(jnp.asarray([1.0, 2.0], jnp.float32))
    # finite-difference oracle
    eps = 1e-3
    base = np.asarray([1.0, 2.0], np.float32)
    for i in range(2):
        d = base.copy()
        d[i] += eps
        fd = (float(f(jnp.asarray(d))) - float(f(jnp.asarray(base)))) / eps
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-2, atol=2e-3)


def test_while_backward_under_jit():
    def f(x):
        return while_loop(lambda c: c < 5.0, lambda c: c + x, jnp.float32(0.0),
                          max_iter=10)

    g = jax.jit(jax.grad(f))(jnp.float32(1.0))
    # 5 additions of x (0->5), each contributes 1
    np.testing.assert_allclose(float(g), 5.0)


# ---------------------------------------------------------------------------
# case_of: forward (case.of.tests.c analog)
# ---------------------------------------------------------------------------

def test_case_of_selects_branch():
    branches = [lambda x: x + 1.0, lambda x: x * 2.0, lambda x: -x]
    x = jnp.float32(3.0)
    assert float(case_of(0, branches, x)) == 4.0
    assert float(case_of(1, branches, x)) == 6.0
    assert float(case_of(2, branches, x)) == -3.0


def test_case_of_clamps_out_of_range():
    branches = [lambda x: x, lambda x: x * 10.0]
    assert float(case_of(-3, branches, jnp.float32(1.0))) == 1.0
    assert float(case_of(99, branches, jnp.float32(1.0))) == 10.0


def test_case_of_traced_index():
    branches = [lambda x: x + 1.0, lambda x: x * 2.0]

    @jax.jit
    def f(i, x):
        return case_of(i, branches, x)

    assert float(f(jnp.int32(0), jnp.float32(5.0))) == 6.0
    assert float(f(jnp.int32(1), jnp.float32(5.0))) == 10.0


def test_case_of_pytree_output():
    branches = [lambda x: (x, x + 1.0), lambda x: (x * 2.0, x * 3.0)]
    a, b = case_of(1, branches, jnp.float32(2.0))
    assert (float(a), float(b)) == (4.0, 6.0)


def test_case_of_multiple_operands():
    branches = [lambda a, b: a + b, lambda a, b: a - b]
    out = case_of(1, branches, jnp.float32(7.0), jnp.float32(3.0))
    assert float(out) == 4.0


# ---------------------------------------------------------------------------
# case_of: backward
# ---------------------------------------------------------------------------

def test_case_of_backward_per_branch():
    branches = [lambda x: x * x, lambda x: 3.0 * x]

    def f(i, x):
        return case_of(i, branches, x)

    g0 = jax.grad(f, argnums=1)(0, jnp.float32(4.0))
    g1 = jax.grad(f, argnums=1)(1, jnp.float32(4.0))
    np.testing.assert_allclose(float(g0), 8.0)
    np.testing.assert_allclose(float(g1), 3.0)


def test_case_of_backward_traced_index_under_jit():
    branches = [lambda x: jnp.sum(x * x), lambda x: jnp.sum(jnp.cos(x))]

    @jax.jit
    def g(i, x):
        return jax.grad(lambda y: case_of(i, branches, y))(x)

    x = jnp.asarray([0.3, 0.7], jnp.float32)
    np.testing.assert_allclose(np.asarray(g(jnp.int32(0), x)),
                               2 * np.asarray(x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g(jnp.int32(1), x)),
                               -np.sin(np.asarray(x)), rtol=1e-5)


def test_nested_while_in_case_of_backward():
    # compose the two constructs, grad through both (the reference nests
    # while inside case_of sub-graphs the same way)
    def pow2_loop(x):
        return while_loop(lambda c: c < 8.0 * x / x, lambda c: c * 2.0, x,
                          max_iter=5)

    branches = [pow2_loop, lambda x: x]

    def f(x):
        return case_of(0, branches, x)

    np.testing.assert_allclose(float(jax.grad(f)(jnp.float32(1.0))), 8.0)
