"""User-level control flow — twins of the reference's Level-3.5 `while` /
`case..of` constructs (lib/nnc/ccv_nnc_symbolic_graph_while.c,
ccv_nnc_symbolic_graph_case_of.c; dynamic-graph wrappers in
ccv_nnc_dynamic_graph_while.c).

TPU-native mapping: the loop body / branches are traced once and lowered
to `lax.while_loop` / `lax.switch` — XLA control flow on device, no host
round trips — instead of the reference's interpreter-driven sub-graph
re-execution (ccv_nnc_graph_while.c graph_run loop).

- ``while_loop(cond, body, init)``: `cond` sees the carry (a pytree) and
  returns a scalar bool; `body` maps carry -> carry. With ``max_iter``
  it lowers to a masked `lax.scan`, which is reverse-differentiable —
  the twin of the reference's backward-while via tape
  (ccv_nnc_dynamic_graph_backward + tape.c).
- ``case_of(index, branches, *operands)``: multiway branch on a traced
  integer, like ccv_nnc_symbolic_graph_case_of with its index expression;
  branches must return matching pytrees. Differentiable.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


def while_loop(cond: Callable[[Any], Any], body: Callable[[Any], Any],
               init: Any, max_iter: int | None = None) -> Any:
    """ccv_nnc_symbolic_graph_while twin. Runs `body` while `cond(carry)`
    holds. Unbounded form uses lax.while_loop (forward-only); pass
    `max_iter` for the scan-lowered differentiable form."""
    if max_iter is None:
        return jax.lax.while_loop(lambda c: jnp.asarray(cond(c)).reshape(()),
                                  body, init)

    def step(carry, _):
        run, c = carry
        run = jnp.logical_and(run, jnp.asarray(cond(c)).reshape(()))
        new = body(c)
        c = jax.tree_util.tree_map(
            lambda n, o: jnp.where(run, n, o) if hasattr(n, "dtype")
            else n, new, c)
        return (run, c), None

    (_, out), _ = jax.lax.scan(step, (jnp.bool_(True), init), None,
                               length=max_iter)
    return out


def case_of(index, branches: Sequence[Callable], *operands) -> Any:
    """ccv_nnc_symbolic_graph_case_of twin: pick a branch subgraph by a
    (traced) integer index; out-of-range clamps like lax.switch."""
    return jax.lax.switch(jnp.asarray(index).astype(jnp.int32),
                          list(branches), *operands)
