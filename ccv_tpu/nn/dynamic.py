"""Dynamic (eager) graph with a backward tape — Level-4 twin
(reference: lib/nnc/ccv_nnc_dynamic_graph.c / dynamic_graph_backward.c).

The reference executes commands eagerly while recording exec symbols into
a tape symbolic graph; ``backward`` slices the tape into a sub-graph and
runs reverse-mode on it. Here ops execute eagerly through jax (immediate
dispatch) while the tape records (fn, input vars, output vars);
``backward`` replays the recorded slice as a pure function of the wrt
variables and differentiates it with jax.vjp — the tape IS the symbolic
graph.

    g = DynamicGraph()
    x = g.variable(jnp.ones((2, 2)))
    w = g.variable(init)
    y = g.exec(lambda a, b: a @ b, x, w)
    loss = g.exec(lambda v: jnp.sum(v * v), y)
    (dw,) = g.backward(loss, (w,))
    g.minimize(loss, optimizers.sgd(0.1), (w,))   # backward + apply
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class Var:
    """ccv_nnc_tensor_variable_t twin: a tracked eager value."""

    __slots__ = ("value", "uid", "constant")
    _counter = [0]

    def __init__(self, value, constant: bool = False):
        self.value = value
        self.constant = constant
        Var._counter[0] += 1
        self.uid = Var._counter[0]

    @property
    def shape(self):
        return self.value.shape

    def numpy(self):
        import numpy as np

        return np.asarray(self.value)

    def __repr__(self):
        kind = "const" if self.constant else "var"
        return f"<{kind} {self.uid} {getattr(self.value, 'shape', ())}>"


class DynamicGraph:
    """ccv_nnc_dynamic_graph_new twin."""

    def __init__(self):
        # tape entries: (fn, input Vars, output Vars)
        self._tape: List[Tuple[Callable, Tuple[Var, ...], Tuple[Var, ...]]] \
            = []
        self._no_grad = False

    # -- variables -----------------------------------------------------------
    def variable(self, value) -> Var:
        """ccv_nnc_tensor_variable_new + set: a tracked leaf."""
        return Var(jnp.asarray(value))

    def constant(self, value) -> Var:
        """ccv_nnc_tensor_constant_new: never differentiated through."""
        return Var(jnp.asarray(value), constant=True)

    # -- eager execution -------------------------------------------------------
    def exec(self, fn: Callable, *inputs: Var):
        """ccv_nnc_dynamic_graph_exec twin: run `fn` on the variables'
        values NOW; record the op on the tape (unless in no_grad)."""
        out_val = fn(*(v.value for v in inputs))
        multi = isinstance(out_val, (tuple, list))
        outs = tuple(Var(o) for o in (out_val if multi else (out_val,)))
        if not self._no_grad:
            self._tape.append((fn, tuple(inputs), outs))
        return outs if multi else outs[0]

    @contextlib.contextmanager
    def no_grad(self):
        """Tape-disabled execution (the reference's no-grad exec mode)."""
        prev = self._no_grad
        self._no_grad = True
        try:
            yield
        finally:
            self._no_grad = prev

    # -- backward --------------------------------------------------------------
    def backward(self, output: Var, wrt: Sequence[Var],
                 dy: Optional[Any] = None) -> Tuple:
        """ccv_nnc_dynamic_graph_backward twin: d output / d wrt by
        replaying the tape slice as a pure function (non-wrt leaves and
        constants are closed over)."""
        wrt_uids = [v.uid for v in wrt]
        tape = list(self._tape)
        target = output.uid

        def f(*wrt_vals):
            env = dict(zip(wrt_uids, wrt_vals))

            def val(v: Var):
                return env.get(v.uid, v.value)

            for fn, ins, outs in tape:
                # recompute only ops downstream of a wrt variable
                if not any(i.uid in env for i in ins):
                    continue
                out = fn(*(val(i) for i in ins))
                for o, ov in zip(outs, out if isinstance(out, (tuple, list))
                                 else (out,)):
                    env[o.uid] = ov
            assert target in env, "output does not depend on wrt variables"
            return env[target]

        out_val, vjp = jax.vjp(f, *(v.value for v in wrt))
        seed = jnp.ones_like(out_val) if dy is None else jnp.asarray(dy)
        return vjp(seed)

    def minimize(self, loss: Var, optimizer, wrt: Sequence[Var],
                 opt_state=None):
        """ccv_nnc_dynamic_graph_minimize twin: backward + optimizer
        update, writing the new values back into the variables."""
        grads = self.backward(loss, wrt)
        params = [v.value for v in wrt]
        if opt_state is None:
            opt_state = optimizer.init(params)
        new_params, opt_state = optimizer.update(list(grads), opt_state,
                                                 params)
        for v, p in zip(wrt, new_params):
            v.value = p
        return opt_state

    def reset_tape(self):
        """Drop recorded ops (the tape GC)."""
        self._tape.clear()

    def dot(self) -> str:
        """ccv_nnc_dynamic_graph_dot twin."""
        lines = ["digraph tape {"]
        for i, (fn, ins, outs) in enumerate(self._tape):
            name = getattr(fn, "__name__", "op")
            lines.append(f'  op{i} [label="{name}"];')
            for v in ins:
                lines.append(f"  v{v.uid} -> op{i};")
            for v in outs:
                lines.append(f"  op{i} -> v{v.uid};")
        lines.append("}")
        return "\n".join(lines)
