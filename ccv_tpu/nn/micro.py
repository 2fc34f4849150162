"""Micro-ops IR: author custom ops from index-expression primitives.

Twin of the reference's micro-op facility (lib/nnc/ccv_nnc_micro.h API,
ccv_nnc_micro_core.c node constructors, ccv_nnc_micro_interpret.c
execution, test/unit/nnc/micro.tests.c usage): a tiny IR of
reindex / unary / binary / reduce / select nodes over symbolic tensors,
from which both the forward op and its gradients are derived.

TPU-native redesign. The reference lowers the IR to nested C loops
(ccv_nnc_micro_combine_c) and hand-derives gradient loops
(ccv_nnc_micro_core.c emit_grad); here every node evaluates to a traced
JAX expression, so:

- reindex becomes one masked gather built from the index expressions
  (out-of-bounds reads contribute 0, matching the interpreter's
  out_of_bound handling, ccv_nnc_micro_interpret.c:59-92);
- the combined op is a jittable function -> XLA fuses the whole program
  (the role of ccv_nnc_micro_simplify.c's loop merging);
- gradients come from jax.vjp on that function instead of symbolically
  emitted loops -- exact to the same composition.

`Combine.emit()` returns the lowered StableHLO text, the analog of
ccv_nnc_micro_combine_c's generated source (an inspectable artifact of
what will run).

Index/shape expressions follow the reference grammar (ccv_nnc.h:439-461):
integer constants, `$param` bindings, `dXn` (dimension n of the X-th
shape-reference tensor, A = first), `in` (output coordinate n), with
+ - * / and parentheses; `[=...]` equality annotations are accepted and
checked. Division is integer (truncating, like the C).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# unary ops (ccv_nnc.h:379-383)
UNARY_OP_NEG = "neg"
UNARY_OP_LOG = "log"
UNARY_OP_EXP = "exp"
_UNARY = {UNARY_OP_NEG: lambda x: -x, UNARY_OP_LOG: jnp.log,
          UNARY_OP_EXP: jnp.exp}

# binary ops (ccv_nnc.h:385-393)
BINARY_OP_PLUS = "plus"
BINARY_OP_MINUS = "minus"
BINARY_OP_MUL = "mul"
BINARY_OP_DIV = "div"
BINARY_OP_MAX = "max"
BINARY_OP_MIN = "min"
BINARY_OP_EQUAL_TO = "equal_to"
BINARY_OP_LESS_THAN = "less_than"
_BINARY = {
    BINARY_OP_PLUS: lambda a, b: a + b,
    BINARY_OP_MINUS: lambda a, b: a - b,
    BINARY_OP_MUL: lambda a, b: a * b,
    BINARY_OP_DIV: lambda a, b: a / b,
    BINARY_OP_MAX: jnp.maximum,
    BINARY_OP_MIN: jnp.minimum,
    BINARY_OP_EQUAL_TO: lambda a, b: (a == b).astype(jnp.float32),
    BINARY_OP_LESS_THAN: lambda a, b: (a < b).astype(jnp.float32),
}

# reduce ops (ccv_nnc.h:395-403)
REDUCE_OP_MAX = "max"
REDUCE_OP_MIN = "min"
REDUCE_OP_ARGMAX = "argmax"
REDUCE_OP_ARGMIN = "argmin"
REDUCE_OP_MEAN = "mean"
REDUCE_OP_SUM = "sum"
REDUCE_OP_PROD = "prod"


# ---------------------------------------------------------------------------
# expression parser
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"\s*(\d+|\$[A-Za-z_]\w*|d[A-Z]\d+|i\d+|[()+\-*/])")


class _Expr:
    """Parsed index/shape expression; evaluates against an environment of
    `dims` (letter -> shape tuple), `params` ($name -> int) and `coords`
    (output coordinate arrays, empty for shape expressions)."""

    def __init__(self, text: str):
        self.text = text
        # strip [=...] equality annotations (checked by Reindex)
        self.asserts: List[str] = re.findall(r"\[=([^\]]+)\]", text)
        clean = re.sub(r"\[=[^\]]+\]", "", text)
        self._tokens = _TOKEN.findall(clean)
        if _TOKEN.sub("", clean).strip():
            raise ValueError(f"unparsable expression: {text!r}")
        self._pos = 0
        self._ast = self._parse_sum()
        if self._pos != len(self._tokens):
            raise ValueError(f"trailing tokens in expression: {text!r}")

    def _peek(self):
        return self._tokens[self._pos] if self._pos < len(self._tokens) else None

    def _next(self):
        t = self._peek()
        self._pos += 1
        return t

    def _parse_sum(self):
        node = self._parse_prod()
        while self._peek() in ("+", "-"):
            op = self._next()
            rhs = self._parse_prod()
            node = (op, node, rhs)
        return node

    def _parse_prod(self):
        node = self._parse_atom()
        while self._peek() in ("*", "/"):
            op = self._next()
            rhs = self._parse_atom()
            node = (op, node, rhs)
        return node

    def _parse_atom(self):
        t = self._next()
        if t is None:
            raise ValueError(f"unexpected end of expression: {self.text!r}")
        if t == "(":
            node = self._parse_sum()
            if self._next() != ")":
                raise ValueError(f"missing ')' in {self.text!r}")
            return node
        if t == "-":
            return ("-", ("num", 0), self._parse_atom())
        if t.isdigit():
            return ("num", int(t))
        if t.startswith("$"):
            return ("param", t[1:])
        if t[0] == "d":
            return ("dim", t[1], int(t[2:]))
        if t[0] == "i":
            return ("coord", int(t[1:]))
        raise ValueError(f"bad token {t!r} in {self.text!r}")

    def eval(self, dims: Dict[str, Sequence[int]], params: Dict[str, int],
             coords: Sequence[Any] = ()):
        def ev(node):
            kind = node[0]
            if kind == "num":
                return node[1]
            if kind == "param":
                try:
                    return params[node[1]]
                except KeyError:
                    raise KeyError(f"unbound parameter ${node[1]}")
            if kind == "dim":
                return dims[node[1]][node[2]]
            if kind == "coord":
                return coords[node[1]]
            a, b = ev(node[1]), ev(node[2])
            if kind == "+":
                return a + b
            if kind == "-":
                return a - b
            if kind == "*":
                return a * b
            # integer division, truncating toward zero like the C
            # interpreter (floor division differs for negative
            # intermediates, e.g. (i0 - 1) / 2 at i0 = 0 must be 0)
            if isinstance(a, (int, np.integer)) and isinstance(b, (int, np.integer)):
                q = abs(int(a)) // abs(int(b))
                return -q if (a < 0) != (b < 0) else q
            q = jnp.floor_divide(a, b)
            rem = a - q * b
            # floor rounded down past zero where signs differ: bump back up
            return jnp.where((rem != 0) & ((a < 0) != (b < 0)), q + 1, q)
        return ev(self._ast)


# ---------------------------------------------------------------------------
# IR nodes (ccv_nnc_micro_io_t twins)
# ---------------------------------------------------------------------------

class MicroIO:
    """Base symbolic tensor (struct ccv_nnc_micro_io_s)."""

    inputs: Tuple["MicroIO", ...] = ()
    dimensions: int = 0


class _Input(MicroIO):
    def __init__(self, dimensions: int):
        self.dimensions = dimensions


class _Reindex(MicroIO):
    def __init__(self, shape, ss, reindex, x):
        self.shape_exprs = [_Expr(s) for s in shape]
        self.reindex_exprs = [_Expr(s) for s in reindex]
        self.ss = tuple(ss)
        self.inputs = (x,)
        self.dimensions = len(shape)


class _Unary(MicroIO):
    def __init__(self, op, x):
        self.op = op
        self.inputs = (x,)
        self.dimensions = x.dimensions


class _Binary(MicroIO):
    def __init__(self, op, left, right):
        self.op = op
        self.inputs = (left, right)
        self.dimensions = left.dimensions


class _Reduce(MicroIO):
    def __init__(self, op, axis, x):
        self.op = op
        self.axis = tuple(int(a) for a in axis)
        self.inputs = (x,)
        self.dimensions = x.dimensions


class _Select(MicroIO):
    def __init__(self, axis, x, index):
        self.axis = int(axis)
        self.inputs = (x, index)
        self.dimensions = x.dimensions


class _Grad(MicroIO):
    def __init__(self, of):
        self.of = of
        self.dimensions = of.dimensions


def input(dimensions: int) -> MicroIO:  # noqa: A001 - reference name
    """ccv_nnc_micro_input (ccv_nnc.h:438)."""
    return _Input(dimensions)


def reindex(shape: Sequence[str], ss: Sequence[MicroIO],
            reindex: Sequence[str], x: MicroIO) -> MicroIO:
    """ccv_nnc_micro_reindex (ccv_nnc.h:462): reshape/broadcast/gather by
    index expression. `shape` gives the output dims (one expression per
    output axis, referencing dA*/dB*/... = dims of ss[0], ss[1], ... and
    $params); `reindex` gives, per INPUT axis of x, the source coordinate
    as an expression over output coordinates i0, i1, ..."""
    return _Reindex(shape, ss, reindex, x)


def unary(op: str, x: MicroIO) -> MicroIO:
    """ccv_nnc_micro_unary (ccv_nnc.h:469)."""
    if op not in _UNARY:
        raise ValueError(f"unknown unary op {op!r}")
    return _Unary(op, x)


def binary(op: str, left: MicroIO, right: MicroIO) -> MicroIO:
    """ccv_nnc_micro_binary (ccv_nnc.h:477)."""
    if op not in _BINARY:
        raise ValueError(f"unknown binary op {op!r}")
    return _Binary(op, left, right)


def reduce(op: str, axis: Sequence[int], x: MicroIO) -> MicroIO:
    """ccv_nnc_micro_reduce (ccv_nnc.h:486). Keeps rank: reduced axes have
    extent 1 (the interpreter writes results through a keepdims view,
    micro.tests.c:104 passes dy as (1,2,2,1,1,1,2))."""
    return _Reduce(op, axis, x)


def select(axis: int, x: MicroIO, index: MicroIO) -> MicroIO:
    """ccv_nnc_micro_select (ccv_nnc.h:494): take_along_axis."""
    return _Select(axis, x, index)


def grad(x: MicroIO) -> MicroIO:
    """ccv_nnc_micro_grad (ccv_nnc.h:502): symbolic gradient marker for
    combine(); wraps an input (-> outgrad) or an output (-> ingrad)."""
    return _Grad(x)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def _eval(node: MicroIO, env: Dict[int, Any], params: Dict[str, int]):
    got = env.get(id(node))
    if got is not None:
        return got
    if isinstance(node, _Input):
        raise ValueError("input tensor not bound")
    if isinstance(node, _Reindex):
        x = _eval(node.inputs[0], env, params)
        dims = {chr(ord("A") + i): tuple(_eval(s, env, params).shape)
                for i, s in enumerate(node.ss)}
        out_shape = tuple(int(e.eval(dims, params)) for e in node.shape_exprs)
        # equality annotations like dA1[=dB0]
        for e in node.shape_exprs:
            for a in e.asserts:
                lhs = int(e.eval(dims, params))
                rhs = int(_Expr(a).eval(dims, params))
                if lhs != rhs:
                    raise ValueError(
                        f"shape annotation {e.text!r} violated: {lhs} != {rhs}")
        coords = [jax.lax.broadcasted_iota(jnp.int32, out_shape, d)
                  for d in range(len(out_shape))]
        if len(node.reindex_exprs) != x.ndim:
            raise ValueError(
                f"reindex expects {x.ndim} index expressions for a rank-"
                f"{x.ndim} input, got {len(node.reindex_exprs)}")
        idx = [e.eval(dims, params, coords) for e in node.reindex_exprs]
        idx = [jnp.broadcast_to(jnp.asarray(i, jnp.int32), out_shape)
               for i in idx]
        ok = jnp.ones(out_shape, bool)
        for i, ext in zip(idx, x.shape):
            ok &= (i >= 0) & (i < ext)
        safe = tuple(i.clip(0, ext - 1) for i, ext in zip(idx, x.shape))
        val = x[safe]
        val = jnp.where(ok, val, 0)
        env[id(node)] = val
        return val
    if isinstance(node, _Unary):
        val = _UNARY[node.op](_eval(node.inputs[0], env, params))
    elif isinstance(node, _Binary):
        val = _BINARY[node.op](_eval(node.inputs[0], env, params),
                               _eval(node.inputs[1], env, params))
    elif isinstance(node, _Reduce):
        x = _eval(node.inputs[0], env, params)
        ax = node.axis
        if node.op == REDUCE_OP_SUM:
            val = jnp.sum(x, axis=ax, keepdims=True)
        elif node.op == REDUCE_OP_PROD:
            val = jnp.prod(x, axis=ax, keepdims=True)
        elif node.op == REDUCE_OP_MEAN:
            val = jnp.mean(x, axis=ax, keepdims=True)
        elif node.op == REDUCE_OP_MAX:
            val = jnp.max(x, axis=ax, keepdims=True)
        elif node.op == REDUCE_OP_MIN:
            val = jnp.min(x, axis=ax, keepdims=True)
        elif node.op == REDUCE_OP_ARGMAX:
            val = x
            for a in ax:
                val = jnp.argmax(val, axis=a, keepdims=True).astype(jnp.float32)
        elif node.op == REDUCE_OP_ARGMIN:
            val = x
            for a in ax:
                val = jnp.argmin(val, axis=a, keepdims=True).astype(jnp.float32)
        else:
            raise ValueError(f"unknown reduce op {node.op!r}")
    elif isinstance(node, _Select):
        x = _eval(node.inputs[0], env, params)
        index = _eval(node.inputs[1], env, params).astype(jnp.int32)
        val = jnp.take_along_axis(x, index, axis=node.axis)
    elif isinstance(node, _Grad):
        raise ValueError("grad() nodes are combine() declarations, not "
                         "evaluatable tensors")
    else:
        raise TypeError(f"unknown node {node!r}")
    env[id(node)] = val
    return val


# ---------------------------------------------------------------------------
# combine (ccv_nnc_micro_combine_t twin)
# ---------------------------------------------------------------------------

class Combine:
    """ccv_nnc_micro_combine_new twin (ccv_nnc.h:522): the composed op.

    forward(values, *inputs) -> outputs; backward(values, ingrads+saved,
    ...) via jax.vjp on the composed forward. Both are jitted per
    (shapes, parameter values).
    """

    def __init__(self, inputs: Sequence[MicroIO], parameters: Sequence[str],
                 outputs: Sequence[MicroIO],
                 ingrads: Sequence[MicroIO] = (),
                 outgrads: Sequence[MicroIO] = ()):
        self.inputs = tuple(inputs)
        self.parameters = tuple(p.lstrip("$") for p in parameters)
        self.outputs = tuple(outputs)
        # ingrads: grad(output) markers (cotangents) + plain forward
        # tensors the backward needs re-supplied; outgrads: grad(input)
        self.ingrads = tuple(ingrads)
        self.outgrads = tuple(outgrads)
        for g in self.outgrads:
            if not (isinstance(g, _Grad) and g.of in self.inputs):
                raise ValueError("outgrads must be grad(<combine input>)")
        self._jit: Dict[Any, Callable] = {}

    # -- forward ----------------------------------------------------------
    def _forward_fn(self, params: Dict[str, int]):
        def fn(*arrays):
            env = {id(n): a for n, a in zip(self.inputs, arrays)}
            return [_eval(o, dict(env), params) for o in self.outputs]
        return fn

    def interpret(self, cmd: str, inputs: Sequence[np.ndarray],
                  values: Sequence[int] = (),
                  outputs: Optional[Sequence[np.ndarray]] = None):
        """ccv_nnc_micro_combine_interpret twin (ccv_nnc.h:540).

        cmd: "forward" | "backward". Returns the list of result arrays
        (reshaped to the provided `outputs` buffers if given, which are
        also filled in place — tensor views with matching element counts
        are accepted, like the reference's)."""
        params = {n: int(v) for n, v in zip(self.parameters, values)}
        if len(values) != len(self.parameters):
            raise ValueError(
                f"expected {len(self.parameters)} parameter values")
        key = (cmd, tuple(sorted(params.items())),
               tuple((tuple(a.shape), str(np.asarray(a).dtype))
                     for a in inputs))
        fn = self._jit.get(key)
        if fn is None:
            if cmd == "forward":
                fn = jax.jit(self._forward_fn(params))
            elif cmd == "backward":
                fn = jax.jit(self._backward_fn(params))
            else:
                raise ValueError(f"unknown cmd {cmd!r}")
            self._jit[key] = fn
        res = [np.asarray(r) for r in fn(*[jnp.asarray(a) for a in inputs])]
        if outputs is not None:
            for buf, r in zip(outputs, res):
                np.copyto(buf, r.reshape(buf.shape))
        return res

    # -- backward ---------------------------------------------------------
    def _backward_fn(self, params: Dict[str, int]):
        """Backward calling convention (micro.tests.c:104-123): inputs =
        [<one array per ingrad>], outputs = [<one per outgrad>]. A grad()
        ingrad supplies the cotangent of that output; a plain MicroIO
        ingrad re-supplies that forward tensor."""
        wrt = tuple(self.inputs.index(g.of) for g in self.outgrads)
        cot_specs = []      # (output index) per grad ingrad
        fwd_specs = []      # (input index) per plain ingrad
        for n in self.ingrads:
            if isinstance(n, _Grad):
                cot_specs.append(self.outputs.index(n.of))
            else:
                fwd_specs.append(self.inputs.index(n))
        if sorted(fwd_specs) != list(range(len(self.inputs))):
            raise ValueError("backward ingrads must re-supply every forward "
                             "input (after the grad cotangents), like "
                             "micro.tests.c:104's TENSOR_LIST(dy, x, w)")

        def fn(*arrays):
            cots = {}
            fwds = {}
            ai = 0
            for n in self.ingrads:
                if isinstance(n, _Grad):
                    cots[self.outputs.index(n.of)] = arrays[ai]
                else:
                    fwds[self.inputs.index(n)] = arrays[ai]
                ai += 1
            xs = [fwds[i] for i in range(len(self.inputs))]

            def f(*w):
                full = list(xs)
                for i, v in zip(wrt, w):
                    full[i] = v
                env = {id(n): a for n, a in zip(self.inputs, full)}
                return [_eval(o, dict(env), params) for o in self.outputs]

            primals, vjp = jax.vjp(f, *[xs[i] for i in wrt])
            cotangents = []
            for oi, p in enumerate(primals):
                c = cots.get(oi)
                if c is None:
                    cotangents.append(jnp.zeros_like(p))
                else:
                    cotangents.append(jnp.asarray(c).reshape(p.shape)
                                      .astype(p.dtype))
            return list(vjp(cotangents))
        return fn

    # -- artifact ----------------------------------------------------------
    def emit(self, values: Sequence[int],
             shapes: Sequence[Tuple[int, ...]]) -> str:
        """ccv_nnc_micro_combine_c twin (ccv_nnc.h:546): the generated
        program text. The reference emits C source; the TPU build's
        executable artifact is the lowered StableHLO module."""
        params = {n: int(v) for n, v in zip(self.parameters, values)}
        args = [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes]
        return jax.jit(self._forward_fn(params)).lower(*args).as_text()
