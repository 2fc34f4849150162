"""Functional CNNP model API (reference: lib/nnc/ccv_cnnp_model_core.c).

``ccv_cnnp_model_new`` builds a model from input/output *symbols*: layers
applied to symbolic nodes record a DAG, which supports fan-out / fan-in —
residual and branching topologies that Sequential cannot express
(ccv_cnnp_model_core.c: ccv_cnnp_input / ccv_cnnp_model_apply).

    x = Input()
    h = Convolution(64, (3, 3))(x)
    h = ReLU()(h)
    h = Convolution(64, (3, 3))(h)
    y = Add()(h, x)          # residual
    model = Model([x], [y])

``Model`` exposes the same lifecycle as ``Sequential`` (compile / fit /
evaluate / backward / apply_gradients / write / read / dot) — the three
jitted programs come from the shared machinery in ``ccv_tpu.nn.model``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.nn.layers import Layer


class Node:
    """A symbolic tensor: a layer applied to other nodes (or an input)."""

    _counter = [0]

    def __init__(self, layer: Optional[Layer], inputs: Sequence["Node"]):
        self.layer = layer
        self.inputs = list(inputs)
        Node._counter[0] += 1
        self.uid = Node._counter[0]

    def __repr__(self):
        lname = self.layer.name if self.layer else "input"
        return f"<Node {self.uid} {lname}>"


class Input(Node):
    """ccv_cnnp_input twin: a free input symbol."""

    def __init__(self, shape: Optional[Sequence[int]] = None):
        super().__init__(None, [])
        self.shape = tuple(shape) if shape is not None else None


def _symbolic_call(self: Layer, *nodes: Node) -> Node:
    """Layer(…)(node) records a graph node (ccv_cnnp_model_apply twin)."""
    assert all(isinstance(n, Node) for n in nodes), \
        "symbolic call expects Node inputs; use apply() for arrays"
    return Node(self, nodes)


# graft the symbolic call onto every Layer
Layer.__call__ = _symbolic_call


def topsort(outputs: Sequence[Node]) -> List[Node]:
    order: List[Node] = []
    seen = set()

    def visit(n: Node):
        if n.uid in seen:
            return
        seen.add(n.uid)
        for p in n.inputs:
            visit(p)
        order.append(n)

    for o in outputs:
        visit(o)
    return order


# ---------------------------------------------------------------------------
# multi-input / structural layers (ccv_cnnp_model_addons.c)
# ---------------------------------------------------------------------------

class Add(Layer):
    """ccv_cnnp_sum / add twin: elementwise sum of all inputs."""

    def __init__(self, name: str = "add"):
        self.name = name

    def init(self, key, in_shapes):
        return {}, {}, in_shapes[0]

    def apply(self, params, state, xs, training=False, key=None):
        y = xs[0]
        for x in xs[1:]:
            y = y + x
        return y, state

    n_inputs = "many"


class Mul(Layer):
    """ccv_cnnp_mul twin: elementwise product (x * y * p)."""

    def __init__(self, p: float = 1.0, name: str = "mul"):
        self.p = p
        self.name = name

    def init(self, key, in_shapes):
        return {}, {}, in_shapes[0]

    def apply(self, params, state, xs, training=False, key=None):
        y = xs[0]
        for x in xs[1:]:
            y = y * x
        return y * self.p, state

    n_inputs = "many"


class Concat(Layer):
    """ccv_cnnp_concat twin (model_addons.c): concatenate along `axis`."""

    def __init__(self, axis: int = -1, name: str = "concat"):
        self.axis = axis
        self.name = name

    def init(self, key, in_shapes):
        axis = self.axis % len(in_shapes[0])
        out = list(in_shapes[0])
        out[axis] = sum(s[axis] for s in in_shapes)
        return {}, {}, tuple(out)

    def apply(self, params, state, xs, training=False, key=None):
        return jnp.concatenate(xs, axis=self.axis), state

    n_inputs = "many"


class Chunk(Layer):
    """ccv_cnnp_chunk twin: split into n equal parts along `axis`.
    Produces a multi-output node; index with model-level Pick or use
    ``Chunk(n, axis)(x)[i]`` via the returned tuple node."""

    def __init__(self, n: int, axis: int = -1, name: str = "chunk"):
        self.n = n
        self.axis = axis
        self.name = name
        self.n_outputs = n

    def init(self, key, in_shape):
        axis = self.axis % len(in_shape)
        assert in_shape[axis] % self.n == 0
        out = list(in_shape)
        out[axis] = in_shape[axis] // self.n
        return {}, {}, tuple(tuple(out) for _ in range(self.n))

    def apply(self, params, state, x, training=False, key=None):
        return tuple(jnp.split(x, self.n, axis=self.axis)), state


class Pick(Layer):
    """Select one output of a multi-output node (tuple indexing)."""

    def __init__(self, index: int, name: str = "pick"):
        self.index = index
        self.name = name

    def init(self, key, in_shape):
        return {}, {}, in_shape[self.index]

    def apply(self, params, state, x, training=False, key=None):
        return x[self.index], state


class Reduce(Layer):
    """ccv_cnnp_reduce_{sum,mean,max,min,norm2} twins."""

    def __init__(self, op: str, axis, keepdims: bool = False,
                 name: str = "reduce"):
        assert op in ("sum", "mean", "max", "min", "norm2")
        self.op = op
        self.axis = tuple(axis) if isinstance(axis, (list, tuple)) else (axis,)
        self.keepdims = keepdims
        self.name = f"{name}_{op}"

    def init(self, key, in_shape):
        out = []
        axes = {a % len(in_shape) for a in self.axis}
        for i, s in enumerate(in_shape):
            if i in axes:
                if self.keepdims:
                    out.append(1)
            else:
                out.append(s)
        return {}, {}, tuple(out)

    def apply(self, params, state, x, training=False, key=None):
        fn = {"sum": jnp.sum, "mean": jnp.mean, "max": jnp.max,
              "min": jnp.min,
              "norm2": lambda v, axis, keepdims: jnp.sqrt(
                  jnp.sum(v * v, axis=axis, keepdims=keepdims))}[self.op]
        return fn(x, axis=self.axis, keepdims=self.keepdims), state


class GRU(Layer):
    """ccv_cnnp_gru-style gated recurrent unit over (B, T, D) sequences.

    Standard GRU (reset/update/candidate gates); scan over time with
    lax.scan (compiler-friendly), returns the full hidden sequence."""

    def __init__(self, hidden: int, name: str = "gru"):
        self.hidden = hidden
        self.name = name

    def init(self, key, in_shape):
        B, T, D = in_shape
        H = self.hidden
        k1, k2, k3 = jax.random.split(key, 3)
        lim = 1.0 / np.sqrt(H)
        params = {
            "wx": jax.random.uniform(k1, (D, 3 * H), jnp.float32, -lim, lim),
            "wh": jax.random.uniform(k2, (H, 3 * H), jnp.float32, -lim, lim),
            "b": jnp.zeros((3 * H,)),
        }
        return params, {}, (B, T, H)

    def apply(self, params, state, x, training=False, key=None):
        H = self.hidden
        xproj = x @ params["wx"] + params["b"]  # (B, T, 3H)

        def step(h, xp):
            hp = h @ params["wh"]
            r = jax.nn.sigmoid(xp[..., :H] + hp[..., :H])
            z = jax.nn.sigmoid(xp[..., H:2 * H] + hp[..., H:2 * H])
            n = jnp.tanh(xp[..., 2 * H:] + r * hp[..., 2 * H:])
            h = (1 - z) * n + z * h
            return h, h

        h0 = jnp.zeros((x.shape[0], H), x.dtype)
        _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xproj, 0, 1))
        return jnp.swapaxes(ys, 0, 1), state


class IndexSelect(Layer):
    """ccv_cnnp_index_select twin: gather rows of x by integer index y."""

    def __init__(self, name: str = "index_select"):
        self.name = name

    def init(self, key, in_shapes):
        x_shape, idx_shape = in_shapes
        return {}, {}, tuple(idx_shape) + tuple(x_shape[1:])

    def apply(self, params, state, xs, training=False, key=None):
        x, idx = xs
        return jnp.take(x, idx.astype(jnp.int32), axis=0), state

    n_inputs = "many"


# ---------------------------------------------------------------------------
# the graph model
# ---------------------------------------------------------------------------

class Model:
    """ccv_cnnp_model_new twin: a DAG of layers from inputs to outputs.

    Shares the Sequential lifecycle (ccv_tpu.nn.model._ProgramMixin):
    compile(optimizer, loss) -> fit/evaluate/backward/apply_gradients."""

    def __init__(self, inputs: Sequence[Input], outputs: Sequence[Node],
                 name: str = "model"):
        self.inputs = list(inputs)
        self.outputs = list(outputs)
        self.name = name
        self.order = [n for n in topsort(self.outputs) if n.layer is not None]
        self.params: Any = None
        self.state: Any = None
        # lifecycle plumbing shared with Sequential via _ProgramMixin
        from ccv_tpu.nn import model as _model

        self._mixin = _model
        self.opt = None
        self.opt_state = None
        self.loss = None
        self.parallel = 1
        self._mesh = None
        self.checkpointing = False
        self._fit_fn = self._eval_fn = self._grad_fn = None
        self._pending_grads = None
        self._step_key = jax.random.PRNGKey(0)

    # -- build -------------------------------------------------------------
    def build(self, input_shapes, key=None):
        """Shape-infer the DAG and initialize parameters."""
        if input_shapes and not isinstance(input_shapes[0], (tuple, list)):
            input_shapes = [input_shapes]
        assert len(input_shapes) == len(self.inputs)
        key = key if key is not None else jax.random.PRNGKey(0)
        shapes: Dict[int, Any] = {}
        for node, s in zip(self.inputs, input_shapes):
            shapes[node.uid] = tuple(s)
        params, states = {}, {}
        for node in self.order:
            key, sub = jax.random.split(key)
            in_shapes = [shapes[p.uid] for p in node.inputs]
            arg = in_shapes if getattr(node.layer, "n_inputs", 1) == "many" \
                else in_shapes[0]
            p, s, out = node.layer.init(sub, arg)
            params[str(node.uid)] = p
            states[str(node.uid)] = s
            shapes[node.uid] = out
        self.params = params
        self.state = states
        self.output_shape = [shapes[o.uid] for o in self.outputs]
        return self.output_shape if len(self.output_shape) > 1 \
            else self.output_shape[0]

    def _forward(self, params, states, xs, training: bool, key):
        if not isinstance(xs, (tuple, list)):
            xs = [xs]
        vals: Dict[int, Any] = {}
        for node, x in zip(self.inputs, xs):
            vals[node.uid] = x
        new_states = {}
        for node in self.order:
            key, sub = jax.random.split(key)
            ins = [vals[p.uid] for p in node.inputs]
            arg = ins if getattr(node.layer, "n_inputs", 1) == "many" \
                else ins[0]
            apply = node.layer.apply
            if self.checkpointing and training:
                apply = jax.checkpoint(apply, static_argnums=())
            uid = str(node.uid)
            y, ns = apply(params[uid], states[uid], arg, training, sub)
            new_states[uid] = ns
            vals[node.uid] = y
        outs = [vals[o.uid] for o in self.outputs]
        return (outs if len(outs) > 1 else outs[0]), new_states

    def __call__(self, xs, training: bool = False):
        y, _ = self._forward(self.params, self.state, xs, training,
                             jax.random.PRNGKey(0))
        return y

    # -- shared lifecycle (delegates to the Sequential machinery) -----------
    compile = None  # filled in below from model.py to avoid circular import

    def dot(self) -> str:
        """ccv_cnnp_model_dot twin."""
        lines = ["digraph model {"]
        for i, node in enumerate(self.inputs):
            lines.append(f'  n{node.uid} [label="input{i}" shape=box];')
        for node in self.order:
            lines.append(f'  n{node.uid} [label="{node.layer.name}"];')
            for p in node.inputs:
                lines.append(f"  n{p.uid} -> n{node.uid};")
        lines.append("}")
        return "\n".join(lines)


def _install_lifecycle():
    """Bind the Sequential lifecycle methods onto Model (same semantics,
    same jitted program construction)."""
    from ccv_tpu.nn.model import Sequential

    for meth in ("compile", "set_data_parallel", "set_gradient_checkpointing",
                 "_make_programs", "_next_key", "fit", "evaluate", "backward",
                 "apply_gradients", "parameters", "set_parameters",
                 "parameter_count", "parameters_zip_map", "parameters_isnan",
                 "cancel", "_take_cancel"):
        setattr(Model, meth, getattr(Sequential, meth))


def _model_write(self, path: str, name: Optional[str] = None):
    """ccv_cnnp_model_write twin for graph models: one SQLite tensor row
    per (node-uid, key) — same tensors schema as Sequential checkpoints."""
    from ccv_tpu.nn import tensor_io

    name = name or self.name
    conn = tensor_io.open_db(path)
    with conn:
        for i, node in enumerate(self.order):
            uid = str(node.uid)
            for k, v in self.params[uid].items():
                tensor_io.tensor_write(
                    conn, f"__{name}__/{i}/{node.layer.name}/{k}",
                    np.asarray(v))
            for k, v in self.state[uid].items():
                tensor_io.tensor_write(
                    conn, f"__{name}__/{i}/{node.layer.name}/state/{k}",
                    np.asarray(v))
    conn.close()


def _model_read(self, path: str, name: Optional[str] = None):
    import sqlite3

    from ccv_tpu.nn import tensor_io

    name = name or self.name
    conn = sqlite3.connect(path)
    for i, node in enumerate(self.order):
        uid = str(node.uid)
        for k in list(self.params[uid].keys()):
            arr = tensor_io.tensor_read(
                conn, f"__{name}__/{i}/{node.layer.name}/{k}")
            self.params[uid][k] = jnp.asarray(
                arr.reshape(self.params[uid][k].shape))
        for k in list(self.state[uid].keys()):
            try:
                arr = tensor_io.tensor_read(
                    conn, f"__{name}__/{i}/{node.layer.name}/state/{k}")
                self.state[uid][k] = jnp.asarray(arr)
            except KeyError:
                pass
    conn.close()


Model.write = _model_write
Model.read = _model_read


_install_lifecycle()


# ---------------------------------------------------------------------------
# remaining simple ctors of ccv_cnnp_model_addons.c
# ---------------------------------------------------------------------------

class _ElemwiseBinary(Layer):
    n_inputs = "many"

    def init(self, key, in_shapes):
        return {}, {}, in_shapes[0]


class Div(_ElemwiseBinary):
    """ccv_cnnp_div (optionally reciprocal)."""

    def __init__(self, reciprocal: bool = False, name: str = "div"):
        self.reciprocal = reciprocal
        self.name = name

    def apply(self, params, state, xs, training=False, key=None):
        if self.reciprocal:
            return 1.0 / xs[0], state
        return xs[0] / xs[1], state


class Max(_ElemwiseBinary):
    """ccv_cnnp_max: elementwise maximum of two inputs."""

    def __init__(self, name: str = "max"):
        self.name = name

    def apply(self, params, state, xs, training=False, key=None):
        return jnp.maximum(xs[0], xs[1]), state


class Min(_ElemwiseBinary):
    """ccv_cnnp_min."""

    def __init__(self, name: str = "min"):
        self.name = name

    def apply(self, params, state, xs, training=False, key=None):
        return jnp.minimum(xs[0], xs[1]), state


class Matmul(Layer):
    """ccv_cnnp_matmul: batched matmul of two inputs with optional
    transposes (the GEMM cmd's transpose pairs)."""

    n_inputs = "many"

    def __init__(self, transpose_a=False, transpose_b=False,
                 name: str = "matmul"):
        self.ta = transpose_a
        self.tb = transpose_b
        self.name = name

    def init(self, key, in_shapes):
        a, b = in_shapes
        a = a[:-2] + (a[-1], a[-2]) if self.ta else a
        b = b[:-2] + (b[-1], b[-2]) if self.tb else b
        return {}, {}, tuple(a[:-1]) + (b[-1],)

    def apply(self, params, state, xs, training=False, key=None):
        a, b = xs
        if self.ta:
            a = jnp.swapaxes(a, -1, -2)
        if self.tb:
            b = jnp.swapaxes(b, -1, -2)
        return jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(
            xs[0].dtype), state


class CMul(_ElemwiseBinary):
    """ccv_cnnp_cmul: complex elementwise product; the last axis holds
    interleaved (re, im) pairs (the GEMM cmd's complex layout)."""

    def __init__(self, name: str = "cmul"):
        self.name = name

    def apply(self, params, state, xs, training=False, key=None):
        a, b = xs
        ar, ai = a[..., 0::2], a[..., 1::2]
        br, bi = b[..., 0::2], b[..., 1::2]
        re = ar * br - ai * bi
        im = ar * bi + ai * br
        out = jnp.stack([re, im], axis=-1).reshape(a.shape)
        return out, state


class MaskedFill(Layer):
    """ccv_cnnp_masked_fill: x where mask != eq, else fill."""

    n_inputs = "many"

    def __init__(self, eq: float = 0.0, fill: float = -1e9,
                 name: str = "masked_fill"):
        self.eq = eq
        self.fill = fill
        self.name = name

    def init(self, key, in_shapes):
        return {}, {}, in_shapes[0]

    def apply(self, params, state, xs, training=False, key=None):
        x, mask = xs
        return jnp.where(mask == self.eq, jnp.asarray(self.fill, x.dtype),
                         x), state


class Scalar(Layer):
    """ccv_cnnp_scalar: a constant scalar tensor node (broadcast to the
    input's leading shape)."""

    def __init__(self, value: float, name: str = "scalar"):
        self.value = value
        self.name = name

    def init(self, key, in_shape):
        return {}, {}, ()

    def apply(self, params, state, x, training=False, key=None):
        return jnp.asarray(self.value, jnp.float32), state


class ScalarMul(Layer):
    """ccv_cnnp_scalar_mul: x * a."""

    def __init__(self, a: float, name: str = "scalar_mul"):
        self.a = a
        self.name = name

    def apply(self, params, state, x, training=False, key=None):
        return x * self.a, state


class Clamp(Layer):
    """ccv_cnnp_clamp."""

    def __init__(self, lo=None, hi=None, name: str = "clamp"):
        self.lo = lo
        self.hi = hi
        self.name = name

    def apply(self, params, state, x, training=False, key=None):
        return jnp.clip(x, self.lo, self.hi), state


class Sqrt(Layer):
    """ccv_cnnp_sqrt."""

    def __init__(self, name: str = "sqrt"):
        self.name = name

    def apply(self, params, state, x, training=False, key=None):
        return jnp.sqrt(x), state


class ArgMax(Layer):
    """ccv_cnnp_argmax."""

    def __init__(self, axis: int = -1, name: str = "argmax"):
        self.axis = axis
        self.name = name

    def init(self, key, in_shape):
        out = list(in_shape)
        del out[self.axis]
        return {}, {}, tuple(out)

    def apply(self, params, state, x, training=False, key=None):
        return jnp.argmax(x, axis=self.axis), state


class ArgMin(ArgMax):
    """ccv_cnnp_argmin."""

    def __init__(self, axis: int = -1, name: str = "argmin"):
        super().__init__(axis, name)

    def apply(self, params, state, x, training=False, key=None):
        return jnp.argmin(x, axis=self.axis), state


class DatatypeConversion(Layer):
    """ccv_cnnp_datatype_conversion."""

    def __init__(self, dtype, name: str = "cast"):
        self.dtype = dtype
        self.name = name

    def apply(self, params, state, x, training=False, key=None):
        return x.astype(self.dtype), state


class Contiguous(Layer):
    """ccv_cnnp_contiguous / ccv_cnnp_move: identity in XLA-land (layout
    is the compiler's business); kept for API parity."""

    def __init__(self, name: str = "contiguous"):
        self.name = name

    def apply(self, params, state, x, training=False, key=None):
        return x, state


Move = Contiguous  # ccv_cnnp_move


class Parameter(Layer):
    """ccv_cnnp_parameter: a free trainable tensor node (no inputs used)."""

    def __init__(self, shape, init_bound: float = 0.0, name: str = "param"):
        self.shape = tuple(shape)
        self.init_bound = init_bound
        self.name = name

    def init(self, key, in_shape):
        if self.init_bound:
            p = jax.random.uniform(key, self.shape, jnp.float32,
                                   -self.init_bound, self.init_bound)
        else:
            p = jnp.zeros(self.shape, jnp.float32)
        return {"w": p}, {}, self.shape

    def apply(self, params, state, x, training=False, key=None):
        return params["w"], state


class Variable(Layer):
    """ccv_cnnp_variable: a free NON-trainable tensor node."""

    def __init__(self, shape, name: str = "variable"):
        self.shape = tuple(shape)
        self.name = name

    def init(self, key, in_shape):
        return {}, {"v": jnp.zeros(self.shape, jnp.float32)}, self.shape

    def apply(self, params, state, x, training=False, key=None):
        return state["v"], state


class Extract(Pick):
    """ccv_cnnp_extract: select one output of a multi-output node."""


class Debug(Layer):
    """ccv_cnnp_debug: identity that calls back with the value (uses
    jax.debug.callback so it works under jit)."""

    def __init__(self, fn=None, name: str = "debug"):
        self.fn = fn or (lambda v: print(f"[debug:{name}]", v.shape))
        self.name = name

    def apply(self, params, state, x, training=False, key=None):
        jax.debug.callback(self.fn, x)
        return x, state


class Squeeze(Layer):
    """ccv_cnnp_squeeze-style: drop size-1 axes (all, or the given ones)."""

    def __init__(self, axis=None, name: str = "squeeze"):
        self.axis = axis
        self.name = name

    def init(self, key, in_shape):
        if self.axis is None:
            out = tuple(d for d in in_shape if d != 1)
        else:
            axes = {a % len(in_shape) for a in (
                self.axis if isinstance(self.axis, (tuple, list))
                else (self.axis,))}
            out = tuple(d for i, d in enumerate(in_shape) if i not in axes)
        return {}, {}, out

    def apply(self, params, state, x, training=False, key=None):
        return jnp.squeeze(x, axis=self.axis), state


class CmdExec(Layer):
    """ccv_cnnp_cmd_exec twin (ccv_nnc.h:4180+): wrap an arbitrary command
    — any jittable ``fn(*inputs)`` (e.g. from ``ccv_tpu.nn.ops``) — as a
    graph-model layer. Multi-input via symbolic call on several nodes."""

    def __init__(self, fn, name: str = "cmd_exec"):
        self.fn = fn
        self.name = name

    def init(self, key, in_shape):
        shapes = in_shape if isinstance(in_shape, list) else [in_shape]
        outs = jax.eval_shape(
            self.fn, *[jax.ShapeDtypeStruct(tuple(s), jnp.float32)
                       for s in shapes])
        out = outs.shape if hasattr(outs, "shape") else [o.shape
                                                         for o in outs]
        return {}, {}, out

    def apply(self, params, state, x, training=False, key=None):
        if isinstance(x, (tuple, list)):
            return self.fn(*x), state
        return self.fn(x), state


class Dynamic(Layer):
    """ccv_cnnp_dynamic_new twin (ccv_nnc.h:3676): defer building the
    inner model until the input shape is known; ``builder(shape)`` returns
    the Layer to use."""

    def __init__(self, builder, name: str = "dynamic"):
        self.builder = builder
        self.name = name
        self._inner: Optional[Layer] = None

    def init(self, key, in_shape):
        self._inner = self.builder(tuple(in_shape))
        return self._inner.init(key, in_shape)

    def apply(self, params, state, x, training=False, key=None):
        assert self._inner is not None, "init() first"
        return self._inner.apply(params, state, x, training=training,
                                 key=key)


def model_copy(model, is_trainable: bool = True):
    """ccv_cnnp_model_copy twin (ccv_cnnp_model.c:599): clone the model
    ARCHITECTURE, unbuilt — the reference copies the graph with
    copy_weights=0, so the clone shares no parameters and re-initializes
    on its own build()/compile()."""
    import copy as _copy

    if isinstance(model, Model):
        inputs, outputs = _copy.deepcopy((model.inputs, model.outputs))
        new = Model(inputs, outputs, name=model.name)
    else:
        from ccv_tpu.nn import model as _m

        if not isinstance(model, _m.Sequential):
            raise TypeError(f"cannot copy {type(model).__name__}")
        new = _m.Sequential(_copy.deepcopy(model.layers), name=model.name)
    new.is_trainable = is_trainable
    return new
