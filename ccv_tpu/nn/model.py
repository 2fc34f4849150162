"""CNNP-like model API (reference: lib/nnc/ccv_cnnp_model.c).

The reference JIT-builds three symbolic-graph programs per model (FIT /
MULTISTAGE / MULTISTAGE_NO_GRAD, model.c:1406/1705/1864/2006); here the same
three entry points are jax.jit functions closed over the layer stack:

- ``fit(inputs, fits)``          one optimizer step (train step)
- ``evaluate(inputs)``           forward only (optionally with batch-norm
                                 statistics frozen)
- ``backward(...)`` + ``apply_gradients()``  the decoupled two-phase mode

Data parallelism (``set_data_parallel(n)``) mirrors
ccv_nnc_symbolic_graph_data_parallel (parallel.c:24): instead of duplicating
the graph per GPU and inserting NCCL allreduce nodes, the train step is
jitted over a jax Mesh with batch-sharded inputs and replicated parameters —
GSPMD inserts the all-reduces on ICI.

Gradient checkpointing (``set_gradient_checkpointing()``) mirrors
ccv_cnnp_model_gradient_checkpointing.c by wrapping each layer's apply in
jax.checkpoint.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.nn import ops
from ccv_tpu.nn.layers import Layer
from ccv_tpu.nn.optimizers import Optimizer


# loss registry (the CMD_*_FORWARD losses used by ccv_cnnp_model_compile)
LOSSES = {
    "softmax_crossentropy": lambda out, fit: jnp.mean(
        ops.softmax_crossentropy(out, fit)[0]),
    "categorical_crossentropy": lambda out, fit: jnp.mean(
        ops.categorical_crossentropy(out, fit)),
    "sigmoid_binary_crossentropy": lambda out, fit: jnp.mean(
        ops.sigmoid_binary_crossentropy(out, fit)[0]),
    "mse": lambda out, fit: jnp.mean(ops.mse_loss(out, fit)),
    "mae": lambda out, fit: jnp.mean(ops.mae_loss(out, fit)),
    "smooth_l1": lambda out, fit: jnp.mean(ops.smooth_l1_loss(out, fit)),
}


class Sequential:
    """ccv_cnnp_sequential_new twin: a layer stack with CNNP's lifecycle."""

    def __init__(self, layers: Sequence[Layer], name: str = "model"):
        self.layers = list(layers)
        self.name = name
        self.params: Any = None
        self.state: Any = None
        self.opt: Optional[Optimizer] = None
        self.opt_state: Any = None
        self.loss: Optional[Callable] = None
        self.input_shape = None
        self.parallel: int = 1
        self._mesh = None
        self.checkpointing = False
        self.memory_compression = False
        self.memory_reduction = False
        self._fit_fn = None
        self._eval_fn = None
        self._grad_fn = None
        self._pending_grads = None
        self._step_key = jax.random.PRNGKey(0)

    # -- build ------------------------------------------------------------
    def build(self, input_shape: Sequence[int], key=None):
        """Shape-infer + initialize parameters (CNNP does this lazily on
        first fit/evaluate; explicit here)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        params, states = [], []
        shape = tuple(input_shape)
        for layer in self.layers:
            key, sub = jax.random.split(key)
            p, s, shape = layer.init(sub, shape)
            params.append(p)
            states.append(s)
        self.params = params
        self.state = states
        self.input_shape = tuple(input_shape)
        self.output_shape = shape
        return shape

    def _forward(self, params, states, x, training: bool, key):
        new_states = []
        for i, layer in enumerate(self.layers):
            key, sub = jax.random.split(key)
            apply = layer.apply
            if self.checkpointing and training:
                apply = jax.checkpoint(apply, static_argnums=())
            from ccv_tpu.utils import flags as _flags

            if (getattr(self, "memory_compression", False) and training
                    and hasattr(x, "ndim") and x.ndim == 4
                    and not _flags.is_set(_flags.DISABLE_MEMORY_COMPRESSION)):
                from ccv_tpu.nn.compression import compressed_apply

                y, ns = compressed_apply(apply, x.shape, x.dtype, training)(
                    params[i], states[i], x, sub)
            elif (getattr(self, "memory_reduction", False) and training
                    and hasattr(x, "dtype")
                    and x.dtype in (jnp.float32, jnp.float64)):
                from ccv_tpu.nn.compression import reduced_apply

                y, ns = reduced_apply(apply, x.dtype, training)(
                    params[i], states[i], x, sub)
            else:
                y, ns = apply(params[i], states[i], x, training, sub)
            new_states.append(ns)
            x = y
        return x, new_states

    def __call__(self, x, training: bool = False):
        if self.params is None:
            self.build((x.shape if hasattr(x, "shape") else np.shape(x)))
        y, _ = self._forward(self.params, self.state, x, training,
                             jax.random.PRNGKey(0))
        return y

    # -- compile ----------------------------------------------------------
    def compile(self, optimizer: Optimizer, loss: str | Callable,
                input_shape: Optional[Sequence[int]] = None):
        """ccv_cnnp_model_compile twin (model.c:572)."""
        if input_shape is not None and self.params is None:
            self.build(input_shape)
        assert self.params is not None, "build(input_shape) first"
        self.opt = optimizer
        self.opt_state = optimizer.init(self.params)
        self.loss = LOSSES[loss] if isinstance(loss, str) else loss
        self._make_programs()

    def set_data_parallel(self, parallel: int):
        """ccv_cnnp_model_set_data_parallel twin (model.c:635): shard the
        batch over `parallel` devices; XLA inserts gradient all-reduces."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = jax.devices()
        if len(devices) < parallel:
            # single-chip environment: fall back to virtual CPU devices so
            # the data-parallel program still compiles + runs (the driver's
            # dryrun and CI both rely on this; real fleets have the chips)
            import warnings

            warnings.warn(
                f"set_data_parallel({parallel}): only {len(devices)} "
                f"device(s) available; falling back to replicating on them")
            parallel = max(1, len(devices))
        devices = devices[:parallel]
        self._mesh = Mesh(np.array(devices), ("data",))
        self.parallel = parallel
        if self.opt is not None:
            self._make_programs()

    def set_gradient_checkpointing(self, enable: bool = True):
        """ccv_cnnp_model_set_gradient_checkpointing twin (model.c:670)."""
        self.checkpointing = enable
        if self.opt is not None:
            self._make_programs()

    def set_memory_compression(self, enable: bool = True):
        """ccv_cnnp_model_set_memory_compression twin (model.c:654):
        4-D activations saved for backward are LSSC-compressed (4:1,
        lossy) — see ccv_tpu.nn.compression."""
        self.memory_compression = enable
        if self.opt is not None:
            self._make_programs()

    def set_memory_reduction(self, enable: bool = True):
        """ccv_cnnp_model_set_memory_reduction twin (ccv_nnc.h:3931 /
        ccv_nnc_symbolic_graph_memory_reduction.c): float32 activations
        saved for backward are stored as bfloat16 and re-converted inside
        the VJP (half the activation HBM; forward outputs stay exact)."""
        self.memory_reduction = enable
        if self.opt is not None:
            self._make_programs()

    # -- the three jitted programs (FIT / MULTISTAGE / NO_GRAD) -----------
    def _make_programs(self):
        opt = self.opt
        loss_fn = self.loss

        def loss_and_states(params, states, x, fits, key):
            out, new_states = self._forward(params, states, x, True, key)
            return loss_fn(out, fits), (out, new_states)

        def fit_step(params, states, opt_state, x, fits, key):
            (loss, (out, new_states)), grads = jax.value_and_grad(
                loss_and_states, has_aux=True)(params, states, x, fits, key)
            new_params, new_opt = opt.update(grads, opt_state, params)
            return new_params, new_states, new_opt, loss

        def eval_step(params, states, x):
            out, _ = self._forward(params, states, x, False, jax.random.PRNGKey(0))
            return out

        def grad_step(params, states, x, fits, key):
            (loss, (out, new_states)), grads = jax.value_and_grad(
                loss_and_states, has_aux=True)(params, states, x, fits, key)
            return grads, new_states, loss

        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self._mesh
            data = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, repl)
            self.state = jax.device_put(self.state, repl)
            self.opt_state = jax.device_put(self.opt_state, repl)
            self._fit_fn = jax.jit(
                fit_step,
                in_shardings=(repl, repl, repl, data, data, repl),
                out_shardings=(repl, repl, repl, repl))
            self._eval_fn = jax.jit(eval_step,
                                    in_shardings=(repl, repl, data),
                                    out_shardings=data)
            self._grad_fn = jax.jit(grad_step,
                                    in_shardings=(repl, repl, data, data, repl),
                                    out_shardings=(repl, repl, repl))
        else:
            self._fit_fn = jax.jit(fit_step)
            self._eval_fn = jax.jit(eval_step)
            self._grad_fn = jax.jit(grad_step)

    def _next_key(self):
        self._step_key, sub = jax.random.split(self._step_key)
        return sub

    # -- cancellation (ccv_cnnp_model_cancel, ccv_nnc.h:3823; the
    # cooperative graph-run abort of ccv_nnc_graph_cancel, :1349) --------
    def cancel(self):
        """Cancel the next queued training/backward step. Jitted programs
        are atomic on-device, so the abort point is BETWEEN dispatched
        steps (the reference aborts between graph nodes): the next
        fit/backward/apply_gradients observes the flag, skips its work,
        returns None, and clears the flag. Safe to call from another
        thread while a step is executing."""
        import threading

        ev = getattr(self, "_cancel_event", None)
        if ev is None:
            ev = self._cancel_event = threading.Event()
        ev.set()

    def _take_cancel(self) -> bool:
        ev = getattr(self, "_cancel_event", None)
        if ev is not None and ev.is_set():
            ev.clear()
            return True
        return False

    # -- public API (ccv_cnnp_model_fit / evaluate / backward / apply) ----
    def fit(self, inputs, fits):
        """One training step; returns the loss (model.c:1533), or None if
        the step was cancelled."""
        assert self._fit_fn is not None, "compile() first"
        if self._take_cancel():
            return None
        self.params, self.state, self.opt_state, loss = self._fit_fn(
            self.params, self.state, self.opt_state, inputs, fits,
            self._next_key())
        return float(loss)

    def evaluate(self, inputs):
        """Forward pass (model.c:1848).

        Always runs as ONE jitted program: an uncompiled model gets a
        lazily-built inference jit (the MULTISTAGE_NO_GRAD analog,
        model.c:2006). Eager per-layer dispatch is only for __call__ —
        round-tripping ~40 layer dispatches through a tunneled device
        measured 12x slower than the compiled program on VGG-D."""
        if self._eval_fn is None:
            if self.params is None:
                self.build(inputs.shape if hasattr(inputs, "shape")
                           else np.shape(inputs))

            def eval_step(params, states, x):
                out, _ = self._forward(params, states, x, False,
                                       jax.random.PRNGKey(0))
                return out

            self._eval_fn = jax.jit(eval_step)
        return self._eval_fn(self.params, self.state, inputs)

    def backward(self, inputs, fits):
        """Compute+stash gradients (model.c:1913); returns loss, or None
        if cancelled."""
        if self._take_cancel():
            return None
        grads, self.state, loss = self._grad_fn(
            self.params, self.state, inputs, fits, self._next_key())
        if self._pending_grads is None:
            self._pending_grads = grads
        else:  # accumulate like the reference's multistage mode
            self._pending_grads = jax.tree_util.tree_map(
                jnp.add, self._pending_grads, grads)
        return float(loss)

    def apply_gradients(self):
        """Apply stashed gradients (model.c:2088); no-op if cancelled."""
        if self._take_cancel():
            self._pending_grads = None
            return
        assert self._pending_grads is not None, "backward() first"
        self.params, self.opt_state = self.opt.update(
            self._pending_grads, self.opt_state, self.params)
        self._pending_grads = None

    # -- parameter access (ccv_nnc.h:4039-4170) ---------------------------
    def parameters(self):
        return self.params

    def set_parameters(self, params):
        self.params = params

    def parameter_count(self) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(self.params))

    def parameters_zip_map(self, fn: Callable, other):
        """ccv_cnnp_model_parameters_zip_map twin."""
        self.params = jax.tree_util.tree_map(fn, self.params, other)

    def parameters_isnan(self) -> bool:
        leaves = jax.tree_util.tree_leaves(self.params)
        return bool(np.any([bool(jnp.any(jnp.isnan(p))) for p in leaves]))

    # -- checkpoint io ----------------------------------------------------
    def write(self, path: str, name: Optional[str] = None):
        from ccv_tpu.nn import tensor_io

        tensor_io.write_model(self, path, name or self.name)

    def read(self, path: str, name: Optional[str] = None):
        from ccv_tpu.nn import tensor_io

        tensor_io.read_model(self, path, name or self.name)

    def checkpoint(self, path: str, name: Optional[str] = None):
        """Preemption-safe trainer checkpoint: parameters + layer states
        (BN stats) + optimizer state + the step RNG key, one SQLite file.

        Goes beyond the reference (ccv_cnnp_model_write persists only
        parameters/internals, ccv_cnnp_model_io.c:30-60): resuming from
        this file continues the exact training trajectory."""
        from ccv_tpu.nn import tensor_io

        name = name or self.name
        tensor_io.write_model(self, path, name)
        conn = tensor_io.open_db(path)
        try:
            for tag, tree in (("opt", self.opt_state),
                              ("lstate", self.state)):
                leaves = jax.tree_util.tree_leaves(tree)
                for i, leaf in enumerate(leaves):
                    tensor_io.tensor_write(
                        conn, f"__{name}__[{tag}:{i}]", np.asarray(leaf))
            # the PRNG key is uint32 (not a ccv dtype): store the bits
            tensor_io.tensor_write(conn, f"__{name}__[stepkey]",
                                   np.asarray(self._step_key)
                                   .view(np.int32))
            conn.commit()
        finally:
            conn.close()

    def resume(self, path: str, name: Optional[str] = None):
        """Restore a .checkpoint() file: the inverse, incl. optimizer
        state, so fit() continues the exact trajectory."""
        from ccv_tpu.nn import tensor_io

        name = name or self.name
        tensor_io.read_model(self, path, name)
        conn = tensor_io.open_db(path)
        try:
            for tag, tree in (("opt", self.opt_state),
                              ("lstate", self.state)):
                leaves, treedef = jax.tree_util.tree_flatten(tree)
                read = [
                    jnp.asarray(tensor_io.tensor_read(
                        conn, f"__{name}__[{tag}:{i}]")).astype(l.dtype)
                    .reshape(l.shape) if hasattr(l, "dtype") else l
                    for i, l in enumerate(leaves)]
                restored = jax.tree_util.tree_unflatten(treedef, read)
                if tag == "opt":
                    self.opt_state = restored
                else:
                    self.state = restored
            self._step_key = jnp.asarray(
                tensor_io.tensor_read(conn, f"__{name}__[stepkey]")
                .view(np.uint32))
        finally:
            conn.close()

    def dot(self) -> str:
        """ccv_cnnp_model_dot twin: a GraphViz description of the stack."""
        lines = ["digraph model {"]
        prev = "input"
        for i, layer in enumerate(self.layers):
            node = f"l{i}_{layer.name}"
            lines.append(f'  {node} [label="{layer.name}"];')
            lines.append(f"  {prev} -> {node};")
            prev = node
        lines.append("}")
        return "\n".join(lines)
