"""Optimizers (reference: lib/nnc/cmd/{sgd,adam,adamw,lamb,rmsprop} +
ccv_nnc_symbolic_graph_minimize.c).

Functional update rules over parameter pytrees: ``init(params) -> state``,
``update(grads, state, params) -> (new_params, new_state)``. The reference
appends these as graph nodes (saved_aux = the state slots); here they're
pytree maps inside the jitted train step. Each output tree is produced by
its own tree_map — the duplicated arithmetic is CSE'd by XLA under jit.

Semantics match the reference kernels:
- sgd (cmd/sgd/ccv_nnc_sgd_cpu_ref.c):
    m' = momentum * m + (1 - dampening) * (scale*g + decay * p)
    p' = p - rate * m'   (plus Nesterov variant)
- adam/adamw (cmd/adam): bias-corrected moments, optional amsgrad slot;
  adamw decouples the decay.
- lamb (cmd/lamb): adam step scaled by trust ratio |p| / |update|.
- rmsprop (cmd/rmsprop): accumulator + momentum.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

tmap = jax.tree_util.tree_map


@dataclasses.dataclass(frozen=True)
class Optimizer:
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], tuple]
    hyper: dict = dataclasses.field(default_factory=dict)


def sgd(rate: float = 0.001, scale: float = 1.0, decay: float = 0.0,
        momentum: float = 0.9, dampening: float = 0.0, nesterov: bool = False):
    def init(params):
        return tmap(jnp.zeros_like, params)

    def update(grads, state, params):
        def new_m(g, m, p):
            return momentum * m + (1.0 - dampening) * (scale * g + decay * p)

        def new_p(g, m, p):
            gm = scale * g + decay * p
            m_ = momentum * m + (1.0 - dampening) * gm
            step = gm + momentum * m_ if nesterov else m_
            return (p - rate * step).astype(p.dtype)

        return (tmap(new_p, grads, state, params),
                tmap(new_m, grads, state, params))

    return Optimizer(init, update, dict(kind="sgd", rate=rate, scale=scale,
                                        decay=decay, momentum=momentum,
                                        dampening=dampening, nesterov=nesterov))


class AdamState(NamedTuple):
    step: jnp.ndarray
    m: Any
    v: Any
    vmax: Any  # amsgrad slot (zeros when unused)


def _adam_family(rate, scale, decay, beta1, beta2, epsilon, amsgrad,
                 decoupled: bool, kind: str):
    base_rate = rate

    def init(params):
        return AdamState(jnp.zeros((), jnp.int32),
                         tmap(jnp.zeros_like, params),
                         tmap(jnp.zeros_like, params),
                         tmap(jnp.zeros_like, params))

    def update(grads, state, params, rate=None):
        # optional per-call learning rate (traced scalar OK): the twin of
        # the reference's per-step ccv_cnnp_model_set_minimizer re-config
        # (bin/nnc/iwslt.c:776) without retracing the step
        rate = base_rate if rate is None else rate
        step = state.step + 1
        b1t = 1.0 - beta1 ** step.astype(jnp.float32)
        b2t = 1.0 - beta2 ** step.astype(jnp.float32)

        def eff_grad(g, p):
            g = scale * g
            return g if decoupled else g + decay * p

        def new_m(g, m, p):
            return beta1 * m + (1 - beta1) * eff_grad(g, p)

        def new_v(g, v, p):
            ge = eff_grad(g, p)
            return beta2 * v + (1 - beta2) * ge * ge

        def new_vmax(g, v, vm, p):
            return jnp.maximum(vm, new_v(g, v, p) / b2t) if amsgrad else vm

        def new_p(g, m, v, vm, p):
            m_ = new_m(g, m, p)
            vhat = new_v(g, v, p) / b2t
            if amsgrad:
                vhat = jnp.maximum(vm, vhat)
            upd = (m_ / b1t) / (jnp.sqrt(vhat) + epsilon)
            if decoupled:
                upd = upd + decay * p
            return (p - rate * upd).astype(p.dtype)

        return (tmap(new_p, grads, state.m, state.v, state.vmax, params),
                AdamState(step,
                          tmap(new_m, grads, state.m, params),
                          tmap(new_v, grads, state.v, params),
                          tmap(new_vmax, grads, state.v, state.vmax, params)))

    return Optimizer(init, update, dict(kind=kind, rate=rate, scale=scale,
                                        decay=decay, beta1=beta1, beta2=beta2,
                                        epsilon=epsilon, amsgrad=amsgrad))


def adam(rate: float = 0.001, scale: float = 1.0, decay: float = 0.0,
         beta1: float = 0.9, beta2: float = 0.999, epsilon: float = 1e-8,
         amsgrad: bool = False):
    return _adam_family(rate, scale, decay, beta1, beta2, epsilon, amsgrad,
                        decoupled=False, kind="adam")


def adamw(rate: float = 0.001, scale: float = 1.0, decay: float = 0.01,
          beta1: float = 0.9, beta2: float = 0.999, epsilon: float = 1e-8,
          amsgrad: bool = False):
    return _adam_family(rate, scale, decay, beta1, beta2, epsilon, amsgrad,
                        decoupled=True, kind="adamw")


def lamb(rate: float = 0.001, scale: float = 1.0, decay: float = 0.0,
         beta1: float = 0.9, beta2: float = 0.999, epsilon: float = 1e-6):
    def init(params):
        return AdamState(jnp.zeros((), jnp.int32),
                         tmap(jnp.zeros_like, params),
                         tmap(jnp.zeros_like, params),
                         tmap(jnp.zeros_like, params))

    def update(grads, state, params):
        step = state.step + 1
        b1t = 1.0 - beta1 ** step.astype(jnp.float32)
        b2t = 1.0 - beta2 ** step.astype(jnp.float32)

        def new_m(g, m):
            return beta1 * m + (1 - beta1) * scale * g

        def new_v(g, v):
            return beta2 * v + (1 - beta2) * (scale * g) ** 2

        def new_p(g, m, v, p):
            u = (new_m(g, m) / b1t) / (jnp.sqrt(new_v(g, v) / b2t) + epsilon) + decay * p
            w_norm = jnp.sqrt(jnp.sum(p.astype(jnp.float32) ** 2))
            u_norm = jnp.sqrt(jnp.sum(u ** 2))
            trust = jnp.where((w_norm > 0) & (u_norm > 0), w_norm / u_norm, 1.0)
            return (p - rate * trust * u).astype(p.dtype)

        return (tmap(new_p, grads, state.m, state.v, params),
                AdamState(step, tmap(new_m, grads, state.m),
                          tmap(new_v, grads, state.v), state.vmax))

    return Optimizer(init, update, dict(kind="lamb", rate=rate, scale=scale,
                                        decay=decay, beta1=beta1, beta2=beta2,
                                        epsilon=epsilon))


def rmsprop(rate: float = 0.001, scale: float = 1.0, decay: float = 0.0,
            alpha: float = 0.99, momentum: float = 0.9, epsilon: float = 1e-8):
    def init(params):
        return (tmap(jnp.zeros_like, params), tmap(jnp.zeros_like, params))

    def update(grads, state, params):
        v_acc, mom = state

        def eff(g, p):
            return scale * g + decay * p

        def new_v(g, v, p):
            return alpha * v + (1 - alpha) * eff(g, p) ** 2

        def new_mom(g, v, m, p):
            return momentum * m + eff(g, p) / (jnp.sqrt(new_v(g, v, p)) + epsilon)

        def new_p(g, v, m, p):
            return (p - rate * new_mom(g, v, m, p)).astype(p.dtype)

        return (tmap(new_p, grads, v_acc, mom, params),
                (tmap(new_v, grads, v_acc, params),
                 tmap(new_mom, grads, v_acc, mom, params)))

    return Optimizer(init, update, dict(kind="rmsprop", rate=rate, scale=scale,
                                        decay=decay, alpha=alpha,
                                        momentum=momentum, epsilon=epsilon))


def clip_grad_norm(grads, max_norm: float):
    """ccv_cnnp_model_parameters_clip_grad_norm twin (ccv_nnc.h:4149)."""
    leaves = jax.tree_util.tree_leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    factor = jnp.minimum(1.0, max_norm / jnp.maximum(total, 1e-12))
    return tmap(lambda g: g * factor, grads), total


def grads_isnan(grads):
    """ccv_cnnp_model_parameter_gradients_isnan twin (ccv_nnc.h:4169)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.any(jnp.stack([jnp.any(jnp.isnan(g)) for g in leaves]))


# ---------------------------------------------------------------------------
# Functional per-tensor update steps — twins of the reference's optimizer
# COMMANDS (the tree-level Optimizer objects above are the CNNP-style API;
# these are CCV_NNC_{SGD,ADAM,...}_FORWARD as plain functions, formulas
# verbatim from the cpu_ref kernels).
# ---------------------------------------------------------------------------

def sgd_step(grad, x, mom, rate=0.001, scale=1.0, decay=0.0,
             momentum=0.9, dampening=0.0, nesterov=False):
    """CCV_NNC_SGD_FORWARD (cmd/sgd/ccv_nnc_sgd_cpu_ref.c:79-114):
    (grad, x, momentum) -> (new x, new momentum)."""
    if nesterov:
        assert dampening == 0, "nesterov requires dampening == 0"
        g = scale * grad
        m = momentum * mom + g + decay * x
        return x - rate * (g + momentum * m), m
    m = momentum * mom + (1.0 - dampening) * (scale * grad + decay * x)
    return x - rate * m, m


def adam_step(grad, x, m, v, step, rate=0.001, scale=1.0, beta1=0.9,
              beta2=0.999, decay=0.0, epsilon=1e-8):
    """CCV_NNC_ADAM_FORWARD (cmd/adam/ccv_nnc_adam_cpu_ref.c:112-122):
    (grad, x, m, v) + step (1-based) -> (new x, new m, new v)."""
    g = scale * grad + decay * x
    m2 = beta1 * m + (1.0 - beta1) * g
    v2 = beta2 * v + (1.0 - beta2) * g * g
    inv_b1 = 1.0 / (1.0 - beta1 ** step)
    inv_b2 = 1.0 / (1.0 - beta2 ** step)
    return (x - (m2 * rate * inv_b1) / (jnp.sqrt(v2 * inv_b2) + epsilon),
            m2, v2)


def adamw_step(grad, x, m, v, step, rate=0.001, scale=1.0, beta1=0.9,
               beta2=0.999, decay=0.01, epsilon=1e-8):
    """CCV_NNC_ADAMW_FORWARD (cmd/adam/ccv_nnc_adamw_cpu_ref.c:157-160):
    decoupled decay — the decay term leaves the gradient moments."""
    g = scale * grad
    m2 = beta1 * m + (1.0 - beta1) * g
    v2 = beta2 * v + (1.0 - beta2) * g * g
    inv_b1 = 1.0 / (1.0 - beta1 ** step)
    inv_b2 = 1.0 / (1.0 - beta2 ** step)
    return (x - rate * decay * x
            - (m2 * rate * inv_b1) / (jnp.sqrt(v2 * inv_b2) + epsilon),
            m2, v2)


def lamb_step(grad, x, m, v, step, rate=0.001, scale=1.0, beta1=0.9,
              beta2=0.999, decay=0.0, epsilon=1e-6):
    """CCV_NNC_LAMB_FORWARD (cmd/lamb/ccv_nnc_lamb_cpu_ref.c:96-130):
    adam-style update scaled by the layer trust ratio |w| / |update|."""
    g = scale * grad
    m2 = beta1 * m + (1.0 - beta1) * g
    v2 = beta2 * v + (1.0 - beta2) * g * g
    inv_b1 = 1.0 / (1.0 - beta1 ** step)
    inv_b2 = 1.0 / (1.0 - beta2 ** step)
    update = (m2 * inv_b1) / (jnp.sqrt(v2 * inv_b2) + epsilon) + decay * x
    w_norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2))
    u_norm = jnp.sqrt(jnp.sum(update.astype(jnp.float32) ** 2))
    trust = jnp.where((w_norm > 0) & (u_norm > 0), w_norm / u_norm, 1.0)
    return x - rate * trust * update, m2, v2


def rmsprop_step(grad, x, mom, v, rate=0.001, scale=1.0, decay=0.0,
                 alpha=0.99, momentum=0.9, epsilon=1e-8):
    """CCV_NNC_RMSPROP_FORWARD (cmd/rmsprop/ccv_nnc_rmsprop_cpu_ref.c:90-94):
    (grad, x, momentum, velocity) -> (new x, new momentum, new velocity)."""
    g = scale * grad + decay * x
    v2 = alpha * v + (1.0 - alpha) * g * g
    m2 = momentum * mom + g / (jnp.sqrt(v2) + epsilon)
    return x - rate * m2, m2, v2
