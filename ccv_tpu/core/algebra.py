"""Linear algebra / reductions (reference: lib/ccv_algebra.c).

gemm rides the MXU directly; sat (summed-area table) is two cumulative
sums — the building block for all the cascade detectors (SCD/ICF/BBF
feature lookups become SAT gathers). For float inputs the prefix sums run
as two triangular-matrix contractions on the MXU (``sat_mxu``): the TPU
backend lowers reduce_window prefix scans to a sequential row-at-a-time
while loop (measured ~2-3 ms per 425x640x8 plane), while the triangular
matmul is one MXU pass (~0.1 ms) — and the PADDING_ZERO leading zero
row/column falls out of the matrix shapes for free.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

NO_PADDING = 0x00
PADDING_ZERO = 0x01

# transpose flags (lib/ccv.h ccv_gemm)
CCV_A_TRANSPOSE = 0x01
CCV_B_TRANSPOSE = 0x02
CCV_C_TRANSPOSE = 0x04


def sat(a, padding: int = NO_PADDING):
    """ccv_sat twin: inclusive 2D prefix sum over (..., H, W[, C]).

    NO_PADDING: same size as input. PADDING_ZERO: one extra leading zero
    row/column (so window sums need no bounds checks). 8U inputs accumulate
    in int32 (int64 for >= 0x808080 pixels, matching the reference's
    safe-type rule).
    """
    spatial_last = a.ndim == 2
    x = a
    if jnp.issubdtype(x.dtype, jnp.integer):
        big = (x.shape[-2 if spatial_last else -3] * x.shape[-1 if spatial_last else -2]) >= 0x808080
        x = x.astype(jnp.int64 if big and jax.config.jax_enable_x64 else jnp.int32)
    h_axis = -2 if spatial_last else -3
    w_axis = -1 if spatial_last else -2
    out = jnp.cumsum(jnp.cumsum(x, axis=h_axis), axis=w_axis)
    if padding == PADDING_ZERO:
        pad = [(0, 0)] * out.ndim
        pad[h_axis] = (1, 0)
        pad[w_axis] = (1, 0)
        out = jnp.pad(out, pad)
    return out


def sat_mxu(a, padding: int = NO_PADDING):
    """Float SAT as two triangular-ones contractions on the MXU.

    cumsum-along-W is dot_general(U (W', W), x (H, W, C)) contracting W —
    output (W', H, C); cumsum-along-H then contracts H the same way and
    rotates back to (H', W', C). No transposes. With PADDING_ZERO the
    triangular matrices grow one all-zero leading row, producing the
    padded SAT directly. Precision HIGHEST keeps f32-exact accumulation
    (default TPU matmul would round through bf16 and break the window
    parity gates)."""
    spatial_last = a.ndim == 2
    x = a if not spatial_last else a[..., None]
    assert x.ndim == 3, "sat_mxu: (H, W[, C]) only"
    H, W = x.shape[0], x.shape[1]
    pad = 1 if padding == PADDING_ZERO else 0

    assert jnp.issubdtype(x.dtype, jnp.floating), \
        "sat_mxu is float-only; integer parity paths use sat()"

    def tri(n):
        # (n + pad, n): row i sums inputs 0..i-pad (row 0 all-zero when
        # padding, giving the PADDING_ZERO leading row/col for free)
        return (jnp.arange(n + pad)[:, None] - pad
                >= jnp.arange(n)[None, :]).astype(x.dtype)
    s1 = jax.lax.dot_general(
        tri(W), x, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)          # (W', H, C)
    s2 = jax.lax.dot_general(
        tri(H), s1, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)          # (H', W', C)
    return s2[..., 0] if spatial_last else s2


def sat_auto(a, padding: int = NO_PADDING):
    """SAT with measured form selection (the ccv_nnc_cmd_autotune analog,
    cmd.c:344-577): benchmarks the cumsum lowering against the triangular
    MXU contraction per (shape, dtype, device) and persists the winner.
    Integer inputs always take `sat` (parity paths need exact int
    accumulation). Under tracing with no recorded decision the MXU form
    wins by default on accelerators (measured ~20x on v5e for the
    cascade-detector plane shapes)."""
    if jnp.issubdtype(jnp.asarray(a).dtype if not hasattr(a, "dtype")
                      else a.dtype, jnp.integer) or a.ndim > 3:
        return sat(a, padding)
    forced = os.environ.get("CCV_TPU_SAT")
    if forced in ("sat", "sat_mxu"):
        return (sat if forced == "sat" else sat_mxu)(a, padding)
    from ccv_tpu.nn import autotune

    default = "sat" if jax.default_backend() == "cpu" else "sat_mxu"
    fn = autotune.choose(
        "sat", {"sat": sat, "sat_mxu": sat_mxu}, (a,),
        default=default, extra=f"pad{padding}")
    return fn(a, padding)


def gemm(a, b, alpha: float = 1.0, transpose: int = 0, c=None, beta: float = 0.0):
    """ccv_gemm twin: alpha * a @ b + beta * c, MXU matmul."""
    x = a.T if transpose & CCV_A_TRANSPOSE else a
    y = b.T if transpose & CCV_B_TRANSPOSE else b
    out = alpha * jnp.matmul(x, y, preferred_element_type=jnp.float32)
    if c is not None and beta != 0.0:
        out = out + beta * (c.T if transpose & CCV_C_TRANSPOSE else c)
    return out


def normalize(a, btype=None, flag: int = 1):
    """ccv_normalize twin: L1 (flag=1) or L2 (flag=2) normalization."""
    x = a.astype(jnp.float32)
    if flag == 1:
        norm = jnp.sum(jnp.abs(x))
    else:
        norm = jnp.sqrt(jnp.sum(x * x))
    return x / jnp.maximum(norm, 1e-12)


def dot(a, b):
    return jnp.vdot(a.astype(jnp.float32), b.astype(jnp.float32))


def sum_(a, flag: int = 0):
    return jnp.sum(a)


def variance(a):
    x = a.astype(jnp.float32)
    return jnp.mean(x * x) - jnp.mean(x) ** 2


def multiply(a, b):
    return a * b


def add(a, b):
    return a + b


def subtract(a, b):
    return a - b


def scale(a, ds: float):
    return a * ds
