"""Command registry — twin of the reference's cmd registry/introspection
(lib/nnc/ccv_nnc_cmd.c: ccv_nnc_cmd_name:740, ccv_nnc_cmd_ok:750, the
generated ccv_nnc_cmd.inc table of 139 CMD_*_FORWARD/BACKWARD entries).

The reference resolves a uint32 cmd id to a name, attributes, and the set
of backends that implement it; each backend registration carries the
tensor formats / datatypes / memory it supports plus bitmask+inplace rules
(REGISTER_COMMAND_BACKEND, lib/nnc/ccv_nnc_internal.h:197-204; e.g. GEMM
cpu_ref declares NHWC|NCHW x 32F, cmd/blas/ccv_nnc_gemm_cpu_ref.c:450).
Here the single backend is XLA: every registered command maps to the
`ccv_tpu.nn.ops` function that implements its forward, "backward" support
means `jax.grad` traces through it, and each entry carries the same
capability metadata — the formats and dtypes OUR lowering supports, the
(input, output) pairs that may safely alias (the donate/inplace rule), and
the command's I/O arity (the bitmask-rule analog) — so `cmd_ok` can answer
per-dtype/per-format questions honestly instead of a blanket yes.

    >>> cmd("CCV_NNC_GEMM_FORWARD")(a, b)
    >>> cmd_ok("CCV_NNC_CONVOLUTION_FORWARD", dtype="float16", format="NCHW")
    True
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

from ccv_tpu.nn import ops

# attribute bits (ccv_nnc.h:63-65)
CMD_ATTR_PASSTHROUGH = 0x01
CMD_ATTR_OUTPUT_ONES = 0x02
CMD_ATTR_NULL_IS_ONES = 0x04

# dtype capability sets (the reference's registry->tensor_datatypes mask;
# names are jnp dtype names). FLOAT is what the MXU/VPU path supports
# natively; f64 additionally works on the CPU backend but is not claimed.
DTYPES_FLOAT = ("float32", "bfloat16", "float16")
DTYPES_ANY = DTYPES_FLOAT + ("int32", "int64", "uint8", "int8", "bool")
FORMATS_ALL = ops.FORMATS
FORMATS_NHWC = (ops.FORMAT_NHWC,)


@dataclasses.dataclass(frozen=True)
class CmdEntry:
    """One registry row (the ccv_nnc_cmd.inc analog).

    formats/dtypes: capability masks (registry->tensor_formats/_datatypes);
    inplace: (input_idx, output_idx) pairs that may alias — the
    ccv_nnc_cmd_allow_inplace analog, realized in JAX via buffer donation;
    arity: (min_inputs, n_outputs) — the bitmask-rule analog (the exact
    per-slot bitmasks are subsumed by Python's argument binding).
    """

    id: int
    name: str
    fn: Callable
    attrs: int = 0
    differentiable: bool = True  # jax.grad traces through the forward
    formats: Tuple[str, ...] = FORMATS_ALL
    dtypes: Tuple[str, ...] = DTYPES_FLOAT
    inplace: Tuple[Tuple[int, int], ...] = ()
    arity: Tuple[int, int] = (1, 1)


_REGISTRY: Dict[str, CmdEntry] = {}
_BY_ID: Dict[int, CmdEntry] = {}

_EW_INPLACE = ((0, 0),)  # elementwise ops may write onto their first input


def _register(short: str, fn: Callable, attrs: int = 0,
              differentiable: bool = True, **caps):
    name = f"CCV_NNC_{short}_FORWARD"
    entry = CmdEntry(id=len(_REGISTRY) + 1, name=name, fn=fn, attrs=attrs,
                     differentiable=differentiable, **caps)
    _REGISTRY[name] = entry
    _BY_ID[entry.id] = entry
    globals()[name] = entry.id


# (short, fn, differentiable, capability overrides)
for _short, _fn, _diff, _caps in [
    ("GEMM", ops.gemm, True, dict(arity=(2, 1))),
    ("ADD", ops.add, True, dict(arity=(2, 1), inplace=_EW_INPLACE)),
    ("MUL", ops.mul, True, dict(arity=(2, 1), inplace=_EW_INPLACE)),
    ("SCALAR_MUL", ops.scalar_mul, True, dict(inplace=_EW_INPLACE)),
    ("CMUL", ops.cmul, True, dict(arity=(2, 1))),
    ("CONVOLUTION", ops.conv2d, True, dict(arity=(2, 1))),
    ("CONVOLUTION_TRANSPOSE", ops.conv2d_transpose, True,
     dict(arity=(2, 1))),
    ("RELU", ops.relu, True, dict(inplace=_EW_INPLACE)),
    ("LEAKY_RELU", ops.leaky_relu, True, dict(inplace=_EW_INPLACE)),
    ("SIGMOID", ops.sigmoid, True, dict(inplace=_EW_INPLACE)),
    ("TANH", ops.tanh, True, dict(inplace=_EW_INPLACE)),
    ("SWISH", ops.swish, True, dict(inplace=_EW_INPLACE)),
    ("GELU", ops.gelu, True, dict(inplace=_EW_INPLACE)),
    ("SOFTMAX", ops.softmax, True, dict(inplace=_EW_INPLACE)),
    ("DROPOUT", ops.dropout, True, dict(arity=(3, 1))),
    ("EWSUM", ops.ewsum, True, dict(arity=(2, 1), inplace=_EW_INPLACE)),
    ("EWPROD", ops.ewprod, True, dict(arity=(2, 1), inplace=_EW_INPLACE)),
    ("EWDIV", ops.ewdiv, True, dict(arity=(2, 1), inplace=_EW_INPLACE)),
    ("EWEXP", ops.ewexp, True, dict(inplace=_EW_INPLACE)),
    ("EWLOG", ops.ewlog, True, dict(inplace=_EW_INPLACE)),
    ("EWSQRT", ops.ewsqrt, True, dict(inplace=_EW_INPLACE)),
    ("EWABS", ops.ewabs, True, dict(inplace=_EW_INPLACE)),
    ("EWNEG", ops.ewneg, True, dict(inplace=_EW_INPLACE)),
    ("CLAMP", ops.clamp, True, dict(inplace=_EW_INPLACE)),
    ("MIN", ops.ewmin, True, dict(arity=(2, 1), inplace=_EW_INPLACE)),
    ("MAX", ops.ewmax, True, dict(arity=(2, 1), inplace=_EW_INPLACE)),
    ("MAX_POOL", ops.max_pool, True, dict(dtypes=DTYPES_ANY)),
    ("AVERAGE_POOL", ops.avg_pool, True, {}),
    ("BATCH_NORM", ops.batch_norm, True, dict(arity=(5, 3))),
    ("LAYER_NORM", ops.layer_norm, True, dict(arity=(1, 1))),
    ("GROUP_NORM", ops.group_norm, True, dict(arity=(1, 1))),
    ("RMSNORM", ops.rmsnorm, True, dict(arity=(2, 1))),
    ("MSE", ops.mse_loss, True, dict(arity=(2, 1))),
    ("MAE", ops.mae_loss, False, dict(arity=(2, 1))),
    ("SMOOTH_L1", ops.smooth_l1_loss, True, dict(arity=(2, 1))),
    ("CATEGORICAL_CROSSENTROPY", ops.categorical_crossentropy, True,
     dict(arity=(2, 1))),
    ("SOFTMAX_CROSSENTROPY", ops.softmax_crossentropy, True,
     dict(arity=(2, 2))),
    ("BINARY_CROSSENTROPY", ops.binary_crossentropy, True,
     dict(arity=(2, 1))),
    ("SIGMOID_BINARY_CROSSENTROPY", ops.sigmoid_binary_crossentropy, True,
     dict(arity=(2, 2))),
    ("REDUCE_SUM", ops.reduce_sum, True, {}),
    ("REDUCE_MEAN", ops.reduce_mean, True, {}),
    ("REDUCE_MAX", ops.reduce_max, True, dict(dtypes=DTYPES_ANY)),
    ("REDUCE_MIN", ops.reduce_min, True, dict(dtypes=DTYPES_ANY)),
    ("REDUCE_NORM2", ops.reduce_norm2, True, {}),
    ("ARGMAX", ops.argmax, False, dict(dtypes=DTYPES_ANY)),
    ("ARGMIN", ops.argmin, False, dict(dtypes=DTYPES_ANY)),
    ("REDUCE_ISNAN", ops.reduce_isnan, False, {}),
    ("FORMAT_TRANSFORM", ops.format_transform, True,
     dict(dtypes=DTYPES_ANY)),
    ("DATATYPE_CONVERSION", ops.datatype_conversion, True,
     dict(dtypes=DTYPES_ANY)),
    ("SET", ops.set_, False, dict(dtypes=DTYPES_ANY, arity=(0, 1))),
    ("MASKED_FILL", ops.masked_fill, True, dict(arity=(2, 1))),
    ("PAD", ops.pad, True, dict(dtypes=DTYPES_ANY)),
    ("INDEX_SELECT", ops.index_select, True,
     dict(dtypes=DTYPES_ANY, arity=(2, 1))),
    ("UPSAMPLE", ops.upsample, True, {}),
    ("HISTOGRAM", ops.histogram, False, {}),
    ("RANDOM_UNIFORM", ops.random_uniform, False, dict(arity=(2, 1))),
    ("RANDOM_NORMAL", ops.random_normal, False, dict(arity=(2, 1))),
    ("NMS", ops.nms, False, dict(arity=(2, 2))),
    ("ROI_ALIGN", ops.roi_align, True,
     dict(arity=(2, 1), formats=FORMATS_NHWC)),
    ("SCALED_DOT_PRODUCT_ATTENTION", ops.scaled_dot_product_attention, True,
     dict(arity=(3, 1), formats=FORMATS_NHWC)),
    ("LSTM", ops.lstm, True, dict(arity=(3, 1), formats=FORMATS_NHWC)),
    ("TRANSPOSE", ops.transpose, True, dict(dtypes=DTYPES_ANY)),
    ("DATA_TRANSFER", ops.data_transfer, True,
     dict(dtypes=DTYPES_ANY, inplace=_EW_INPLACE)),
]:
    _register(_short, _fn, differentiable=_diff, **_caps)

# optimizer update commands (cmd/sgd, cmd/adam, cmd/lamb, cmd/rmsprop):
# functional per-tensor steps, formulas verbatim from the cpu_ref kernels;
# all update their parameter/aux slots in place in the reference
from ccv_tpu.nn import optimizers as _opt  # noqa: E402

for _short, _fn in [("SGD", _opt.sgd_step), ("ADAM", _opt.adam_step),
                    ("ADAMW", _opt.adamw_step), ("LAMB", _opt.lamb_step),
                    ("RMSPROP", _opt.rmsprop_step)]:
    _register(_short, _fn, differentiable=False,
              inplace=((0, 0), (1, 1)), arity=(3, 2))

# collective commands (cmd/comm/ccv_nnc_comm.c:97+): shard_map-body
# collectives; autodiff through psum is native to jax (allreduce backward
# = allreduce, matching comm.c's bitmask registration)
from ccv_tpu.parallel import mesh as _mesh  # noqa: E402

_register("COMM_ALLREDUCE", _mesh.comm_allreduce, inplace=_EW_INPLACE)
_register("COMM_BROADCAST", _mesh.comm_broadcast)
_register("COMM_REDUCE", _mesh.comm_reduce)

# activation compression (cmd/compression/): LSSC 4x4 block codec
from ccv_tpu.nn import compression as _compression  # noqa: E402

_register("COMPRESSION_LSSC", _compression.lssc_compress,
          differentiable=False, dtypes=("float16", "bfloat16"))

_register("NOOP", lambda *a: a[0] if len(a) == 1 else a,
          attrs=CMD_ATTR_PASSTHROUGH, dtypes=DTYPES_ANY)

CMD_COUNT = len(_REGISTRY)


def cmd(name_or_id) -> Callable:
    """Resolve a command to its op function (the dispatch analog)."""
    e = (_BY_ID[name_or_id] if isinstance(name_or_id, int)
         else _REGISTRY[name_or_id])
    return e.fn


def cmd_entry(name_or_id) -> CmdEntry:
    return (_BY_ID[name_or_id] if isinstance(name_or_id, int)
            else _REGISTRY[name_or_id])


def cmd_name(cmd_id: int) -> str:
    """ccv_nnc_cmd_name twin (ccv_nnc.h:740)."""
    return _BY_ID[cmd_id].name


def cmd_ok(name_or_id, backend: str = "xla",
           dtype: Optional[str] = None, format: Optional[str] = None) -> bool:
    """ccv_nnc_cmd_ok twin (ccv_nnc.h:750): is the command lowerable on
    this backend for this dtype/format? Mirrors the reference's registry
    mask check (cmd.c:671-682 backend selection)."""
    try:
        e = cmd_entry(name_or_id)
    except KeyError:
        return False
    if backend not in ("xla", "tpu", "cpu"):
        return False
    if dtype is not None and str(dtype) not in e.dtypes:
        return False
    if format is not None and format not in e.formats:
        return False
    return True


def cmd_allow_inplace(name_or_id, input_idx: int, output_idx: int) -> bool:
    """ccv_nnc_cmd_allow_inplace twin (ccv_nnc.h:760): may input i alias
    output j? (Realized in JAX via jit buffer donation.)"""
    return (input_idx, output_idx) in cmd_entry(name_or_id).inplace


def cmd_attr(name_or_id, attr: int) -> bool:
    """ccv_nnc_cmd_attr twin: test an attribute bit."""
    return bool(cmd_entry(name_or_id).attrs & attr)


def commands():
    """Enumerate the registry (the ccv_nnc_cmd.inc table analog)."""
    return list(_REGISTRY.values())
