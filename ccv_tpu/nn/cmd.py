"""Command registry — twin of the reference's cmd registry/introspection
(lib/nnc/ccv_nnc_cmd.c: ccv_nnc_cmd_name:740, ccv_nnc_cmd_ok:750, the
generated ccv_nnc_cmd.inc table of 139 CMD_*_FORWARD/BACKWARD entries).

The reference resolves a uint32 cmd id to a name, attributes, and the set
of backends that implement it; dispatch then picks a backend at exec time.
Here the single backend is XLA: every registered command maps to the
`ccv_tpu.nn.ops` function that implements its forward, "backward" support
means `jax.grad` traces through it, and `cmd_ok` reports whether XLA can
lower it for the current default platform (always true — one compiler).

    >>> cmd("CCV_NNC_GEMM_FORWARD")(a, b)
    >>> cmd_name(CCV_NNC_GEMM_FORWARD)
    'CCV_NNC_GEMM_FORWARD'
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

from ccv_tpu.nn import ops

# attribute bits (ccv_nnc.h:63-65)
CMD_ATTR_PASSTHROUGH = 0x01
CMD_ATTR_OUTPUT_ONES = 0x02
CMD_ATTR_NULL_IS_ONES = 0x04


@dataclasses.dataclass(frozen=True)
class CmdEntry:
    """One registry row (the ccv_nnc_cmd.inc analog)."""

    id: int
    name: str
    fn: Callable
    attrs: int = 0
    differentiable: bool = True  # jax.grad traces through the forward


_REGISTRY: Dict[str, CmdEntry] = {}
_BY_ID: Dict[int, CmdEntry] = {}


def _register(short: str, fn: Callable, attrs: int = 0,
              differentiable: bool = True):
    name = f"CCV_NNC_{short}_FORWARD"
    entry = CmdEntry(id=len(_REGISTRY) + 1, name=name, fn=fn, attrs=attrs,
                     differentiable=differentiable)
    _REGISTRY[name] = entry
    _BY_ID[entry.id] = entry
    globals()[name] = entry.id


for _short, _fn, _diff in [
    ("GEMM", ops.gemm, True), ("ADD", ops.add, True),
    ("MUL", ops.mul, True), ("SCALAR_MUL", ops.scalar_mul, True),
    ("CMUL", ops.cmul, True),
    ("CONVOLUTION", ops.conv2d, True),
    ("CONVOLUTION_TRANSPOSE", ops.conv2d_transpose, True),
    ("RELU", ops.relu, True), ("LEAKY_RELU", ops.leaky_relu, True),
    ("SIGMOID", ops.sigmoid, True), ("TANH", ops.tanh, True),
    ("SWISH", ops.swish, True), ("GELU", ops.gelu, True),
    ("SOFTMAX", ops.softmax, True), ("DROPOUT", ops.dropout, True),
    ("EWSUM", ops.ewsum, True), ("EWPROD", ops.ewprod, True),
    ("EWDIV", ops.ewdiv, True), ("EWEXP", ops.ewexp, True),
    ("EWLOG", ops.ewlog, True), ("EWSQRT", ops.ewsqrt, True),
    ("EWABS", ops.ewabs, True), ("EWNEG", ops.ewneg, True),
    ("CLAMP", ops.clamp, True), ("MIN", ops.ewmin, True),
    ("MAX", ops.ewmax, True),
    ("MAX_POOL", ops.max_pool, True),
    ("AVERAGE_POOL", ops.avg_pool, True),
    ("BATCH_NORM", ops.batch_norm, True),
    ("LAYER_NORM", ops.layer_norm, True),
    ("GROUP_NORM", ops.group_norm, True),
    ("RMSNORM", ops.rmsnorm, True),
    ("MSE", ops.mse_loss, True),
    ("MAE", ops.mae_loss, False),
    ("SMOOTH_L1", ops.smooth_l1_loss, True),
    ("CATEGORICAL_CROSSENTROPY", ops.categorical_crossentropy, True),
    ("SOFTMAX_CROSSENTROPY", ops.softmax_crossentropy, True),
    ("BINARY_CROSSENTROPY", ops.binary_crossentropy, True),
    ("SIGMOID_BINARY_CROSSENTROPY",
     ops.sigmoid_binary_crossentropy, True),
    ("REDUCE_SUM", ops.reduce_sum, True),
    ("REDUCE_MEAN", ops.reduce_mean, True),
    ("REDUCE_MAX", ops.reduce_max, True),
    ("REDUCE_MIN", ops.reduce_min, True),
    ("REDUCE_NORM2", ops.reduce_norm2, True),
    ("ARGMAX", ops.argmax, False), ("ARGMIN", ops.argmin, False),
    ("REDUCE_ISNAN", ops.reduce_isnan, False),
    ("FORMAT_TRANSFORM", ops.format_transform, True),
    ("DATATYPE_CONVERSION", ops.datatype_conversion, True),
    ("SET", ops.set_, False),
    ("MASKED_FILL", ops.masked_fill, True),
    ("PAD", ops.pad, True),
    ("INDEX_SELECT", ops.index_select, True),
    ("UPSAMPLE", ops.upsample, True),
    ("HISTOGRAM", ops.histogram, False),
    ("RANDOM_UNIFORM", ops.random_uniform, False),
    ("RANDOM_NORMAL", ops.random_normal, False),
    ("NMS", ops.nms, False),
    ("ROI_ALIGN", ops.roi_align, True),
    ("SCALED_DOT_PRODUCT_ATTENTION",
     ops.scaled_dot_product_attention, True),
    ("LSTM", ops.lstm, True),
    ("TRANSPOSE", ops.transpose, True),
    ("DATA_TRANSFER", ops.data_transfer, True),
]:
    _register(_short, _fn, differentiable=_diff)

# optimizer update commands (cmd/sgd, cmd/adam, cmd/lamb, cmd/rmsprop):
# functional per-tensor steps, formulas verbatim from the cpu_ref kernels
from ccv_tpu.nn import optimizers as _opt  # noqa: E402

for _short, _fn in [("SGD", _opt.sgd_step), ("ADAM", _opt.adam_step),
                    ("ADAMW", _opt.adamw_step), ("LAMB", _opt.lamb_step),
                    ("RMSPROP", _opt.rmsprop_step)]:
    _register(_short, _fn, differentiable=False)

# collective commands (cmd/comm/ccv_nnc_comm.c:97+): shard_map-body
# collectives; autodiff through psum is native to jax (allreduce backward
# = allreduce, matching comm.c's bitmask registration)
from ccv_tpu.parallel import mesh as _mesh  # noqa: E402

_register("COMM_ALLREDUCE", _mesh.comm_allreduce)
_register("COMM_BROADCAST", _mesh.comm_broadcast)
_register("COMM_REDUCE", _mesh.comm_reduce)

# activation compression (cmd/compression/): LSSC 4x4 block codec
from ccv_tpu.nn import compression as _compression  # noqa: E402

_register("COMPRESSION_LSSC", _compression.lssc_compress,
          differentiable=False)

_register("NOOP", lambda *a: a[0] if len(a) == 1 else a,
          attrs=CMD_ATTR_PASSTHROUGH)

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


def cmd_ok(name_or_id, backend: str = "xla") -> bool:
    """ccv_nnc_cmd_ok twin (ccv_nnc.h:750): is the command lowerable on
    this backend? XLA is the only backend; registration implies yes."""
    try:
        cmd_entry(name_or_id)
    except KeyError:
        return False
    return backend in ("xla", "tpu", "cpu")


def cmd_attr(name_or_id, attr: int) -> bool:
    """ccv_nnc_cmd_attr twin: test an attribute bit."""
    return bool(cmd_entry(name_or_id).attrs & attr)


def commands():
    """Enumerate the registry (the ccv_nnc_cmd.inc table analog)."""
    return list(_REGISTRY.values())
