"""Layer-zoo completeness audit vs the reference's ccv_cnnp_* constructors.

Extracts every `CCV_WARN_UNUSED(ccv_cnnp_model_t*) ccv_cnnp_<name>` ctor
from the reference header (lib/nnc/ccv_nnc.h §level_5 add-ons,
lib/nnc/ccv_cnnp_model_addons.c) and asserts each has a twin in
ccv_tpu.nn — the test_cmd_complete.py treatment for the model zoo.
"""

import re

import pytest

from conftest import reference_path, requires_reference

# reference ctor name -> our attribute (module, name). Names that differ
# only by camel-casing are resolved automatically.
EXPLICIT = {
    "model_new": ("ccv_tpu.nn.functional", "Model"),
    "sequential_new": ("ccv_tpu.nn.model", "Sequential"),
    "model_copy": ("ccv_tpu.nn.functional", "model_copy"),
    "dynamic_new": ("ccv_tpu.nn.functional", "Dynamic"),
    "graph": ("ccv_tpu.nn.functional", "Model"),  # DAG-of-layers form
    "average_pool": ("ccv_tpu.nn.layers", "AvgPool"),
    "max_pool": ("ccv_tpu.nn.layers", "MaxPool"),
    "relu": ("ccv_tpu.nn.layers", "ReLU"),
    "leaky_relu": ("ccv_tpu.nn.layers", "LeakyReLU"),
    "gelu": ("ccv_tpu.nn.layers", "GELU"),
    "lstm": ("ccv_tpu.nn.layers", "LSTM"),
    "rmsnorm": ("ccv_tpu.nn.layers", "RMSNorm"),
    "reduce_sum": ("ccv_tpu.nn.functional", "Reduce"),
    "reduce_mean": ("ccv_tpu.nn.functional", "Reduce"),
    "reduce_max": ("ccv_tpu.nn.functional", "Reduce"),
    "reduce_min": ("ccv_tpu.nn.functional", "Reduce"),
    "reduce_norm2": ("ccv_tpu.nn.functional", "Reduce"),
    "scaled_dot_product_attention": ("ccv_tpu.nn.layers",
                                     "ScaledDotProductAttention"),
    "cmd_exec": ("ccv_tpu.nn.functional", "CmdExec"),
    "move": ("ccv_tpu.nn.functional", "Move"),
    "argmax": ("ccv_tpu.nn.functional", "ArgMax"),
    "argmin": ("ccv_tpu.nn.functional", "ArgMin"),
    "cmul": ("ccv_tpu.nn.functional", "CMul"),
    "sum": ("ccv_tpu.nn.functional", "Add"),  # ccv_cnnp_sum = n-ary add
}

MODULES = ("ccv_tpu.nn.layers", "ccv_tpu.nn.functional", "ccv_tpu.nn.model")


@requires_reference
def test_all_reference_cnnp_ctors_have_twins():
    import importlib

    hdr = open(reference_path("lib/nnc/ccv_nnc.h")).read()
    names = sorted(set(re.findall(
        r"CCV_WARN_UNUSED\(ccv_cnnp_model_t\*\) ccv_cnnp_([a-z_0-9]+)",
        hdr)))
    assert len(names) >= 60, f"header parse broke: {len(names)} ctors"

    mods = {m: importlib.import_module(m) for m in MODULES}
    missing = []
    for name in names:
        if name in EXPLICIT:
            mod, attr = EXPLICIT[name]
            if not hasattr(mods[mod], attr):
                missing.append(f"{name} (expected {mod}.{attr})")
            continue
        camel = "".join(p.capitalize() for p in name.split("_"))
        if not any(hasattr(m, camel) or hasattr(m, name)
                   for m in mods.values()):
            missing.append(name)
    assert not missing, f"ctors without twins: {missing}"
