"""Command registry completeness: all 69 reference forward families
(cmd/ccv_nnc_cmd.inc) are registered, and the optimizer-update command
twins follow the cpu_ref formulas exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.nn import cmd as C
from ccv_tpu.nn import optimizers as opt

# every REGISTER_COMMAND(..._FORWARD) family name in the reference's
# generated registry (lib/nnc/cmd/ccv_nnc_cmd.inc)
REF_FAMILIES = """ADAM ADAMW ADD ARGMAX ARGMIN AVERAGE_POOL BATCH_NORM
BINARY_CROSSENTROPY CATEGORICAL_CROSSENTROPY CLAMP CMUL COMM_ALLREDUCE
COMM_BROADCAST COMM_REDUCE COMPRESSION_LSSC CONVOLUTION
CONVOLUTION_TRANSPOSE DATATYPE_CONVERSION DATA_TRANSFER DROPOUT EWABS
EWDIV EWEXP EWLOG EWNEG EWPROD EWSQRT EWSUM FORMAT_TRANSFORM GELU GEMM
GROUP_NORM HISTOGRAM INDEX_SELECT LAMB LAYER_NORM LEAKY_RELU LSTM MAE
MASKED_FILL MAX MAX_POOL MIN MSE MUL NMS NOOP PAD RANDOM_NORMAL
RANDOM_UNIFORM REDUCE_ISNAN REDUCE_MAX REDUCE_MEAN REDUCE_MIN
REDUCE_NORM2 REDUCE_SUM RELU RMSNORM RMSPROP ROI_ALIGN SCALAR_MUL
SCALED_DOT_PRODUCT_ATTENTION SET SGD SIGMOID SIGMOID_BINARY_CROSSENTROPY
SMOOTH_L1 SOFTMAX SOFTMAX_CROSSENTROPY SWISH TANH TRANSPOSE
UPSAMPLE""".split()


def test_all_reference_families_registered():
    ours = {e.name.replace("CCV_NNC_", "").replace("_FORWARD", "")
            for e in C.commands()}
    missing = sorted(set(REF_FAMILIES) - ours)
    assert not missing, missing


def test_sgd_step_matches_cpu_ref_formula():
    """cmd/sgd/ccv_nnc_sgd_cpu_ref.c:112-114 (vanilla) and :79-84
    (nesterov)."""
    rng = np.random.default_rng(0)
    g = rng.standard_normal(8).astype(np.float32)
    x = rng.standard_normal(8).astype(np.float32)
    m = rng.standard_normal(8).astype(np.float32)
    kw = dict(rate=0.01, scale=2.0, decay=0.1, momentum=0.9, dampening=0.2)
    nx, nm = opt.sgd_step(jnp.asarray(g), jnp.asarray(x), jnp.asarray(m),
                          **kw)
    want_m = 0.9 * m + (1 - 0.2) * (2.0 * g + 0.1 * x)
    np.testing.assert_allclose(np.asarray(nm), want_m, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nx), x - 0.01 * want_m, rtol=1e-6)
    # nesterov: mom = momentum*m + grad + decay*x; x -= rate*(grad+momentum*mom)
    nx, nm = opt.sgd_step(jnp.asarray(g), jnp.asarray(x), jnp.asarray(m),
                          rate=0.01, scale=2.0, decay=0.1, momentum=0.9,
                          dampening=0.0, nesterov=True)
    gg = 2.0 * g
    want_m = 0.9 * m + gg + 0.1 * x
    np.testing.assert_allclose(np.asarray(nm), want_m, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nx), x - 0.01 * (gg + 0.9 * want_m),
                               rtol=1e-6)


def test_adam_adamw_bias_correction_and_decoupled_decay():
    """cmd/adam/ccv_nnc_adam_cpu_ref.c:112-122, adamw :157-160."""
    g = np.full(4, 0.5, np.float32)
    x = np.full(4, 1.0, np.float32)
    z = np.zeros(4, np.float32)
    step = 1
    nx, nm, nv = opt.adam_step(*map(jnp.asarray, (g, x, z, z)), step,
                               rate=0.1, beta1=0.9, beta2=0.999,
                               decay=0.5, epsilon=0.0)
    grad = g + 0.5 * x  # coupled decay enters the moments
    m2 = 0.1 * grad
    v2 = 0.001 * grad * grad
    want = x - 0.1 * (m2 / 0.1) / np.sqrt(v2 / 0.001)
    np.testing.assert_allclose(np.asarray(nx), want, rtol=1e-5)
    # adamw: decay decoupled — moments see only scale*grad
    nxw, nmw, nvw = opt.adamw_step(*map(jnp.asarray, (g, x, z, z)), step,
                                   rate=0.1, beta1=0.9, beta2=0.999,
                                   decay=0.5, epsilon=0.0)
    np.testing.assert_allclose(np.asarray(nmw), 0.1 * g, rtol=1e-6)
    wantw = x - 0.1 * 0.5 * x - 0.1 * (0.1 * g / 0.1) / np.sqrt(
        0.001 * g * g / 0.001)
    np.testing.assert_allclose(np.asarray(nxw), wantw, rtol=1e-5)


def test_lamb_trust_ratio():
    """cmd/lamb/ccv_nnc_lamb_cpu_ref.c:96-130: step scaled by |w|/|update|."""
    g = np.full(4, 1.0, np.float32)
    x = np.full(4, 2.0, np.float32)
    z = np.zeros(4, np.float32)
    nx, _, _ = opt.lamb_step(*map(jnp.asarray, (g, x, z, z)), 1,
                             rate=0.1, epsilon=0.0)
    # update = bias-corrected m/sqrt(v) = 1 everywhere; trust = |w|/|u| = 2
    np.testing.assert_allclose(np.asarray(nx), x - 0.1 * 2.0 * 1.0,
                               rtol=1e-5)


def test_rmsprop_step():
    """cmd/rmsprop/ccv_nnc_rmsprop_cpu_ref.c:90-94."""
    g = np.full(4, 1.0, np.float32)
    x = np.zeros(4, np.float32)
    z = np.zeros(4, np.float32)
    nx, nm, nv = opt.rmsprop_step(*map(jnp.asarray, (g, x, z, z)),
                                  rate=0.1, alpha=0.99, momentum=0.9,
                                  epsilon=0.0)
    v2 = 0.01
    m2 = 1.0 / np.sqrt(v2)
    np.testing.assert_allclose(np.asarray(nv), np.full(4, v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nx), np.full(4, -0.1 * m2),
                               rtol=1e-5)


def test_comm_cmds_under_shard_map():
    """COMM_* commands run as shard_map bodies (comm.c NCCL twin)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    x = jnp.arange(4.0)

    ar = C.cmd("CCV_NNC_COMM_ALLREDUCE_FORWARD")
    out = shard_map(lambda v: ar(v, "data"), mesh=mesh, in_specs=P("data"),
                    out_specs=P("data"))(x)
    np.testing.assert_allclose(np.asarray(out), np.full(4, 6.0))

    bc = C.cmd("CCV_NNC_COMM_BROADCAST_FORWARD")
    out = shard_map(lambda v: bc(v, "data"), mesh=mesh, in_specs=P("data"),
                    out_specs=P("data"))(x)
    np.testing.assert_allclose(np.asarray(out), np.zeros(4))  # root 0's value


def test_transpose_and_data_transfer():
    x = jnp.arange(24.0).reshape(2, 3, 4)
    assert C.cmd("CCV_NNC_TRANSPOSE_FORWARD")(x, 0, 2).shape == (4, 3, 2)
    y = C.cmd("CCV_NNC_DATA_TRANSFER_FORWARD")(np.ones((2, 2)))
    assert isinstance(y, jax.Array)
