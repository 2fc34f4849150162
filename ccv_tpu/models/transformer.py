"""Transformer model family — twin of the reference's NNC transformer
examples (reference: bin/nnc/wmt.c:138-248 `_multihead_attention_new` /
`_encoder_block_new` / `_decoder_block_new` / `_encoder_decoder_new`,
bin/nnc/iwslt.c same topology, bin/nnc/imdb.c encoder-only classifier).

The reference builds these with CNNP graph models over NNC; here the same
architectures are plain functional JAX so the whole training step jits to
one XLA program:

* bf16 matmuls on the MXU (params kept fp32, casts at the edges);
* scaled-dot-product attention goes through the Pallas flash-attention
  kernel on TPU (ccv_tpu.ops.pallas.flash_attention), plain-XLA SDPA
  elsewhere;
* `shardings()` returns Megatron-style tensor-parallel NamedShardings
  (qkv column-parallel, output projection row-parallel, ff1 column / ff2
  row) over a ('data', 'model') mesh so GSPMD inserts the all-reduces —
  the TPU-native equivalent of the reference's NCCL data-parallel
  transform (lib/nnc/ccv_nnc_symbolic_graph_parallel.c:24).

Architectural notes carried over from wmt.c (kept for parity, quirks and
all): post-layer-norm applied *before* the residual sum
(wmt.c:187-189 `out = LN(attn(x)); out = x + out`), ReLU feed-forward,
shared width d = k*h, per-sequence valid-length masks rather than
per-position masks.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Hyper-parameters (defaults = wmt.c main(): k=64 h=8 layers=6 ff=2048,
    dropout 0.1, max_length 128)."""
    vocab_size: int
    tgt_vocab_size: Optional[int] = None   # encoder-decoder only
    layers: int = 6
    heads: int = 8
    head_dim: int = 64
    ff: int = 2048
    max_len: int = 128
    dropout: float = 0.1
    dtype: Any = jnp.bfloat16
    # rematerialize each block's activations in the backward pass
    # (ccv_cnnp_model_gradient_checkpointing.c's role, as jax.checkpoint)
    remat: bool = False
    # remat policy: "full" recomputes everything (min memory, +1 forward
    # of FLOPs); "dots" saves the block's weight-matmul outputs and
    # recomputes only cheap elementwise/norm ops
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — the
    # usual MFU-vs-memory sweet spot for transformer training
    remat_policy: str = "full"

    @property
    def dim(self) -> int:
        return self.heads * self.head_dim


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def _dense_init(key, d_in, d_out):
    bound = math.sqrt(6.0 / (d_in + d_out))   # glorot, like ccv_cnnp_dense
    return jax.random.uniform(key, (d_in, d_out), jnp.float32, -bound, bound)


def _block_init(key, cfg: TransformerConfig, cross: bool) -> Dict[str, Any]:
    d, ff = cfg.dim, cfg.ff
    n = 10 if cross else 7
    ks = list(jax.random.split(key, n))
    p = {
        "wq": _dense_init(ks[0], d, d), "wk": _dense_init(ks[1], d, d),
        "wv": _dense_init(ks[2], d, d), "wo": _dense_init(ks[3], d, d),
        "bq": jnp.zeros((d,)), "bk": jnp.zeros((d,)), "bv": jnp.zeros((d,)),
        "ln1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "w1": _dense_init(ks[4], d, ff), "b1": jnp.zeros((ff,)),
        "w2": _dense_init(ks[5], ff, d), "b2": jnp.zeros((d,)),
        "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
    }
    if cross:
        p["xwq"] = _dense_init(ks[6], d, d)
        p["xwk"] = _dense_init(ks[7], d, d)
        p["xwv"] = _dense_init(ks[8], d, d)
        p["xwo"] = _dense_init(ks[9], d, d)
        p["xbq"] = jnp.zeros((d,))
        p["xbk"] = jnp.zeros((d,))
        p["xbv"] = jnp.zeros((d,))
        p["ln_x"] = {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}
    return p


def init_encoder_decoder(key, cfg: TransformerConfig) -> Dict[str, Any]:
    """Params for the wmt.c `_encoder_decoder_new` twin."""
    tgt_vocab = cfg.tgt_vocab_size or cfg.vocab_size
    keys = jax.random.split(key, 2 * cfg.layers + 3)
    return {
        "src_embed": jax.random.normal(keys[0], (cfg.vocab_size, cfg.dim)) * 0.02,
        "tgt_embed": jax.random.normal(keys[1], (tgt_vocab, cfg.dim)) * 0.02,
        "encoder": [_block_init(keys[2 + i], cfg, cross=False)
                    for i in range(cfg.layers)],
        "decoder": [_block_init(keys[2 + cfg.layers + i], cfg, cross=True)
                    for i in range(cfg.layers)],
        "out": _dense_init(keys[-1], cfg.dim, tgt_vocab),
    }


def init_encoder_classifier(key, cfg: TransformerConfig,
                            num_classes: int) -> Dict[str, Any]:
    """Params for the imdb.c encoder-only classifier twin."""
    keys = jax.random.split(key, cfg.layers + 2)
    return {
        "src_embed": jax.random.normal(keys[0], (cfg.vocab_size, cfg.dim)) * 0.02,
        "encoder": [_block_init(keys[1 + i], cfg, cross=False)
                    for i in range(cfg.layers)],
        "out": _dense_init(keys[-1], cfg.dim, num_classes),
    }


def init_lm(key, cfg: TransformerConfig) -> Dict[str, Any]:
    """Decoder-only language model (no reference twin; the TPU-native
    flagship for the multichip training-step dryrun)."""
    keys = jax.random.split(key, cfg.layers + 2)
    return {
        "src_embed": jax.random.normal(keys[0], (cfg.vocab_size, cfg.dim)) * 0.02,
        "encoder": [_block_init(keys[1 + i], cfg, cross=False)
                    for i in range(cfg.layers)],
        "out": _dense_init(keys[-1], cfg.dim, cfg.vocab_size),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def sinusoid_positions(t: int, d: int) -> jnp.ndarray:
    pos = np.arange(t)[:, None]
    i = np.arange(d // 2)[None, :]
    ang = pos / np.power(10000.0, 2 * i / d)
    out = np.zeros((t, d), np.float32)
    out[:, 0::2] = np.sin(ang)
    out[:, 1::2] = np.cos(ang)
    return jnp.asarray(out)


def _layer_norm(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(x.dtype)


def _dropout(x, rate, key, train):
    if not train or rate <= 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _use_flash(mask, dropout, train) -> bool:
    # the kernel pads T/D itself; it can't apply an arbitrary key mask or
    # attention-weight dropout, so those fall back to the XLA path
    return (mask is None and jax.default_backend() != "cpu"
            and (not train or dropout <= 0.0))


@dataclasses.dataclass(frozen=True)
class RingSpec:
    """Sequence-parallel attention config: when set on a forward call the
    self-attention runs as ring attention over `seq_axis` of `mesh`,
    composing with GSPMD dp/tp shardings on `batch_axis`/`head_axis`
    (parallel/sequence.py; new design per SURVEY §5.7)."""
    mesh: Any
    seq_axis: str = "seq"
    batch_axis: Optional[str] = None
    head_axis: Optional[str] = None

    # static hashability for jax.checkpoint static_argnums: identity is
    # fine, the spec is constructed once per training program
    def __hash__(self):
        return id(self)


def _attend(q, k, v, heads: int, causal: bool, mask, dropout, key, train,
            ring: Optional[RingSpec] = None):
    """(B, T, D) x3 -> (B, T, D) multi-head attention.

    mask: (B, Tk) True=valid (the reference's per-sequence length masks,
    wmt.c:114-121) or None.
    """
    B, Tq, D = q.shape
    Tk = k.shape[1]
    hd = D // heads
    scale = 1.0 / math.sqrt(hd)
    qh = q.reshape(B, Tq, heads, hd)
    kh = k.reshape(B, Tk, heads, hd)
    vh = v.reshape(B, Tk, heads, hd)
    if ring is not None and mask is None and Tq == Tk:
        from ccv_tpu.parallel import sequence as seqp
        out = seqp.ring_attention(qh, kh, vh, ring.mesh,
                                  seq_axis=ring.seq_axis, scale=scale,
                                  is_causal=causal,
                                  batch_axis=ring.batch_axis,
                                  head_axis=ring.head_axis)
        return out.reshape(B, Tq, D)
    if _use_flash(mask, dropout, train) and Tq == Tk:
        # measured Pallas-vs-XLA choice per shape (autotune, the
        # ccv_nnc_cmd_autotune analog); default = the Pallas kernel,
        # which the decision cache overrides where XLA measured faster
        from ccv_tpu.nn import autotune
        from ccv_tpu.ops.pallas import flash_attention

        fn = autotune.choose(
            "sdpa",
            {"pallas": lambda q_, k_, v_: flash_attention(
                q_, k_, v_, scale=scale, is_causal=causal),
             "xla": lambda q_, k_, v_: _sdpa_xla(
                 q_, k_, v_, scale, causal, None, 0.0, None, False)},
            (qh, kh, vh), default="pallas", extra=f"causal={causal}")
        return fn(qh, kh, vh).reshape(B, Tq, D)
    out = _sdpa_xla(qh, kh, vh, scale, causal, mask, dropout, key, train)
    return out.reshape(B, Tq, D)


def _sdpa_xla(qh, kh, vh, scale, causal, mask, dropout, key, train):
    """Plain-XLA SDPA on (B, T, h, d) heads-split tensors."""
    Tq, Tk = qh.shape[1], kh.shape[1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    if causal:
        cm = jnp.tril(jnp.ones((Tq, Tk), bool))
        logits = jnp.where(cm[None, None], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1)
    w = _dropout(w, dropout, key, train)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(vh.dtype), vh)


def _mha(p, x, mem, cfg, causal, mask, key, train, prefix="", ring=None):
    dt = cfg.dtype
    wq, wk, wv, wo = (p[prefix + n].astype(dt) for n in ("wq", "wk", "wv", "wo"))
    bq, bk, bv = (p[prefix + n].astype(dt) for n in ("bq", "bk", "bv"))
    src = x if mem is None else mem
    q = x @ wq + bq
    k = src @ wk + bk
    v = src @ wv + bv
    o = _attend(q, k, v, cfg.heads, causal, mask, cfg.dropout, key, train,
                ring=ring)
    return o @ wo


def _ffn(p, x, cfg):
    dt = cfg.dtype
    h = jax.nn.relu(x @ p["w1"].astype(dt) + p["b1"].astype(dt))
    return h @ p["w2"].astype(dt) + p["b2"].astype(dt)


def _encoder_block(p, x, cfg, mask, key, train, causal=False, ring=None):
    """wmt.c:181-199 `_encoder_block_new`: x + LN(attn(x)), then
    first + LN(ffn(.)) — layer norm inside the residual branch."""
    k1, k2, k3 = (jax.random.split(key, 3) if key is not None
                  else (None, None, None))
    a = _mha(p, x, None, cfg, causal, mask, k1, train, ring=ring)
    first = x + _layer_norm(a, p["ln1"])
    out = _dropout(first, cfg.dropout, k2, train)
    out = _ffn(p, out, cfg)
    out = first + _layer_norm(out, p["ln2"])
    return _dropout(out, cfg.dropout, k3, train)


def _decoder_block(p, x, mem, cfg, src_mask, tgt_mask, key, train):
    """wmt.c:203-233 `_decoder_block_new`: causal self-attn, cross-attn,
    ffn — each as first + LN(branch)."""
    ks = (jax.random.split(key, 4) if key is not None else (None,) * 4)
    a = _mha(p, x, None, cfg, True, tgt_mask, ks[0], train)
    first = x + _layer_norm(a, p["ln1"])
    out = _dropout(first, cfg.dropout, ks[1], train)
    xa = _mha(p, out, mem, cfg, False, src_mask, ks[2], train, prefix="x")
    first = first + _layer_norm(xa, p["ln_x"])
    out = _dropout(first, cfg.dropout, ks[3], train)
    out = _ffn(p, out, cfg)
    out = first + _layer_norm(out, p["ln2"])
    return out


def _embed(table, ids, cfg, dt):
    x = table.astype(dt)[ids] * math.sqrt(cfg.dim)
    T = ids.shape[1]
    return x + sinusoid_positions(T, cfg.dim).astype(dt)


def encoder_decoder_forward(params, cfg: TransformerConfig, src, tgt,
                            src_mask=None, tgt_mask=None,
                            train: bool = False, key=None):
    """wmt.c `_encoder_decoder_new` twin: (B,Ts) int32 src, (B,Tt) int32
    tgt -> (B,Tt,tgt_vocab) float32 logits. Masks are (B, T) booleans
    (True=valid token)."""
    dt = cfg.dtype
    nk = 2 * cfg.layers + 1
    keys = (list(jax.random.split(key, nk)) if key is not None
            else [None] * nk)
    x = _embed(params["src_embed"], src, cfg, dt)
    x = _dropout(x, cfg.dropout, keys[-1], train)
    for i, blk in enumerate(params["encoder"]):
        x = _encoder_block(blk, x, cfg, src_mask, keys[i], train)
    y = _embed(params["tgt_embed"], tgt, cfg, dt)
    for i, blk in enumerate(params["decoder"]):
        y = _decoder_block(blk, y, x, cfg, src_mask, tgt_mask,
                           keys[cfg.layers + i], train)
    return (y @ params["out"].astype(dt)).astype(jnp.float32)


def encoder_classifier_forward(params, cfg: TransformerConfig, src,
                               src_mask=None, train: bool = False, key=None):
    """imdb.c twin: encoder stack, masked mean-pool, linear head ->
    (B, num_classes) logits."""
    dt = cfg.dtype
    nk = cfg.layers + 1
    keys = (list(jax.random.split(key, nk)) if key is not None
            else [None] * nk)
    x = _embed(params["src_embed"], src, cfg, dt)
    x = _dropout(x, cfg.dropout, keys[-1], train)
    for i, blk in enumerate(params["encoder"]):
        x = _encoder_block(blk, x, cfg, src_mask, keys[i], train)
    if src_mask is not None:
        m = src_mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(x.astype(jnp.float32) * m, 1) / jnp.maximum(
            jnp.sum(m, 1), 1.0)
    else:
        pooled = jnp.mean(x.astype(jnp.float32), 1)
    return pooled.astype(dt) @ params["out"].astype(dt)


def lm_forward(params, cfg: TransformerConfig, ids,
               train: bool = False, key=None,
               ring: Optional[RingSpec] = None):
    """Decoder-only LM: (B,T) int32 -> (B,T,vocab) float32 logits.

    ring: optional RingSpec — self-attention runs sequence-parallel over
    the given mesh axis (composes with GSPMD dp/tp shardings)."""
    dt = cfg.dtype
    nk = cfg.layers + 1
    keys = (list(jax.random.split(key, nk)) if key is not None
            else [None] * nk)
    x = _embed(params["src_embed"], ids, cfg, dt)
    x = _dropout(x, cfg.dropout, keys[-1], train)
    block = _encoder_block
    if cfg.remat:
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if cfg.remat_policy == "dots" else None)
        block = jax.checkpoint(_encoder_block,
                               static_argnums=(2, 5, 6, 7),
                               policy=policy)
    for i, blk in enumerate(params["encoder"]):
        x = block(blk, x, cfg, None, keys[i], train, True, ring)
    return (x @ params["out"].astype(dt)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Sharding (dp x tp over a ('data','model') mesh)
# ---------------------------------------------------------------------------

def _block_spec(cross: bool) -> Dict[str, Any]:
    col, row = P(None, "model"), P("model", None)
    vec, rep = P("model"), P()
    p = {
        "wq": col, "wk": col, "wv": col, "wo": row,
        "bq": vec, "bk": vec, "bv": vec,
        "ln1": {"g": rep, "b": rep},
        "w1": col, "b1": vec, "w2": row, "b2": rep,
        "ln2": {"g": rep, "b": rep},
    }
    if cross:
        p.update({"xwq": col, "xwk": col, "xwv": col, "xwo": row,
                  "xbq": vec, "xbk": vec, "xbv": vec,
                  "ln_x": {"g": rep, "b": rep}})
    return p


def shardings(params, mesh: Mesh) -> Any:
    """NamedSharding pytree: embeddings/vocab-out column-sharded on
    'model', attention/ffn Megatron-style. Matching the partition specs
    lets GSPMD place one all-reduce per block on ICI — the role the
    reference's COMM_ALLREDUCE graph nodes play
    (lib/nnc/cmd/comm/ccv_nnc_comm.c:97)."""
    spec: Dict[str, Any] = {}
    for name in ("src_embed", "tgt_embed"):
        if name in params:
            spec[name] = P(None, "model")
    if "out" in params:
        spec["out"] = P(None, "model")
    for name in ("encoder", "decoder"):
        if name in params:
            cross = name == "decoder"
            spec[name] = [_block_spec(cross) for _ in params[name]]

    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def _fit(param, s):
        # drop axis shardings the parameter's shape can't honor (e.g. an
        # odd vocab size not divisible by the 'model' axis) — replicate
        # that axis instead of erroring
        fixed = tuple(
            (a if a is None or param.shape[i] % axis_sizes.get(a, 1) == 0
             else None)
            for i, a in enumerate(tuple(s) + (None,) * (param.ndim - len(s))))
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map(_fit, params, spec)


def cross_entropy(logits, labels, label_smoothing: float = 0.0,
                  mask=None):
    """Token cross entropy with optional smoothing; mask (B,T) True=count."""
    V = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
    if label_smoothing > 0.0:
        nll = (1.0 - label_smoothing) * nll - label_smoothing * jnp.mean(
            logp, -1)
    if mask is not None:
        m = mask.astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(nll)
