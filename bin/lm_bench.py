"""Transformer-LM training throughput + MFU on one chip.

Twin of the reference's attention/training micro-benchmarks
(bin/nnc/laplacian.cpp etc. time single ops; doc/convnet.rst:79 reports
whole-model s/iter) — here the headline numbers are tokens/sec and MFU
(model FLOPs utilization) for a GPT-2-medium-shaped decoder LM
(24 layers, d=1024, h=16, T=1024) training in bf16 with the Pallas
flash-attention kernel (forward AND backward) and per-block gradient
rematerialization.

MFU convention (PaLM appendix B): model FLOPs = 6*N*tokens for the
weight matmuls + 12*L*T^2*d*B for attention scores (causal halves it),
divided by wall time and the chip's peak bf16 FLOP/s.

Usage: python bin/lm_bench.py [--layers 24 --dim 1024 --batch 8 --seq 1024]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PEAK_BF16 = {
    # chip generation -> peak bf16 TFLOP/s per chip
    "v5e": 197.0,
    "v4": 275.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def measure(layers=24, dim=1024, heads=16, ff=4096, batch=8, seq=1024,
            vocab=32768, steps=20, remat=True, remat_policy="dots",
            flash=True, profile=None) -> dict:
    """Run the LM training-throughput measurement; returns the result
    dict (also importable from bench.py so BENCH_r*.json carries MFU)."""
    import jax
    import jax.numpy as jnp

    from ccv_tpu.models import transformer as tfm
    from ccv_tpu.nn import optimizers
    from ccv_tpu.utils import flags as _flags

    if not flash:
        _flags.enable_flag(_flags.DISABLE_PALLAS_FLASH_ATTENTION)
        tfm._use_flash = lambda *a: False

    cfg = tfm.TransformerConfig(
        vocab_size=vocab, layers=layers, heads=heads,
        head_dim=dim // heads, ff=ff, max_len=seq,
        dropout=0.0, dtype=jnp.bfloat16, remat=remat,
        remat_policy=remat_policy)
    params = tfm.init_lm(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    opt = optimizers.adam(rate=1e-4)
    opt_state = opt.init(params)

    B, T = batch, seq
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T + 1), 0,
                             cfg.vocab_size, dtype=jnp.int32)

    @jax.jit
    def train_step(params, opt_state, ids):
        def loss_fn(p):
            logits = tfm.lm_forward(p, cfg, ids[:, :-1], train=True)
            return tfm.cross_entropy(logits, ids[:, 1:])
        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params, new_opt = opt.update(grads, opt_state, params)
        return new_params, new_opt, loss

    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state, ids)
    loss.block_until_ready()
    compile_s = time.time() - t0

    # steady-state: keep the device queue full, time at the host edge
    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = train_step(params, opt_state, ids)
    loss.block_until_ready()
    dt = (time.time() - t0) / steps

    if profile:
        jax.profiler.start_trace(profile)
        for _ in range(3):
            params, opt_state, loss = train_step(params, opt_state, ids)
        loss.block_until_ready()
        jax.profiler.stop_trace()

    tokens = B * T
    d = cfg.dim
    # 6*N per token for fwd+bwd weight matmuls; attention scores QK^T+PV
    # fwd (4*T^2*d per layer per seq) x3 for fwd+bwd, halved by causality
    flops_weights = 6.0 * n_params * tokens
    flops_attn = 3 * 12.0 * layers * B * T * T * d / 2
    flops = flops_weights + flops_attn
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak = PEAK_BF16.get(gen, PEAK_BF16["v5e"]) * 1e12
    mfu = flops / dt / peak
    return {
        "model": f"L{layers} d{d} h{heads} ff{ff}",
        "params_m": round(n_params / 1e6, 1),
        "batch": B, "seq": T,
        "step_ms": round(dt * 1e3, 2),
        "tokens_per_s": round(tokens / dt),
        "model_tflops_per_s": round(flops / dt / 1e12, 2),
        "mfu": round(mfu, 4),
        "loss": round(float(loss), 4),
        "compile_s": round(compile_s, 1),
        "remat": remat, "flash": flash,
        "peak_tflops": peak / 1e12,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--ff", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--remat-policy", default="dots",
                    choices=["full", "dots"],
                    help="dots: save matmul outputs, recompute only cheap "
                    "elementwise ops (higher MFU, modest memory)")
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture an xprof trace of 3 steps into DIR")
    args = ap.parse_args()
    print(json.dumps(measure(
        layers=args.layers, dim=args.dim, heads=args.heads, ff=args.ff,
        batch=args.batch, seq=args.seq, vocab=args.vocab, steps=args.steps,
        remat=not args.no_remat, remat_policy=args.remat_policy,
        flash=not args.no_flash, profile=args.profile)))


if __name__ == "__main__":
    main()
