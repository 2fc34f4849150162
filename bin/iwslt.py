#!/usr/bin/env python
"""bin/nnc/iwslt twin: encoder-decoder transformer on IWSLT-style paired
text (reference: bin/nnc/iwslt.c). Same data format as wmt (parallel
src/tgt token files + vocab files, _text_to_tensor_index semantics,
iwslt.c:47-88) with the tool's distinctive features:

* Noam warmup learning-rate schedule (iwslt.c:774:
  lr = 1/sqrt(d_model) * min(1/sqrt(step), step / warmup^1.5))
* gradient accumulation over ``--big-step`` micro-batches before the
  optimizer step (iwslt.c big_step loop)
* greedy autoregressive decode of a test file after training
  (iwslt.c eval_wmt:288-419)

    iwslt.py --src s.txt --tgt t.txt --src-vocab sv --tgt-vocab tv --tst x.txt
    iwslt.py --demo      # synthetic copy task + greedy decode check
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from wmt import encode, load_vocab, synthetic_pairs


def noam_lr(step: int, d_model: int, warmup: int) -> float:
    """iwslt.c:774 learning-rate schedule."""
    s = max(step, 1)
    return (1.0 / np.sqrt(d_model)
            * min(1.0 / np.sqrt(s), s / (np.sqrt(warmup) * warmup)))


def greedy_decode(params, cfg, src_b, spad, tpad, max_len):
    """eval_wmt (iwslt.c:288): encode once, then feed the argmax token
    back until every row emitted end/pad."""
    import jax.numpy as jnp

    from ccv_tpu.models import transformer as tfm

    B = src_b.shape[0]
    tv = cfg.tgt_vocab_size or cfg.vocab_size
    beg, end = tv - 3, tv - 2
    src_mask = src_b != spad
    tgt = jnp.full((B, max_len), tpad, jnp.int32).at[:, 0].set(beg)
    done = np.zeros(B, bool)
    for t in range(1, max_len):
        logits = tfm.encoder_decoder_forward(params, cfg, src_b, tgt,
                                             src_mask=src_mask)
        nxt = jnp.argmax(logits[:, t - 1], axis=-1).astype(jnp.int32)
        tgt = tgt.at[:, t].set(jnp.where(jnp.asarray(done), tpad, nxt))
        done |= np.asarray(nxt) == end
        if done.all():
            break
    return np.asarray(tgt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src")
    ap.add_argument("--tgt")
    ap.add_argument("--src-vocab")
    ap.add_argument("--tgt-vocab")
    ap.add_argument("--tst", help="test file to greedy-decode after training")
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--big-step", type=int, default=4,
                    help="gradient-accumulation micro-batches (iwslt.c)")
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--ff", type=int, default=2048)
    ap.add_argument("--warmup", type=int, default=4000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ccv_tpu.models import transformer as tfm
    from ccv_tpu.nn import optimizers

    rng = np.random.default_rng(0)
    demo = args.demo or not args.src
    if demo:
        max_len = min(args.max_len, 16)
        src, tgt, out = synthetic_pairs(rng, max_len=max_len)
        sv = tv = 64
        spad = tpad = 63
        layers, dim, ff = 2, 128, 256
        # tiny-scale demo stays in the linear warmup region (peak ~1e-3);
        # the 1/sqrt(step) tail only matters at real scale
        warmup = 200
    else:
        max_len = args.max_len
        src_vocab = load_vocab(args.src_vocab)
        tgt_vocab = load_vocab(args.tgt_vocab)
        sv, tv = len(src_vocab) + 4, len(tgt_vocab) + 4
        spad, tpad = sv - 1, tv - 1
        rows = [[], [], []]
        with open(args.src) as fs, open(args.tgt) as ft:
            for sline, tline in zip(fs, ft):
                s, _, _ = encode(sline, src_vocab, max_len, False)
                t, _, _ = encode(tline, tgt_vocab, max_len, True)
                o = np.concatenate([t[1:], [tpad]]).astype(np.int32)
                rows[0].append(s)
                rows[1].append(t)
                rows[2].append(o)
        if not rows[0]:
            sys.exit(f"no sentence pairs read from {args.src} / {args.tgt}")
        src, tgt, out = (np.stack(r) for r in rows)
        layers, dim, ff = args.layers, args.dim, args.ff
        warmup = args.warmup

    cfg = tfm.TransformerConfig(
        vocab_size=sv, tgt_vocab_size=tv, layers=layers, heads=args.heads,
        head_dim=dim // args.heads, ff=ff, max_len=max_len,
        dropout=0.0 if demo else 0.1, dtype=jnp.bfloat16)
    params = tfm.init_encoder_decoder(jax.random.PRNGKey(0), cfg)
    opt = optimizers.adam(rate=1.0, beta1=0.9, beta2=0.98, epsilon=1e-9)
    state = opt.init(params)

    @jax.jit
    def grad_fn(params, src_b, tgt_b, out_b, key):
        src_mask = src_b != spad
        out_mask = out_b != tpad

        def loss_fn(p):
            logits = tfm.encoder_decoder_forward(
                p, cfg, src_b, tgt_b, src_mask=src_mask, train=True,
                key=key)
            return tfm.cross_entropy(
                logits, out_b, label_smoothing=0.0 if demo else 0.1,
                mask=out_mask)

        return jax.value_and_grad(loss_fn)(params)

    @jax.jit
    def apply_fn(params, state, grads, lr):
        # accumulated-mean gradients; Noam lr threaded as a traced scalar
        # so the schedule doesn't retrace
        return opt.update(grads, state, params, rate=lr)

    key = jax.random.PRNGKey(1)
    n, bs, big = len(src), args.batch, max(1, args.big_step)
    t0 = time.time()
    it = 0
    opt_steps = 0
    acc = None
    loss = None
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        for i in range(0, n - bs + 1, bs):
            sel = order[i:i + bs]
            key, sub = jax.random.split(key)
            loss, grads = grad_fn(params, jnp.asarray(src[sel]),
                                  jnp.asarray(tgt[sel]),
                                  jnp.asarray(out[sel]), sub)
            acc = grads if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, grads)
            it += 1
            if it % big == 0:
                opt_steps += 1
                lr = noam_lr(opt_steps, dim, warmup)
                mean = jax.tree_util.tree_map(lambda g: g / big, acc)
                params, state = apply_fn(params, state, mean,
                                         jnp.float32(lr))
                acc = None
            if it % 10 == 0:
                tok_s = it * bs * max_len / (time.time() - t0)
                print(f"epoch {epoch} iter {it}: loss {float(loss):.4f} "
                      f"lr {noam_lr(max(opt_steps, 1), dim, warmup):.2e} "
                      f"({tok_s:,.0f} tgt tok/s)")
    print(f"final loss {float(loss):.4f}")

    if demo:
        dec = greedy_decode(params, cfg, jnp.asarray(src[:8]), spad, tpad,
                            max_len)
        ok = sum(int((dec[i, 1:] == out[i, :-1]).all()) for i in range(8))
        print(f"greedy decode: {ok}/8 demo sequences reproduced")
    elif args.tst:
        src_vocab = load_vocab(args.src_vocab)
        inv = {i: w for w, i in load_vocab(args.tgt_vocab).items()}
        with open(args.tst) as f:
            lines = [l.rstrip("\n") for l in f][:32]
        sb = np.stack([encode(l, src_vocab, max_len, False)[0]
                       for l in lines])
        dec = greedy_decode(params, cfg, jnp.asarray(sb), spad, tpad,
                            max_len)
        for row in dec:
            words = [inv.get(int(t), "<unk>") for t in row[1:]
                     if int(t) < tv - 4]
            print(" ".join(words))
    return float(loss)


if __name__ == "__main__":
    main()
