#!/usr/bin/env python
"""bin/nnc/imdb twin: transformer-encoder sentiment classifier
(reference: bin/nnc/imdb.c — vocab file + tokenized reviews -> encoder
classifier trained with ADAM; same topology via
ccv_tpu.models.transformer.encoder_classifier).

    imdb.py --train pos.txt neg.txt --vocab vocab.txt [--epochs 2]
    imdb.py --demo          # synthetic separable corpus, quick sanity run

Text format: one whitespace-tokenized review per line. The last four
vocab ids are reserved like the reference (unk/beg/end/pad,
bin/nnc/imdb.c _vocab_init + word_to_index)."""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", nargs=2, metavar=("POS", "NEG"))
    ap.add_argument("--vocab")
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max-len", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from bin_imdb_shared import load_corpus
    from ccv_tpu.models import transformer as tfm
    from ccv_tpu.nn import optimizers

    rng = np.random.default_rng(0)
    xs, ys, vocab_size, pad_id = load_corpus(args)

    cfg = tfm.TransformerConfig(
        vocab_size=vocab_size, layers=args.layers, heads=args.heads,
        head_dim=args.dim // args.heads, ff=4 * args.dim,
        max_len=args.max_len, dropout=0.1, dtype=jnp.bfloat16)
    params = tfm.init_encoder_classifier(jax.random.PRNGKey(0), cfg, 2)
    opt = optimizers.adam(rate=args.lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, ids, labels, key):
        mask = ids != pad_id

        def loss_fn(p):
            logits = tfm.encoder_classifier_forward(
                p, cfg, ids, src_mask=mask, train=True, key=key)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            nll = -jnp.take_along_axis(logp, labels[:, None], 1).mean()
            acc = jnp.mean((jnp.argmax(logits, -1) == labels))
            return nll, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, state = opt.update(grads, state, params)
        return params, state, loss, acc

    key = jax.random.PRNGKey(1)
    n = len(xs)
    t0 = time.time()
    it = 0
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        for i in range(0, n - args.batch + 1, args.batch):
            sel = order[i:i + args.batch]
            key, sub = jax.random.split(key)
            params, state, loss, acc = step(
                params, state, jnp.asarray(xs[sel]), jnp.asarray(ys[sel]),
                sub)
            it += 1
            if it % 10 == 0:
                print(f"epoch {epoch} iter {it}: loss {float(loss):.4f} "
                      f"acc {float(acc):.3f} "
                      f"({(time.time() - t0) / it * 1000:.0f} ms/iter)")
    print(f"final: loss {float(loss):.4f} acc {float(acc):.3f}")
    return float(acc)


if __name__ == "__main__":
    main()
