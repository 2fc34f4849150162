#!/usr/bin/env python
"""bin/nnc/imdb_lstm twin: LSTM sentiment classifier (reference:
bin/nnc/imdb_lstm.c — embedding -> multi-layer LSTM -> dense head).

    imdb_lstm.py --demo
    imdb_lstm.py --train pos.txt neg.txt --vocab vocab.txt
"""

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
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from bin_imdb_shared import load_corpus
    from ccv_tpu.nn import layers, model as nnmodel, optimizers

    xs, ys, vocab_size, pad_id = load_corpus(args)

    net = nnmodel.Sequential([
        layers.Embedding(vocab_size, args.dim),
        layers.LSTM(args.dim),
        layers._Stateless(lambda x: jnp.mean(x, axis=1),
                          shape_fn=lambda s: (s[0], s[2]), name="meanpool"),
        layers.Dense(2),
    ])
    net.build((args.batch, args.max_len))
    net.compile(optimizers.adam(rate=args.lr), "softmax_crossentropy")
    rng = np.random.default_rng(0)
    n = len(xs)
    t0 = time.time()
    it = 0
    loss = acc = 0.0
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        for i in range(0, n - args.batch + 1, args.batch):
            sel = order[i:i + args.batch]
            loss = net.fit(jnp.asarray(xs[sel]), jnp.asarray(ys[sel]))
            it += 1
            if it % 10 == 0:
                logits = net.evaluate(jnp.asarray(xs[sel]))
                acc = float(jnp.mean(jnp.argmax(logits, -1)
                                     == jnp.asarray(ys[sel])))
                print(f"epoch {epoch} iter {it}: loss {float(loss):.4f} "
                      f"acc {acc:.3f} "
                      f"({(time.time() - t0) / it * 1000:.0f} ms/iter)")
    print(f"final: loss {float(loss):.4f} acc {acc:.3f}")
    return acc


if __name__ == "__main__":
    main()
