#!/usr/bin/env python
"""bin/nnc/wmt twin: encoder-decoder transformer translation trainer
(reference: bin/nnc/wmt.c — parallel src/tgt token files + vocab files,
teacher-forced decoder with shifted targets, ADAM; topology
ccv_tpu.models.transformer.encoder_decoder with k=64 h=8 layers=6
ff=2048 defaults like wmt.c main()).

    wmt.py --src src.txt --tgt tgt.txt --src-vocab sv.txt --tgt-vocab tv.txt
    wmt.py --demo      # synthetic copy task, quick sanity run
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def load_vocab(path):
    vocab = {}
    with open(path) as f:
        for i, line in enumerate(f):
            vocab[line.strip()] = i
    return vocab


def encode(line, vocab, max_len, has_beg):
    """wmt.c _text_to_tensor_index: [beg?] tokens [end] pad; returns the
    row plus its valid length."""
    n = len(vocab) + 4
    unk, beg, end, pad = n - 4, n - 3, n - 2, n - 1
    ids = ([beg] if has_beg else []) + [vocab.get(w, unk)
                                        for w in line.split()]
    ids = ids[:max_len - 1] + [end]
    length = len(ids)
    ids += [pad] * (max_len - len(ids))
    return np.array(ids[:max_len], np.int32), min(length, max_len), pad


def synthetic_pairs(rng, n=192, max_len=16, vocab=64):
    """Copy task: target = source sequence (beg-shifted)."""
    src = np.full((n, max_len), vocab - 1, np.int32)
    tgt = np.full((n, max_len), vocab - 1, np.int32)
    out = np.full((n, max_len), vocab - 1, np.int32)
    for i in range(n):
        ln = int(rng.integers(4, max_len - 2))
        seq = rng.integers(4, vocab - 4, ln).astype(np.int32)
        src[i, :ln] = seq
        src[i, ln] = vocab - 2
        tgt[i, 0] = vocab - 3
        tgt[i, 1:ln + 1] = seq
        out[i, :ln] = seq
        out[i, ln] = vocab - 2
    return src, tgt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src")
    ap.add_argument("--tgt")
    ap.add_argument("--src-vocab")
    ap.add_argument("--tgt-vocab")
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--dim", type=int, default=512)   # k=64 x h=8
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--ff", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--data-parallel", type=int, default=0,
                    help="shard the batch over N devices")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ccv_tpu.models import transformer as tfm
    from ccv_tpu.nn import optimizers

    rng = np.random.default_rng(0)
    if args.demo or not args.src:
        max_len = min(args.max_len, 16)
        src, tgt, out = synthetic_pairs(rng, max_len=max_len)
        sv = tv = 64
        spad = tpad = 63
        layers, dim, ff = 2, 128, 256
    else:
        max_len = args.max_len
        src_vocab = load_vocab(args.src_vocab)
        tgt_vocab = load_vocab(args.tgt_vocab)
        sv, tv = len(src_vocab) + 4, len(tgt_vocab) + 4
        # pad token ids are fixed by the vocab size (encode: pad = n - 1);
        # compute up front so empty/mismatched files fail fast below
        spad, tpad = sv - 1, tv - 1
        src_rows, tgt_rows, out_rows = [], [], []
        with open(args.src) as fs, open(args.tgt) as ft:
            for sline, tline in zip(fs, ft):
                s, _, _ = encode(sline, src_vocab, max_len, False)
                t, tl, _ = encode(tline, tgt_vocab, max_len, True)
                # training target = tgt shifted left (wmt.c:106-108)
                o = np.concatenate([t[1:], [tpad]]).astype(np.int32)
                src_rows.append(s)
                tgt_rows.append(t)
                out_rows.append(o)
        if not src_rows:
            sys.exit(f"no sentence pairs read from {args.src} / {args.tgt}")
        src = np.stack(src_rows)
        tgt = np.stack(tgt_rows)
        out = np.stack(out_rows)
        layers, dim, ff = args.layers, args.dim, args.ff

    demo = args.demo or not args.src
    cfg = tfm.TransformerConfig(
        vocab_size=sv, tgt_vocab_size=tv, layers=layers, heads=args.heads,
        head_dim=dim // args.heads, ff=ff, max_len=max_len,
        dropout=0.0 if demo else 0.1, dtype=jnp.bfloat16)
    params = tfm.init_encoder_decoder(jax.random.PRNGKey(0), cfg)
    opt = optimizers.adam(rate=args.lr)
    state = opt.init(params)

    if args.data_parallel:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()[:args.data_parallel]), ("data",))
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        state = jax.device_put(state, repl)
        batch_sh = NamedSharding(mesh, P("data", None))
    else:
        batch_sh = None

    @jax.jit
    def step(params, state, src_b, tgt_b, out_b, key):
        src_mask = src_b != spad
        out_mask = out_b != tpad

        def loss_fn(p):
            logits = tfm.encoder_decoder_forward(
                p, cfg, src_b, tgt_b, src_mask=src_mask, train=True,
                key=key)
            return tfm.cross_entropy(logits, out_b, label_smoothing=0.1,
                                     mask=out_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, state = opt.update(grads, state, params)
        return params, state, loss

    key = jax.random.PRNGKey(1)
    n = len(src)
    bs = args.batch
    t0 = time.time()
    it = 0
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        for i in range(0, n - bs + 1, bs):
            sel = order[i:i + bs]
            key, sub = jax.random.split(key)
            sb, tb, ob = (jnp.asarray(src[sel]), jnp.asarray(tgt[sel]),
                          jnp.asarray(out[sel]))
            if batch_sh is not None:
                sb, tb, ob = (jax.device_put(x, batch_sh)
                              for x in (sb, tb, ob))
            params, state, loss = step(params, state, sb, tb, ob, sub)
            it += 1
            if it % 5 == 0:
                tok_s = it * bs * max_len / (time.time() - t0)
                print(f"epoch {epoch} iter {it}: loss {float(loss):.4f} "
                      f"({tok_s:,.0f} tgt tok/s)")
    print(f"final loss {float(loss):.4f}")
    return float(loss)


if __name__ == "__main__":
    main()
