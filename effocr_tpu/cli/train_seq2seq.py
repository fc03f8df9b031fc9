"""Seq2seq (TrOCR-style) baseline train + eval CLI
(trocr/train_trocr.py / trocr/infer_trocr.py)."""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from effocr_tpu.baselines.data import Seq2SeqDataset, charset_from_coco
from effocr_tpu.baselines.seq2seq import (
    CharTokenizer,
    Seq2SeqOCR,
    beam_decode,
    greedy_decode,
    make_seq2seq_train_step,
)
from effocr_tpu.eval.textline import textline_evaluation
from effocr_tpu.train import checkpoint as ckpt
from effocr_tpu.train.metrics import MetricsWriter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", required=True)
    p.add_argument("--train_coco", required=True)
    p.add_argument("--val_coco", required=True)
    p.add_argument("--run_name", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--num_epochs", type=int, default=20)
    p.add_argument("--max_len", type=int, default=64)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--img_h", type=int, default=64)
    p.add_argument("--img_w", type=int, default=512)
    p.add_argument("--num_beams", type=int, default=1,
                   help="beam width for eval decode (reference default 4, "
                        "trocr/train_trocr.py:149-156); 1 = greedy")
    p.add_argument("--data_device", choices=["stream", "resident"],
                   default="stream",
                   help="resident: decode the corpus once into an "
                        "HBM-resident uint8 bank and ship int32 indices "
                        "per step (avoids the axon per-transfer host-RSS "
                        "leak on long runs)")
    args = p.parse_args()

    os.makedirs(args.run_name, exist_ok=True)
    charset = charset_from_coco([args.train_coco, args.val_coco])
    tok = CharTokenizer(charset)
    with open(os.path.join(args.run_name, "charset.json"), "w") as f:
        json.dump(tok.chars, f, ensure_ascii=False)

    model = Seq2SeqOCR(vocab_size=tok.vocab_size, img_h=args.img_h,
                       img_w=args.img_w, dim=args.dim,
                       max_len=args.max_len)
    train_ds = Seq2SeqDataset(args.train_coco, args.image_dir, tok,
                              args.img_h, args.img_w, args.max_len)
    val_ds = Seq2SeqDataset(args.val_coco, args.image_dir, tok,
                            args.img_h, args.img_w, args.max_len)

    dummy = jnp.zeros((1, args.img_h, args.img_w, 3))
    params = model.init(jax.random.PRNGKey(0), dummy,
                        jnp.zeros((1, args.max_len - 1), jnp.int32))["params"]
    tx = optax.adamw(args.lr)
    state = {"params": params, "opt_state": tx.init(params)}
    resident = args.data_device == "resident"
    step = make_seq2seq_train_step(model, tx, bank_mode=resident)
    metrics = MetricsWriter(args.run_name)

    if resident:
        bank = tuple(jax.device_put(a) for a in train_ds.materialize())
        val_bank = jax.device_put(val_ds.materialize()[0])
        gather = jax.jit(lambda b, i: jnp.take(b, i, axis=0))

    best_cer = float("inf")
    it = 0
    for epoch in range(args.num_epochs):
        if resident:
            batch_iter = (
                (bank[0], bank[1], bank[2], jnp.asarray(idx))
                for idx, _ in train_ds.index_batches(args.batch_size,
                                                     seed=epoch)
            )
        else:
            batch_iter = (
                (jnp.asarray(xs), jnp.asarray(ids), jnp.asarray(masks))
                for xs, ids, masks, _ in train_ds.batches(args.batch_size,
                                                          seed=epoch)
            )
        for batch in batch_iter:
            state, loss = step(state, *batch)
            if it % 50 == 0:
                metrics.log({"train/loss": float(loss)}, step=it)
                print(f"epoch {epoch} it {it}: loss={float(loss):.4f}")
            it += 1

        pairs = []
        if resident:
            eval_iter = (
                (gather(val_bank, jnp.asarray(idx)), texts)
                for idx, texts in val_ds.index_batches(args.batch_size,
                                                       shuffle=False,
                                                       drop_last=False)
            )
        else:
            eval_iter = (
                (jnp.asarray(xs), texts)
                for xs, _, _, texts in val_ds.batches(args.batch_size,
                                                      shuffle=False,
                                                      drop_last=False)
            )
        for xs, texts in eval_iter:
            if args.num_beams > 1:
                out = beam_decode(model, state["params"], xs,
                                  max_len=args.max_len,
                                  beam_size=args.num_beams)
            else:
                out = greedy_decode(model, state["params"], xs,
                                    max_len=args.max_len)
            for row, gt in zip(np.asarray(out), texts):
                pairs.append((gt, tok.decode(row)))
        acc, cer = textline_evaluation(pairs)
        metrics.log({"val/accuracy": acc, "val/cer": cer}, step=it)
        print(f"epoch {epoch}: acc={acc:.2f} cer={cer:.4f}")
        if cer <= best_cer:
            best_cer = cer
            ckpt.save_variables(
                {"params": state["params"]},
                os.path.join(args.run_name, "seq2seq_best.msgpack"),
            )
    print(f"Best val CER: {best_cer}")


if __name__ == "__main__":
    main()
