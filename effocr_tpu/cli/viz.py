"""Recognizer retrieval visualization CLI (viz_effocr_recognizer.py).

For each query crop: embed, retrieve k nearest prototypes, save a grid with
correctness in the filename.
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from effocr_tpu.kernels.image_ops import paired_transform_host
from effocr_tpu.models import create_encoder
from effocr_tpu.retrieval.index import PrototypeIndex
from effocr_tpu.train import checkpoint as ckpt
from effocr_tpu.utils.viz import save_knn_grid


def main():
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--recognizer_dir", type=str, required=True)
    p.add_argument("--query_dir", type=str, default=None,
                   help="directory of query crop PNGs")
    p.add_argument("--query_txt", type=str, default=None,
                   help="text file listing query image paths "
                        "(viz_effocr_recognizer.py --query_txt)")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--num", type=int, default=50)
    p.add_argument("--seed", type=int, default=111,
                   help="query shuffle seed (reference default :36)")
    args = p.parse_args()
    if not (args.query_dir or args.query_txt):
        p.error("pass --query_dir or --query_txt")

    with open(os.path.join(args.recognizer_dir, "model.json")) as f:
        meta = json.load(f)
    encoder = create_encoder(meta.get("arch", "convnext_tiny"))
    imsize = meta.get("image_size", 224)
    ch = meta.get("input_channels", 3)
    init = encoder.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, imsize, imsize, ch)), train=False)
    variables = ckpt.load_variables(
        init, ckpt.best_checkpoint_path(args.recognizer_dir)
    )
    index = PrototypeIndex.load(args.recognizer_dir)

    from PIL import Image

    embed = jax.jit(lambda x: encoder.apply(variables, x, train=False))
    if args.query_txt:
        with open(args.query_txt) as f:
            queries = f.read().split()
    else:
        queries = sorted(glob(os.path.join(args.query_dir, "*.png")))
    # sample n at random, like the reference (:53-54)
    np.random.default_rng(args.seed).shuffle(queries)
    queries = queries[: args.num]
    for qp in queries:
        raw = np.asarray(Image.open(qp).convert("RGB"))
        x = paired_transform_host(raw, imsize)
        if ch == 1:
            x = x.mean(axis=-1, keepdims=True)
        emb = np.asarray(embed(jnp.asarray(x[None])))
        _, idx = index.search(emb, k=args.k)
        chars = [index.chars[i] for i in idx[0]]
        neighbors = []
        if index.thumbnails is not None:
            neighbors = [
                np.repeat(index.thumbnails[i][:, :, None], 3, axis=2)
                for i in idx[0]
            ]
        stem = os.path.splitext(os.path.basename(qp))[0]
        # ground truth from the filename: crops are {stem}_{annoid}_{hex}
        # (data/coco.py extract_char_crops) and tree files are
        # PAIRED_{stem}_{annoid}_{hex}_{idx} — the char is the LAST
        # 0x-prefixed part either way
        hex_parts = [s for s in stem.split("_") if s.startswith("0x")]
        true_char = None
        if hex_parts:
            try:
                true_char = chr(int(hex_parts[-1], 16))
            except ValueError:
                pass
        correct = (true_char == chars[0]) if true_char else None
        # matched flag in the filename, like the reference (:92-96)
        name = (f"{stem}_{correct}_nn_"
                f"{'-'.join(hex(ord(c)) for c in chars)}.png")
        save_knn_grid(raw, neighbors, os.path.join(args.out_dir, name),
                      correct=correct)
        print(f"{stem}: {''.join(chars)}")


if __name__ == "__main__":
    main()
