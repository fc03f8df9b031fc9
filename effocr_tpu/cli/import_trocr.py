"""Import a published HF TrOCR checkpoint for TPU inference.

Checkpoint-interop parity with the reference's converter
(scripts/trocr_fairseq_to_pytorch_chkpt.py: fairseq/unilm TrOCR -> HF
VisionEncoderDecoderModel).  This CLI takes the next hop: HF checkpoint
directory -> our npz artifact running as a jitted JAX program, with an
optional torch parity check and an optional COCO text-line evaluation
(the reference's trocr/infer_trocr.py role).
"""

from __future__ import annotations

import argparse
import json
import os


def _special_ids(model_dir: str, tok=None):
    """Resolve (decoder_start, eos, pad) for a checkpoint directory.

    Handles HF's diff-serialized configs (default-valued keys are OMITTED
    from config.json — e.g. TrOCRConfig's decoder_start_token_id=2) and
    present-but-null keys; never uses `or` fallbacks, which would discard
    a legitimate token id 0.  Published TrOCR checkpoints start decoding
    with decoder_start_token_id=2 (</s>, the BART convention)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    dec = cfg.get("decoder") or {}

    def pick(*vals):
        for v in vals:
            if v is not None:
                return int(v)
        raise AssertionError("unreachable: last candidate is a literal")

    start = pick(cfg.get("decoder_start_token_id"),
                 dec.get("decoder_start_token_id"), 2)
    eos = pick(dec.get("eos_token_id"), cfg.get("eos_token_id"),
               getattr(tok, "eos_token_id", None) if tok else None,
               getattr(tok, "sep_token_id", None) if tok else None, 2)
    pad = pick(dec.get("pad_token_id"), cfg.get("pad_token_id"),
               getattr(tok, "pad_token_id", None) if tok else None, 1)
    return start, eos, pad


def convert(model_dir: str, out_path: str, check: bool = False,
            fairseq_pt: str = None) -> str:
    import numpy as np

    from effocr_tpu.baselines.trocr_import import (
        import_fairseq_checkpoint,
        import_hf_checkpoint,
        save_trocr_npz,
        trocr_forward,
    )

    if fairseq_pt:
        # raw fairseq/unilm checkpoint: renaming hop first
        # (trocr_fairseq_to_pytorch_chkpt.py:28-87 role), then HF->JAX
        params, spec = import_fairseq_checkpoint(fairseq_pt)
    else:
        params, spec = import_hf_checkpoint(model_dir)
    save_trocr_npz(out_path, params, spec)
    n_params = sum(int(np.prod(v.shape)) for v in params.values())
    print(f"converted: {spec.enc_layers}L/{spec.enc_hidden}d encoder + "
          f"{spec.dec_layers}L/{spec.dec_hidden}d decoder, vocab "
          f"{spec.vocab_size}, {n_params / 1e6:.1f}M params -> {out_path}")

    if check:
        import torch
        from transformers import VisionEncoderDecoderModel

        model = VisionEncoderDecoderModel.from_pretrained(model_dir).eval()
        rng = np.random.default_rng(0)
        pix = rng.normal(
            size=(2, spec.image_size, spec.image_size, 3)).astype(np.float32)
        ids = rng.integers(
            3, spec.vocab_size, size=(2, 8)).astype(np.int64)
        with torch.no_grad():
            ref = model(
                pixel_values=torch.from_numpy(pix).permute(0, 3, 1, 2),
                decoder_input_ids=torch.from_numpy(ids),
            ).logits.numpy()
        got = np.asarray(
            trocr_forward(params, spec, pix, ids.astype(np.int32)))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
        print("torch parity check passed (teacher-forced logits, "
              "rtol/atol 2e-3)")
    return out_path


def evaluate(npz_path: str, model_dir: str, coco_json: str, image_dir: str,
             batch: int = 8, max_len: int = 64, limit: int = 0,
             num_beams: int = 1):
    """Decode COCO text lines with the imported model (greedy or beam,
    reference default num_beams=4) and score with textline_evaluation —
    the reference's trocr/infer_trocr.py flow."""
    import numpy as np
    from PIL import Image

    from effocr_tpu.baselines.trocr_import import (
        load_trocr_npz,
        trocr_beam_decode,
        trocr_greedy_decode,
    )
    from effocr_tpu.eval.textline import textline_evaluation

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir)
    params, spec = load_trocr_npz(npz_path)
    bos, eos, pad = _special_ids(model_dir, tok)

    with open(coco_json) as f:
        coco = json.load(f)
    pairs = []
    size = spec.image_size
    batch_pix, batch_gt = [], []
    images = [im for im in coco["images"] if im.get("text")]
    if limit:
        images = images[:limit]

    def flush():
        if not batch_pix:
            return
        pix = np.stack(batch_pix)
        if num_beams > 1:
            ids = np.asarray(trocr_beam_decode(
                params, spec, pix, max_len=max_len, num_beams=num_beams,
                bos_id=int(bos), eos_id=int(eos), pad_id=int(pad)))
        else:
            ids = np.asarray(trocr_greedy_decode(
                params, spec, pix, max_len=max_len,
                bos_id=int(bos), eos_id=int(eos), pad_id=int(pad)))
        for row, gt in zip(ids, batch_gt):
            row = list(row)
            if int(eos) in row:
                row = row[: row.index(int(eos))]
            pred = tok.decode([i for i in row if i != int(pad)],
                              skip_special_tokens=True)
            pairs.append((gt, pred))
        batch_pix.clear()
        batch_gt.clear()

    for im in images:
        img = Image.open(
            os.path.join(image_dir, im["file_name"])).convert("RGB")
        img = img.resize((size, size), Image.BILINEAR)
        # TrOCRProcessor semantics: rescale 1/255, normalize mean=std=0.5
        arr = (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
        batch_pix.append(arr)
        batch_gt.append(im["text"])
        if len(batch_pix) == batch:
            flush()
    flush()

    acc, cer = textline_evaluation(pairs)
    print(f"n={len(pairs)} line_accuracy={acc:.4f} CER={cer:.4f}")
    return acc, cer


def finetune(npz_path: str, model_dir: str, train_coco: str, val_coco: str,
             image_dir: str, num_epochs: int = 10, batch: int = 8,
             lr: float = 5e-5, max_len: int = 64, out: str = None,
             seed: int = 0):
    """Fine-tune imported TrOCR weights on COCO (line image, text) pairs —
    the reference's trocr/train_trocr.py (AdamW lr 5e-5 :73-74, pad labels
    ignored :49-50, per-epoch CER eval, best checkpoint).  The corpus is
    uploaded once as HBM banks; steps ship int32 indices."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from PIL import Image

    from effocr_tpu.baselines.trocr_import import (
        load_trocr_npz,
        make_trocr_finetune_step,
        save_trocr_npz,
        trocr_greedy_decode,
    )
    from effocr_tpu.eval.textline import textline_evaluation

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir)
    params, spec = load_trocr_npz(npz_path)
    start, eos, pad = _special_ids(model_dir, tok)
    size = spec.image_size

    def materialize(coco_json):
        with open(coco_json) as f:
            coco = json.load(f)
        ims = [im for im in coco["images"] if im.get("text")]
        pix = np.zeros((len(ims), size, size, 3), np.uint8)
        labels = np.full((len(ims), max_len), pad, np.int32)
        gts = []
        for i, im in enumerate(ims):
            img = Image.open(
                os.path.join(image_dir, im["file_name"])).convert("RGB")
            pix[i] = np.asarray(img.resize((size, size), Image.BILINEAR))
            ids = tok(im["text"], truncation=True,
                      max_length=max_len).input_ids
            labels[i, : len(ids)] = ids
            gts.append(im["text"])
        return pix, labels, labels != pad, gts

    tr_pix, tr_lab, tr_mask, _ = materialize(train_coco)
    va_pix, va_lab, va_mask, va_gt = materialize(val_coco)
    if len(tr_pix) == 0:
        raise ValueError(f"no images with text fields in {train_coco}")
    if batch > len(tr_pix):
        print(f"batch {batch} > {len(tr_pix)} train lines; "
              f"clamping to {len(tr_pix)}")
        batch = len(tr_pix)
    print(f"train {len(tr_pix)} lines, val {len(va_pix)} lines")

    tx = optax.adamw(lr)
    params = jax.tree.map(jnp.asarray, params)
    state = {"params": params, "opt_state": tx.init(params)}
    step = make_trocr_finetune_step(spec, tx, start, bank_mode=True)
    bank = (jax.device_put(tr_pix), jax.device_put(tr_lab),
            jax.device_put(tr_mask))
    va_bank = jax.device_put(va_pix)

    def eval_cer(params):
        pairs = []
        for s in range(0, len(va_pix), batch):
            idx = np.arange(s, min(s + batch, len(va_pix)))
            full = np.resize(idx, batch)      # pad the tail batch
            pix_b = jnp.take(va_bank, jnp.asarray(full, jnp.int32), axis=0)
            pix_f = (pix_b.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            ids = np.asarray(trocr_greedy_decode(
                params, spec, pix_f, max_len=max_len, bos_id=start,
                eos_id=eos, pad_id=pad))
            for j, gi in enumerate(idx):
                row = list(ids[j])
                if eos in row:
                    row = row[: row.index(eos)]
                pred = tok.decode([i for i in row if i != pad],
                                  skip_special_tokens=True)
                pairs.append((va_gt[gi], pred))
        return textline_evaluation(pairs)

    out = out or npz_path.replace(".npz", "_ft.npz")
    rng = np.random.default_rng(seed)
    best_cer = float("inf")
    n = len(tr_pix)
    acc, cer = eval_cer(state["params"])
    print(f"zero-shot: line_accuracy={acc:.4f} CER={cer:.4f}")
    for epoch in range(num_epochs):
        order = np.arange(n)
        rng.shuffle(order)
        losses = []
        for s in range(0, n - batch + 1, batch):
            idx = jnp.asarray(order[s : s + batch], jnp.int32)
            state, loss = step(state, *bank, idx)
            losses.append(float(loss))
        acc, cer = eval_cer(state["params"])
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
              f"line_accuracy={acc:.4f} CER={cer:.4f}")
        if cer <= best_cer:
            best_cer = cer
            save_trocr_npz(
                out, {k: np.asarray(v)
                      for k, v in state["params"].items()}, spec)
    print(f"best CER {best_cer:.4f} -> {out}")
    return best_cer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", default=None,
                   help="HF checkpoint dir (config.json + weights)")
    p.add_argument("--fairseq_pt", default=None,
                   help="raw fairseq/unilm TrOCR checkpoint (.pt): apply "
                        "the renaming hop (the reference's "
                        "trocr_fairseq_to_pytorch_chkpt.py role) before "
                        "the HF->JAX conversion; --model_dir is then only "
                        "needed for tokenizer-based eval/finetune")
    p.add_argument("--out", default=None,
                   help="default: <model_dir>/trocr_tpu.npz")
    p.add_argument("--check", action="store_true", default=False,
                   help="torch parity check after conversion")
    p.add_argument("--coco_json", default=None,
                   help="optional: evaluate on COCO lines after import "
                        "(the trocr/infer_trocr.py role; also the "
                        "--zero_shot equivalent)")
    p.add_argument("--image_dir", default=None)
    p.add_argument("--train_coco_json", default=None,
                   help="optional: fine-tune on COCO line pairs after "
                        "import (the trocr/train_trocr.py role)")
    p.add_argument("--val_coco_json", default=None)
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=5e-5,
                   help="reference default (trocr/train_trocr.py:73-74)")
    p.add_argument("--finetune_out", default=None,
                   help="default: <out>_ft.npz")
    p.add_argument("--eval_npz", default=None,
                   help="skip conversion and use this existing npz "
                        "artifact (e.g. a previous run's _ft.npz)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max_len", type=int, default=64)
    p.add_argument("--num_beams", type=int, default=4,
                   help="reference eval default (trocr/infer_trocr.py:107);"
                        " 1 = greedy")
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()
    if not args.model_dir and not (args.fairseq_pt or args.eval_npz):
        p.error("--model_dir is required (or --fairseq_pt / --eval_npz)")
    if args.out:
        out = args.out
    elif args.model_dir:
        out = os.path.join(args.model_dir, "trocr_tpu.npz")
    else:
        out = os.path.splitext(args.fairseq_pt)[0] + "_tpu.npz"
    if args.eval_npz:
        eval_npz = args.eval_npz      # evaluate an existing artifact
    else:
        convert(args.model_dir, out, check=args.check and not args.fairseq_pt,
                fairseq_pt=args.fairseq_pt)
        eval_npz = out
    if args.train_coco_json:
        if not (args.image_dir and args.val_coco_json):
            p.error("--train_coco_json requires --image_dir and "
                    "--val_coco_json")
        ft_out = args.finetune_out or eval_npz.replace(".npz", "_ft.npz")
        finetune(eval_npz, args.model_dir, args.train_coco_json,
                 args.val_coco_json, args.image_dir,
                 num_epochs=args.num_epochs, batch=args.batch, lr=args.lr,
                 max_len=args.max_len, out=ft_out)
        eval_npz = ft_out             # --coco_json scores the result
    if args.coco_json:
        if not args.image_dir:
            p.error("--coco_json requires --image_dir")
        evaluate(eval_npz, args.model_dir, args.coco_json, args.image_dir,
                 batch=args.batch, max_len=args.max_len, limit=args.limit,
                 num_beams=args.num_beams)


if __name__ == "__main__":
    main()
