"""Seq2seq baseline: tokenizer round-trip, train-step overfit on one batch,
greedy decode recovers the memorized string."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from effocr_tpu.baselines.seq2seq import (
    BOS,
    EOS,
    PAD,
    CharTokenizer,
    Seq2SeqOCR,
    greedy_decode,
    make_seq2seq_train_step,
)


def test_tokenizer_roundtrip():
    tok = CharTokenizer(list("abc "))
    ids, mask = tok.encode("ab c", max_len=16)
    assert ids[0] == BOS
    assert EOS in ids
    assert tok.decode(ids[1:]) == "ab c"
    assert mask.sum() == 6  # BOS + 4 chars + EOS


def test_tokenizer_truncation():
    tok = CharTokenizer(list("x"))
    ids, _ = tok.encode("x" * 100, max_len=8)
    assert len(ids) == 8
    assert ids[-1] == EOS


def test_seq2seq_overfit_and_decode(rng):
    tok = CharTokenizer(list("abcd"))
    model = Seq2SeqOCR(
        vocab_size=tok.vocab_size, img_h=32, img_w=64, patch=8,
        dim=64, enc_depth=2, dec_depth=2, heads=4, max_len=12,
    )
    images = jnp.asarray(rng.uniform(0, 1, (2, 32, 64, 3)), jnp.float32)
    texts = ["abca", "ddcb"]
    ids = np.stack([tok.encode(t, 12)[0] for t in texts])
    masks = np.stack([tok.encode(t, 12)[1] for t in texts])

    params = model.init(jax.random.PRNGKey(0), images,
                        jnp.asarray(ids[:, :-1]))["params"]
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params)}
    step = make_seq2seq_train_step(model, tx)
    loss0 = None
    for i in range(150):
        state, loss = step(state, images, jnp.asarray(ids),
                           jnp.asarray(masks))
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < 0.1 * loss0

    out = greedy_decode(model, state["params"], images, max_len=12)
    decoded = [tok.decode(row) for row in np.asarray(out)]
    assert decoded == texts


def test_seq2seq_bank_step_matches_stream(rng):
    """Resident-bank step (HBM bank + int32 indices) computes the same
    update as the streaming step on the gathered batch."""
    tok = CharTokenizer(list("abcd"))
    model = Seq2SeqOCR(
        vocab_size=tok.vocab_size, img_h=32, img_w=64, patch=8,
        dim=64, enc_depth=2, dec_depth=2, heads=4, max_len=12,
    )
    n = 6
    imgs = rng.integers(0, 256, (n, 32, 64, 3)).astype(np.uint8)
    texts = ["abca", "ddcb", "ba", "c", "abcd", "da"]
    ids = np.stack([tok.encode(t, 12)[0] for t in texts])
    masks = np.stack([tok.encode(t, 12)[1] for t in texts])
    idx = np.asarray([4, 1, 3, 0], np.int32)

    import optax

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:1]),
                        jnp.asarray(ids[:1, :-1]))["params"]
    tx = optax.adam(1e-3)
    state_s = {"params": params, "opt_state": tx.init(params)}
    state_b = jax.tree_util.tree_map(jnp.copy, state_s)

    step_s = make_seq2seq_train_step(model, tx)
    step_b = make_seq2seq_train_step(model, tx, bank_mode=True)
    state_s, loss_s = step_s(state_s, jnp.asarray(imgs[idx]),
                             jnp.asarray(ids[idx]), jnp.asarray(masks[idx]))
    state_b, loss_b = step_b(state_b, jnp.asarray(imgs), jnp.asarray(ids),
                             jnp.asarray(masks), jnp.asarray(idx))
    assert abs(float(loss_s) - float(loss_b)) < 1e-5
    leaves_s = jax.tree_util.tree_leaves(state_s["params"])
    leaves_b = jax.tree_util.tree_leaves(state_b["params"])
    for a, b in zip(leaves_s, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_seq2seq_materialize_and_index_batches(tmp_path):
    """materialize() rows match load(); index_batches pads short tails and
    reports only real texts."""
    from PIL import Image

    from effocr_tpu.baselines.data import Seq2SeqDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    texts = ["ab", "cd", "ad"]
    coco = {"images": [], "annotations": [], "categories": []}
    r = np.random.default_rng(0)
    for i, t in enumerate(texts):
        arr = r.integers(0, 256, (20, 50, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"l{i}.png")
        coco["images"].append({"id": i, "file_name": f"l{i}.png",
                               "text": t})
    tok = CharTokenizer(list("abcd"))
    ds = Seq2SeqDataset(coco, str(img_dir), tok, img_h=32, img_w=64,
                        max_len=12)
    xs, ids, masks = ds.materialize()
    assert xs.shape == (3, 32, 64, 3) and xs.dtype == np.uint8
    for i in range(3):
        x, t_ids, t_mask, _ = ds.load(i)
        np.testing.assert_array_equal(xs[i], x)
        np.testing.assert_array_equal(ids[i], t_ids)
        np.testing.assert_array_equal(masks[i], t_mask)
    out = list(ds.index_batches(2, shuffle=False, drop_last=False))
    assert len(out) == 2
    idx0, texts0 = out[0]
    idx1, texts1 = out[1]
    assert idx0.tolist() == [0, 1] and texts0 == ["ab", "cd"]
    assert idx1.tolist() == [2, 0] and texts1 == ["ad"]


def test_train_seq2seq_cli_resident(tmp_path, monkeypatch):
    """train-seq2seq --data_device resident end-to-end on a tiny corpus:
    bank upload, index batching, gathered eval decode, checkpointing."""
    import json
    import sys

    from PIL import Image

    from effocr_tpu.cli import train_seq2seq as cli

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    texts = ["ab", "cd", "ad", "bc", "da"]
    coco = {"images": [], "annotations": [], "categories": []}
    r = np.random.default_rng(0)
    for i, t in enumerate(texts):
        arr = r.integers(0, 256, (20, 50, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"l{i}.png")
        coco["images"].append({"id": i, "file_name": f"l{i}.png",
                               "text": t})
    cj = tmp_path / "corpus.json"
    cj.write_text(json.dumps(coco))

    run = tmp_path / "s2s"
    monkeypatch.setattr(sys, "argv", [
        "train-seq2seq", "--image_dir", str(img_dir),
        "--train_coco", str(cj), "--val_coco", str(cj),
        "--run_name", str(run), "--batch_size", "2", "--num_epochs", "1",
        "--max_len", "8", "--dim", "32", "--img_h", "32", "--img_w", "64",
        "--data_device", "resident",
    ])
    cli.main()
    assert (run / "seq2seq_best.msgpack").exists()
    assert (run / "charset.json").exists()
