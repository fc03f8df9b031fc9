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
