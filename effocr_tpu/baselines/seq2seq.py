"""Seq2seq OCR baseline — the TrOCR-style comparator.

Capability parity with the reference's TrOCR fine-tune/eval baseline
(trocr/train_trocr.py, trocr/infer_trocr.py): an image-encoder +
autoregressive text-decoder trained on (line image, transcription) pairs,
evaluated with the same textline_evaluation metrics.  Not a port of HF
TrOCR — a compact first-party Flax vision-encoder-decoder sized for
text lines:

- encoder: ViT-style patch encoder over a fixed [H, W] line canvas
  (lines are wide, so the canvas is rectangular, not TrOCR's 384 square),
- decoder: causal transformer with cross-attention, char-level vocab,
- greedy + beam decode as fixed-length lax.scan programs (TPU-friendly:
  no dynamic shapes; reference beam config num_beams=4 max_length=64,
  trocr/train_trocr.py:149-156).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from effocr_tpu.models.vit import Mlp

Dtype = Any

PAD, BOS, EOS = 0, 1, 2


class CharTokenizer:
    """Char-level vocab with PAD/BOS/EOS at 0/1/2."""

    def __init__(self, charset: Sequence[str]):
        self.chars = sorted(set(charset))
        self.char_to_id = {c: i + 3 for i, c in enumerate(self.chars)}
        self.id_to_char = {i + 3: c for i, c in enumerate(self.chars)}

    @property
    def vocab_size(self) -> int:
        return len(self.chars) + 3

    def encode(self, text: str, max_len: int) -> Tuple[np.ndarray, np.ndarray]:
        ids = [BOS] + [self.char_to_id[c] for c in text if c in self.char_to_id]
        ids = ids[: max_len - 1] + [EOS]
        out = np.full((max_len,), PAD, np.int32)
        out[: len(ids)] = ids
        mask = np.zeros((max_len,), bool)
        mask[: len(ids)] = True
        return out, mask

    def decode(self, ids: Sequence[int]) -> str:
        out = []
        for i in ids:
            if i == EOS:
                break
            if i >= 3:
                out.append(self.id_to_char.get(int(i), ""))
        return "".join(out)


class DecoderBlock(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, causal_mask):
        b, t, _ = x.shape
        hd = self.dim // self.heads

        def mha(q_in, kv_in, mask, name):
            q = nn.Dense(self.dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"{name}_q")(q_in)
            k = nn.Dense(self.dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"{name}_k")(kv_in)
            v = nn.Dense(self.dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"{name}_v")(kv_in)
            q = q.reshape(b, -1, self.heads, hd)
            k = k.reshape(b, -1, self.heads, hd)
            v = v.reshape(b, -1, self.heads, hd)
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
            if mask is not None:
                attn = jnp.where(mask, attn, -1e30)
            attn = jax.nn.softmax(attn, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
            o = o.reshape(b, -1, self.dim)
            return nn.Dense(self.dim, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"{name}_o")(o)

        h = nn.LayerNorm(param_dtype=self.param_dtype)(x)
        x = x + mha(h, h, causal_mask, "self")
        h = nn.LayerNorm(param_dtype=self.param_dtype)(x)
        x = x + mha(h, memory, None, "cross")
        h = nn.LayerNorm(param_dtype=self.param_dtype)(x)
        x = x + Mlp(4 * self.dim, self.dim, self.dtype, self.param_dtype)(h)
        return x


class Seq2SeqOCR(nn.Module):
    vocab_size: int
    img_h: int = 64
    img_w: int = 512
    patch: int = 8
    dim: int = 256
    enc_depth: int = 6
    dec_depth: int = 4
    heads: int = 8
    max_len: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.patch_embed = nn.Conv(
            self.dim, (self.patch, self.patch),
            strides=(self.patch, self.patch), dtype=self.dtype,
            param_dtype=self.param_dtype, name="patch_embed",
        )
        n_tokens = (self.img_h // self.patch) * (self.img_w // self.patch)
        self.enc_pos = self.param(
            "enc_pos", nn.initializers.truncated_normal(0.02),
            (1, n_tokens, self.dim), self.param_dtype,
        )
        self.enc_blocks = [
            _EncBlock(self.dim, self.heads, self.dtype, self.param_dtype,
                      name=f"enc{i}")
            for i in range(self.enc_depth)
        ]
        self.enc_norm = nn.LayerNorm(param_dtype=self.param_dtype,
                                     name="enc_norm")
        self.tok_embed = nn.Embed(self.vocab_size, self.dim,
                                  param_dtype=self.param_dtype,
                                  name="tok_embed")
        self.dec_pos = self.param(
            "dec_pos", nn.initializers.truncated_normal(0.02),
            (1, self.max_len, self.dim), self.param_dtype,
        )
        self.dec_blocks = [
            DecoderBlock(self.dim, self.heads, self.dtype, self.param_dtype,
                         name=f"dec{i}")
            for i in range(self.dec_depth)
        ]
        self.dec_norm = nn.LayerNorm(param_dtype=self.param_dtype,
                                     name="dec_norm")
        self.head = nn.Dense(self.vocab_size, dtype=jnp.float32,
                             param_dtype=self.param_dtype, name="head")

    def encode(self, images):
        """images [B, H, W, 3] uint8 or float in [0,1] -> memory [B, N, D].

        uint8 is normalized here so the host ships bytes, not floats (4x
        less host->device traffic per step)."""
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        x = self.patch_embed(images.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, self.dim) + self.enc_pos.astype(self.dtype)
        for blk in self.enc_blocks:
            x = blk(x)
        return self.enc_norm(x)

    def decode_logits(self, memory, token_ids):
        """Teacher-forced logits [B, T, vocab] for input tokens [B, T]."""
        b, t = token_ids.shape
        x = self.tok_embed(token_ids) + self.dec_pos[:, :t].astype(self.dtype)
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        for blk in self.dec_blocks:
            x = blk(x, memory, causal)
        return self.head(self.dec_norm(x))

    def __call__(self, images, token_ids):
        memory = self.encode(images)
        return self.decode_logits(memory, token_ids)


class _EncBlock(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from effocr_tpu.models.vit import SelfAttention

        h = nn.LayerNorm(param_dtype=self.param_dtype)(x)
        x = x + SelfAttention(self.dim, self.heads, self.dtype,
                              self.param_dtype)(h)
        h = nn.LayerNorm(param_dtype=self.param_dtype)(x)
        return x + Mlp(4 * self.dim, self.dim, self.dtype,
                       self.param_dtype)(h)


def make_seq2seq_train_step(model: Seq2SeqOCR, tx, bank_mode: bool = False):
    """CE teacher-forcing step (the HF Trainer equivalent in
    trocr/train_trocr.py).

    bank_mode: the dataset lives in HBM (uint8 image bank + token banks)
    and each step receives int32 indices only — the same resident-bank
    pattern as the recognizer/localizer trainers (the axon transport
    retains every host→device transfer buffer, so streaming full image
    batches leaks host RSS per step)."""
    import optax

    def update(state, images, token_ids, token_mask):
        def loss_fn(params):
            logits = model.apply({"params": params}, images,
                                 token_ids[:, :-1])
            targets = token_ids[:, 1:]
            mask = token_mask[:, 1:]
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, targets[..., None], axis=-1
            )[..., 0]
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return {"params": new_params, "opt_state": new_opt}, loss

    if bank_mode:
        def step_bank(state, bank_imgs, bank_ids, bank_masks, idx):
            return update(
                state,
                jnp.take(bank_imgs, idx, axis=0),
                jnp.take(bank_ids, idx, axis=0),
                jnp.take(bank_masks, idx, axis=0),
            )

        return jax.jit(step_bank, donate_argnums=(0,))

    return jax.jit(update, donate_argnums=(0,))


@partial(jax.jit, static_argnames=("model", "max_len", "beam_size"))
def beam_decode(model: Seq2SeqOCR, params, images, max_len: int = 64,
                beam_size: int = 4):
    """Fixed-shape beam search (reference config num_beams=4,
    trocr/train_trocr.py:149-156).  Returns the best beam's tokens
    [B, max_len-1] (BOS stripped)."""
    memory = model.apply({"params": params}, images, method=Seq2SeqOCR.encode)
    b, n_mem, dim = memory.shape
    k = beam_size
    # expand memory per beam: [B*K, N, D]
    mem_k = jnp.repeat(memory, k, axis=0)

    tokens0 = jnp.full((b, k, max_len), PAD, jnp.int32).at[:, :, 0].set(BOS)
    # only beam 0 live at t=0 (all beams identical otherwise)
    scores0 = jnp.where(
        jnp.arange(k)[None, :] == 0, 0.0, NEG_INF_BEAM
    ) * jnp.ones((b, 1))
    done0 = jnp.zeros((b, k), bool)

    def body(carry, t):
        tokens, scores, done = carry
        logits = model.apply(
            {"params": params}, mem_k, tokens.reshape(b * k, max_len),
            method=Seq2SeqOCR.decode_logits,
        )  # [B*K, T, V]
        v = logits.shape[-1]
        logp = jax.nn.log_softmax(
            logits[:, t].reshape(b, k, v), axis=-1
        )
        # finished beams may only extend with PAD at zero cost
        pad_only = jnp.full((v,), NEG_INF_BEAM).at[PAD].set(0.0)
        logp = jnp.where(done[:, :, None], pad_only[None, None, :], logp)
        cand = scores[:, :, None] + logp              # [B, K, V]
        flat = cand.reshape(b, k * v)
        top_scores, top_flat = jax.lax.top_k(flat, k)  # [B, K]
        beam_src = top_flat // v
        tok = (top_flat % v).astype(jnp.int32)
        tokens = jnp.take_along_axis(
            tokens, beam_src[:, :, None], axis=1
        ).at[:, :, t + 1].set(tok)
        done = jnp.take_along_axis(done, beam_src, axis=1) | (tok == EOS)
        return (tokens, top_scores, done), None

    (tokens, scores, _), _ = jax.lax.scan(
        body, (tokens0, scores0, done0), jnp.arange(max_len - 1)
    )
    best = jnp.argmax(scores, axis=1)
    out = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1
    )[:, 0]
    return out[:, 1:]


NEG_INF_BEAM = -1e9


@partial(jax.jit, static_argnames=("model", "max_len"))
def greedy_decode(model: Seq2SeqOCR, params, images, max_len: int = 64):
    """Fixed-length greedy decode as a lax.scan (no dynamic shapes)."""
    memory = model.apply({"params": params}, images, method=Seq2SeqOCR.encode)
    b = images.shape[0]

    def body(carry, t):
        tokens, done = carry
        logits = model.apply(
            {"params": params}, memory, tokens,
            method=Seq2SeqOCR.decode_logits,
        )
        # next token from position t
        nxt = jnp.argmax(logits[:, t], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, PAD, nxt)
        done = done | (nxt == EOS)
        tokens = tokens.at[:, t + 1].set(nxt)
        return (tokens, done), None

    tokens0 = jnp.full((b, max_len), PAD, jnp.int32).at[:, 0].set(BOS)
    done0 = jnp.zeros((b,), bool)
    (tokens, _), _ = jax.lax.scan(
        body, (tokens0, done0), jnp.arange(max_len - 1)
    )
    return tokens[:, 1:]
