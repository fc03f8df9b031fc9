"""HF TrOCR checkpoint importer — run published TrOCR weights on TPU.

Capability parity with the reference's checkpoint-interop converter
(scripts/trocr_fairseq_to_pytorch_chkpt.py, which maps fairseq/unilm TrOCR
checkpoints onto HF ``VisionEncoderDecoderModel``).  The TPU-native
equivalent goes one hop further down the same chain: it maps an HF
``VisionEncoderDecoderModel`` (ViT encoder + TrOCR decoder) state dict onto
a pure-JAX forward, so any published TrOCR checkpoint — including ones
produced by the reference's converter — runs as a jitted XLA program.

Design notes (TPU-first, not a port):
- The forward is a pure function over a flat param dict; the architecture
  spec is a hashable frozen dataclass so ``jax.jit`` treats it as static.
- Greedy decode is a fixed-length ``lax.scan`` (no KV cache, no dynamic
  shapes): for a comparator-scale decoder the recompute is cheap and the
  program stays a single static XLA computation.
- Exact HF semantics reproduced (verified by the parity test in
  tests/test_trocr_import.py against the local torch implementation):
  ViT pre-LN blocks with erf-GELU and eps=1e-12 LayerNorm; TrOCR post-LN
  decoder blocks, query pre-scaled by head_dim**-0.5, learned positional
  embeddings with the BART-style offset of 2, optional embed scale
  sqrt(d_model) and embedding LayerNorm, optional enc_to_dec_proj.
"""

from __future__ import annotations

import dataclasses
import json
import math
from functools import partial
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TrOCRSpec:
    """Architecture hyperparameters, inferable from an HF state dict."""

    # encoder (ViT)
    enc_hidden: int
    enc_layers: int
    enc_heads: int
    patch: int
    image_size: int
    # decoder (TrOCR)
    dec_hidden: int
    dec_layers: int
    dec_heads: int
    vocab_size: int
    max_positions: int          # excludes the offset-2 rows
    cross_hidden: int           # kdim/vdim of the cross attention
    # flags (from config.json; not inferable from shapes)
    scale_embedding: bool = False
    layernorm_embedding: bool = True
    activation: str = "gelu"
    has_enc_to_dec_proj: bool = False

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch) ** 2


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out, in] -> JAX convention [in, out]."""
    return np.ascontiguousarray(np.asarray(w).T)


# --------------------------------------------------------------- fairseq hop
def _fairseq_sinusoidal(n: int, dim: int, padding_idx: int = 1) -> np.ndarray:
    """fairseq SinusoidalPositionalEmbedding.get_embedding, exactly.

    Used to materialize a learned-layout position table from checkpoints
    trained with sinusoidal decoder positions (trocr-base:
    use_learned_position_embeddings=False): the sinusoidal values are
    deterministic, so baking them into the [n, dim] table the rest of the
    importer expects is mathematically identical.
    """
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freq = np.exp(np.arange(half, dtype=np.float64) * -emb)
    pos = np.arange(n, dtype=np.float64)[:, None] * freq[None, :]
    out = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        out = np.concatenate([out, np.zeros((n, 1))], axis=1)
    if padding_idx is not None:
        out[padding_idx] = 0.0
    return out.astype(np.float32)


def fairseq_to_hf_state_dict(
    sd: Mapping[str, Any]
) -> Dict[str, np.ndarray]:
    """Raw fairseq/unilm TrOCR ``ckpt["model"]`` -> HF-layout state dict.

    The renaming hop of the reference's converter
    (scripts/trocr_fairseq_to_pytorch_chkpt.py:28-87: create_rename_keys +
    the qkv split + the ``decoder.model.`` prefixing at :455-460), so
    holders of the paper's original fairseq checkpoints can enter the
    pipeline without the unilm/fairseq packages.  Differences from the
    reference, on purpose:

    - encoder position embeddings are KEPT when shape-consistent (the
      reference deletes them after renaming, silently leaving the HF
      model's random init — a quirk, not a behavior to reproduce; our
      spec inference sizes the patch grid from this very tensor);
    - sinusoidal decoder positions (trocr-base layout) are materialized
      into the learned-position table (see _fairseq_sinusoidal) instead
      of being unsupported;
    - the qkv bias is split alongside the weight when present (deit
      small uses qkv_bias=True).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out: Dict[str, np.ndarray] = {}

    enc_renames = {
        "norm1": "layernorm_before",
        "norm2": "layernorm_after",
    }
    for k, v in sd.items():
        if k in ("decoder.version", "encoder.deit.head.weight",
                 "encoder.deit.head.bias"):
            continue
        if k.endswith("embed_positions._float_tensor"):
            continue  # sinusoidal marker; table materialized below
        if k.startswith("encoder.deit.blocks."):
            parts = k.split(".")
            i, rest = parts[3], ".".join(parts[4:])
            base = f"encoder.encoder.layer.{i}"
            wb = parts[-1]  # weight|bias
            if rest.startswith("attn.qkv."):
                h = v.shape[0] // 3
                for j, name in enumerate(("query", "key", "value")):
                    out[f"{base}.attention.attention.{name}.{wb}"] = \
                        v[j * h : (j + 1) * h]
            elif rest.startswith("attn.proj."):
                out[f"{base}.attention.output.dense.{wb}"] = v
            elif parts[4] in enc_renames:
                out[f"{base}.{enc_renames[parts[4]]}.{wb}"] = v
            elif rest.startswith("mlp.fc1."):
                out[f"{base}.intermediate.dense.{wb}"] = v
            elif rest.startswith("mlp.fc2."):
                out[f"{base}.output.dense.{wb}"] = v
            else:
                out[f"{base}.{rest}"] = v
        elif k == "encoder.deit.cls_token":
            out["encoder.embeddings.cls_token"] = v
        elif k == "encoder.deit.pos_embed":
            out["encoder.embeddings.position_embeddings"] = v
        elif k == "encoder.deit.patch_embed.proj.weight":
            out["encoder.embeddings.patch_embeddings.projection.weight"] = v
        elif k == "encoder.deit.patch_embed.proj.bias":
            out["encoder.embeddings.patch_embeddings.projection.bias"] = v
        elif k == "encoder.deit.norm.weight":
            out["encoder.layernorm.weight"] = v
        elif k == "encoder.deit.norm.bias":
            out["encoder.layernorm.bias"] = v
        elif k.startswith("decoder.") and "output_projection" not in k:
            out["decoder.model." + k] = v
        else:
            out[k] = v

    if "decoder.model.decoder.embed_positions.weight" not in out:
        # sinusoidal positions: bake the fairseq table (padding_idx=1,
        # offset 2 — row p+2 is position p, matching the learned layout)
        tok = out["decoder.model.decoder.embed_tokens.weight"]
        dim = tok.shape[1]
        n = 514  # fairseq default max_target_positions 512 (+2 offset)
        out["decoder.model.decoder.embed_positions.weight"] = \
            _fairseq_sinusoidal(n, dim)
    return out


def _looks_like_fairseq(sd: Mapping[str, Any]) -> bool:
    return any(k.startswith("encoder.deit.") for k in sd)


def import_fairseq_checkpoint(pt_path: str):
    """Raw fairseq/unilm TrOCR .pt -> (params, spec).

    Chains the renaming hop into the HF->JAX converter.  The pickle is
    read with the allowlist unpickler (interop/torch_pickle.py), so the
    fairseq cfg/args objects inside become inert stubs — no fairseq
    install or foreign code execution needed.  Flags not recoverable
    from tensor shapes use the reference's hard-coded config values
    (trocr_fairseq_to_pytorch_chkpt.py: activation relu,
    scale_embedding true for both published sizes).
    """
    import torch

    from effocr_tpu.interop.torch_pickle import _PickleModule

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False,
                      pickle_module=_PickleModule)
    if not isinstance(ckpt, dict) or "model" not in ckpt:
        raise ValueError(f"{pt_path}: not a fairseq checkpoint "
                         "(no 'model' key)")
    sd = {k: np.asarray(v.detach().float().cpu().numpy())
          for k, v in ckpt["model"].items()
          if hasattr(v, "detach")}
    if not _looks_like_fairseq(sd):
        raise ValueError(
            f"{pt_path}: no encoder.deit.* keys — already HF-layout? "
            "use the --model_dir path instead")
    hf_sd = fairseq_to_hf_state_dict(sd)
    config = {"decoder": {"activation_function": "relu",
                          "scale_embedding": True,
                          "use_learned_position_embeddings": True}}
    spec = spec_from_state_dict(hf_sd, config)
    return convert_state_dict(hf_sd, spec), spec


def spec_from_state_dict(
    sd: Mapping[str, Any], config: Optional[Mapping[str, Any]] = None
) -> TrOCRSpec:
    """Infer the architecture from tensor shapes (+ flags from config.json).

    ``config`` is the parsed HF config.json (VisionEncoderDecoderConfig
    layout: top-level "encoder" and "decoder" sub-dicts); only boolean /
    string flags are read from it — every dimension comes from the weights.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    proj = sd["encoder.embeddings.patch_embeddings.projection.weight"]
    enc_hidden, _, patch, _ = proj.shape
    pos = sd["encoder.embeddings.position_embeddings"]
    n_patches = pos.shape[1] - 1
    image_size = patch * int(round(math.sqrt(n_patches)))
    enc_layers = 0
    while f"encoder.encoder.layer.{enc_layers}.layernorm_before.weight" in sd:
        enc_layers += 1
    dec_layers = 0
    while f"decoder.model.decoder.layers.{dec_layers}.final_layer_norm.weight" in sd:
        dec_layers += 1
    tok = sd["decoder.model.decoder.embed_tokens.weight"]
    vocab_size, dec_hidden = tok.shape
    dec_pos = sd["decoder.model.decoder.embed_positions.weight"]
    cross_k = sd["decoder.model.decoder.layers.0.encoder_attn.k_proj.weight"]

    enc_cfg = (config or {}).get("encoder", {})
    dec_cfg = (config or {}).get("decoder", {})
    if not dec_cfg.get("use_learned_position_embeddings", True):
        raise ValueError(
            "only learned decoder position embeddings are supported "
            "(all published TrOCR checkpoints use them)"
        )
    return TrOCRSpec(
        enc_hidden=int(enc_hidden),
        enc_layers=enc_layers,
        enc_heads=int(enc_cfg.get("num_attention_heads",
                               max(1, enc_hidden // 64))),
        patch=int(patch),
        image_size=int(image_size),
        dec_hidden=int(dec_hidden),
        dec_layers=dec_layers,
        dec_heads=int(dec_cfg.get("decoder_attention_heads",
                               max(1, dec_hidden // 64))),
        vocab_size=int(vocab_size),
        max_positions=int(dec_pos.shape[0] - 2),
        cross_hidden=int(cross_k.shape[1]),
        scale_embedding=bool(dec_cfg.get("scale_embedding", False)),
        layernorm_embedding=(
            "decoder.model.decoder.layernorm_embedding.weight" in sd
        ),
        activation=str(dec_cfg.get("activation_function", "gelu")),
        has_enc_to_dec_proj=("enc_to_dec_proj.weight" in sd),
    )


def convert_state_dict(sd: Mapping[str, Any], spec: TrOCRSpec) -> Dict[str, np.ndarray]:
    """HF VisionEncoderDecoder state dict -> flat JAX param dict.

    Linear weights are transposed to [in, out]; the patch conv is kept in
    HWIO so the encoder embeds patches with one reshaped matmul (an MXU
    matmul, not a conv — the stride equals the kernel so they coincide).
    """
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    p: Dict[str, np.ndarray] = {}
    # --- encoder embeddings ---
    proj = sd["encoder.embeddings.patch_embeddings.projection.weight"]
    # [D, 3, P, P] -> [P, P, 3, D] -> flat [P*P*3, D] matmul form
    p["enc/patch_w"] = np.ascontiguousarray(
        proj.transpose(2, 3, 1, 0).reshape(-1, spec.enc_hidden)
    )
    p["enc/patch_b"] = sd["encoder.embeddings.patch_embeddings.projection.bias"]
    p["enc/cls"] = sd["encoder.embeddings.cls_token"]
    p["enc/pos"] = sd["encoder.embeddings.position_embeddings"]
    for i in range(spec.enc_layers):
        src = f"encoder.encoder.layer.{i}"
        dst = f"enc/L{i}"
        p[f"{dst}/ln1_s"] = sd[f"{src}.layernorm_before.weight"]
        p[f"{dst}/ln1_b"] = sd[f"{src}.layernorm_before.bias"]
        for name, hf in (("q", "query"), ("k", "key"), ("v", "value")):
            p[f"{dst}/{name}_w"] = _t(sd[f"{src}.attention.attention.{hf}.weight"])
            p[f"{dst}/{name}_b"] = sd[f"{src}.attention.attention.{hf}.bias"]
        p[f"{dst}/o_w"] = _t(sd[f"{src}.attention.output.dense.weight"])
        p[f"{dst}/o_b"] = sd[f"{src}.attention.output.dense.bias"]
        p[f"{dst}/ln2_s"] = sd[f"{src}.layernorm_after.weight"]
        p[f"{dst}/ln2_b"] = sd[f"{src}.layernorm_after.bias"]
        p[f"{dst}/fc1_w"] = _t(sd[f"{src}.intermediate.dense.weight"])
        p[f"{dst}/fc1_b"] = sd[f"{src}.intermediate.dense.bias"]
        p[f"{dst}/fc2_w"] = _t(sd[f"{src}.output.dense.weight"])
        p[f"{dst}/fc2_b"] = sd[f"{src}.output.dense.bias"]
    p["enc/final_ln_s"] = sd["encoder.layernorm.weight"]
    p["enc/final_ln_b"] = sd["encoder.layernorm.bias"]
    if spec.has_enc_to_dec_proj:
        p["proj_w"] = _t(sd["enc_to_dec_proj.weight"])
        p["proj_b"] = sd["enc_to_dec_proj.bias"]
    # --- decoder ---
    p["dec/tok_embed"] = sd["decoder.model.decoder.embed_tokens.weight"]
    p["dec/pos_embed"] = sd["decoder.model.decoder.embed_positions.weight"]
    if spec.layernorm_embedding:
        p["dec/emb_ln_s"] = sd["decoder.model.decoder.layernorm_embedding.weight"]
        p["dec/emb_ln_b"] = sd["decoder.model.decoder.layernorm_embedding.bias"]
    for i in range(spec.dec_layers):
        src = f"decoder.model.decoder.layers.{i}"
        dst = f"dec/L{i}"
        for blk, hf in (("self", "self_attn"), ("cross", "encoder_attn")):
            for name in ("q", "k", "v"):
                p[f"{dst}/{blk}_{name}_w"] = _t(sd[f"{src}.{hf}.{name}_proj.weight"])
                p[f"{dst}/{blk}_{name}_b"] = sd[f"{src}.{hf}.{name}_proj.bias"]
            p[f"{dst}/{blk}_o_w"] = _t(sd[f"{src}.{hf}.out_proj.weight"])
            p[f"{dst}/{blk}_o_b"] = sd[f"{src}.{hf}.out_proj.bias"]
            p[f"{dst}/{blk}_ln_s"] = sd[f"{src}.{hf}_layer_norm.weight"]
            p[f"{dst}/{blk}_ln_b"] = sd[f"{src}.{hf}_layer_norm.bias"]
        p[f"{dst}/fc1_w"] = _t(sd[f"{src}.fc1.weight"])
        p[f"{dst}/fc1_b"] = sd[f"{src}.fc1.bias"]
        p[f"{dst}/fc2_w"] = _t(sd[f"{src}.fc2.weight"])
        p[f"{dst}/fc2_b"] = sd[f"{src}.fc2.bias"]
        p[f"{dst}/final_ln_s"] = sd[f"{src}.final_layer_norm.weight"]
        p[f"{dst}/final_ln_b"] = sd[f"{src}.final_layer_norm.bias"]
    p["dec/out_proj_w"] = _t(sd["decoder.output_projection.weight"])
    return p


# ---------------------------------------------------------------- forward


def _ln(x, s, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * s + b


def _act(name: str):
    if name == "gelu":
        return partial(jax.nn.gelu, approximate=False)
    if name == "gelu_new":
        return partial(jax.nn.gelu, approximate=True)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unsupported activation {name!r}")


def _mha(q_in, kv_in, p, prefix, heads, causal: bool):
    """Multi-head attention matching HF TrOCR/ViT: q pre-scaled by
    head_dim**-0.5 (identical math to the /sqrt(d) form)."""
    b, tq, _ = q_in.shape
    tk = kv_in.shape[1]
    d = p[f"{prefix}q_w"].shape[1]
    hd = d // heads
    q = q_in @ p[f"{prefix}q_w"] + p[f"{prefix}q_b"]
    k = kv_in @ p[f"{prefix}k_w"] + p[f"{prefix}k_b"]
    v = kv_in @ p[f"{prefix}v_w"] + p[f"{prefix}v_b"]
    q = q.reshape(b, tq, heads, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
    k = k.reshape(b, tk, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, tk, heads, hd).transpose(0, 2, 1, 3)
    attn = q @ k.transpose(0, 1, 3, 2)
    if causal:
        mask = jnp.tril(jnp.ones((tq, tk), bool))
        attn = jnp.where(mask[None, None], attn, jnp.float32(-1e30))
    attn = jax.nn.softmax(attn, axis=-1)
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(b, tq, d)
    return o @ p[f"{prefix}o_w"] + p[f"{prefix}o_b"]


@partial(jax.jit, static_argnames=("spec",))
def trocr_encode(params, spec: TrOCRSpec, pixel_values):
    """pixel_values [B, H, W, 3] float32 (already mean/std normalized)
    -> encoder memory [B, N+1, cross_hidden]."""
    b = pixel_values.shape[0]
    g = spec.image_size // spec.patch
    # patchify as a matmul: [B, g, P, g, P, 3] -> [B, g*g, P*P*3]
    x = pixel_values.reshape(b, g, spec.patch, g, spec.patch, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, -1)
    x = x @ params["enc/patch_w"] + params["enc/patch_b"]
    cls = jnp.broadcast_to(params["enc/cls"], (b, 1, spec.enc_hidden))
    x = jnp.concatenate([cls, x], axis=1) + params["enc/pos"]
    for i in range(spec.enc_layers):
        L = f"enc/L{i}"
        h = _ln(x, params[f"{L}/ln1_s"], params[f"{L}/ln1_b"], 1e-12)
        x = x + _mha(h, h, params, f"{L}/", spec.enc_heads, causal=False)
        h = _ln(x, params[f"{L}/ln2_s"], params[f"{L}/ln2_b"], 1e-12)
        h = _act("gelu")(h @ params[f"{L}/fc1_w"] + params[f"{L}/fc1_b"])
        x = x + (h @ params[f"{L}/fc2_w"] + params[f"{L}/fc2_b"])
    x = _ln(x, params["enc/final_ln_s"], params["enc/final_ln_b"], 1e-12)
    if spec.has_enc_to_dec_proj:
        x = x @ params["proj_w"] + params["proj_b"]
    return x


@partial(jax.jit, static_argnames=("spec",))
def trocr_decode_logits(params, spec: TrOCRSpec, memory, input_ids):
    """Teacher-forced decoder logits [B, T, vocab] (causal mask only,
    matching HF with attention_mask=None)."""
    t = input_ids.shape[1]
    scale = math.sqrt(spec.dec_hidden) if spec.scale_embedding else 1.0
    x = jnp.take(params["dec/tok_embed"], input_ids, axis=0) * scale
    # learned positions with the BART-style offset of 2
    pos = jax.lax.dynamic_slice_in_dim(params["dec/pos_embed"], 2, t, axis=0)
    x = x + pos[None]
    if spec.layernorm_embedding:
        x = _ln(x, params["dec/emb_ln_s"], params["dec/emb_ln_b"], 1e-5)
    act = _act(spec.activation)
    for i in range(spec.dec_layers):
        L = f"dec/L{i}"
        h = _mha(x, x, params, f"{L}/self_", spec.dec_heads, causal=True)
        x = _ln(x + h, params[f"{L}/self_ln_s"], params[f"{L}/self_ln_b"], 1e-5)
        h = _mha(x, memory, params, f"{L}/cross_", spec.dec_heads, causal=False)
        x = _ln(x + h, params[f"{L}/cross_ln_s"], params[f"{L}/cross_ln_b"], 1e-5)
        h = act(x @ params[f"{L}/fc1_w"] + params[f"{L}/fc1_b"])
        h = h @ params[f"{L}/fc2_w"] + params[f"{L}/fc2_b"]
        x = _ln(x + h, params[f"{L}/final_ln_s"], params[f"{L}/final_ln_b"], 1e-5)
    return x @ params["dec/out_proj_w"]


@partial(jax.jit, static_argnames=("spec",))
def trocr_forward(params, spec: TrOCRSpec, pixel_values, input_ids):
    memory = trocr_encode(params, spec, pixel_values)
    return trocr_decode_logits(params, spec, memory, input_ids)


@partial(jax.jit, static_argnames=("spec", "max_len", "bos_id", "eos_id", "pad_id"))
def trocr_greedy_decode(params, spec: TrOCRSpec, pixel_values,
                        max_len: int = 64, bos_id: int = 2, eos_id: int = 2,
                        pad_id: int = 1):
    """Fixed-length greedy generation as a lax.scan (the start token is
    stripped on return).  Default ids follow published TrOCR checkpoints:
    decoding starts with decoder_start_token_id=2 (</s>, the BART
    convention), <pad>=1, eos=</s>=2 — prefer reading them from the
    checkpoint's config.json (cli/import_trocr._special_ids)."""
    memory = trocr_encode(params, spec, pixel_values)
    b = pixel_values.shape[0]

    def body(carry, t):
        tokens, done = carry
        logits = trocr_decode_logits(params, spec, memory, tokens)
        nxt = jnp.argmax(logits[:, t], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_id, nxt)
        done = done | (nxt == eos_id)
        tokens = tokens.at[:, t + 1].set(nxt)
        return (tokens, done), None

    tokens0 = jnp.full((b, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    done0 = jnp.zeros((b,), bool)
    (tokens, _), _ = jax.lax.scan(body, (tokens0, done0),
                                  jnp.arange(max_len - 1))
    return tokens[:, 1:]


@partial(jax.jit, static_argnames=("spec", "max_len", "num_beams", "bos_id",
                                   "eos_id", "pad_id", "length_penalty"))
def trocr_beam_decode(params, spec: TrOCRSpec, pixel_values,
                      max_len: int = 64, num_beams: int = 4,
                      bos_id: int = 2, eos_id: int = 2, pad_id: int = 1,
                      length_penalty: float = 1.0):
    """Fixed-shape beam search matching HF ``generate`` semantics (the
    reference's TrOCR eval decodes with num_beams=4, trocr/infer_trocr.py
    :107): 2K candidate expansion per step, EOS candidates finalized with
    score / generated_len**length_penalty, running beams continue from
    the non-EOS top-K, plus HF's early-stop heuristic gate (once the best
    possible running score can no longer beat the worst finished score,
    no further finalizations are accepted — replicated so a fixed-length
    scan returns the same winner as HF's dynamic loop with
    early_stopping=False).  Returns the best sequence [B, max_len-1]
    (decoder-start stripped, PAD-filled after EOS).
    """
    memory = trocr_encode(params, spec, pixel_values)
    b = memory.shape[0]
    k, L = num_beams, max_len
    k2 = 2 * k
    mem_k = jnp.repeat(memory, k, axis=0)
    neg = jnp.float32(-1e9)

    run_seq = jnp.full((b, k, L), pad_id, jnp.int32).at[:, :, 0].set(bos_id)
    run_sc = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, neg) * jnp.ones((b, 1))
    fin_seq = run_seq
    fin_sc = jnp.full((b, k), neg)
    fin_done = jnp.zeros((b, k), bool)
    heur_ok = jnp.ones((b, 1), bool)   # "improvement still possible"
    top_mask = (jnp.arange(k2) < k)[None, :]

    def body(carry, t):
        run_seq, run_sc, fin_seq, fin_sc, fin_done, heur_ok = carry
        logits = trocr_decode_logits(
            params, spec, mem_k, run_seq.reshape(b * k, L))
        v = logits.shape[-1]
        logp = jax.nn.log_softmax(logits[:, t].reshape(b, k, v), axis=-1)
        flat = (logp + run_sc[:, :, None]).reshape(b, k * v)
        top_sc, top_idx = jax.lax.top_k(flat, k2)          # [B, 2K]
        src = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)
        cand_seq = jnp.take_along_axis(
            run_seq, src[:, :, None], axis=1).at[:, :, t + 1].set(tok)
        hits = (tok == eos_id) | (t == L - 2)              # stopping criteria
        # next running beams: top-K among non-finished candidates
        nxt_sc, nxt_i = jax.lax.top_k(top_sc + hits * neg, k)
        run_seq = jnp.take_along_axis(cand_seq, nxt_i[:, :, None], axis=1)
        run_sc = nxt_sc
        # finalize: only candidates in the top-K mask, gated by heuristic
        did_finish = hits & top_mask
        gen_len = (t + 1).astype(jnp.float32)
        norm_sc = (top_sc / gen_len ** length_penalty
                   + (~heur_ok) * neg + (~did_finish) * neg)
        m_sc = jnp.concatenate([fin_sc, norm_sc], axis=1)
        m_seq = jnp.concatenate([fin_seq, cand_seq], axis=1)
        m_done = jnp.concatenate([fin_done, did_finish], axis=1)
        fin_sc, mi = jax.lax.top_k(m_sc, k)
        fin_seq = jnp.take_along_axis(m_seq, mi[:, :, None], axis=1)
        fin_done = jnp.take_along_axis(m_done, mi, axis=1)
        # early-stop heuristic (early_stopping=False branch)
        best_poss = run_sc[:, :1] / gen_len ** length_penalty
        worst_fin = jnp.where(
            fin_done, jnp.min(fin_sc, axis=1, keepdims=True), neg)
        heur_ok = heur_ok & jnp.any(best_poss > worst_fin, axis=-1,
                                    keepdims=True)
        return (run_seq, run_sc, fin_seq, fin_sc, fin_done, heur_ok), None

    (run_seq, run_sc, fin_seq, fin_sc, fin_done, heur_ok), _ = jax.lax.scan(
        body, (run_seq, run_sc, fin_seq, fin_sc, fin_done, heur_ok),
        jnp.arange(L - 1))
    return fin_seq[:, 0, 1:]


# ------------------------------------------------------------- finetuning


def make_trocr_finetune_step(spec: TrOCRSpec, tx, decoder_start: int,
                             bank_mode: bool = False):
    """CE fine-tuning step for imported TrOCR weights — the reference's
    trocr/train_trocr.py role (fine-tune a pretrained TrOCR on COCO line
    pairs; AdamW, pad labels ignored in the loss :49-50,147).

    Teacher forcing follows HF shift_tokens_right: decoder input =
    [decoder_start] + labels[:-1]; loss = mean CE over positions where
    the caller-supplied label_mask is set (identical to HF's -100-ignore
    CrossEntropyLoss mean when the mask marks non-pad positions).

    bank_mode: the corpus lives in HBM (uint8 pixel bank [N,S,S,3] +
    int32 label bank + mask bank) and steps ship int32 indices — the
    same resident-bank pattern as every other trainer here (the axon
    transport retains each host->device transfer buffer, and a f32
    384x384 batch is ~14 MB/step otherwise)."""
    import optax

    def update(state, pixels_u8, labels, label_mask):
        # TrOCRProcessor semantics: rescale 1/255, normalize mean=std=0.5
        pix = (pixels_u8.astype(jnp.float32) / 255.0 - 0.5) / 0.5

        def loss_fn(params):
            inp = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), decoder_start, labels.dtype),
                 labels[:, :-1]], axis=1)
            logits = trocr_forward(params, spec, pix, inp)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, labels[..., None], axis=-1)[..., 0]
            m = label_mask.astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return {"params": new_params, "opt_state": new_opt}, loss

    if bank_mode:
        def step_bank(state, bank_pix, bank_labels, bank_masks, idx):
            return update(
                state,
                jnp.take(bank_pix, idx, axis=0),
                jnp.take(bank_labels, idx, axis=0),
                jnp.take(bank_masks, idx, axis=0),
            )

        return jax.jit(step_bank, donate_argnums=(0,))
    return jax.jit(update, donate_argnums=(0,))


# ------------------------------------------------------------ persistence


def save_trocr_npz(path: str, params: Dict[str, np.ndarray], spec: TrOCRSpec):
    meta = json.dumps(dataclasses.asdict(spec))
    np.savez_compressed(path, __spec__=np.frombuffer(meta.encode(), np.uint8),
                        **params)


def load_trocr_npz(path: str):
    with np.load(path) as z:
        spec = TrOCRSpec(**json.loads(bytes(z["__spec__"]).decode()))
        params = {k: z[k] for k in z.files if k != "__spec__"}
    return params, spec


def import_hf_checkpoint(model_dir: str):
    """Load an HF TrOCR VisionEncoderDecoder checkpoint directory
    (config.json + pytorch_model.bin or model.safetensors) and convert.

    Returns (params, spec).  torch is only needed for .bin checkpoints.
    """
    import os

    with open(os.path.join(model_dir, "config.json")) as f:
        config = json.load(f)
    st_path = os.path.join(model_dir, "model.safetensors")
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch

        sd = {k: v.numpy() for k, v in
              torch.load(bin_path, map_location="cpu",
                         weights_only=True).items()}
    else:
        raise FileNotFoundError(
            f"no model.safetensors or pytorch_model.bin in {model_dir}")
    spec = spec_from_state_dict(sd, config)
    return convert_state_dict(sd, spec), spec
