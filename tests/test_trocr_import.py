"""Parity tests: the TrOCR importer vs the torch reference implementation.

Mirrors the reference's converter-validation pattern (the reference checks
its fairseq->HF conversion by comparing outputs on a sample image;
scripts/trocr_fairseq_to_pytorch_chkpt.py adapted from HF's converter) —
here we check HF->JAX on random weights with exact-architecture tiny
configs, covering the three published-checkpoint layouts: equal dims,
cross_attention_hidden_size set, and the enc_to_dec_proj path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from effocr_tpu.baselines.trocr_import import (  # noqa: E402
    convert_state_dict,
    load_trocr_npz,
    save_trocr_npz,
    spec_from_state_dict,
    trocr_forward,
    trocr_greedy_decode,
)


def _make_hf_model(enc_hidden=32, dec_hidden=32, cross_hidden=None,
                   scale_embedding=False, image_size=32, patch=16, vocab=37):
    from transformers import (
        TrOCRConfig,
        VisionEncoderDecoderConfig,
        VisionEncoderDecoderModel,
        ViTConfig,
    )

    ec = ViTConfig(
        hidden_size=enc_hidden, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=2 * enc_hidden, image_size=image_size,
        patch_size=patch,
    )
    dc = TrOCRConfig(
        d_model=dec_hidden, decoder_layers=2, decoder_attention_heads=2,
        decoder_ffn_dim=2 * dec_hidden, vocab_size=vocab,
        max_position_embeddings=24, use_learned_position_embeddings=True,
        layernorm_embedding=True, scale_embedding=scale_embedding,
        cross_attention_hidden_size=cross_hidden,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
        decoder_start_token_id=1,
    )
    cfg = VisionEncoderDecoderConfig.from_encoder_decoder_configs(ec, dc)
    cfg.decoder_start_token_id = 1
    cfg.pad_token_id = 0
    torch.manual_seed(0)
    model = VisionEncoderDecoderModel(cfg).eval()
    config = {"encoder": ec.to_dict(), "decoder": dc.to_dict()}
    return model, config


def _parity_case(**kw):
    model, config = _make_hf_model(**kw)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    spec = spec_from_state_dict(sd, config)
    params = convert_state_dict(sd, spec)

    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, spec.image_size, spec.image_size, 3)).astype(
        np.float32)
    ids = rng.integers(3, spec.vocab_size, size=(2, 7)).astype(np.int64)

    with torch.no_grad():
        ref = model(
            pixel_values=torch.from_numpy(pix).permute(0, 3, 1, 2),
            decoder_input_ids=torch.from_numpy(ids),
        ).logits.numpy()
    got = np.asarray(trocr_forward(params, spec, pix, ids.astype(np.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    return model, params, spec


def test_parity_equal_dims():
    _parity_case()


def test_parity_cross_attention_hidden_size():
    # encoder 32 -> decoder 48 with cross-attn k/v projecting from 32
    _parity_case(enc_hidden=32, dec_hidden=48, cross_hidden=32)


def test_parity_enc_to_dec_proj_and_scale_embedding():
    # dim mismatch with no cross_attention_hidden_size -> enc_to_dec_proj
    model, params, spec = _parity_case(
        enc_hidden=32, dec_hidden=48, cross_hidden=None,
        scale_embedding=True)
    assert spec.has_enc_to_dec_proj
    assert spec.scale_embedding


def test_greedy_decode_matches_hf_generate(tmp_path):
    model, params, spec = _parity_case()
    rng = np.random.default_rng(1)
    pix = rng.normal(size=(2, spec.image_size, spec.image_size, 3)).astype(
        np.float32)

    max_len = 10
    with torch.no_grad():
        ref = model.generate(
            torch.from_numpy(pix).permute(0, 3, 1, 2),
            max_length=max_len, num_beams=1, do_sample=False,
        ).numpy()

    # npz round-trip on the way (persistence test)
    path = str(tmp_path / "trocr.npz")
    save_trocr_npz(path, params, spec)
    params2, spec2 = load_trocr_npz(path)
    assert spec2 == spec

    got = np.asarray(trocr_greedy_decode(
        params2, spec2, pix, max_len=max_len,
        bos_id=1, eos_id=2, pad_id=0))

    for b in range(2):
        r = list(ref[b][1:])  # strip decoder_start
        g = list(got[b])
        r = r[: r.index(2) + 1] if 2 in r else r
        g = g[: g.index(2) + 1] if 2 in g else g
        assert g[: len(r)] == r


def test_beam_decode_matches_hf_generate():
    """num_beams=4 parity with HF generate (the reference's TrOCR eval
    config, trocr/infer_trocr.py:107) on a batch of random images."""
    from effocr_tpu.baselines.trocr_import import trocr_beam_decode

    model, config = _make_hf_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    spec = spec_from_state_dict(sd, config)
    params = convert_state_dict(sd, spec)

    rng = np.random.default_rng(7)
    pix = rng.normal(size=(4, spec.image_size, spec.image_size, 3)).astype(
        np.float32)
    max_len = 12
    with torch.no_grad():
        ref = model.generate(
            torch.from_numpy(pix).permute(0, 3, 1, 2),
            max_length=max_len, num_beams=4, do_sample=False,
            length_penalty=1.0, early_stopping=False,
        ).numpy()
    got = np.asarray(trocr_beam_decode(
        params, spec, pix, max_len=max_len, num_beams=4,
        bos_id=1, eos_id=2, pad_id=0))
    for b in range(pix.shape[0]):
        r = list(ref[b][1:])
        g = list(got[b])
        r = r[: r.index(2) + 1] if 2 in r else r
        g = g[: g.index(2) + 1] if 2 in g else g
        assert g == r, (b, g, r)


def test_finetune_loss_matches_hf():
    """Our masked-CE teacher-forcing loss == HF VisionEncoderDecoder loss
    with -100-masked pad labels (the reference's fine-tune objective,
    trocr/train_trocr.py:49-50)."""
    import optax

    from effocr_tpu.baselines.trocr_import import make_trocr_finetune_step

    model, config = _make_hf_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    spec = spec_from_state_dict(sd, config)
    params = convert_state_dict(sd, spec)

    rng = np.random.default_rng(0)
    pix_u8 = rng.integers(0, 255, (2, spec.image_size, spec.image_size, 3),
                          dtype=np.uint8)
    labels = np.full((2, 9), 0, np.int64)        # pad_token_id = 0
    labels[0, :6] = [1, 5, 6, 7, 8, 2]
    labels[1, :4] = [1, 9, 10, 2]
    mask = labels != 0

    pix_f = (torch.from_numpy(pix_u8).permute(0, 3, 1, 2).float()
             / 255.0 - 0.5) / 0.5
    # NOTE: we compare against the explicit objective (CE of logits at
    # position i vs labels[i] with decoder_input_ids = shift_tokens_right
    # (labels)) — the semantics of transformers <=4.3x that the reference
    # trained with.  transformers 4.57's generic model(...).loss routes
    # through ForCausalLMLoss, which shifts labels AGAIN on top of the
    # already-shifted decoder inputs (targets become labels[i+1] while
    # input[i]=labels[i-1]) — a double shift we deliberately do not
    # replicate.
    from transformers.models.vision_encoder_decoder. \
        modeling_vision_encoder_decoder import shift_tokens_right

    dec_in = shift_tokens_right(torch.from_numpy(labels), 0, 1)
    with torch.no_grad():
        logits = model(pixel_values=pix_f,
                       decoder_input_ids=dec_in).logits
        ref_loss = float(torch.nn.CrossEntropyLoss()(
            logits.reshape(-1, logits.shape[-1]),
            torch.from_numpy(np.where(mask, labels, -100)).reshape(-1)))

    tx = optax.sgd(0.0)
    import jax.numpy as jnp

    params_j = {k: jnp.asarray(v) for k, v in params.items()}
    step = make_trocr_finetune_step(spec, tx, decoder_start=1)
    _, loss = step({"params": params_j, "opt_state": tx.init(params_j)},
                   pix_u8, labels.astype(np.int32), mask)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=2e-4, atol=2e-4)


def test_special_id_resolution(tmp_path):
    """HF diff-serializes configs: default-valued special ids are OMITTED
    from config.json (TrOCRConfig's decoder_start_token_id=2), and older
    checkpoints can carry present-but-null keys; token id 0 from a
    tokenizer must not be discarded by falsy fallbacks."""
    import json as _json

    from effocr_tpu.cli.import_trocr import _special_ids

    class FakeTok:
        eos_token_id = None
        sep_token_id = None
        pad_token_id = 0   # legitimate id 0

    # 1. defaults omitted entirely -> TrOCR conventions, tok pad=0 kept
    d1 = tmp_path / "a"
    d1.mkdir()
    (d1 / "config.json").write_text(_json.dumps({"decoder": {}}))
    assert _special_ids(str(d1), FakeTok()) == (2, 2, 0)

    # 2. present-but-null keys fall through instead of crashing
    d2 = tmp_path / "b"
    d2.mkdir()
    (d2 / "config.json").write_text(_json.dumps(
        {"decoder_start_token_id": None,
         "decoder": {"eos_token_id": None, "pad_token_id": None}}))
    assert _special_ids(str(d2)) == (2, 2, 1)

    # 3. explicit values win
    d3 = tmp_path / "c"
    d3.mkdir()
    (d3 / "config.json").write_text(_json.dumps(
        {"decoder_start_token_id": 7,
         "decoder": {"eos_token_id": 8, "pad_token_id": 9}}))
    assert _special_ids(str(d3), FakeTok()) == (7, 8, 9)


def test_cli_convert_and_evaluate(tmp_path):
    """End-to-end import-trocr CLI flow: save_pretrained checkpoint +
    local char-level fast tokenizer -> convert --check -> COCO eval."""
    import json

    from effocr_tpu.cli.import_trocr import convert, evaluate

    model, config = _make_hf_model(vocab=16)
    model_dir = tmp_path / "hf_ckpt"
    model.save_pretrained(model_dir, safe_serialization=False)

    # char-level WordLevel tokenizer built offline (ids 3.. for chars);
    # </s> appended so the model learns to stop, Fuse decoder so decoded
    # chars concatenate without separators
    from tokenizers import Tokenizer, decoders
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Split
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2}
    for i, c in enumerate("abcdefghij ".replace(" ", "▁") + "k"):
        vocab[c] = 3 + i
    t = Tokenizer(WordLevel(vocab, unk_token="<pad>"))
    t.pre_tokenizer = Split("", "isolated")
    t.post_processor = TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 2)])
    t.decoder = decoders.Fuse()
    tok = PreTrainedTokenizerFast(
        tokenizer_object=t, pad_token="<pad>", bos_token="<s>",
        eos_token="</s>")
    tok.save_pretrained(model_dir)

    out = str(tmp_path / "trocr_tpu.npz")
    convert(str(model_dir), out, check=True)

    # two synthetic "line images" + COCO json with text fields
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    from PIL import Image

    rng = np.random.default_rng(0)
    images = []
    for i in range(6):
        name = f"line{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (24, 90, 3), dtype=np.uint8)
        ).save(img_dir / name)
        images.append({"id": i, "file_name": name, "text": "abc"})
    coco = str(tmp_path / "eval.json")
    with open(coco, "w") as f:
        json.dump({"images": images, "annotations": [],
                   "categories": []}, f)

    acc, cer = evaluate(out, str(model_dir), coco, str(img_dir),
                        batch=2, max_len=8)
    assert 0.0 <= acc <= 100.0 and cer >= 0.0

    # fine-tune (trocr/train_trocr.py role): a random tiny model must
    # memorize the constant transcription and beat zero-shot CER
    from effocr_tpu.cli.import_trocr import finetune

    best_cer = finetune(out, str(model_dir), coco, coco, str(img_dir),
                        num_epochs=10, batch=2, lr=5e-3, max_len=8)
    assert best_cer < min(cer, 0.5)


# ------------------------------------------------------- fairseq-layout hop
class _FakeFairseqCfg:
    """Foreign (non-torch) object inside the checkpoint — the allowlist
    unpickler must stub it, never import/execute it."""

    def __init__(self):
        self.arch = "trocr_base"


def _hf_sd_to_fairseq(sd, enc_layers=2):
    """Reverse of fairseq_to_hf_state_dict, for round-trip testing: map an
    HF VisionEncoderDecoderModel state dict back into the raw fairseq/unilm
    layout (the input of the reference's converter,
    scripts/trocr_fairseq_to_pytorch_chkpt.py:28-87)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("encoder.pooler."):
            continue
        if k.startswith("encoder.encoder.layer."):
            parts = k.split(".")
            i, rest, wb = parts[3], ".".join(parts[4:-1]), parts[-1]
            base = f"encoder.deit.blocks.{i}"
            if rest in ("attention.attention.query", "attention.attention.key",
                        "attention.attention.value"):
                continue  # merged below
            m = {"attention.output.dense": "attn.proj",
                 "layernorm_before": "norm1", "layernorm_after": "norm2",
                 "intermediate.dense": "mlp.fc1", "output.dense": "mlp.fc2"}
            out[f"{base}.{m[rest]}.{wb}"] = v
        elif k == "encoder.embeddings.cls_token":
            out["encoder.deit.cls_token"] = v
        elif k == "encoder.embeddings.position_embeddings":
            out["encoder.deit.pos_embed"] = v
        elif k.startswith("encoder.embeddings.patch_embeddings.projection."):
            out[k.replace("encoder.embeddings.patch_embeddings.projection.",
                          "encoder.deit.patch_embed.proj.")] = v
        elif k.startswith("encoder.layernorm."):
            out[k.replace("encoder.layernorm.", "encoder.deit.norm.")] = v
        elif k.startswith("decoder.model."):
            out[k[len("decoder.model."):]] = v
        else:
            out[k] = v
    for i in range(enc_layers):
        base_hf = f"encoder.encoder.layer.{i}.attention.attention"
        for wb in ("weight", "bias"):
            q = sd.get(f"{base_hf}.query.{wb}")
            if q is None:
                continue
            kk = sd[f"{base_hf}.key.{wb}"]
            vv = sd[f"{base_hf}.value.{wb}"]
            out[f"encoder.deit.blocks.{i}.attn.qkv.{wb}"] = np.concatenate(
                [q, kk, vv], axis=0)
    # junk the reference's converter explicitly deletes
    out["decoder.version"] = np.asarray([3.0], np.float32)
    h = sd["encoder.layernorm.weight"].shape[0]
    out["encoder.deit.head.weight"] = np.zeros((7, h), np.float32)
    out["encoder.deit.head.bias"] = np.zeros((7,), np.float32)
    return out


def test_fairseq_hop_roundtrip_parity():
    """fairseq-layout -> hop -> HF-layout -> JAX matches the HF model's
    teacher-forced logits exactly (the qkv split + renames are lossless)."""
    from effocr_tpu.baselines.trocr_import import fairseq_to_hf_state_dict

    model, config = _make_hf_model()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    fs = _hf_sd_to_fairseq(sd)
    hf2 = fairseq_to_hf_state_dict(fs)

    spec = spec_from_state_dict(hf2, config)
    params = convert_state_dict(hf2, spec)
    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, spec.image_size, spec.image_size, 3)).astype(
        np.float32)
    ids = rng.integers(3, spec.vocab_size, size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        ref = model(
            pixel_values=torch.from_numpy(pix).permute(0, 3, 1, 2),
            decoder_input_ids=torch.from_numpy(ids),
        ).logits.numpy()
    got = np.asarray(trocr_forward(params, spec, pix, ids.astype(np.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_fairseq_checkpoint_end_to_end(tmp_path):
    """A synthetic fairseq-layout .pt checkpoint (with non-tensor cfg junk,
    as real fairseq checkpoints carry) converts end-to-end through
    import_fairseq_checkpoint — no fairseq install, allowlist unpickler."""
    from effocr_tpu.baselines.trocr_import import import_fairseq_checkpoint

    # decoder flags must match the hop's hard-coded reference config
    # (relu + scale_embedding, trocr_fairseq_to_pytorch_chkpt.py:270,326)
    model, config = _make_hf_model()
    model.config.decoder.activation_function = "relu"
    model.config.decoder.scale_embedding = True
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    fs = {k: torch.from_numpy(np.asarray(v))
          for k, v in _hf_sd_to_fairseq(sd).items()}

    path = str(tmp_path / "fairseq_trocr.pt")
    torch.save({"model": fs, "cfg": _FakeFairseqCfg(), "args": None}, path)
    params, spec = import_fairseq_checkpoint(path)
    assert spec.enc_layers == 2 and spec.dec_layers == 2
    assert spec.activation == "relu" and spec.scale_embedding

    pix = np.zeros((1, spec.image_size, spec.image_size, 3), np.float32)
    ids = np.asarray([[1, 4, 5]], np.int32)
    logits = np.asarray(trocr_forward(params, spec, pix, ids))
    assert logits.shape == (1, 3, spec.vocab_size)
    assert np.isfinite(logits).all()


def test_fairseq_sinusoidal_table():
    """Materialized sinusoidal positions: fairseq semantics (padding row 1
    zeroed, half sin / half cos layout)."""
    from effocr_tpu.baselines.trocr_import import _fairseq_sinusoidal

    t = _fairseq_sinusoidal(10, 8)
    assert t.shape == (10, 8)
    assert np.all(t[1] == 0.0)                       # padding_idx zeroed
    np.testing.assert_allclose(t[0, :4], 0.0)        # sin(0) = 0
    np.testing.assert_allclose(t[0, 4:], 1.0)        # cos(0) = 1
    import math as _m
    np.testing.assert_allclose(t[3, 0], _m.sin(3.0), rtol=1e-6)
    np.testing.assert_allclose(t[3, 4], _m.cos(3.0), rtol=1e-6)
