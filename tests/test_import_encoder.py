"""Pretrained-encoder import parity (models/import_weights.py) — the
reference's timm/HF ``pretrained=True`` capability
(models/encoders.py:58,84)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from effocr_tpu.models.import_weights import (  # noqa: E402
    convert_hf_convnext,
    convert_hf_vit,
)


def test_convnext_parity():
    """Our ConvNeXt forward == HF ConvNextModel pooler_output."""
    from transformers import ConvNextConfig, ConvNextModel

    from effocr_tpu.models.convnext import ConvNeXt

    depths, dims = [1, 1, 2, 1], [8, 16, 24, 32]
    torch.manual_seed(0)
    hf = ConvNextModel(ConvNextConfig(
        depths=depths, hidden_sizes=dims, num_channels=3)).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_convnext(sd, depths, dims)

    model = ConvNeXt(depths=tuple(depths), dims=tuple(dims),
                     dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 train=False))
    with torch.no_grad():
        ref = hf(torch.from_numpy(x).permute(0, 3, 1, 2)
                 ).pooler_output.numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_vit_parity():
    """Our ViT CLS embedding == HF ViTModel last_hidden_state[:, 0]."""
    from transformers import ViTConfig, ViTModel

    from effocr_tpu.models.vit import ViT

    # layer_norm_eps matched to our (timm-convention) 1e-6: at RANDOM init
    # the 0.02-std embeddings make LN variance ~1e-3, where HF's 1e-12
    # default vs 1e-6 shifts outputs by ~1e-3 (pure eps artifact, <0.1%
    # for trained weights — see models/import_weights.py docstring)
    torch.manual_seed(0)
    hf = ViTModel(ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=16,
        layer_norm_eps=1e-6)).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_vit(sd, depth=2)

    model = ViT(patch=16, dim=32, depth=2, heads=2, image_size=32,
                dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 train=False))
    with torch.no_grad():
        ref = hf(torch.from_numpy(x).permute(0, 3, 1, 2)
                 ).last_hidden_state[:, 0].numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_import_cli_roundtrip(tmp_path):
    """import_hf_encoder: registry inference + shape validation + the
    msgpack round-trips into create_encoder for --checkpoint warm start
    (convnext_atto-shaped checkpoint)."""
    from transformers import ConvNextConfig, ConvNextModel

    from effocr_tpu.models.factory import create_encoder
    from effocr_tpu.models.import_weights import import_hf_encoder
    from effocr_tpu.train import checkpoint as ckpt

    torch.manual_seed(0)
    hf = ConvNextModel(ConvNextConfig(
        depths=[2, 2, 6, 2], hidden_sizes=[40, 80, 160, 320],
        num_channels=3, image_size=64)).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    variables, name, image_size = import_hf_encoder(str(tmp_path))
    assert name == "convnext_atto"
    assert image_size == 64
    out = str(tmp_path / "enc_init.msgpack")
    ckpt.save_variables(variables, out)

    model = create_encoder(name, dtype=jnp.float32)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    restored = ckpt.load_variables(init, out)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(restored, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = hf(torch.from_numpy(x).permute(0, 3, 1, 2)
                 ).pooler_output.numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)