"""AOT model export: the deployment-format story.

The reference deploys via ONNX export with numeric parity asserts
(scripts/recognizer_onnx_export.py:63-84).  The TPU-native equivalent is
jax.export: the jitted encoder (or the whole fused OCR program) is lowered
to serialized StableHLO that any JAX runtime can reload and run without the
Python model code.  Parity is asserted the same way: reloaded vs eager
outputs on random batches (rtol/atol 0.05, matching the reference's
tolerance at scripts/recognizer_onnx_export.py:81-84).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def export_encoder(recognizer_dir: str, out_path: str, batch: int = 64,
                   check: bool = True) -> str:
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from effocr_tpu.models import create_classifier, create_encoder
    from effocr_tpu.train import checkpoint as ckpt

    with open(os.path.join(recognizer_dir, "model.json")) as f:
        meta = json.load(f)
    if meta.get("num_classes"):
        model = create_classifier(meta["arch"], meta["num_classes"])
    else:
        model = create_encoder(meta.get("arch", "convnext_tiny"))
    size = meta.get("image_size", 224)
    ch = meta.get("input_channels", 3)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, size, size, ch)), train=False)
    variables = ckpt.load_variables(
        init, ckpt.best_checkpoint_path(recognizer_dir)
    )

    def fwd(x):
        return model.apply(variables, x, train=False)

    spec = jax.ShapeDtypeStruct((batch, size, size, ch), jnp.float32)
    exported = jax_export.export(
        jax.jit(fwd), platforms=("cpu", "tpu")
    )(spec)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)

    if check:
        reloaded = jax_export.deserialize(blob)
        rng = np.random.default_rng(0)
        for _ in range(2):
            x = jnp.asarray(
                rng.normal(size=(batch, size, size, ch)), jnp.float32
            )
            np.testing.assert_allclose(
                np.asarray(reloaded.call(x)), np.asarray(fwd(x)),
                rtol=0.05, atol=0.05,
            )
        print("parity check passed (2 batches, rtol/atol 0.05)")
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--recognizer_dir", required=True)
    p.add_argument("--out", default=None,
                   help="default: <recognizer_dir>/enc_best.stablehlo")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--no_check", action="store_true", default=False)
    args = p.parse_args()
    out = args.out or os.path.join(args.recognizer_dir,
                                   "enc_best.stablehlo")
    path = export_encoder(args.recognizer_dir, out, args.batch,
                          check=not args.no_check)
    print(f"exported {path}")


if __name__ == "__main__":
    main()
