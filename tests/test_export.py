"""AOT export round-trip: serialize -> deserialize -> numeric parity
(the reference's ONNX export parity asserts,
scripts/recognizer_onnx_export.py:81-84)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_export_roundtrip_parity(rng):
    from jax import export as jax_export

    from effocr_tpu.models import create_encoder

    model = create_encoder("convnext_atto", dtype=jnp.float32)
    x0 = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    def fwd(x):
        return model.apply(variables, x, train=False)

    spec = jax.ShapeDtypeStruct((2, 64, 64, 3), jnp.float32)
    blob = jax_export.export(
        jax.jit(fwd), platforms=("cpu", "tpu")
    )(spec).serialize()
    reloaded = jax_export.deserialize(blob)

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(reloaded.call(x)), np.asarray(fwd(x)),
        rtol=0.05, atol=0.05,
    )
