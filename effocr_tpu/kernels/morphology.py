"""Grayscale morphology (erode/dilate) via lax.reduce_window.

Replaces kornia.morphology in the render augmentation pipeline
(utils/datasets_utils.py:29-36): random 3/4 x 2/3 rectangular structuring
elements, applied to NHWC float images.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _window(x: jnp.ndarray, kh: int, kw: int, init, op) -> jnp.ndarray:
    """Same-padded reduce_window over H, W of NHWC (or HWC) input."""
    ndim = x.ndim
    dims = [1] * ndim
    h_axis, w_axis = ndim - 3, ndim - 2
    dims[h_axis], dims[w_axis] = kh, kw
    pads = [(0, 0)] * ndim
    pads[h_axis] = ((kh - 1) // 2, kh // 2)
    pads[w_axis] = ((kw - 1) // 2, kw // 2)
    return jax.lax.reduce_window(
        x, init, op, tuple(dims), (1,) * ndim, tuple(pads)
    )


@partial(jax.jit, static_argnames=("kh", "kw"))
def dilate(x: jnp.ndarray, kh: int = 3, kw: int = 2) -> jnp.ndarray:
    """Max-filter (thickens bright regions; thins dark glyphs)."""
    return _window(x, kh, kw, -jnp.inf, jax.lax.max).astype(x.dtype)


@partial(jax.jit, static_argnames=("kh", "kw"))
def erode(x: jnp.ndarray, kh: int = 3, kw: int = 2) -> jnp.ndarray:
    """Min-filter (thickens dark glyphs)."""
    return _window(x, kh, kw, jnp.inf, jax.lax.min).astype(x.dtype)
