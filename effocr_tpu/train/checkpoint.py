"""Checkpointing: save/load model variables + optimizer state.

The reference saves torch state_dicts per-epoch-best
(train_effocr_recognizer.py:65-72,364-366) and relies on filenames
('enc_best.pth') as the artifact contract.  Here variables are serialized
with flax msgpack (enc_best.msgpack) — same directory contract, and a
`latest`/resume story for trainers (the D2 trainer's resume_or_load,
train_effocr_localizer_d2.py:101-108).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
from flax import serialization


def save_variables(variables: Any, path: str) -> None:
    """Atomic write (temp file + os.replace): a concurrent reader — e.g.
    `build-index` harvesting enc_best from a live run — must never see a
    torn or interleaved checkpoint, which an in-place same-length
    overwrite could silently produce."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    variables = jax.device_get(variables)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(variables))
    os.replace(tmp, path)


def load_variables(template: Any, path: str) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_train_state(state: Any, path: str) -> None:
    save_variables(state, path)


def load_train_state(template: Any, path: str) -> Any:
    return load_variables(template, path)


def best_checkpoint_path(run_dir: str, name: str = "enc_best") -> str:
    return os.path.join(run_dir, f"{name}.msgpack")
