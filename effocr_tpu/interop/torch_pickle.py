"""Extract tensors from full torch module pickles without their package.

Ultralytics ``best.pt`` (the reference's localizer artifact,
onnx_engines/infer_ocr_yolo.py:273) is not a state dict — it's a pickle
of their ``Model`` object, normally unloadable without the ultralytics
package on sys.path.  But the tensors inside don't need those classes:
only the *container* types are foreign.  A permissive Unpickler maps any
unimportable class to an inert stub that records its ``__dict__``; real
torch machinery (tensor rebuilds, storages) still imports, so after
loading we walk the module tree's ``_parameters``/``_buffers``/
``_modules`` dicts — identical structure on stubs and genuine
``nn.Module``s — and emit a flat ``state_dict``-style name→array map.

Scope: extraction only.  No foreign code runs (stubs have empty
constructors and a dict-recording ``__setstate__``); this is the
import-side mirror of ``torch.save(ckpt["model"].state_dict())``.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional

import numpy as np


class _Stub:
    """Inert stand-in for an unimportable pickled class."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_stub_state"] = state

    # some classes pickle via __reduce__ with append/extend calls
    def append(self, item):
        self.__dict__.setdefault("_stub_items", []).append(item)

    def extend(self, items):
        self.__dict__.setdefault("_stub_items", []).extend(items)


class _PermissiveUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (_Stub,), {"__module__": module})


class _PickleModule:
    """pickle-module shim for torch.load (needs .Unpickler)."""

    Unpickler = _PermissiveUnpickler
    load = staticmethod(pickle.load)


def _walk_modules(obj: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return
    for coll in ("_parameters", "_buffers"):
        for k, v in (d.get(coll) or {}).items():
            if v is None or k == "num_batches_tracked":
                continue
            try:
                out[prefix + k] = v.detach().float().cpu().numpy()
            except Exception:
                continue
    for k, m in (d.get("_modules") or {}).items():
        if m is not None:
            _walk_modules(m, f"{prefix}{k}.", out)


def load_module_pickle_state_dict(
    path: str, root_key: Optional[str] = None
) -> Dict[str, np.ndarray]:
    """Full module pickle (.pt zip) -> flat {name: float32 array}.

    ``root_key``: key inside a checkpoint dict to walk ("model"/"ema");
    default tries "model" then "ema" then the object itself.  Key names
    match what ``obj.state_dict()`` would have produced.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False,
                     pickle_module=_PickleModule)
    if isinstance(obj, dict):
        if root_key is not None:
            obj = obj[root_key]
        else:
            for k in ("model", "ema"):
                if isinstance(obj.get(k), object) and obj.get(k) is not None \
                        and hasattr(obj[k], "__dict__"):
                    obj = obj[k]
                    break
    out: Dict[str, np.ndarray] = {}
    _walk_modules(obj, "", out)
    if not out:
        raise ValueError(
            f"{path}: no parameters found walking the pickled module tree "
            "(not a torch module checkpoint?)")
    return out
