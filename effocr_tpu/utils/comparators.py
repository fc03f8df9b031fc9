"""External-OCR comparator hooks.

The reference compares against Tesseract / Google Cloud Vision / Baidu
(onnx_engines/infer_ocr_yolo.py:38-72,673-725).  Cloud hooks need network
credentials (and the reference's hard-coded keys are exactly the thing not
to reproduce); here they are clean adapter stubs, and the Tesseract hook is
live when pytesseract + the binary exist.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def tesseract_available() -> bool:
    try:
        import pytesseract

        pytesseract.get_tesseract_version()
        return True
    except Exception:
        return False


def run_tesseract(image: np.ndarray, lang: str = "eng",
                  psm: int = 7) -> str:
    """Single-text-line Tesseract OCR (psm 7 = treat as one line),
    mirroring the comparator at infer_ocr_yolo.py:690-694."""
    import pytesseract
    from PIL import Image

    return pytesseract.image_to_string(
        Image.fromarray(np.asarray(image, np.uint8)),
        lang=lang, config=f"--psm {psm}",
    ).strip()


def run_gcv(image_bytes: bytes, api_key: Optional[str] = None) -> str:
    """Google Cloud Vision hook (infer_ocr_yolo.py:38-52).  Requires
    network + credentials; raises if unavailable."""
    raise RuntimeError(
        "GCV comparator requires network access and an API key; "
        "set up google-cloud-vision and adapt this hook."
    )


def run_baidu(image_bytes: bytes, api_key: Optional[str] = None,
              secret_key: Optional[str] = None) -> str:
    """Baidu OCR hook (infer_ocr_yolo.py:53-72).  Requires network +
    credentials; raises if unavailable."""
    raise RuntimeError(
        "Baidu comparator requires network access and API credentials."
    )


def compare_ocr(
    images: Sequence[np.ndarray],
    gts: Sequence[str],
    lang: str = "eng",
) -> Dict[str, Tuple[float, float]]:
    """Run available comparators over (image, gt) pairs; returns
    {name: (accuracy, cer)} via textline_evaluation."""
    from effocr_tpu.eval.textline import textline_evaluation

    out: Dict[str, Tuple[float, float]] = {}
    if tesseract_available():
        pairs = [(gt, run_tesseract(im, lang=lang))
                 for im, gt in zip(images, gts)]
        out["tesseract"] = textline_evaluation(pairs)
    return out
