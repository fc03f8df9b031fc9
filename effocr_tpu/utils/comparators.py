"""External-OCR comparator hooks.

The reference compares against Tesseract / Google Cloud Vision / Baidu
(onnx_engines/infer_ocr_yolo.py:38-72,673-725).  The Tesseract hook is
live when pytesseract + the binary exist.  The cloud hooks are complete
REST-protocol implementations (request construction + response parsing
matching the reference's client calls) with an injectable ``transport``:
credentials come from arguments or the environment — never hard-coded
(the reference's in-source keys are exactly the thing not to reproduce)
— and the default urllib transport is only touched when one is not
injected, so the protocol logic is fully testable offline.
"""

from __future__ import annotations

import base64
import json as _json
import urllib.parse
import urllib.request
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

# transport(url, body_bytes, headers) -> decoded-JSON dict.  Injectable so
# the request/response protocol is unit-testable without network access.
Transport = Callable[[str, bytes, Dict[str, str]], dict]


def _urllib_transport(url: str, body: bytes, headers: Dict[str, str]) -> dict:
    req = urllib.request.Request(url, data=body, headers=headers)
    with urllib.request.urlopen(req, timeout=30) as resp:
        return _json.loads(resp.read().decode("utf-8"))


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


def run_gcv(
    image_bytes: bytes,
    api_key: str,
    lang: str = "ja",
    transport: Optional[Transport] = None,
) -> str:
    """Google Cloud Vision document OCR (infer_ocr_yolo.py:39-51).

    The reference calls ``client.document_text_detection(image,
    image_context={"language_hints": [lang]})`` and returns
    ``response.full_text_annotation.text``; this builds the equivalent
    ``images:annotate`` REST request (DOCUMENT_TEXT_DETECTION + the same
    language hint) and reads ``fullTextAnnotation.text`` back.  Credentials
    are caller-supplied — never embedded (anti-goal: the reference's
    hard-coded keys).
    """
    body = _json.dumps({
        "requests": [{
            "image": {"content": base64.b64encode(image_bytes).decode()},
            "features": [{"type": "DOCUMENT_TEXT_DETECTION"}],
            "imageContext": {"languageHints": [lang]},
        }]
    }).encode("utf-8")
    url = ("https://vision.googleapis.com/v1/images:annotate?key="
           + urllib.parse.quote(api_key))
    out = (transport or _urllib_transport)(
        url, body, {"Content-Type": "application/json"})
    resp = out.get("responses", [{}])[0]
    if "error" in resp:
        raise RuntimeError(f"GCV error: {resp['error']}")
    return resp.get("fullTextAnnotation", {}).get("text", "")


def baidu_access_token(
    api_key: str,
    secret_key: str,
    transport: Optional[Transport] = None,
) -> str:
    """OAuth client-credentials exchange for the Baidu OCR API (the step
    the reference performs out-of-band to obtain the ``access_token`` it
    passes at infer_ocr_yolo.py:53-56)."""
    url = ("https://aip.baidubce.com/oauth/2.0/token?"
           + urllib.parse.urlencode({
               "grant_type": "client_credentials",
               "client_id": api_key, "client_secret": secret_key}))
    out = (transport or _urllib_transport)(url, b"", {})
    if "access_token" not in out:
        raise RuntimeError(f"Baidu token exchange failed: {out}")
    return out["access_token"]


def run_baidu(
    image_bytes: bytes,
    access_token: str,
    request_url: str = "https://aip.baidubce.com/rest/2.0/ocr/v1/accurate_basic",
    lang: str = "JAP",
    transport: Optional[Transport] = None,
) -> str:
    """Baidu accurate_basic OCR (infer_ocr_yolo.py:53-72): form-encoded
    POST of the base64 image + language_type, joined ``words_result``
    text back — same endpoint, params, and parse as the reference."""
    params = urllib.parse.urlencode({
        "image": base64.b64encode(image_bytes).decode(),
        "language_type": lang,
    }).encode("utf-8")
    url = f"{request_url}?access_token={urllib.parse.quote(access_token)}"
    out = (transport or _urllib_transport)(
        url, params, {"content-type": "application/x-www-form-urlencoded"})
    if "error_code" in out:
        raise RuntimeError(f"Baidu OCR error: {out}")
    return "".join(x["words"] for x in out.get("words_result", []))


def png_bytes(image: np.ndarray) -> bytes:
    """Encode an image array to PNG bytes for the cloud hooks (the
    reference reads pre-saved files at infer_ocr_yolo.py:45,61)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(image, np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


def compare_ocr(
    images: Sequence[np.ndarray],
    gts: Sequence[str],
    lang: str = "eng",
    gcv_api_key: Optional[str] = None,
    baidu_access_token: Optional[str] = None,
    transport: Optional[Transport] = None,
) -> Dict[str, Tuple[float, float]]:
    """Run available comparators over (image, gt) pairs; returns
    {name: (accuracy, cer)} via textline_evaluation.  Tesseract runs when
    the binary exists; the cloud comparators run only when their
    credentials are supplied (reference: infer_ocr_yolo.py:673-725 runs
    whichever --gcv/--baidu flags select)."""
    from effocr_tpu.eval.textline import textline_evaluation

    cloud_lang = {"eng": "en", "jpn": "ja"}.get(lang, lang)
    out: Dict[str, Tuple[float, float]] = {}
    if tesseract_available():
        pairs = [(gt, run_tesseract(im, lang=lang))
                 for im, gt in zip(images, gts)]
        out["tesseract"] = textline_evaluation(pairs)
    if gcv_api_key:
        pairs = [(gt, run_gcv(png_bytes(im), gcv_api_key, lang=cloud_lang,
                              transport=transport).strip())
                 for im, gt in zip(images, gts)]
        out["gcv"] = textline_evaluation(pairs)
    if baidu_access_token:
        pairs = [(gt, run_baidu(png_bytes(im), baidu_access_token,
                                lang="JAP" if lang == "jpn" else "ENG",
                                transport=transport).strip())
                 for im, gt in zip(images, gts)]
        out["baidu"] = textline_evaluation(pairs)
    return out
