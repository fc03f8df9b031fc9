"""Cloud-comparator protocol tests (offline, injected transport).

The reference's GCV/Baidu comparators (onnx_engines/infer_ocr_yolo.py:
38-72) are network calls; here the request construction and response
parsing are exercised against fake transports so the protocol logic is
verified without egress or credentials.
"""

import base64
import json
import urllib.parse

import numpy as np
import pytest

from effocr_tpu.utils.comparators import (
    baidu_access_token,
    compare_ocr,
    png_bytes,
    run_baidu,
    run_gcv,
)


def test_gcv_request_and_parse():
    calls = {}

    def transport(url, body, headers):
        calls["url"] = url
        calls["body"] = json.loads(body.decode())
        calls["headers"] = headers
        return {"responses": [{"fullTextAnnotation": {"text": "雪の朝\n"}}]}

    out = run_gcv(b"PNGDATA", "KEY123", lang="ja", transport=transport)
    assert out == "雪の朝\n"
    assert calls["url"].startswith(
        "https://vision.googleapis.com/v1/images:annotate?key=KEY123")
    req = calls["body"]["requests"][0]
    # same semantics as the reference's document_text_detection +
    # language_hints call (infer_ocr_yolo.py:48-50)
    assert req["features"] == [{"type": "DOCUMENT_TEXT_DETECTION"}]
    assert req["imageContext"]["languageHints"] == ["ja"]
    assert base64.b64decode(req["image"]["content"]) == b"PNGDATA"
    assert calls["headers"]["Content-Type"] == "application/json"


def test_gcv_error_raises():
    def transport(url, body, headers):
        return {"responses": [{"error": {"code": 403, "message": "denied"}}]}

    with pytest.raises(RuntimeError, match="GCV error"):
        run_gcv(b"x", "KEY", transport=transport)


def test_baidu_request_and_parse():
    calls = {}

    def transport(url, body, headers):
        calls["url"] = url
        calls["params"] = urllib.parse.parse_qs(body.decode())
        calls["headers"] = headers
        return {"words_result": [{"words": "雪の"}, {"words": "朝"}],
                "words_result_num": 2}

    out = run_baidu(b"IMGDATA", "TOK", lang="JAP", transport=transport)
    # joined words, reference parse at infer_ocr_yolo.py:69
    assert out == "雪の朝"
    assert calls["url"] == (
        "https://aip.baidubce.com/rest/2.0/ocr/v1/accurate_basic"
        "?access_token=TOK")
    assert calls["params"]["language_type"] == ["JAP"]
    assert base64.b64decode(calls["params"]["image"][0]) == b"IMGDATA"
    assert calls["headers"]["content-type"] == \
        "application/x-www-form-urlencoded"


def test_baidu_error_raises_and_token_flow():
    def bad(url, body, headers):
        return {"error_code": 17, "error_msg": "quota"}

    with pytest.raises(RuntimeError, match="Baidu OCR error"):
        run_baidu(b"x", "TOK", transport=bad)

    def token_transport(url, body, headers):
        q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
        assert q["grant_type"] == ["client_credentials"]
        assert q["client_id"] == ["AK"] and q["client_secret"] == ["SK"]
        return {"access_token": "24.abcdef", "expires_in": 2592000}

    assert baidu_access_token("AK", "SK", transport=token_transport) \
        == "24.abcdef"

    def no_token(url, body, headers):
        return {"error": "invalid_client"}

    with pytest.raises(RuntimeError, match="token exchange"):
        baidu_access_token("AK", "SK", transport=no_token)


def test_compare_ocr_cloud_paths():
    """compare_ocr runs the cloud comparators through textline_evaluation
    when credentials are present (infer_ocr_yolo.py:673-725)."""
    img = np.full((32, 96), 255, np.uint8)

    def transport(url, body, headers):
        if "vision.googleapis" in url:
            return {"responses": [
                {"fullTextAnnotation": {"text": "hello\n"}}]}
        return {"words_result": [{"words": "hello"}]}

    out = compare_ocr([img], ["hello"], lang="eng",
                      gcv_api_key="K", baidu_access_token="T",
                      transport=transport)
    # textline_evaluation returns (accuracy_percent, cer)
    assert out["gcv"][0] == 100.0 and out["gcv"][1] == 0.0
    assert out["baidu"][0] == 100.0 and out["baidu"][1] == 0.0


def test_png_bytes_roundtrip():
    import io

    from PIL import Image

    img = (np.arange(32 * 32, dtype=np.uint8).reshape(32, 32) % 251)
    data = png_bytes(img)
    back = np.asarray(Image.open(io.BytesIO(data)))
    assert (back == img).all()
