"""Native preproc library: build, letterbox parity with the host reference,
crop-square parity with median_pad_square + resize."""

import numpy as np
import pytest

from effocr_tpu import native
from effocr_tpu.kernels.image_ops import letterbox_host, median_pad_square

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_letterbox_batch_matches_host(rng):
    imgs = [
        rng.integers(0, 255, (50, 1000, 3)).astype(np.uint8),
        rng.integers(0, 255, (64, 480, 3)).astype(np.uint8),
    ]
    out, ratios, tops, lefts = native.letterbox_batch(imgs, 640)
    for i, im in enumerate(imgs):
        ref, r, (dw, dh) = letterbox_host(im, (640, 640))
        assert ratios[i] == pytest.approx(r, rel=1e-5)
        assert tops[i] == int(round(dh - 0.1))
        assert lefts[i] == int(round(dw - 0.1))
        # bilinear rounding differences between cv2 and ours: allow small
        # pixel deltas, but geometry (pad regions) must match exactly
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert (diff <= 2).mean() > 0.99
        # pad rows exactly 114
        assert (out[i][: tops[i]] == 114).all()


def test_letterbox_identity_no_resize(rng):
    im = rng.integers(0, 255, (640, 640, 3)).astype(np.uint8)
    out, ratios, tops, lefts = native.letterbox_batch([im], 640)
    assert ratios[0] == 1.0
    np.testing.assert_array_equal(out[0], im)


def test_crop_square_batch(rng):
    im = rng.integers(0, 255, (64, 256, 3)).astype(np.uint8)
    rects = np.array([[40, 0, 72, 64]], np.int32)
    out = native.crop_square_batch([im], rects, np.zeros((1,), np.int32),
                                   out_size=224)
    crop = im[0:64, 40:72]
    sq = median_pad_square(crop)  # white pad right/bottom
    from PIL import Image

    ref = np.asarray(
        Image.fromarray(sq).resize((224, 224), Image.BILINEAR)
    )
    diff = np.abs(out[0].astype(int) - ref.astype(int))
    assert (diff <= 3).mean() > 0.98


def test_letterbox_gray_batch_matches_numpy_path(rng):
    """Fused native gray+letterbox(+4-bit pack) is bit-identical to the
    python path it replaces (pipelines/infer.py _dispatch_chunk: channel
    mean -> letterbox_batch -> nibble pack)."""
    imgs = [
        np.ascontiguousarray(
            rng.integers(0, 256, (int(h), int(w), 3)).astype(np.uint8)
        )
        for h, w in [(40, 300), (64, 1100), (31, 257)]
    ]
    gray = [im.mean(axis=-1, keepdims=True).astype(np.uint8) for im in imgs]
    ref, rr, rt, rl = native.letterbox_batch(
        [np.ascontiguousarray(g) for g in gray], 640, out_h=64
    )
    packed_ref = (ref[:, :, 0::2] & 0xF0) | (ref[:, :, 1::2] >> 4)

    out8, r8, t8, l8 = native.letterbox_gray_batch(
        imgs, 640, out_h=64, pack_bits=8
    )
    np.testing.assert_array_equal(out8, ref[..., 0])
    np.testing.assert_array_equal(r8, rr)
    np.testing.assert_array_equal(t8, rt)
    np.testing.assert_array_equal(l8, rl)

    out4, _, _, _ = native.letterbox_gray_batch(
        imgs, 640, out_h=64, pack_bits=4
    )
    np.testing.assert_array_equal(out4, packed_ref[..., 0])

    from effocr_tpu.kernels.image_ops import dither_offsets, quantize_2bit

    d = dither_offsets(64, 640)
    lv = quantize_2bit(ref, d[None, :, :, None])
    packed2_ref = (
        (lv[:, :, 0::4] << 6)
        | (lv[:, :, 1::4] << 4)
        | (lv[:, :, 2::4] << 2)
        | lv[:, :, 3::4]
    ).astype(np.uint8)
    out2, _, _, _ = native.letterbox_gray_batch(
        imgs, 640, out_h=64, pack_bits=2
    )
    np.testing.assert_array_equal(out2, packed2_ref[..., 0])

    # single-channel input accepted directly
    out1, _, _, _ = native.letterbox_gray_batch(
        [np.ascontiguousarray(g) for g in gray], 640, out_h=64, pack_bits=8
    )
    np.testing.assert_array_equal(out1, ref[..., 0])


def _save_png(tmp_path, name, arr, **kw):
    from PIL import Image

    p = str(tmp_path / name)
    Image.fromarray(arr).save(p, **kw)
    return p


def test_decode_png_rgb_parity(tmp_path, rng):
    from PIL import Image

    arrs = [
        rng.integers(0, 255, (48, 700, 3)).astype(np.uint8),
        rng.integers(0, 255, (64, 120, 3)).astype(np.uint8),
    ]
    paths = [_save_png(tmp_path, f"rgb{i}.png", a) for i, a in enumerate(arrs)]
    out, status = native.decode_png_batch(
        paths, [a.shape for a in arrs], num_threads=2
    )
    assert (status == 0).all()
    for a, o, p in zip(arrs, out, paths):
        np.testing.assert_array_equal(o, a)
        np.testing.assert_array_equal(
            o, np.asarray(Image.open(p).convert("RGB"))
        )


def test_decode_png_gray_source(tmp_path, rng):
    g = rng.integers(0, 255, (40, 300)).astype(np.uint8)
    p = _save_png(tmp_path, "gray.png", g)
    # gray -> 1 channel: exact
    out, status = native.decode_png_batch([p], [(40, 300, 1)])
    assert status[0] == 0
    np.testing.assert_array_equal(out[0], g[..., None])
    # gray -> 3 channels: replicate (PIL convert("RGB") semantics)
    out, status = native.decode_png_batch([p], [(40, 300, 3)])
    assert status[0] == 0
    np.testing.assert_array_equal(out[0], np.repeat(g[..., None], 3, -1))


def test_decode_png_rgb_to_gray_channel_mean(tmp_path, rng):
    a = rng.integers(0, 255, (32, 500, 3)).astype(np.uint8)
    p = _save_png(tmp_path, "rgb.png", a)
    out, status = native.decode_png_batch([p], [(32, 500, 1)])
    assert status[0] == 0
    ref = a.mean(axis=-1, keepdims=True).astype(np.uint8)
    np.testing.assert_array_equal(out[0], ref)


def test_decode_png_unsupported_falls_back(tmp_path, rng):
    from PIL import Image

    # palette PNG: status nonzero, caller must use PIL
    a = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    p = str(tmp_path / "pal.png")
    Image.fromarray(a).convert("P").save(p)
    out, status = native.decode_png_batch([p], [(16, 16, 3)])
    assert status[0] != 0 and out[0] is None
    # shape mismatch: rejected, no overflow
    p2 = _save_png(tmp_path, "ok.png", a)
    out, status = native.decode_png_batch([p2], [(99, 99, 3)])
    assert status[0] != 0
    # missing file
    out, status = native.decode_png_batch(
        [str(tmp_path / "nope.png")], [(8, 8, 3)]
    )
    assert status[0] != 0


def test_lazy_image_native_decode(tmp_path, rng):
    from effocr_tpu.pipelines.infer import _LazyImage, _materialize_batch

    rgb = rng.integers(0, 255, (40, 600, 3)).astype(np.uint8)
    gray = rng.integers(0, 255, (40, 200)).astype(np.uint8)
    p_rgb = _save_png(tmp_path, "line_rgb.png", rgb)
    p_gray = _save_png(tmp_path, "line_gray.png", gray)

    # gray pipeline: RGB source reduces via channel mean, gray loads as-is
    li = _LazyImage(p_rgb, gray=True)
    assert li.shape == (40, 600, 1)
    np.testing.assert_array_equal(
        li.load(), rgb.mean(-1, keepdims=True).astype(np.uint8)
    )
    lg = _LazyImage(p_gray, gray=True)
    assert lg.shape == (40, 200, 1)
    np.testing.assert_array_equal(lg.load(), gray[..., None])

    # RGB pipeline: exact passthrough; batch materialize decodes once
    li2 = _LazyImage(p_rgb, gray=False)
    out = _materialize_batch([li2, li2, rgb])
    np.testing.assert_array_equal(out[0], rgb)
    assert out[0] is out[1]
    np.testing.assert_array_equal(out[2], rgb)


def test_decode_letterbox_gray_fused_bit_exact(tmp_path):
    """Fused decode+letterbox+pack == decode_png_batch then
    letterbox_gray_batch, per pack width, gray and RGB sources."""
    from PIL import Image

    rng = np.random.default_rng(17)
    paths, shapes = [], []
    for i in range(6):
        h, w = int(rng.integers(40, 90)), int(rng.integers(200, 600))
        if i % 2:
            arr = rng.integers(0, 256, (h, w), np.uint8).astype(np.uint8)
            Image.fromarray(arr, "L").save(tmp_path / f"{i}.png")
        else:
            arr = rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.uint8)
            Image.fromarray(arr, "RGB").save(tmp_path / f"{i}.png")
        paths.append(str(tmp_path / f"{i}.png"))
        shapes.append((h, w))

    size_w, size_h = 512, 64
    for bits in (8, 4, 2):
        w_out = size_w * bits // 8
        pad = {2: 0x55, 4: 0x77, 8: 114}[bits]
        buf = np.full((8, size_h, w_out, 1), pad, np.uint8)
        res = native.decode_letterbox_gray_batch(
            paths, shapes, size_w, buf, out_h=size_h, pack_bits=bits)
        assert res is not None
        ratios, tops, lefts = res

        # two-step reference
        arrs, status = native.decode_png_batch(
            paths, [(h, w, 1) for h, w in shapes])
        assert (status == 0).all()
        out2, r2, t2, l2 = native.letterbox_gray_batch(
            arrs, size_w, out_h=size_h, pack_bits=bits)
        np.testing.assert_array_equal(buf[:6, :, :, 0], out2)
        np.testing.assert_array_equal(ratios, r2)
        np.testing.assert_array_equal(tops, t2)
        np.testing.assert_array_equal(lefts, l2)

    # a corrupt file makes the whole batch return None (caller fallback)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\n nonsense")
    buf = np.full((8, size_h, size_w, 1), 114, np.uint8)
    assert native.decode_letterbox_gray_batch(
        paths + [str(bad)], shapes + [(32, 32)], size_w, buf,
        out_h=size_h, pack_bits=8) is None
