"""Microbenchmark the fused OCR program's device stages in isolation.

Times (on whatever backend jax picks): detector forward, decode+NMS at a
sweep of max_nms sizes, the reading-order argsort, ROI crops, and encoder
sub-batches — each jitted standalone, timed with block_until_ready.  Use to attribute the fused program's latency
before optimizing any single stage (DESIGN.md round-2 profile: detector
31 ms / decode+NMS 30 ms / encoder 34 ms / crops+sort+retrieval 10 ms at
line_batch=256, max_nms=1024 on the relay-attached v5e chip).

Run:  python scripts/nms_microbench.py [line_batch]
"""

import math
import sys
import time

import numpy as np


def timeit(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    samples = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        samples.append(time.time() - t0)
    return float(np.median(samples)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from effocr_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()

    from effocr_tpu.kernels.nms import batched_nms
    from effocr_tpu.kernels.roi import crop_lines_to_squares
    from effocr_tpu.kernels.yolo_decode import decode_and_nms
    from effocr_tpu.models import create_encoder, create_localizer

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    h, w = 64, 640
    rng = np.random.default_rng(0)

    localizer = create_localizer("yolov5s", num_classes=2)
    loc_vars = localizer.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 1)), train=False
    )
    imgs = jnp.asarray(
        rng.integers(0, 255, (b, h, w, 1)).astype(np.float32) / 255.0
    )

    fwd = jax.jit(
        lambda x: localizer.apply(loc_vars, x, train=False)[0]
    )
    t_fwd = timeit(fwd, imgs)
    decoded = fwd(imgs)
    decoded = jax.block_until_ready(decoded)
    print(f"detector fwd [{b},{h},{w},1]: {t_fwd:.1f} ms  "
          f"(decoded {decoded.shape})")

    for max_nms in (256, 512, 1024, 2048):
        dn = jax.jit(
            lambda d, m=max_nms: decode_and_nms(
                d, conf_thresh=0.35, iou_thresh=0.01, max_nms=m,
                max_det=min(m, 1000),
            )
        )
        t = timeit(dn, decoded)
        print(f"decode+NMS max_nms={max_nms:5d}: {t:.1f} ms")

    # bare batched_nms on realistic box layouts (~28 glyphs/line kept)
    n = 1024
    boxes = np.zeros((b, n, 4), np.float32)
    xs = rng.uniform(0, 600, (b, n))
    boxes[..., 0] = xs
    boxes[..., 1] = rng.uniform(0, 8, (b, n))
    boxes[..., 2] = xs + rng.uniform(8, 26, (b, n))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(40, 56, (b, n))
    scores = rng.uniform(0.35, 0.9, (b, n)).astype(np.float32)
    classes = (rng.uniform(size=(b, n)) < 0.1).astype(np.int32)
    valid = rng.uniform(size=(b, n)) < (200.0 / n)
    bn = jax.jit(
        lambda bo, s, c, v: batched_nms(bo, s, c, v, 0.01, 512)
    )
    t = timeit(bn, jnp.asarray(boxes), jnp.asarray(scores),
               jnp.asarray(classes), jnp.asarray(valid))
    print(f"batched_nms alone [b={b}, n={n}]: {t:.1f} ms")

    # reading-order argsort over b*max_det keys
    for m in (512, 1000):
        keys = jnp.asarray(
            rng.integers(0, 2**30, (b * m,)).astype(np.int32)
        )
        srt = jax.jit(lambda k: jnp.argsort(k)[: 24 * b])
        t = timeit(srt, keys)
        print(f"argsort [{b}*{m}]: {t:.1f} ms")

    # ROI crops + encoder
    n_crops = 24 * b
    rects = np.stack([
        rng.integers(0, 500, n_crops),
        np.zeros(n_crops, int),
        rng.integers(520, 640, n_crops),
        np.full(n_crops, 64),
    ], axis=1).astype(np.int32)
    flat_b = rng.integers(0, b, n_crops).astype(np.int32)
    cr = jax.jit(
        lambda im, r, fb: crop_lines_to_squares(
            im, r, fb, jnp.ones((n_crops,), bool), out_size=224, window=96
        )
    )
    t = timeit(cr, imgs, jnp.asarray(rects), jnp.asarray(flat_b))
    print(f"roi crops [{n_crops}]: {t:.1f} ms")

    encoder = create_encoder("mobilenetv3_small_050")
    enc_vars = encoder.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 224, 224, 1)), train=False
    )
    crops = cr(imgs, jnp.asarray(rects), jnp.asarray(flat_b))
    crops = jax.block_until_ready(crops)
    sub = math.gcd(n_crops, 2048)  # largest pow2 sub-batch dividing n_crops
    enc = jax.jit(
        lambda x: jax.lax.map(
            lambda s: encoder.apply(enc_vars, s, train=False),
            x.reshape(n_crops // sub, sub, *x.shape[1:]),
        )
    )
    t = timeit(enc, crops)
    print(f"encoder [{n_crops} crops, sub={sub}]: {t:.1f} ms")


if __name__ == "__main__":
    main()
