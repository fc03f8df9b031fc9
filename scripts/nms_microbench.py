"""Microbenchmark the fused OCR program's device stages in isolation.

Times (on whatever backend jax picks): host->device canvas transfer,
detector forward, decode+NMS at a sweep of max_nms sizes, the
reading-order argsort, ROI crops, and encoder sub-batches — each jitted
standalone, timed with block_until_ready.  Use to attribute the fused
program's latency before optimizing any single stage (DESIGN.md round-2
profile: detector 31 ms / decode+NMS 30 ms / encoder 34 ms /
crops+sort+retrieval 10 ms at line_batch=256, max_nms=1024, 64x640
canvas, mobilenetv3@224 on the relay-attached v5e chip).

Run:  python scripts/nms_microbench.py [--line_batch 256] [--canvas_h 64]
          [--canvas_w 640] [--encoder mobilenetv3_small_050]
          [--imsize 224] [--crops_per_line 24] [--crop_window 96]
          [--transfer_bits 4]
e.g. the trained en config: --canvas_w 1024 --encoder convnext_atto
          --imsize 128 --crops_per_line 33
"""

import argparse
import math
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

    p = argparse.ArgumentParser()
    p.add_argument("--line_batch", type=int, default=256)
    p.add_argument("--canvas_h", type=int, default=64)
    p.add_argument("--canvas_w", type=int, default=640)
    p.add_argument("--encoder", default="mobilenetv3_small_050")
    p.add_argument("--imsize", type=int, default=224)
    p.add_argument("--crops_per_line", type=int, default=24)
    p.add_argument("--crop_window", type=int, default=96)
    p.add_argument("--transfer_bits", type=int, default=4)
    args = p.parse_args()

    b, h, w = args.line_batch, args.canvas_h, args.canvas_w
    rng = np.random.default_rng(0)

    # host->device transfer of the packed canvas (the measured wall on the
    # relay-attached chip): time jnp.asarray + block_until_ready
    packed_w = w * args.transfer_bits // 8
    payload = rng.integers(0, 255, (b, h, packed_w)).astype(np.uint8)
    tr = lambda x: jnp.asarray(x)
    t_tr = timeit(tr, payload)
    mb = payload.nbytes / 1e6
    print(f"h2d transfer [{b},{h},{packed_w}] = {mb:.1f} MB: {t_tr:.1f} ms "
          f"({mb / t_tr * 1e3:.0f} MB/s)")

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
        for kern in ("xla", "pallas"):
            dn = jax.jit(
                lambda d, m=max_nms, k=kern: decode_and_nms(
                    d, conf_thresh=0.35, iou_thresh=0.01, max_nms=m,
                    max_det=min(m, 1000), nms_kernel=k,
                )
            )
            try:
                t = timeit(dn, decoded)
            except Exception as e:  # pallas lowering may fail off-TPU
                print(f"decode+NMS max_nms={max_nms:5d} [{kern}]: "
                      f"FAILED ({type(e).__name__})")
                continue
            print(f"decode+NMS max_nms={max_nms:5d} [{kern}]: {t:.1f} ms")

    # bare batched_nms on realistic box layouts (~28 glyphs/line kept)
    n = 1024
    boxes = np.zeros((b, n, 4), np.float32)
    xs = rng.uniform(0, w - 40, (b, n))
    boxes[..., 0] = xs
    boxes[..., 1] = rng.uniform(0, 8, (b, n))
    boxes[..., 2] = xs + rng.uniform(8, 26, (b, n))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(
        h - 24, h - 8, (b, n)
    )
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
    for m in (128, 512, 1000):
        keys = jnp.asarray(
            rng.integers(0, 2**30, (b * m,)).astype(np.int32)
        )
        srt = jax.jit(
            lambda k: jnp.argsort(k)[: args.crops_per_line * b]
        )
        t = timeit(srt, keys)
        print(f"argsort [{b}*{m}]: {t:.1f} ms")

    # ROI crops + encoder
    n_crops = args.crops_per_line * b
    rects = np.stack([
        rng.integers(0, w - 140, n_crops),
        np.zeros(n_crops, int),
        rng.integers(w - 120, w, n_crops),
        np.full(n_crops, h),
    ], axis=1).astype(np.int32)
    flat_b = rng.integers(0, b, n_crops).astype(np.int32)
    cr = jax.jit(
        lambda im, r, fb: crop_lines_to_squares(
            im, r, fb, jnp.ones((n_crops,), bool),
            out_size=args.imsize, window=args.crop_window,
        )
    )
    t = timeit(cr, imgs, jnp.asarray(rects), jnp.asarray(flat_b))
    print(f"roi crops [{n_crops}] -> {args.imsize}: {t:.1f} ms")

    encoder = create_encoder(args.encoder)
    enc_vars = encoder.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, args.imsize, args.imsize, 1)), train=False,
    )
    crops = cr(imgs, jnp.asarray(rects), jnp.asarray(flat_b))
    crops = jax.block_until_ready(crops)
    # pipeline geometry: crop slots are a fixed sub-batch multiple
    sub = 2048
    n_enc = int(math.ceil(n_crops / sub)) * sub
    pad = jnp.zeros((n_enc - n_crops, *crops.shape[1:]), crops.dtype)
    crops_p = jnp.concatenate([crops, pad]) if n_enc > n_crops else crops
    crops_p = jax.block_until_ready(crops_p)
    enc = jax.jit(
        lambda x: jax.lax.map(
            lambda s: encoder.apply(enc_vars, s, train=False),
            x.reshape(n_enc // sub, sub, *x.shape[1:]),
        )
    )
    t = timeit(enc, crops_p)
    print(f"encoder {args.encoder}@{args.imsize} "
          f"[{n_enc} crop slots, sub={sub}]: {t:.1f} ms")


if __name__ == "__main__":
    main()
