"""End-to-end throughput benchmark: text-line images/sec/chip.

Measures the full pipeline (host letterbox -> detector -> decode+NMS ->
on-device ROI crops -> encoder -> kNN decode -> postprocess) on synthetic
newspaper-style lines, with the reference's headline fast config
(yolov5s localizer + mobilenetv3_small_050 recognizer, README.md:133-135).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the fraction of the per-chip north-star target
(5,000 lines/s on v5e-8 => 625 lines/s/chip, BASELINE.json).
"""

import json
import os
import sys
import time

import numpy as np


def make_synthetic_lines(n, seed=0, chars_per_line=24):
    """Text-line-shaped uint8 images with glyph-like dark blobs."""
    rng = np.random.default_rng(seed)
    lines = []
    for _ in range(n):
        w = int(rng.integers(700, 1100))
        h = int(rng.integers(40, 64))
        img = np.full((h, w, 3), 255, np.uint8)
        x = 8
        for _ in range(chars_per_line):
            cw = int(rng.integers(12, 26))
            if x + cw >= w - 8:
                break
            y0 = int(rng.integers(4, 10))
            y1 = h - int(rng.integers(4, 10))
            img[y0:y1, x : x + cw] = rng.integers(
                0, 90, (y1 - y0, cw, 3)
            ).astype(np.uint8)
            x += cw + int(rng.integers(4, 12))
        lines.append(img)
    return lines


def run_trained(spec):
    """Coupled north-star bench: trained artifacts on a real held-out corpus.

    `spec` (repo-root BENCH_TRAINED.json, or $BENCH_TRAINED_SPEC) pins the
    exact engine flags + corpus of the demonstrated configuration, so the
    recorded number is the honest trained-artifact one — throughput AND CER
    from the same invocation (timing semantics match the reference:
    infer_effocr_onnx_multi.py:394-395, host decode included).
    """
    import argparse

    from effocr_tpu.cli.infer import add_engine_args, load_engine
    from effocr_tpu.core.cache import enable_persistent_cache
    from effocr_tpu.data.coco import load_json
    from effocr_tpu.eval.textline import textline_evaluation

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    add_engine_args(p)
    args = p.parse_args(spec["flags"])
    engine = load_engine(args)

    coco = load_json(spec["coco_json"])
    images = coco["images"][: spec.get("max_lines", 4096)]
    paths = [os.path.join(spec["image_dir"], x["file_name"]) for x in images]

    engine.run(paths[: engine.config.line_batch])   # compile
    engine.run(paths)                               # warm every chunk shape

    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    engine.timer.reset()          # profile the timed region only
    samples, results = [], None
    for _ in range(repeats):
        start = time.time()
        results = engine.run(paths)
        samples.append(len(paths) / (time.time() - start))
    lines_per_sec = float(np.median(samples))
    print(f"# samples: {[round(s, 1) for s in samples]}", file=sys.stderr)
    if os.environ.get("BENCH_PROFILE"):
        print("# stage wall-clock split (all timed repeats):\n"
              + engine.timer.report(), file=sys.stderr)

    by_name = {os.path.basename(str(k)): v for k, v in results.items()}
    pairs = [(x["text"], by_name.get(x["file_name"]) or "") for x in images]
    acc, cer = textline_evaluation(
        pairs, print_incorrect=False, no_spaces_in_eval=False,
        norm_edit_distance=False, uncased=False,
    )
    target_per_chip = 5000.0 / 8.0
    out = {
        "metric": "textline_images_per_sec_per_chip",
        "value": round(lines_per_sec, 2),
        "unit": "lines/s/chip",
        "vs_baseline": round(lines_per_sec / target_per_chip, 4),
        "weights": "trained",
        "corpus": spec["coco_json"],
        "n_lines": len(paths),
        "cer": cer,
        "textline_accuracy": acc,
        "flags": spec["flags"],
        "pass_samples": [round(s, 1) for s in samples],
    }
    if "band" in spec:
        # the multi-session band this config was pinned under
        # (scripts/bench_sessions.py; between-session relay variance is
        # the dominant noise source — this run is ONE more session and
        # should land inside the band)
        out["pinned_band"] = spec["band"]
    print(json.dumps(out))


def main():
    import jax

    from effocr_tpu.core.cache import enable_persistent_cache

    spec_path = os.environ.get(
        "BENCH_TRAINED_SPEC",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_TRAINED.json"),
    )
    if os.path.exists(spec_path) and not os.environ.get("BENCH_SYNTHETIC"):
        with open(spec_path) as f:
            spec = json.load(f)
        # fall back to the synthetic bench when the pinned artifacts are
        # not present on this host (fresh clone)
        if all(os.path.exists(spec[k]) for k in
               ("image_dir", "coco_json")) and all(
                   os.path.exists(v) for v in spec.get("artifacts", [])):
            run_trained(spec)
            return
        print("# BENCH_TRAINED.json present but artifacts missing -> "
              "synthetic fallback", file=sys.stderr)

    enable_persistent_cache()
    import jax.numpy as jnp

    from effocr_tpu.core.config import (
        EncoderConfig,
        LocalizerConfig,
        PipelineConfig,
    )
    from effocr_tpu.models import create_encoder, create_localizer
    from effocr_tpu.pipelines.infer import EffOCRInference
    from effocr_tpu.retrieval.index import PrototypeIndex

    line_batch = int(os.environ.get("BENCH_LINE_BATCH", "256"))
    n_lines = int(os.environ.get("BENCH_LINES", str(4 * line_batch)))
    lines = make_synthetic_lines(n_lines)

    channels = int(os.environ.get("BENCH_CHANNELS", "1"))
    bits = int(os.environ.get("BENCH_BITS", "4"))
    enc_size = int(os.environ.get("BENCH_ENC_SIZE", "224"))
    localizer = create_localizer("yolov5s", num_classes=2)
    loc_vars = localizer.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 640, channels)),
        train=False,
    )
    encoder = create_encoder("mobilenetv3_small_050")
    enc_vars = encoder.init(
        jax.random.PRNGKey(1), jnp.zeros((1, enc_size, enc_size, channels)),
        train=False,
    )
    # synthetic prototype index, realistic class count (en charset ~ 88;
    # use 1024 to be conservative about the retrieval matmul)
    protos = np.random.default_rng(2).normal(size=(1024, 1024)).astype(
        np.float32
    )
    chars = [chr(0x4E00 + i) for i in range(1024)]
    index = PrototypeIndex(protos, chars)

    cfg = PipelineConfig(
        lang="en",
        # adaptive rectangular canvas: text lines are width-bound, so the
        # chunk's canvas height shrinks to the smallest stride-32 tier that
        # holds the content (64 px for newspaper-aspect lines) — same
        # letterbox geometry as a 192x640 canvas but 3x fewer bytes over
        # the host->device link and 3x fewer detector pixels
        # BENCH_MAX_NMS / BENCH_MAX_DET: NMS candidate / output caps.
        # Defaults match the reference contract (max_det=1000); text
        # lines carry <=64 glyphs, so tighter caps are decode-identical
        # on this workload while the [N,N] suppression work shrinks
        # quadratically — sweep on-chip before changing the default.
        localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.01,
                                  input_height=192,
                                  max_nms=int(os.environ.get(
                                      "BENCH_MAX_NMS", "1024")),
                                  max_det=int(os.environ.get(
                                      "BENCH_MAX_DET", "1000"))),
        encoder=EncoderConfig(arch="mobilenetv3_small_050",
                              image_size=enc_size),
        adaptive_height=True,
        # 4-bit packed transfer: halves host->device bytes (the measured
        # wall); decode-identical on printed lines (tests/test_pipeline_e2e
        # + CER parity on the trained demo corpus, BENCH_ACCURACY.md)
        transfer_bits=bits,
        line_batch=line_batch,
        crop_batch=24 * line_batch,
        encoder_sub_batch=min(2048, 24 * line_batch),
        crop_window=96,
        input_channels=channels,
        transfer="canvas",
        prefetch_chunks=int(os.environ.get("BENCH_PREFETCH", "3")),
    )
    engine = EffOCRInference(cfg, localizer, loc_vars, encoder, enc_vars,
                             index)

    # warmup (compile + executable upload + relay ramp): one chunk first
    # (triggers the compile), then a full untimed pass so every chunk
    # shape/path is warm — the first full run otherwise pays one-time
    # costs (cache deserialization, AOT upload) that the median-of-3 is
    # meant to exclude
    engine.run(lines[: cfg.line_batch])
    engine.run(lines)

    # median of N runs: the TPU sits behind a shared relay whose
    # throughput varies run to run; a single sample is noise
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    samples = []
    for _ in range(repeats):
        start = time.time()
        results = engine.run(lines)
        samples.append(len(lines) / (time.time() - start))
    lines_per_sec = float(np.median(samples))
    print(
        f"# samples: {[round(s, 1) for s in samples]}", file=sys.stderr
    )
    target_per_chip = 5000.0 / 8.0
    print(json.dumps({
        "metric": "textline_images_per_sec_per_chip",
        "value": round(lines_per_sec, 2),
        "unit": "lines/s/chip",
        "vs_baseline": round(lines_per_sec / target_per_chip, 4),
        # provenance: this is the throughput half of the north-star only —
        # random weights on synthetic lines; trained-artifact CER-parity
        # numbers live in BENCH_ACCURACY.md
        "weights": "random",
        "corpus": "synthetic",
        "input_channels": channels,
        "transfer_bits": bits,
        "line_batch": line_batch,
    }))


if __name__ == "__main__":
    main()
