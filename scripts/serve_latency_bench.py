"""Serve-mode latency benchmark: p50/p95/p99 at offered loads.

Drives cli/serve.py's serve_loop core in-process with a paced arrival
stream (open-loop offered load, like a production frontend), recording
per-request latency = emit time - arrival time.  Requests ride the same
fused chunk pipeline as `infer`; a partial batch flushes when the oldest
request has waited --max_latency_ms (continuous batching).

Output: one JSON line per offered load with
{"offered_lps", "served_lps", "p50_ms", "p95_ms", "p99_ms", "max_ms",
 "n", "batch", "max_latency_ms"}.

Usage (pinned en artifacts):
  python scripts/serve_latency_bench.py --spec BENCH_TRAINED.json \
      --loads 100,300,600 --n 900 --max_latency_ms 50
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def paced_stream(items, rate, arrivals, tick=0.004):
    """Open-loop arrival process at `rate` items/s; None ticks between
    arrivals keep serve_loop's latency flush running."""
    t0 = time.monotonic()
    for i, (key, img) in enumerate(items):
        t_due = t0 + i / rate
        while True:
            now = time.monotonic()
            if now >= t_due:
                break
            yield None
            rem = t_due - time.monotonic()
            if rem > 0:
                time.sleep(min(tick, rem))
        arrivals[key] = time.monotonic()
        yield (key, img)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--spec", default=os.path.join(REPO, "BENCH_TRAINED.json"))
    p.add_argument("--loads", default="100,300,600",
                   help="offered loads, lines/s, comma-separated")
    p.add_argument("--n", type=int, default=900,
                   help="requests per load point")
    p.add_argument("--max_latency_ms", type=float, default=50.0)
    p.add_argument("--batch", type=int, default=64,
                   help="serving batch size; overrides the spec's "
                        "--line_batch (the canvas batch dim — a partial "
                        "flush pays the full line_batch-slot chunk, so "
                        "latency-oriented serving wants a small one)")
    p.add_argument("--out", default="",
                   help="also append JSON rows to this file (stdout can "
                        "carry engine-load prints)")
    args = p.parse_args()

    from effocr_tpu.cli.infer import add_engine_args, load_engine
    from effocr_tpu.cli.serve import serve_loop
    from effocr_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    with open(args.spec) as f:
        spec = json.load(f)
    flags = list(spec["flags"])
    if "--line_batch" in flags:
        flags[flags.index("--line_batch") + 1] = str(args.batch)
    else:
        flags += ["--line_batch", str(args.batch)]
    # crop capacity scales with the serving batch
    cb = 40 * args.batch
    if "--crop_batch" in flags:
        flags[flags.index("--crop_batch") + 1] = str(cb)
    # the encoder sub-batch must divide the crop capacity (engine
    # invariant: n_slots % sub == 0); the pinned spec's 2048 does not
    # divide e.g. 2560, so pick the largest power-of-two divisor <=4096
    # (falling back to one whole pass)
    sub = next((d for d in (4096, 2048, 1024, 512, 256)
                if cb % d == 0), cb)
    if "--encoder_sub_batch" in flags:
        flags[flags.index("--encoder_sub_batch") + 1] = str(min(sub, cb))
    else:
        flags += ["--encoder_sub_batch", str(min(sub, cb))]
    ep = argparse.ArgumentParser()
    add_engine_args(ep)
    eargs = ep.parse_args(flags)
    engine = load_engine(eargs)
    batch = args.batch

    from effocr_tpu.data.coco import load_json

    coco = load_json(spec["coco_json"])
    paths = [os.path.join(spec["image_dir"], x["file_name"])
             for x in coco["images"][: args.n]]

    # warm every chunk shape (full batch + a partial flush batch)
    engine.run(paths[:batch])
    engine.run(paths[: max(1, batch // 3)])

    for load in [float(x) for x in args.loads.split(",")]:
        arrivals, lat = {}, []
        done = {}

        def emit(key, text):
            done[key] = text
            lat.append(time.monotonic() - arrivals[key])

        items = [((i, pth), pth) for i, pth in enumerate(paths)]
        t0 = time.monotonic()
        served = serve_loop(
            engine, paced_stream(items, load, arrivals), emit, batch,
            max_latency_s=args.max_latency_ms / 1e3, stats_out=None)
        dt = time.monotonic() - t0
        ms = np.sort(np.asarray(lat) * 1e3)
        row = {
            "offered_lps": load,
            "served_lps": round(served / dt, 1),
            "p50_ms": round(float(np.percentile(ms, 50)), 1),
            "p95_ms": round(float(np.percentile(ms, 95)), 1),
            "p99_ms": round(float(np.percentile(ms, 99)), 1),
            "max_ms": round(float(ms[-1]), 1),
            "n": served,
            "batch": batch,
            "max_latency_ms": args.max_latency_ms,
        }
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
