"""Continuous OCR serving: stdin paths or a watched directory -> JSONL.

The production-serving counterpart of the batch `infer` CLI (the
reference has no serving mode; its closest analogue is the thread-pooled
driver loop of infer_effocr_onnx_multi.py:227-247).  TPU-native design:
requests accumulate into fixed-shape line batches (continuous batching —
a chunk dispatches when line_batch requests are waiting OR the oldest
request exceeds --max_latency_ms), ride the same fused single-program
pipeline as `infer` (one transfer + one fetch per chunk), and scale over
chips with --data_parallel.

Modes:
  --stdin       read one image path per line from stdin; emit one JSON
                object per line to stdout ({"path", "text"}), in input
                order.  EOF drains and exits.
  --watch_dir   poll a directory for new image files; append results to
                --out JSONL; processed files are remembered (and skipped)
                for the life of the process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Callable, Iterable, Iterator, Optional, Tuple


def serve_loop(
    engine,
    requests: Iterable[Tuple[str, "object"]],
    emit: Callable[[str, str], None],
    batch_size: int,
    max_latency_s: float = 0.05,
    now: Callable[[], float] = time.monotonic,
    stats_out=sys.stderr,
) -> int:
    """Continuous-batching core, separated from I/O for testability.

    requests: iterable of (key, image) — image is a path or HWC uint8
    array; a None item is a poll tick (flush-latency check against the
    oldest queued request).  emit(key, text) is called per result in
    request order.  Returns the number of lines served.
    """
    queue: list = []
    oldest: Optional[float] = None
    served = 0
    t0 = now()

    def flush():
        nonlocal served, oldest
        if not queue:
            return
        keys = [k for k, _ in queue]
        imgs = [im for _, im in queue]
        results = engine.run(imgs)
        # engine.run keys string inputs by path, arrays by position
        for i, k in enumerate(keys):
            r = results[imgs[i]] if isinstance(imgs[i], str) else results[i]
            emit(k, r)
        served += len(queue)
        queue.clear()
        oldest = None

    for item in requests:
        if item is not None:
            queue.append(item)
            if oldest is None:
                oldest = now()
        if len(queue) >= batch_size:
            flush()
        elif queue and oldest is not None and now() - oldest >= max_latency_s:
            flush()
    flush()
    dt = max(now() - t0, 1e-9)
    if stats_out is not None:
        print(f"served {served} lines in {dt:.2f}s "
              f"({served / dt:.1f} lines/s)", file=stats_out)
    return served


def _stdin_requests() -> Iterator:
    for line in sys.stdin:
        path = line.strip()
        if path:
            yield (path, path)


def _watch_requests(watch_dir: str, poll_s: float,
                    stop_after_s: float = 0.0) -> Iterator:
    """Yield new image files as they appear; None ticks drive latency
    flushes while idle."""
    exts = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}
    seen = set()
    t0 = time.monotonic()
    while True:
        found = False
        for name in sorted(os.listdir(watch_dir)):
            if os.path.splitext(name)[1].lower() not in exts:
                continue
            path = os.path.join(watch_dir, name)
            if path in seen:
                continue
            seen.add(path)
            found = True
            yield (path, path)
        if not found:
            yield None
            time.sleep(poll_s)
        if stop_after_s and time.monotonic() - t0 >= stop_after_s:
            return


def main():
    from effocr_tpu.cli.infer import load_engine

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--recognizer_dir", type=str, required=True)
    p.add_argument("--localizer_dir", type=str, required=True)
    p.add_argument("--lang", type=str, required=True, choices=["en", "jp"])
    p.add_argument("--vertical", action="store_true", default=False)
    p.add_argument("--stdin", action="store_true", default=False)
    p.add_argument("--watch_dir", type=str, default=None)
    p.add_argument("--out", type=str, default=None,
                   help="JSONL output path (watch mode; default stdout)")
    p.add_argument("--max_latency_ms", type=float, default=200.0,
                   help="flush a partial batch when the oldest request "
                        "has waited this long")
    p.add_argument("--poll_ms", type=float, default=100.0)
    p.add_argument("--stop_after_s", type=float, default=0.0,
                   help="watch mode: exit after this many seconds "
                        "(0 = run forever)")
    # engine knobs shared with `infer`
    p.add_argument("--input_height", type=int, default=None)
    p.add_argument("--localizer_conf_thresh", type=float, default=0.3)
    p.add_argument("--localizer_iou_thresh", type=float, default=0.15)
    p.add_argument("--anchor_margin", type=float, default=None)
    p.add_argument("--spell_check", action="store_true", default=False)
    p.add_argument("--dictionary_path", type=str, default=None)
    p.add_argument("--crop_source", type=str, default="letterbox")
    p.add_argument("--retrieval_kernel", type=str, default="xla")
    p.add_argument("--transfer_bits", type=int, default=8,
                   choices=[2, 4, 8])
    p.add_argument("--line_batch", type=int, default=16)
    p.add_argument("--crop_batch", type=int, default=512)
    p.add_argument("--adaptive_height", action="store_true", default=False)
    p.add_argument("--crop_window", type=int, default=256)
    p.add_argument("--data_parallel", action="store_true", default=False)
    p.add_argument("--build_index_from", type=str, default=None)
    p.add_argument("--blacklist_chars", type=str, default=None)
    p.add_argument("--render_font_name", type=str,
                   default="NotoSerif-Regular")
    args = p.parse_args()

    if not (args.stdin or args.watch_dir):
        p.error("pick a source: --stdin or --watch_dir")

    engine = load_engine(args)

    if args.out:
        sink_f = open(args.out, "a", buffering=1)
    else:
        sink_f = sys.stdout

    def emit(key, text):
        sink_f.write(json.dumps({"path": key, "text": text},
                                ensure_ascii=False) + "\n")
        sink_f.flush()

    requests = (_stdin_requests() if args.stdin
                else _watch_requests(args.watch_dir, args.poll_ms / 1e3,
                                     args.stop_after_s))
    serve_loop(engine, requests, emit, args.line_batch,
               max_latency_s=args.max_latency_ms / 1e3)
    if args.out:
        sink_f.close()


if __name__ == "__main__":
    main()
