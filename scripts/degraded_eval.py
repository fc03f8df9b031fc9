"""Score the pinned artifacts across the shifted-degradation suite.

Loads ONE engine from a BENCH_TRAINED-style spec and runs every variant
dir produced by scripts/make_degraded_eval.py, scoring each with the
reference's textline_evaluation semantics.  Prints one JSON row per
variant and writes a summary table to <suite>/degraded_results.json.

Optionally scores a second localizer (--alt_localizer_dir NAME=path
pairs, e.g. the --augment detector A/B checkpoint) over the same
variants to show which training knob recovers the degraded domains.

Usage:
  python scripts/degraded_eval.py --suite /root/drive2/eval_degraded \
      [--spec BENCH_TRAINED.json] [--alt_localizer aug=/path/loc2k_aug]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_suite(engine, suite, variants):
    from effocr_tpu.data.coco import load_json
    from effocr_tpu.eval.textline import textline_evaluation

    rows = []
    for variant in variants:
        vdir = os.path.join(suite, variant)
        cj = os.path.join(vdir, "corpus.json")
        if not os.path.exists(cj):
            print(f"# skip {variant}: no corpus.json", file=sys.stderr)
            continue
        coco = load_json(cj)
        paths = [os.path.join(vdir, "images", x["file_name"])
                 for x in coco["images"]]
        t0 = time.time()
        results = engine.run(paths)
        dt = time.time() - t0
        by_name = {os.path.basename(str(k)): v for k, v in results.items()}
        pairs = [(x["text"], by_name.get(x["file_name"]) or "")
                 for x in coco["images"]]
        acc, cer = textline_evaluation(
            pairs, print_incorrect=False, no_spaces_in_eval=False,
            norm_edit_distance=False, uncased=False)
        row = {"variant": variant, "n_lines": len(paths),
               "cer": round(cer, 5), "textline_accuracy": round(acc, 2),
               "lines_per_sec": round(len(paths) / dt, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", required=True)
    p.add_argument("--spec", default=os.path.join(REPO, "BENCH_TRAINED.json"))
    p.add_argument("--variants", default="")
    p.add_argument("--alt_localizer", action="append", default=[],
                   help="NAME=localizer_dir: score the same suite with an "
                        "alternate detector checkpoint (e.g. --augment A/B)")
    args = p.parse_args()

    from effocr_tpu.cli.infer import add_engine_args, load_engine
    from effocr_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    with open(args.spec) as f:
        spec = json.load(f)

    variants = (args.variants.split(",") if args.variants else
                sorted(d for d in os.listdir(args.suite)
                       if os.path.isdir(os.path.join(args.suite, d))))

    out = {"spec_flags": spec["flags"], "suites": {}}
    ep = argparse.ArgumentParser()
    add_engine_args(ep)
    engine = load_engine(ep.parse_args(spec["flags"]))
    out["suites"]["pinned"] = run_suite(engine, args.suite, variants)

    for pair in args.alt_localizer:
        name, loc_dir = pair.split("=", 1)
        flags = list(spec["flags"])
        i = flags.index("--localizer_dir")
        flags[i + 1] = loc_dir
        alt = load_engine(ep.parse_args(flags))
        print(f"# alt localizer {name}: {loc_dir}", file=sys.stderr)
        out["suites"][name] = run_suite(alt, args.suite, variants)

    dst = os.path.join(args.suite, "degraded_results.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(f"# wrote {dst}", file=sys.stderr)


if __name__ == "__main__":
    main()
