"""Pick the winning trained-artifact bench config and pin it.

Scans the on-chip sweep results (``/root/drive2/sweep_r3/*.result.json``,
each written by one ``bench.py`` run_trained invocation) and rewrites the
repo-root ``BENCH_TRAINED.json`` so the driver's end-of-round ``bench.py``
run measures the demonstrated north-star configuration (reference timing
semantics: /root/reference/infer_effocr_onnx_multi.py:394-395).

Selection rule (the coupled north-star, BASELINE.json):
  1. among results with CER <= CER_BUDGET (the round-2 trained-artifact
     CER, 0.0593) whose **worst separate session** still clears the
     TARGET (625 lines/s/chip), pin the most ACCURATE (lowest CER) —
     once the throughput bar is met at worst weather, the remaining
     margin should not be bought with accuracy (round-4 verdict weak
     #3/#6: the 2-bit dither traded 10.7 points of exact-line for 4%
     of throughput the pin didn't need).  Multi-session rows only
     (scripts/bench_sessions.py aggregates carrying "min"/"sessions");
     one sample cannot attest worst weather.
  2. otherwise take the highest worst-weather lines/s/chip among
     CER-passing rows (multi-session rows score by their MIN across
     separate invocations; single-session rows by their value).
     Round-4 verdict weak #1/#7: between-session relay variance spans
     -42% from a best-case pin, so pinning on a single session's
     median selects for weather.
  3. if none pass the CER budget, take the lowest-CER result instead
     (never pin a config that trades away the accuracy half).

The pinned flags are exactly the measured winner's — nothing is appended,
so the driver's rerun reproduces the recorded row.  The pinned spec also
carries the observed "band" {min, median, max, sessions} so bench.py can
echo it into the driver's BENCH_r{N}.json.
"""

import glob
import json
import os
import sys

CER_BUDGET = 0.0593
TARGET = 5000.0 / 8.0  # per-chip north-star (BASELINE.json)
# Round-4 sweeps land in sweep_r4; older dirs are still scanned so the
# best measured config wins regardless of which round produced it.
SWEEP_DIRS = os.environ.get(
    "NORTHSTAR_SWEEP_DIRS",
    "/root/drive2/sweep_r4:/root/drive2/sweep_r3",
).split(":")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_results(sweep_dir):
    out = []
    for path in sorted(glob.glob(os.path.join(sweep_dir, "*.result.json"))):
        try:
            with open(path) as f:
                lines = [l for l in f if l.startswith("{")]
            if not lines:
                continue
            r = json.loads(lines[-1])
        except (json.JSONDecodeError, OSError):
            continue
        if r.get("weights") != "trained" or "cer" not in r:
            continue
        r["_path"] = path
        out.append(r)
    return out


def flag_value(flags, name):
    for i, f in enumerate(flags):
        if f == name and i + 1 < len(flags):
            return flags[i + 1]
    return None


def select_winner(results):
    def worst(r):
        # worst observed session; single-session rows fall back to their
        # (one) median value
        return r.get("min", r["value"])

    passing = [r for r in results if r["cer"] <= CER_BUDGET]
    if not passing:
        return min(results, key=lambda r: r["cer"])
    clears = [r for r in passing if "sessions" in r and worst(r) >= TARGET]
    if clears:
        # throughput bar met at worst weather -> accuracy decides
        return min(clears, key=lambda r: r["cer"])
    return max(passing, key=worst)


def main():
    results = []
    for d in SWEEP_DIRS:
        results.extend(load_results(d))
    if not results:
        print("no trained sweep results found; leaving BENCH_TRAINED.json")
        return 1
    winner = select_winner(results)

    flags = list(winner["flags"])
    rec_dir = flag_value(flags, "--recognizer_dir")
    loc_dir = flag_value(flags, "--localizer_dir")
    artifacts = [
        os.path.join(rec_dir, "ref.npz"),
        os.path.join(rec_dir, "enc_best.msgpack"),
        os.path.join(loc_dir, "best_bbox_mAP.msgpack"),
    ]
    missing = [a for a in artifacts if not os.path.exists(a)]
    if missing:
        print(f"winner artifacts missing: {missing}; not pinning")
        return 1

    if "sessions" in winner:
        headline = (f"median {winner['value']} [{winner['min']}-"
                    f"{winner['max']}] lines/s/chip over "
                    f"{len(winner['sessions'])} separate sessions")
    else:
        headline = f"{winner['value']} lines/s/chip (single session)"
    spec = {
        "comment": (
            "Coupled north-star spec (auto-pinned by scripts/pick_northstar.py"
            f" from {os.path.basename(winner['_path'])}: "
            f"{headline} @ CER {winner['cer']:.4f}; pinned on worst-of-N "
            "sessions). bench.py run_trained reports lines/s/chip AND CER "
            "from the same invocation; falls back to the synthetic config "
            "when the host artifacts are absent."
        ),
        "image_dir": os.path.join(
            os.path.dirname(winner["corpus"]), "images"
        ),
        "coco_json": winner["corpus"],
        "max_lines": 5000,
        "artifacts": artifacts,
        "flags": flags,
    }
    if "sessions" in winner:
        spec["band"] = {
            "median": winner["value"], "min": winner["min"],
            "max": winner["max"], "sessions": winner["sessions"],
            "protocol": winner.get("protocol", ""),
        }
    out_path = os.path.join(REPO, "BENCH_TRAINED.json")
    with open(out_path, "w") as f:
        json.dump(spec, f, indent=2)
        f.write("\n")
    print(
        f"pinned {os.path.basename(winner['_path'])}: "
        f"{winner['value']} lines/s/chip @ CER {winner['cer']:.4f} "
        f"(acc {winner.get('textline_accuracy')}) -> {out_path}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
