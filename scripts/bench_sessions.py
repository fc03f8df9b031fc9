"""Variance-honest north-star measurement: M separate bench sessions.

Round-4 verdict (weak #1/#7): the relay/link state between *sessions*
swings throughput far more (observed 661-1142 lines/s at identical
flags) than the <0.3% within-invocation spread, so a single bench.py
invocation — even median-of-3 passes — cannot see the real band, and
pinning on the best single-session number structurally selects for
best weather.

This runner executes each candidate spec as M (default 3) **separate
bench.py processes**, interleaved across candidates and spaced in time,
then writes per-candidate:

  <out>/<name>.sessions.jsonl   one JSON line per session (raw bench rows)
  <out>/<name>.result.json      aggregate row: value = MEDIAN across
                                sessions, plus min/max/sessions fields

scripts/pick_northstar.py scores multi-session rows by their **min**
(worst weather), so the pinned config is the one whose worst observed
session is best — the driver's end-of-round run then lands inside a
published band instead of under a best-case pin.

Timing semantics per session are unchanged (reference anchor:
/root/reference/infer_effocr_onnx_multi.py:394-395 — host decode
included, throughput and CER from the same invocation).

Usage:
  python scripts/bench_sessions.py --out DIR [--sessions 3] [--gap 180] \
      spec1.json [spec2.json ...]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def device_up(timeout_s=150.0):
    """Cheap pre-flight: can a fresh client enumerate the TPU right now?
    Relay outages freeze new clients indefinitely — probing first turns
    a 30-minute hung attempt into a 2.5-minute skip."""
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", f"{REPO}:/root/.axon_site")
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('up')"],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
        return "up" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def run_one(spec_path, env_extra=None):
    if not device_up():
        sys.stderr.write("# device probe failed (relay outage?); "
                         "skipping attempt\n")
        return None
    env = dict(os.environ)
    env["BENCH_TRAINED_SPEC"] = spec_path
    env.setdefault("PYTHONPATH", f"{REPO}:/root/.axon_site")
    if env_extra:
        env.update(env_extra)
    timeout_s = float(os.environ.get("BENCH_SESSION_TIMEOUT", "1800"))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        # relay outages freeze clients mid-init for tens of minutes;
        # recycle and retry — compile progress persists in the XLA cache
        sys.stderr.write(f"# session timed out ({timeout_s:.0f}s): "
                         f"{spec_path}\n")
        return None
    row = None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                pass
    if row is None:
        sys.stderr.write(
            f"# session produced no JSON row (rc={proc.returncode}):\n"
            + proc.stderr[-2000:] + "\n")
    return row


def aggregate(name, rows):
    vals = [r["value"] for r in rows]
    agg = dict(rows[-1])  # flags/corpus/etc from any session (identical)
    agg["value"] = round(statistics.median(vals), 2)
    agg["min"] = round(min(vals), 2)
    agg["max"] = round(max(vals), 2)
    agg["sessions"] = vals
    agg["n_sessions"] = len(vals)
    # CER is deterministic given flags+corpus; guard with worst observed
    cers = [r["cer"] for r in rows if "cer" in r]
    if cers:
        agg["cer"] = max(cers)
    agg["protocol"] = (
        "median across %d separate bench.py invocations; min is the "
        "worst-weather session (pinning criterion)" % len(vals))
    return agg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("specs", nargs="+")
    p.add_argument("--out", required=True)
    p.add_argument("--sessions", type=int, default=3)
    p.add_argument("--gap", type=float, default=180.0,
                   help="seconds to sleep between consecutive sessions "
                        "(lets the relay/link state decorrelate)")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # one measuring process per machine: overlapping benchers share the
    # chip and invalidate each other's numbers (round-5 postmortem — an
    # orphaned stage survived its chain's death and double-booked the
    # device).  flock is robust to crashes: the lock dies with us.
    import fcntl

    lock = open("/tmp/effocr_bench_sessions.lock", "w")
    try:
        fcntl.flock(lock, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        print("another bench_sessions holds the device lock; refusing to "
              "double-book the chip", file=sys.stderr)
        return 2

    names = [os.path.splitext(os.path.basename(s))[0] for s in args.specs]
    rows = {n: [] for n in names}
    first = True
    # keep attempting interleaved rounds until every config has its M
    # successful sessions (relay outages cost attempts, not sessions),
    # bounded so a dead relay cannot spin forever
    max_rounds = args.sessions * 3 + 2
    for si in range(max_rounds):
        if all(len(rows[n]) >= args.sessions for n in names):
            break
        for name, spec in zip(names, args.specs):
            if len(rows[name]) >= args.sessions:
                continue
            if not first:
                time.sleep(args.gap)
            first = False
            t0 = time.time()
            row = run_one(spec)
            dt = time.time() - t0
            if row is None:
                print(f"# [{time.strftime('%H:%M:%S')}] {name} attempt "
                      f"failed after {dt:.0f}s (relay?)", flush=True)
                continue
            row["session"] = len(rows[name])
            row["wall_s"] = round(dt, 1)
            rows[name].append(row)
            with open(os.path.join(args.out, f"{name}.sessions.jsonl"),
                      "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"# [{time.strftime('%H:%M:%S')}] {name} session "
                  f"{row['session']}: {row['value']} lines/s/chip "
                  f"(cer={row.get('cer')})", flush=True)

    for name in names:
        if not rows[name]:
            print(f"# {name}: no successful sessions")
            continue
        agg = aggregate(name, rows[name])
        with open(os.path.join(args.out, f"{name}.result.json"), "w") as f:
            f.write(json.dumps(agg) + "\n")
        print(json.dumps({k: agg[k] for k in
                          ("value", "min", "max", "sessions", "cer")
                          if k in agg} | {"name": name}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
