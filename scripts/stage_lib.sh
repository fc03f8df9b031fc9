# Guarded stage helper shared by the rebuild/chain scripts.
#
# Round-3 postmortem (VERDICT weak #4): `set -e` chains drained an
# unattended queue when one stage's output went missing (a stage timeout
# killed post-train hns mining mid-stage; the next stage crashed on the
# absent file and took the rest of the queue with it).  This helper makes
# every stage:
#   * skippable   — a done-marker file short-circuits re-entry,
#   * guarded     — declared input files are checked BEFORE running,
#   * bounded     — its own timeout, not one shared budget,
#   * non-fatal   — failures are logged and counted; the chain continues.
#
# Usage (from a chain script; do NOT `set -e` in the caller):
#   source "$REPO/scripts/stage_lib.sh"
#   stage NAME DONE_FILE TIMEOUT_S [REQ_FILE ...] -- CMD ARGS...
#   ...
#   stage_summary            # prints pass/fail table, exits 1 if any failed
#
# DONE_FILE of "-" means "always run" (for idempotent stages).

STAGE_FAILURES=()
STAGE_RESULTS=()

_stage_log() { echo "=== $(date -u +%H:%M:%S) stage[$1]: $2"; }

stage() {
  local name="$1" done_file="$2" timeout_s="$3"
  shift 3
  local reqs=()
  while [ "$1" != "--" ]; do reqs+=("$1"); shift; done
  shift # consume --

  if [ "$done_file" != "-" ] && [ -e "$done_file" ]; then
    _stage_log "$name" "SKIP (done: $done_file)"
    STAGE_RESULTS+=("$name: skip")
    return 0
  fi
  local r
  for r in "${reqs[@]}"; do
    if [ ! -e "$r" ]; then
      _stage_log "$name" "FAILED-PRECONDITION (missing: $r)"
      STAGE_FAILURES+=("$name (missing $r)")
      STAGE_RESULTS+=("$name: precondition-failed $r")
      return 0
    fi
  done
  _stage_log "$name" "RUN (timeout ${timeout_s}s): $*"
  local t0 rc
  t0=$(date +%s)
  timeout "$timeout_s" "$@"
  rc=$?
  local dt=$(( $(date +%s) - t0 ))
  if [ $rc -eq 0 ]; then
    _stage_log "$name" "OK (${dt}s)"
    STAGE_RESULTS+=("$name: ok ${dt}s")
  elif [ $rc -eq 124 ]; then
    _stage_log "$name" "TIMEOUT after ${dt}s — outputs may be partial"
    STAGE_FAILURES+=("$name (timeout)")
    STAGE_RESULTS+=("$name: timeout ${dt}s")
  else
    _stage_log "$name" "FAILED rc=$rc (${dt}s)"
    STAGE_FAILURES+=("$name (rc=$rc)")
    STAGE_RESULTS+=("$name: failed rc=$rc ${dt}s")
  fi
  return 0
}

stage_summary() {
  echo "=== $(date -u +%H:%M:%S) chain summary:"
  local s
  for s in "${STAGE_RESULTS[@]}"; do echo "    $s"; done
  if [ ${#STAGE_FAILURES[@]} -gt 0 ]; then
    echo "    FAILURES: ${STAGE_FAILURES[*]}"
    return 1
  fi
  return 0
}
