#!/bin/bash
# Block until a fresh JAX client can enumerate the TPU (relay outages
# freeze new clients indefinitely).  $1 = max seconds to wait (default
# 14400).  Exits 0 when up, 1 on budget exhaustion.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
budget="${1:-14400}"
t0=$(date +%s)
while true; do
  if PYTHONPATH="$REPO:/root/.axon_site" timeout 150 python -c \
      "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "device up after $(( $(date +%s) - t0 ))s"
    exit 0
  fi
  if [ $(( $(date +%s) - t0 )) -ge "$budget" ]; then
    echo "device still down after ${budget}s"
    exit 1
  fi
  sleep 60
done
