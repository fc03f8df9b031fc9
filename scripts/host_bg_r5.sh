#!/bin/bash
# Round-5 host-side background prep (pure CPU, runs while the chip
# trains): jp v3 corpus/tree (rebuild_jp3_host.sh) then the
# shifted-degradation suite from eval5k.  Serial on purpose — one host
# core; order matches when each output is needed by rebuild_r5b.sh.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
mkdir -p /root/drivejp/fonts
for f in /root/reference/japan_font_files/*.ttf; do
  ln -sf "$f" "/root/drivejp/fonts/$(basename "$f")"
done
ln -sf /usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf /root/drivejp/fonts/
ln -sf /usr/share/fonts/truetype/dejavu/DejaVuSans.ttf /root/drivejp/fonts/

bash "$REPO/scripts/rebuild_jp3_host.sh"

cd /root/drive2
if [ ! -e eval_degraded/done.marker ]; then
  env JAX_PLATFORMS=cpu python "$REPO/scripts/make_degraded_eval.py" \
    --src eval5k --out eval_degraded --n 2500 \
    && touch eval_degraded/done.marker
fi
echo "=== host_bg_r5 done"
