#!/bin/bash
# Round-5 TPU evidence runbook — run when the relay is back.
# Each stage is budgeted and independent; partial completion still
# leaves its evidence on disk. Usage:
#   bash tools/round5_tpu_runbook.sh [stage...]
# stages: ab bench bake   (default: all, in that order)
set -u
cd "$(dirname "$0")/.."
STAGES=${*:-"ab bench bake"}

if ! ps -eo cmd | grep -q "[t]pu_init"; then
  echo "relay DOWN — aborting (nothing here works without it)"
  exit 1
fi

run_ab() {
  echo "=== Pallas A/B (einsum vs *_pl for all six heads) ==="
  # einsum heads first (their sigs are mostly cached from r4), then
  # the pallas twins (cold compiles, serialized 2-at-a-time)
  env IMAGEKIT_PALLAS_YUV=1 IMAGEKIT_PALLAS_JPEG8=1 \
      IMAGEKIT_PALLAS_RGB=1 IMAGEKIT_PALLAS_JXC=1 \
      IMAGEKIT_PALLAS_YUVJPG=1 IMAGEKIT_PALLAS_RGBJPG=1 \
    timeout 3600 python tools/device_resident_bench.py \
      --nb 32 --windows 3 \
      --heads jpeg8,jpeg8_pl,yuvsrc,yuvsrc_pl,jxc,jxc_pl,rgbyuv,rgbyuv_pl,yuvjpg,yuvjpg_pl,rgbjpg,rgbjpg_pl \
    | tee /tmp/pallas_ab_r5.json
  echo "A/B written to /tmp/pallas_ab_r5.json — update BASELINE.md"
}

run_bench() {
  echo "=== bench.py certification run (budgeted, staged) ==="
  timeout 1800 python bench.py | tee /tmp/bench_r5.json
  echo "(partial checkpoints in BENCH_partial.json)"
}

run_bake() {
  echo "=== refresh baked compile cache ==="
  timeout 1800 python tools/bake_compile_cache.py
  git status --short baked_cache/ | head
}

for s in $STAGES; do
  case "$s" in
    ab) run_ab ;;
    bench) run_bench ;;
    bake) run_bake ;;
    *) echo "unknown stage $s" ;;
  esac
done
