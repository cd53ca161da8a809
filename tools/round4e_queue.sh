#!/usr/bin/env bash
# Round-4e chip queue (after tools/round4d_queue.sh):
#   1. zero-shot redo #3 — DENSE speaker coverage. The 32-voice GE2E
#      separated its training voices (val EER 0.009) but its embedding
#      space had ~zero correlation with voice-profile similarity, so
#      unseen voices projected onto arbitrary train directions
#      (utterance-level top-1 ~0.4, see tools/check_ge2e_holdout.py).
#      128 train voices force a smooth voice map; the reworked
#      like-for-like gate (utterance top-1 + margin) verifies it.
#   2. serving re-sweep with full priming coverage — the first
#      post-fix sweep lazily compiled the B=2/B=4 buckets mid-sweep
#      (c=4 p90 32 s was one compile, not steady state).
#
#   bash tools/round4e_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."

WORK=${WORK:-/tmp/r4e}
mkdir -p "$WORK"

run() {
  local name=$1; shift
  if [ -f "$WORK/$name.done" ]; then echo "== [$name] cached =="; return; fi
  echo "== [$name] start $(date +%T) =="
  if "$@" > "$WORK/$name.log" 2>&1; then
    touch "$WORK/$name.done"
    echo "== [$name] done  $(date +%T) =="
  else
    echo "== [$name] FAILED (see $WORK/$name.log) =="
  fi
}

run zs_redo3 env ZS=/tmp/zscorp4 WORK=/tmp/zs_redo3 STEPS=8000 \
    SPEAKERS=130 UTTS=20 HOLDOUT=2 VAL_SPK=6 \
    bash tools/run_zeroshot_redo.sh

run serve_hifigan3 env CORPUS=/tmp/qcorp STEP=20000 PORT=18323 \
    VOC=hifigan VOC_CKPT=/tmp/voc_run/hifigan/hifigan_gen_00010000.npz \
    OUT=/tmp/serve_hifigan3.json \
    bash tools/run_serve_bench.sh

echo "== round-4e queue complete =="
