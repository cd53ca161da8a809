#!/usr/bin/env bash
# Round-4 follow-up queue (after tools/round4_queue.sh): the remaining
# chip-serialized evidence runs. One chip — stages run strictly in
# order; each is resumable via .done markers in $WORK.
#
#   bash tools/round4b_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."

WORK=${WORK:-/tmp/r4b}
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

# 1. masked-std inverse-CWT A/B on the 20k CT checkpoint (B side of the
#    pitch-path fix; the A side already exists from round4_queue)
run maskstd env CORPUS=/tmp/qcorp CT_STEPS=20000 VOC_OUT=/tmp/voc_run \
    bash tools/run_maskstd_ab.sh

# 2. zero-shot redo (32 train voices, GE2E early-stop + holdout gate)
run zs_redo env ZS=/tmp/zscorp2 WORK=/tmp/zs_redo STEPS=8000 \
    bash tools/run_zeroshot_redo.sh

echo "== round-4b queue complete =="
