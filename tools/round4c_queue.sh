#!/usr/bin/env bash
# Round-4c chip queue (after tools/round4b_queue.sh):
#   1. zero-shot redo on the REGENERATED corpus — the first redo's
#      GE2E gate correctly aborted because an iid-sampled holdout voice
#      (v32) landed ~0.1 from a train voice; holdout profiles now keep
#      >=0.3 normalized distance (cmtts_tpu/data/synthcorpus.py).
#   2. HiFi-GAN serving re-sweep AFTER the Synthesizer device-commit
#      fix — the first sweep re-uploaded ~50 MB of host-numpy vocoder
#      params per request (p50 7.5 s vs Griffin-Lim's 2.9 s).
#
#   bash tools/round4c_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."

WORK=${WORK:-/tmp/r4c}
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

run zs_redo2 env ZS=/tmp/zscorp3 WORK=/tmp/zs_redo2 STEPS=8000 \
    bash tools/run_zeroshot_redo.sh

run serve_hifigan2 env CORPUS=/tmp/qcorp STEP=20000 PORT=18322 \
    VOC=hifigan VOC_CKPT=/tmp/voc_run/hifigan/hifigan_gen_00010000.npz \
    OUT=/tmp/serve_hifigan2.json \
    bash tools/run_serve_bench.sh

echo "== round-4c queue complete =="
