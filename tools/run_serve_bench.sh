#!/usr/bin/env bash
# On-chip serving load benchmark (VERDICT r3 next #7): start cli/serve.py
# against the quality-run checkpoint, sweep concurrency with
# tools/bench_serve.py, write SERVE_r04.json (latency percentiles,
# throughput, and the /healthz batch-histogram delta proving micro-batch
# coalescing), then shut the server down.
#
#   CORPUS=/tmp/qcorp STEP=20000 OUT=SERVE_r04.json bash tools/run_serve_bench.sh
set -uo pipefail
cd "$(dirname "$0")/.."

CORPUS=${CORPUS:-/tmp/qcorp}
STEP=${STEP:-20000}
PORT=${PORT:-18321}
OUT=${OUT:-SERVE_r04.json}
VOC=${VOC:-griffinlim}            # or: hifigan + VOC_CKPT=<npz>
LOG=/tmp/serve_bench.log

# NOT --warmup_all: the full (text x mel x B) ladder is ~100 graphs
# (~40 min of tunnel compiles). Lazy warmup + the priming sweep below
# compiles only the handful of buckets the benchmark texts actually
# hit; the priming pass is discarded.
args=(--dataset LJSpeech --config_root "$CORPUS/config" \
      --restore_step "$STEP" --params_role target_model \
      --vocoder "$VOC" --port "$PORT" \
      --max_batch 8 --batch_window_ms 20)
[ -n "${VOC_CKPT:-}" ] && args+=(--vocoder_ckpt "$VOC_CKPT")

python cli/serve.py "${args[@]}" > "$LOG" 2>&1 &
SRV=$!
trap 'kill $SRV 2>/dev/null' EXIT

# --warmup_all compiles every (B, text, mel) bucket up front: ~25 min
# cold through the tunnel, ~2 min when the persistent XLA cache is hot.
# Wait up to 40 min and ABORT if the server never listens — benching a
# non-listening server records 100% errors, not latencies.
echo "== waiting for server (pid $SRV) to warm up =="
UP=0
for i in $(seq 1 480); do
  if curl -s -m 2 "http://127.0.0.1:$PORT/healthz" >/dev/null 2>&1; then
    echo "== server up after ~$((i * 5))s =="
    UP=1
    break
  fi
  if ! kill -0 $SRV 2>/dev/null; then
    echo "server died; log tail:"; tail -20 "$LOG"; exit 1
  fi
  sleep 5
done
if [ "$UP" != 1 ]; then
  echo "server never came up; warmup log tail:"; tail -5 "$LOG"; exit 1
fi

# priming sweep: drives every benchmark text through every batch size
# so the lazily-compiled buckets exist before the timed sweeps
echo "== priming (compiles the needed buckets; discarded) =="
python tools/bench_serve.py --url "http://127.0.0.1:$PORT" \
    --concurrency 1 2 4 8 --requests 16 --timeout 300 --out /tmp/serve_prime.json
cat /tmp/serve_prime.json

python tools/bench_serve.py --url "http://127.0.0.1:$PORT" \
    --concurrency 1 2 4 8 --requests 32 --out /tmp/serve_rows.json

python - "$OUT" "${ROUND:-5}" "$VOC" <<'EOF'
import json, sys, os
rows = json.load(open("/tmp/serve_rows.json"))
json.dump({
  "round": int(sys.argv[2]),
  "protocol": ("cli/serve.py on the real chip (target_model role of the "
               "quality checkpoint, T=1, batch_window_ms=20, max_batch=8, "
               f"vocoder={sys.argv[3]}) driven by tools/bench_serve.py: "
               "32 requests per concurrency level over live HTTP after a "
               "discarded priming sweep over every concurrency level "
               "(all batch buckets compiled before timing); batch_hist "
               "is the server-reported per-sweep coalescing histogram"),
  "device": "TPU v5e (1 chip)",
  "sweep": rows,
}, open(sys.argv[1], "w"), indent=1)
print("wrote", sys.argv[1])
EOF

kill $SRV 2>/dev/null
wait $SRV 2>/dev/null
echo "== serve bench done =="
