#!/bin/bash
# Watch for a healthy host window (bandwidth probe < gate) and fire the
# 8v32 scaling bench inside it (VERDICT r4 item 4). Results accumulate
# in scaling_runs.jsonl; BENCH.md is updated by hand from them.
cd "$(dirname "$0")/.."
GATE=${1:-0.7}
MAX_TRIES=${2:-200}
for i in $(seq 1 "$MAX_TRIES"); do
  out=$(python scripts/scaling_bench.py --probe-gate "$GATE" 2>/tmp/scaling_err.log)
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "$out" | python -c '
import json,sys
blob = sys.stdin.read()
start = blob.index("{")
rec = json.loads(blob[start:])
with open("scaling_runs.jsonl","a") as f:
    f.write(json.dumps(rec)+"\n")
print("recorded:", rec.get("stream_efficiency"), rec.get("cover_efficiency"), rec.get("host_probes"))
'
    exit 0
  fi
  echo "try $i: gated ($out)"
  sleep 45
done
echo "no healthy window in $MAX_TRIES tries"
exit 3
