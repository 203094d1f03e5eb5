#!/bin/bash
# Healthy-window watcher for the 8v32 scaling run (north_rule evidence).
# Probes host memory bandwidth every ~3 min; when a healthy window
# appears (probe under the gate), fires the gated scaling bench. The
# bench itself re-probes around every level, so a window that closes
# mid-run is rejected (exit 3) and the watch continues.
cd "$(dirname "$0")/.." || exit 1
GATE="${1:-0.55}"
DEADLINE=$(( $(date +%s) + ${2:-14400} ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if python scripts/scaling_bench.py --cpus 8,32 --probe-gate "$GATE" --write; then
        echo "scaling_watch: healthy-window run recorded"
        exit 0
    fi
    # short sleep: the bench's own section probes show healthy windows
    # can be sub-minute; a 170 s poll missed a 0.257 reading that a
    # concurrently-running bench caught (BENCH.md r5)
    sleep 40
done
echo "scaling_watch: no healthy window before deadline"
exit 4
