#!/bin/bash
# Round-4 tail: wait for the flagship record process to exit, then use the
# remaining chip window for the LAST unmeasured perf levers before the
# round boundary (driver bench runs ~10:21 UTC; everything here must be
# off the chip by TAIL_DEADLINE_TS).
#
#   bash tools/round4_tail.sh <record_pid>
#
# Steps (priority order, each deadline-guarded + stamped):
#   1. summarize the record -> runs_evidence/flagship_r4/summary.txt
#   2. snapshot coarse-march + dedup sweep (tools/bench_snap_coarse.py)
#   3. n_levels timing ablation at the flagship pool (profile_bucketed)
set -u
cd "$(dirname "$0")/.."
PID=${1:?record pid}
TAIL_DEADLINE_TS=${TAIL_DEADLINE_TS:-1787133900}   # 10:05 UTC
EVID=runs_evidence/round4_tail
mkdir -p "$EVID"

stamp() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$EVID/tail.log"; }

stamp "waiting for record pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
stamp "record exited"

# final evidence sync + summary (CPU, cheap)
find runs/flagship_r4/exp -name metrics.jsonl \
    -exec cp {} runs_evidence/flagship_r4/metrics.jsonl \; 2>/dev/null
tail -c 200000 runs/flagship_r4/resume.log \
    > runs_evidence/flagship_r4/resume_log_tail.txt 2>/dev/null
python tools/summarize_run.py runs/flagship_r4/exp/*/nerf_experiment \
    > runs_evidence/flagship_r4/summary.txt 2>&1
stamp "summary written"

# bench.py smoke (CPU, validates the new coarse-s16 A/B path before the
# driver's round-end bench; runs only once the chip process has exited so
# it can't starve the record's host work)
stamp "bench smoke start"
timeout 900 python bench.py --tiny --cpu \
    > "$EVID/bench_smoke.out" 2> "$EVID/bench_smoke.err"
stamp "bench smoke done rc=$? ($(tail -c 120 "$EVID/bench_smoke.out" 2>/dev/null | head -c 120))"

python - <<'EOF' || { stamp "tunnel dead — skipping chip steps"; exit 0; }
import socket
s = socket.socket(); s.settimeout(5)
s.connect(("127.0.0.1", 8082))
EOF

remaining() { echo $((TAIL_DEADLINE_TS - $(date +%s))); }

# 2. snapshot sweep (self-guards per variant via PERF_TPU_DEADLINE_TS)
if [ "$(remaining)" -gt 600 ]; then
    stamp "snap sweep start ($(remaining)s runway)"
    PERF_TPU_DEADLINE_TS=$TAIL_DEADLINE_TS \
        timeout $(( $(remaining) - 120 )) \
        python tools/bench_snap_coarse.py /tmp/qscene.npz \
        > "$EVID/snap_coarse.out" 2> "$EVID/snap_coarse.err"
    stamp "snap sweep done rc=$?"
else
    stamp "no runway for snap sweep"
fi

# 3. n_levels ladder timing at the flagship pool (scale keeps finest res)
for nl_scale in "12 1.6555" "10 1.8517"; do
    set -- $nl_scale
    if [ "$(remaining)" -gt 480 ]; then
        stamp "ablate n_levels=$1 start"
        timeout $(( $(remaining) - 120 )) \
            python tools/profile_bucketed.py --n-levels "$1" \
            --per-level-scale "$2" --iters 5 --full-only \
            > "$EVID/ablate_nl$1.out" 2> "$EVID/ablate_nl$1.err"
        stamp "ablate n_levels=$1 done rc=$?"
    else
        stamp "no runway for n_levels=$1"
    fi
done
stamp "tail complete"
