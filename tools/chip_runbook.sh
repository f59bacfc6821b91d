#!/bin/bash
# Unattended chip-window runbook (CLAUDE.md "Chip runbook"): run the whole
# pending on-chip measurement queue the moment the axon tunnel is back.
# Safe to re-run — the persistent XLA compile cache makes restarts cheap,
# and every step appends one JSON/pytest record to $OUT. Runs ONE TPU
# process at a time (sequential by construction; this box also has one
# CPU core).
#
#   bash tools/chip_runbook.sh [outdir]   # default /root/repo/runs_evidence/chip_runbook
#
# Steps (each individually skippable by deleting its stamp file in $OUT):
#   1. tunnel probe (abort early if the relay is still dead)
#   2. tools/bench_dedup.py        — run-dedup encode microbench verdict
#   3. pytest -m flagship          — flagship quality bars, round-3 knobs
#   4. tools/quality_episode.py    — flagship episode + scene ckpt for (5)
#   5. tools/bench_snap_dedup.py   — snapshot (dedup_ratio, frame_dispatch) A/B
#   6. bench.py                    — headline bench (records all A/B extras)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs_evidence/chip_runbook}
mkdir -p "$OUT"
log() { echo "[chip_runbook $(date -u +%H:%M:%S)] $*" | tee -a "$OUT/runbook.log"; }

python - <<'EOF' || { echo "tunnel dead — aborting"; exit 1; }
import socket
s = socket.socket(); s.settimeout(5)
s.connect(("127.0.0.1", 8082))
EOF
log "tunnel OPEN — starting runbook"

run_step() {  # run_step <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    if [ -f "$OUT/$name.done" ]; then log "$name: already done, skipping"; return 0; fi
    log "$name: start"
    if timeout "$tmo" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"; then
        touch "$OUT/$name.done"; log "$name: OK"
    else
        log "$name: FAILED (rc=$?) — see $OUT/$name.err"
    fi
}

# quality_ep runs FIRST: it produces the fitted-scene ckpt (with the real
# flagship occ grid) that the dedup microbench and the snapshot A/B need —
# runs/ resets between rounds, so the old flagship ckpt can't be assumed.
run_step quality_ep    7200 python tools/quality_episode.py --scene-ckpt /tmp/qscene.npz
run_step dedup_micro   3600 python tools/bench_dedup.py --ckpt /tmp/qscene.npz
run_step flagship_bars 7200 python -m pytest -m flagship tests/test_quality_flagship.py -q
run_step snap_ab       3600 python tools/bench_snap_dedup.py /tmp/qscene.npz
run_step bench         7200 python bench.py
# long tail: finish the 24-anchor flagship record (anchors 9-23, ~2.6 h
# steady-state) + the dense traverse video; skippable via the stamp file
run_step flagship_24   21600 bash tools/resume_flagship.sh

log "runbook complete — results in $OUT"
grep -h "" "$OUT"/*.out 2>/dev/null | tail -40
