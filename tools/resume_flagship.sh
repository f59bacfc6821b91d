#!/bin/bash
# The flagship 24-anchor record (1 raw fit + 24 anchor cycles, reference
# workload core_exp_runner.py:126-130). Two modes, one command:
#   - RESUME: if $RUN/exp/.../checkpoints/ckpt.npz exists, is_continue=true
#     picks up at the checkpointed anchor (phase-level resume incl. sup pool).
#   - FRESH: runs/ is gitignored scratch and resets between rounds; when the
#     scene pano is gone the script regenerates it (synthetic cube room at
#     the reference 2048x1024 supervision size) and starts the record from
#     zero (~5 h at the 611 s steady bucketed cycle — only start this with
#     that much idle-chip runway).
#
#   bash tools/resume_flagship.sh [run_dir]   # default runs/flagship_r4
#
# Runs ONE TPU process (this box has one CPU core; never run anything else
# against the chip while this is in flight). A background loop copies
# ts_log/metrics.jsonl into runs_evidence/ every 5 min so a tunnel death
# mid-run still leaves a committed record.
set -u
cd "$(dirname "$0")/.."
RUN=${1:-runs/flagship_r4}
EVID=runs_evidence/$(basename "$RUN")
mkdir -p "$EVID"

python - <<'EOF' || { echo "tunnel dead — aborting"; exit 1; }
import socket
s = socket.socket(); s.settimeout(5)
s.connect(("127.0.0.1", 8082))
EOF

if [ ! -f "$RUN/scene/cozy_room/image.png" ]; then
    echo "no scene pano under $RUN — bootstrapping a fresh flagship run"
    mkdir -p "$RUN/scene/cozy_room"
    RUN="$RUN" python - <<'EOF'
import os, sys
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")  # host-side scene gen only
import numpy as np
from perf_tpu.utils import render_cube_room_pano
from perf_tpu.utils.io import write_image
pano = render_cube_room_pano(np.eye(4, dtype=np.float32), 1024, 2048)
write_image(os.environ["RUN"] + "/scene/cozy_room/image.png",
            np.asarray(pano["rgb"]))
EOF
fi

# evidence sync: metrics.jsonl + anchor stamps survive even if the tunnel
# dies mid-run (runs/ is wiped between rounds; runs_evidence/ is committed)
sync_evidence() {
    while sleep 300; do
        find "$RUN/exp" -name metrics.jsonl -exec cp {} "$EVID/metrics.jsonl" \; 2>/dev/null
    done
}
sync_evidence &
SYNC_PID=$!
trap 'kill $SYNC_PID 2>/dev/null; find "$RUN/exp" -name metrics.jsonl -exec cp {} "$EVID/metrics.jsonl" \; 2>/dev/null' EXIT

# is_continue=true resumes when a ckpt exists and is a guarded no-op on a
# fresh exp dir (perf_tpu/app/runner.py prints "starting fresh").
# DEADLINE_TS (unix seconds, optional) makes the anchor loop exit cleanly at
# the last checkpoint instead of running into a round boundary where an
# orphan kill mid-dispatch could take the tunnel down.
export PERF_TPU_DEADLINE_TS="${DEADLINE_TS:-0}"
set -x
python core_exp_runner.py --config-name nerf \
    "dataset.image_path=$RUN/scene/cozy_room/image.png" \
    "device.base_exp_dir=$RUN/exp" \
    pers_inpainter_type=fake \
    is_continue=true mode=train \
    2>&1 | tee -a "$RUN/resume.log"
set +x

# full traverse video once training completes (skip when inside the last
# 10 min before the deadline — render_dense is ~2-3 min but not free)
if [ "${DEADLINE_TS:-0}" != "0" ] && [ "$(date +%s)" -gt "$((DEADLINE_TS - 600))" ]; then
    echo "deadline close — skipping render_dense traverse"
else
    set -x
    python core_exp_runner.py --config-name nerf \
        "dataset.image_path=$RUN/scene/cozy_room/image.png" \
        "device.base_exp_dir=$RUN/exp" \
        pers_inpainter_type=fake \
        is_continue=true mode=render_dense \
        2>&1 | tee -a "$RUN/resume.log"
    set +x
fi
tail -c 200000 "$RUN/resume.log" > "$EVID/resume_log_tail.txt" 2>/dev/null || true
