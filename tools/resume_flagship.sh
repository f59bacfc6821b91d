#!/bin/bash
# Resume the flagship 24-anchor record from runs/flagship_r3 (ckpt has 9
# anchors done; the axon relay died mid-round-3 while anchors 9+ were
# pending — BASELINE.md "Round-3 flagship run record"). Safe to re-run:
# is_continue=true skips completed anchors via the checkpointed phase, and
# the persistent XLA compile cache makes restarts cheap.
#
#   bash tools/resume_flagship.sh [run_dir]   # default runs/flagship_r3
#
# Runs ONE TPU process (this box has one CPU core; never run anything else
# against the chip while this is in flight). Expected steady-state cost:
# ~10.2 min/anchor (611 s best bucketed cycle) => ~2.6 h for anchors 9-23,
# then render_dense for the full traverse video.
set -u
cd "$(dirname "$0")/.."
RUN=${1:-runs/flagship_r3}

python - <<'EOF' || { echo "tunnel dead — aborting"; exit 1; }
import socket
s = socket.socket(); s.settimeout(5)
s.connect(("127.0.0.1", 8082))
EOF

set -x
python core_exp_runner.py --config-name nerf \
    "dataset.image_path=$RUN/scene/cozy_room/image.png" \
    "device.base_exp_dir=$RUN/exp" \
    pers_inpainter_type=fake \
    is_continue=true mode=train \
    2>&1 | tee -a "$RUN/resume.log"

# full traverse video once training completes
python core_exp_runner.py --config-name nerf \
    "dataset.image_path=$RUN/scene/cozy_room/image.png" \
    "device.base_exp_dir=$RUN/exp" \
    pers_inpainter_type=fake \
    is_continue=true mode=render_dense \
    2>&1 | tee -a "$RUN/resume.log"
