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

# runs/ is gitignored and the box's scratch filesystem resets between
# rounds — if the flagship scene pano is gone, regenerate it (synthetic
# cube room at the reference 2048x1024 supervision size, same generator
# as tests/test_pipeline_e2e.py) and start the record fresh.
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
# is_continue=true is a no-op on a fresh exp dir (runner starts at phase 0)

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
