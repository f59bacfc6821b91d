"""Snapshot render lever sweep: coarser march (2-voxel stride via
march_coarse=16), the never-completed dedup_ratio ladder, and their combo,
on a saved flagship scene ckpt. One JSON line per variant.

BASELINE.md round-4 closed every structural render lever (frame_dispatch,
K-frame, int8 rows, grouped encode): the 1024x512 snapshot frame is
device-compute/row-bound at its CURRENT sample count. The only remaining
headroom is fewer samples per pixel — stride 16 halves them outright;
dedup gathers one row per brick RUN (t-adjacent samples share bricks for
~4 samples at stride 8). Both are quality-gated against the 50 dB
snapshot bar (reference workload: core_exp_runner.py:223-246 dense render).

    python tools/bench_snap_coarse.py [/tmp/qscene.npz]

Honors PERF_TPU_DEADLINE_TS: skips remaining variants when the wall clock
gets within --margin s of the deadline (remote compiles run 1-7 min).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import perf_tpu

perf_tpu.enable_persistent_compilation_cache()

from perf_tpu.core import gen_pano_rays
from perf_tpu.fields import NGPFieldConfig
from perf_tpu.kernels import BrickGridConfig
from perf_tpu.render import RenderConfig
from perf_tpu.render.snapshot import SnapshotConfig
from perf_tpu.train import NeRFScene, TrainConfig, load_checkpoint
from perf_tpu.utils import render_cube_room_pano

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qscene.npz"
DEADLINE = float(os.environ.get("PERF_TPU_DEADLINE_TS", "0"))
# worst-case remote compile (~420 s) + bake (~35 s) + 12 timed frames —
# a variant admitted right at the margin must still FINISH before the
# deadline (ADVICE r4: 420 covered the compile alone)
MARGIN = 660.0

# (label, SnapshotConfig kwargs) — priority order; the deadline guard cuts
# from the tail. march_coarse rides SnapshotConfig (round-5 production
# knob) so ONE scene serves every variant. Round-5 first sweep verdicts
# (runs_evidence/round5/snap_coarse.jsonl): s8 2.23 fps 53.35 dB;
# s16 3.20 fps 47.73 dB (FAILS the 50 dB input-pose bar, novel +3.5 dB);
# dedup {.5,.625,.75} all ~s8 fps (final, matches round 4). This second
# sweep hunts the knee between s8 and s16.
VARIANTS = [
    ("s12", {"march_coarse": 12, "sample_stride": 12}),
    ("s16_r512", {"march_coarse": 16, "sample_stride": 16, "res": 512}),
    ("s16_half", {"march_coarse": 16, "sample_stride": 8}),
    ("baseline_s8", {}),
    ("coarse_s16", {"march_coarse": 16, "sample_stride": 16}),
    ("s12_r512", {"march_coarse": 12, "sample_stride": 12, "res": 512}),
]

state = load_checkpoint(CKPT)
_scene = None


def get_scene():
    global _scene
    if _scene is None:
        fc = NGPFieldConfig(grid=BrickGridConfig())
        rc = RenderConfig(max_samples=256, eval_chunk=16384)
        _scene = NeRFScene(fc, rc, TrainConfig(), jax.random.PRNGKey(0))
        _scene.load_state_dict(state)
    return _scene


rays = gen_pano_rays(jnp.eye(4), 512, 1024)
gt = render_cube_room_pano(jnp.eye(4), 512, 1024)
gt_rgb = np.asarray(gt["rgb"], np.float64)
pose_n = np.eye(4, dtype=np.float32)
pose_n[0, 3] = 0.3
rays_n = gen_pano_rays(jnp.asarray(pose_n), 512, 1024)
gt_n_rgb = np.asarray(render_cube_room_pano(jnp.asarray(pose_n), 512, 1024)
                      ["rgb"], np.float64)


def psnr(out, ref):
    mse = float(np.mean((np.asarray(out["rgb"], np.float64) - ref) ** 2))
    return round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 2)


for label, kw in VARIANTS:
    if DEADLINE and time.time() > DEADLINE - MARGIN:
        print(json.dumps({"variant": label, "skipped": "deadline"}))
        continue
    scene = get_scene()
    t0 = time.perf_counter()
    scene.bake_snapshot(SnapshotConfig(**kw))
    bake_s = time.perf_counter() - t0
    out = scene.render_snapshot(rays, ("rgb", "distance"))
    float(out["rgb"][0, 0, 0])  # sync (includes frame compile)
    t0 = time.perf_counter()
    for _ in range(10):
        out = scene.render_snapshot(rays, ("rgb", "distance"))
    float(out["rgb"][0, 0, 0])
    dt = (time.perf_counter() - t0) / 10
    out_n = scene.render_snapshot(rays_n, ("rgb", "distance"))
    print(json.dumps({
        "variant": label, **kw,
        "fps": round(1.0 / dt, 3), "ms_per_frame": round(dt * 1e3, 1),
        "psnr": psnr(out, gt_rgb), "psnr_novel": psnr(out_n, gt_n_rgb),
        "bake_sec": round(bake_s, 1),
        "stride": scene._snap_cfg.resolve_stride(scene.render_cfg),
    }), flush=True)
