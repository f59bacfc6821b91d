"""A/B the snapshot bake paths on a fitted flagship scene.

Round-5 lever (VERDICT r4 item 8): the host bake ships per-chunk evals
D2H, scatters on host, then pushes the ~456 MB dense volume back H2D
through the axon tunnel; the device bake keeps index selection, eval,
scatter and pack resident (ONE scalar readback). Tables are bitwise
equal (tests/test_snapshot.py::test_device_bake_matches_host_bake);
this tool measures the wall-clock on the chip.

    python tools/bench_bake.py --ckpt /tmp/qscene.npz [--reps 3]

Prints one JSON line with per-path seconds + the render-agreement PSNR.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny synthetic fit instead of a flagship ckpt "
                         "(smoke: --ckpt is created if missing)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import perf_tpu
    perf_tpu.enable_persistent_compilation_cache()
    from perf_tpu.core import gen_pano_rays
    from perf_tpu.fields import NGPFieldConfig
    from perf_tpu.kernels import BrickGridConfig, HashGridConfig
    from perf_tpu.render import RenderConfig
    from perf_tpu.render.snapshot import SnapshotConfig
    from perf_tpu.train import (SupInfoPool, NeRFScene, TrainConfig,
                                load_checkpoint, save_checkpoint)
    from perf_tpu.utils import render_cube_room_pano

    if args.tiny:
        field_cfg = NGPFieldConfig(grid=HashGridConfig(
            n_levels=8, n_features=2, log2_table_size=14, base_res=4,
            per_level_scale=1.9))
        render_cfg = RenderConfig(step=4e-3, max_samples=128, occ_res=64)
        scene = NeRFScene(field_cfg, render_cfg,
                          TrainConfig(pixel_loss_batch_size=1024,
                                      raw_phase_iter_geo=300,
                                      raw_phase_iter_app=150, scan_chunk=5),
                          jax.random.PRNGKey(0))
        snap_kw = {"res": 128}
        if os.path.exists(args.ckpt):
            scene.load_state_dict(load_checkpoint(args.ckpt))
        else:
            h, w = 128, 256
            pano = render_cube_room_pano(jnp.eye(4), h, w)
            pool = SupInfoPool()
            pool.register_sup_info(np.eye(4, dtype=np.float32),
                                   np.ones((h, w)), pano["rgb"],
                                   pano["distance"], pano["normal"])
            scene.fit(pool)
            save_checkpoint(args.ckpt, scene.state_dict())
    else:
        field_cfg = NGPFieldConfig(grid=BrickGridConfig())
        render_cfg = RenderConfig(max_samples=256, eval_chunk=16384)
        scene = NeRFScene(field_cfg, render_cfg, TrainConfig(),
                          jax.random.PRNGKey(0))
        scene.load_state_dict(load_checkpoint(args.ckpt))
        snap_kw = {}

    out = {"platform": jax.devices()[0].platform,
           "occ_frac": round(float(jnp.mean(
               scene.occ_grid.astype(jnp.float32))), 4)}
    rays = gen_pano_rays(jnp.eye(4), 256, 512)
    renders = {}
    for name, host in (("device", False), ("host", True)):
        cfg = SnapshotConfig(bake_host=host, **snap_kw)
        times = []
        for _ in range(args.reps):
            scene.snapshot = None          # force a fresh bake
            t0 = time.perf_counter()
            table = scene.bake_snapshot(cfg)
            table.block_until_ready()
            times.append(time.perf_counter() - t0)
        renders[name] = np.asarray(
            scene.render_snapshot(rays, ("rgb",))["rgb"], np.float64)
        out[f"bake_{name}_sec"] = [round(t, 2) for t in times]
        out[f"bake_{name}_best"] = round(min(times), 2)
        # free the 2.6 GB table before the other path allocates its own
        scene.snapshot = None

    mse = float(np.mean((renders["device"] - renders["host"]) ** 2))
    out["agree_psnr_db"] = round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 1)
    out["speedup"] = round(out["bake_host_best"] / out["bake_device_best"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
