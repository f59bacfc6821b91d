"""Flagship-scale quality record: one full raw-fit episode on the synthetic
cube room at reference scale (2048x1024 supervision, 3000 geo + 1500 app
steps, full brick field), then PSNR + depth-MAE of a 1024x512 render at the
input pose vs ground truth.

This is BASELINE.md north-star metric 3's proxy (the reference example panos
are stripped blobs in this snapshot): a number the next round can regress
against. Run on the TPU:

    python tools/quality_episode.py [--samples 128] [--geo 3000] [--app 1500]

Prints one JSON line {"psnr": ..., "depth_mae": ..., ...}.
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
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--geo", type=int, default=3000)
    ap.add_argument("--app", type=int, default=1500)
    ap.add_argument("--render-hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="shrunk smoke configuration")
    ap.add_argument("--scene-ckpt", type=str, default=None,
                    help="save the fitted scene here (or load it if the "
                         "file exists) so snapshot variants can be "
                         "evaluated without re-fitting")
    ap.add_argument("--n-levels", type=int, default=None,
                    help="BrickGridConfig.n_levels ablation (keeps the "
                         "finest level res via a recomputed scale)")
    ap.add_argument("--geo-stride", type=int, default=None,
                    help="TrainConfig.geo_sample_stride (round-5 lever: "
                         "coarser geo quadrature — quality-gate the fit)")
    ap.add_argument("--snap-res", type=int, default=None)
    ap.add_argument("--snap-stride", type=int, default=None)
    ap.add_argument("--snap-dedup", type=float, default=None,
                    help="SnapshotConfig.dedup_ratio for the A/B run")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from perf_tpu.core import gen_pano_rays
    from perf_tpu.fields import NGPFieldConfig
    from perf_tpu.kernels import BrickGridConfig, HashGridConfig
    from perf_tpu.render import RenderConfig
    from perf_tpu.train import SupInfoPool, NeRFScene, TrainConfig
    from perf_tpu.utils import render_cube_room_pano

    if args.tiny:
        h, w = 128, 256
        field_cfg = NGPFieldConfig(grid=HashGridConfig(
            n_levels=8, n_features=2, log2_table_size=14, base_res=4,
            per_level_scale=1.9))
        render_cfg = RenderConfig(step=4e-3, max_samples=128, occ_res=64)
        batch = 1024
        args.geo, args.app = min(args.geo, 300), min(args.app, 150)
        args.render_hw = (64, 128)
    else:
        h, w = 1024, 2048
        grid_kw = {}
        if args.n_levels:
            d = BrickGridConfig()
            fine = d.base_res * d.per_level_scale ** (d.n_levels - 1)
            grid_kw = {"n_levels": args.n_levels,
                       "per_level_scale": float(
                           (fine / d.base_res) ** (1.0 / (args.n_levels - 1)))}
        field_cfg = NGPFieldConfig(grid=BrickGridConfig(**grid_kw))
        render_cfg = RenderConfig(max_samples=args.samples,
                                  eval_chunk=16384)
        batch = 8192

    t0 = time.perf_counter()
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pool = SupInfoPool()
    pool.register_sup_info(np.eye(4, dtype=np.float32), np.ones((h, w)),
                           pano["rgb"], pano["distance"], pano["normal"])
    train_cfg = TrainConfig(
        pixel_loss_batch_size=batch,
        raw_phase_iter_geo=args.geo, raw_phase_iter_app=args.app,
        scan_chunk=1 if not args.tiny else 5,
        **({"geo_sample_stride": args.geo_stride}
           if args.geo_stride else {}))
    scene = NeRFScene(field_cfg, render_cfg, train_cfg, jax.random.PRNGKey(0))
    ckpt = args.scene_ckpt
    if ckpt and os.path.exists(ckpt):
        from perf_tpu.train import load_checkpoint
        scene.load_state_dict(load_checkpoint(ckpt))
        fit_s = 0.0
    else:
        scene.fit(pool)
        fit_s = time.perf_counter() - t0
        if ckpt:
            from perf_tpu.train import save_checkpoint
            save_checkpoint(ckpt, scene.state_dict())

    rh, rw = args.render_hw
    rays = gen_pano_rays(jnp.eye(4), rh, rw)
    out = scene.render(rays, ("rgb", "distance"), key=jax.random.PRNGKey(7))
    gt = render_cube_room_pano(jnp.eye(4), rh, rw)
    gt_rgb = np.asarray(gt["rgb"], np.float64)
    gt_d = np.asarray(gt["distance"], np.float64)
    if gt_d.ndim == 3:
        gt_d = gt_d[..., 0]

    def metrics(o):
        rgb = np.asarray(o["rgb"], np.float64)
        mse = float(np.mean((rgb - gt_rgb) ** 2))
        p = float(10.0 * np.log10(1.0 / max(mse, 1e-12)))
        dist = np.asarray(o["distance"], np.float64)[..., 0]
        return p, float(np.mean(np.abs(dist - gt_d)))

    psnr, depth_mae = metrics(out)

    # novel-pose quality (the real NVS check: camera displaced off the
    # supervision pose; GT from the same synthetic room)
    pose_n = np.eye(4, dtype=np.float32)
    pose_n[0, 3] = 0.3
    rays_n = gen_pano_rays(jnp.asarray(pose_n), rh, rw)
    gt_n = render_cube_room_pano(jnp.asarray(pose_n), rh, rw)

    # baked snapshot path (the fast eval renderer) at the same pose
    t0 = time.perf_counter()
    from perf_tpu.render.snapshot import SnapshotConfig
    snap_kw = {}
    if args.tiny:
        snap_kw["res"] = 128
    if args.snap_res:
        snap_kw["res"] = args.snap_res
    if args.snap_stride:
        snap_kw["sample_stride"] = args.snap_stride
    if args.snap_dedup is not None:
        snap_kw["dedup_ratio"] = args.snap_dedup
    scene.bake_snapshot(SnapshotConfig(**snap_kw) if snap_kw else None)
    bake_s = time.perf_counter() - t0
    snap_out = scene.render_snapshot(rays, ("rgb", "distance"))
    psnr_snap, depth_mae_snap = metrics(snap_out)

    def metrics_vs(o, gt):
        rgb = np.asarray(o["rgb"], np.float64)
        g = np.asarray(gt["rgb"], np.float64)
        mse = float(np.mean((rgb - g) ** 2))
        p = float(10.0 * np.log10(1.0 / max(mse, 1e-12)))
        dist = np.asarray(o["distance"], np.float64)[..., 0]
        gd = np.asarray(gt["distance"], np.float64)
        if gd.ndim == 3:
            gd = gd[..., 0]
        return p, float(np.mean(np.abs(dist - gd)))

    psnr_novel, mae_novel = metrics_vs(
        scene.render_snapshot(rays_n, ("rgb", "distance")), gt_n)

    print(json.dumps({
        "psnr": round(psnr, 3),
        "depth_mae": round(depth_mae, 5),
        "psnr_snapshot": round(psnr_snap, 3),
        "depth_mae_snapshot": round(depth_mae_snap, 5),
        "psnr_novel_pose": round(psnr_novel, 3),
        "depth_mae_novel_pose": round(mae_novel, 5),
        "bake_sec": round(bake_s, 1),
        "fit_sec": round(fit_s, 1),
        "samples": render_cfg.max_samples,
        "sup_hw": [h, w], "render_hw": [rh, rw],
        "geo_iters": args.geo, "app_iters": args.app,
        "platform": jax.devices()[0].platform,
        "snap_res": scene._snap_cfg.res,
        "snap_stride": scene._snap_cfg.resolve_stride(scene.render_cfg),
    }))


if __name__ == "__main__":
    main()
