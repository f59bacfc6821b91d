"""Repair a flagship record checkpoint whose color field diverged.

The round-5 24-anchor record blew up in episode 20: one non-finite batch
poisoned Adam -> the app params -> every later anchor pano was rendered
from the diverged scene (runs_evidence/flagship_r4; root-caused and fixed
forward by the optimizer finite-guard in perf_tpu/core/optim.py). The
checkpoint still holds the longest clean prefix of the supervision pool —
panos are registered BEFORE the refit that consumed them, so the pano of
the anchor whose refit diverged is itself clean.

Recovery exploits the episode structure (train/scene.py fit(): occupancy
rebuild + geometry reset + fixed step counts per episode — reference
nerf.py:125-184): the trainable state is a pure function of the pool plus
one episode of training, so re-fitting a fresh scene on the filtered pool
reproduces the post-anchor-N refit state exactly (same program, same step
counts), without replaying the N anchors.

  1. keep the longest all-finite sup-pool prefix (pose/color/distance/
     mask/normal checked per pano),
  2. one standard episode fit on the filtered pool,
  3. save a resumable checkpoint (phase = kept-1) into a fresh run dir and
     copy the scene's cached bootstrap, so
         core_exp_runner.py ... is_continue=true mode=train
     picks up at the first dropped anchor with the optimizer guard live
     (tools/resume_flagship.sh <out-run> does exactly that).

Usage:
    python tools/repair_flagship.py --in-run runs/flagship_r4 \
        --out-run runs/flagship_r5 [--keep N] [--cpu]
"""

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-run", required=True,
                    help="run dir holding exp/**/checkpoints/ckpt.npz")
    ap.add_argument("--out-run", required=True,
                    help="fresh run dir for the repaired, resumable record")
    ap.add_argument("--keep", type=int, default=None,
                    help="keep exactly N pool panos (default: the longest "
                         "all-finite prefix)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="shrunk episode (30/15 steps, 1024-ray batches, "
                         "small sanity render) — validates the repair flow "
                         "on CPU against a synthetic broken checkpoint")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import perf_tpu
    perf_tpu.enable_persistent_compilation_cache()
    import numpy as np

    from perf_tpu.config import load_config
    from perf_tpu.train import (SupInfoPool, NeRFScene, load_checkpoint,
                                save_checkpoint)
    from perf_tpu.app.runner import _train_config

    ckpts = glob.glob(os.path.join(args.in_run, "exp", "**", "checkpoints",
                                   "ckpt.npz"), recursive=True)
    assert len(ckpts) == 1, f"expected one checkpoint under {args.in_run}, " \
                            f"found {ckpts}"
    state = load_checkpoint(ckpts[0])
    pool_state = state["sup_pool"]
    n = int(pool_state["n_sup_infos"])

    def finite(i):
        s = pool_state[f"sup_info_{i}"]
        return all(np.isfinite(np.asarray(s[k])).all()
                   for k in ("pose", "color_map", "distance_map",
                             "mask_input", "normal_map"))

    keep = args.keep
    if keep is None:
        keep = 0
        while keep < n and finite(keep):
            keep += 1
    assert 0 < keep <= n and all(finite(i) for i in range(keep)), \
        f"non-finite pano inside the kept prefix (keep={keep})"
    filtered = {"n_sup_infos": keep}
    for i in range(keep):
        filtered[f"sup_info_{i}"] = pool_state[f"sup_info_{i}"]
    print(f"[repair] pool: {n} panos, keeping clean prefix of {keep} "
          f"(dropped {[i for i in range(keep, n)]})")

    # registration re-runs the parity filters + the fail-loud finiteness
    # gate (train/sup_pool.py register_sup_info) — a corrupt pano that
    # slipped the prefix check would raise here, not train
    pool = SupInfoPool()
    pool.load_state_dict(filtered)

    # scene construction mirrors CoreRunner.__init__ (app/runner.py:181-231)
    # so the repair episode runs the exact production program
    conf = load_config(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs"), "nerf")
    sc = conf["scene"]
    fc = sc.get("field", {}) or {}
    rc = sc.get("renderer_conf", {}) or {}
    kind = fc.get("kind", "hash")
    from perf_tpu.fields import NGPFieldConfig
    from perf_tpu.render import RenderConfig
    render_cfg = RenderConfig(
        bg_color=rc.get("bg_color", "rand_noise"),
        max_samples=conf.get_path("scene.max_samples", 256),
        step=conf.get_path("scene.march_step", 5e-4),
        occ_res=conf.get_path("scene.occ_res", 256),
        occ_dilation=conf.get_path("scene.occ_dilation", 1),
        eval_chunk=rc.get("eval_chunk", 8192 if kind == "brick" else 32768))
    if kind == "brick":
        from perf_tpu.kernels import BrickGridConfig
        grid = BrickGridConfig(
            n_levels=fc.get("n_levels", 16),
            n_features=fc.get("n_features", 2),
            log2_bricks=fc.get("log2_bricks", 12),
            base_res=fc.get("base_res", 16),
            per_level_scale=fc.get("per_level_scale", 1.4472692012786865))
        field_cfg = NGPFieldConfig(grid=grid)
    else:
        field_cfg = NGPFieldConfig()
    train_cfg = _train_config(sc["train_conf"])
    if args.smoke:
        import dataclasses
        train_cfg = dataclasses.replace(
            train_cfg, raw_phase_iter_geo=30, raw_phase_iter_app=15,
            pixel_loss_batch_size=1024, scan_chunk=5)
        render_cfg = dataclasses.replace(
            render_cfg, max_samples=64, occ_res=64, step=4e-3)
        from perf_tpu.kernels import HashGridConfig
        field_cfg = NGPFieldConfig(grid=HashGridConfig(
            n_levels=8, n_features=2, log2_table_size=14, base_res=4,
            per_level_scale=1.9))
    scene = NeRFScene(field_cfg, render_cfg, train_cfg,
                      jax.random.PRNGKey(int(conf.get("seed", 0)) + keep))

    t0 = time.perf_counter()
    scene.fit(pool)
    fit_sec = time.perf_counter() - t0
    bad = [p for p, leaf in
           jax.tree_util.tree_leaves_with_path(scene.params)
           if not np.isfinite(np.asarray(leaf)).all()]
    assert not bad, f"re-fit produced non-finite params at {bad}"

    # quick visual + metric sanity: snapshot render at the raw pano's pose
    from perf_tpu.core import gen_pano_rays
    import jax.numpy as jnp
    rh, rw = (64, 128) if args.smoke else (512, 1024)
    if args.smoke:
        from perf_tpu.render.snapshot import SnapshotConfig
        scene.snap_cfg = SnapshotConfig(res=64)
    rays = gen_pano_rays(jnp.eye(4), rh, rw)
    out = scene.render_snapshot(rays, query_keys=("rgb", "distance"))
    rgb = np.asarray(out["rgb"], np.float64)
    assert np.isfinite(rgb).all(), "repaired scene renders non-finite"
    # PSNR against the raw pano downsampled to the render size
    import jax.image as jimg
    ref_small = np.asarray(jimg.resize(
        jnp.asarray(pool.sup_infos[0].color_map), (rh, rw, 3), "linear"))
    psnr = float(10 * np.log10(
        1.0 / max(np.mean((rgb - ref_small) ** 2), 1e-12)))

    exp_dir = os.path.join(
        args.out_run,
        os.path.relpath(os.path.dirname(os.path.dirname(ckpts[0])),
                        os.path.join(args.in_run)))
    os.makedirs(os.path.join(exp_dir, "checkpoints"), exist_ok=True)
    save_checkpoint(os.path.join(exp_dir, "checkpoints", "ckpt.npz"), {
        "scene": scene.state_dict(),
        "sup_pool": pool.state_dict(),
        # phase = anchors completed = kept panos minus the raw scene pano
        "phase": keep - 1,
    })
    if os.path.isdir(os.path.join(args.in_run, "scene")):
        shutil.copytree(os.path.join(args.in_run, "scene"),
                        os.path.join(args.out_run, "scene"),
                        dirs_exist_ok=True)
    from perf_tpu.utils.io import write_image
    write_image(os.path.join(exp_dir, "repair_check.png"), rgb)
    print(json.dumps({"kept": keep, "dropped": n - keep, "phase": keep - 1,
                      "fit_sec": round(fit_sec, 1),
                      "psnr_vs_raw_pano": round(psnr, 2),
                      "ckpt": os.path.join(exp_dir, "checkpoints",
                                           "ckpt.npz")}))


if __name__ == "__main__":
    main()
