"""Deep-pool budget-creep A/B on a REAL progressive-scene checkpoint.

VERDICT r4 item 3: across the flagship_r4 record the bucketed budget
`bucket_s_low` climbed 80 -> 176 and anchor refits 345 s -> 1056 s (3x) as
the 14-anchor pool's union occupancy shell dragged the p98 probe up. This
tool loads the actual deep checkpoint (scene params + full sup pool) and
measures, per occupancy variant:

    occupied voxels, probed budget, bucket plan (s_low, n_high),
    FULL geo/app step ms (the flagship program family),
    depth parity at registered pool rays (quality proxy: if an occupancy
    variant drops REAL geometry, marching skips the surface and the eval
    depth at already-registered rays diverges from the pool's).

Variants:
    d1        pool shell, dilation=1 (production default, reference-exact
              shell per sup_info.py:309-321)
    d0        dilation=0 (thinner shell; round-3 tiny-scale quality failure
              was 8x coarser than flagship — retest at the real scale)
    d1_prune  d1 AND field-says-occupied: the episode-(n-1) fitted field is
              the best denoiser of the union shell — voxels whose fitted
              density would not pass the reference's nerfacc occupancy
              binarization (density * 5e-3 > occ_thre 1e-2, nerf.py:150,164)
              are dropped. Conservative max over jittered in-voxel samples.
    d0_prune  both.

    python tools/bench_deep_pool.py <ckpt.npz> [--iters 10] [--tau 1e-2]

Honors PERF_TPU_DEADLINE_TS (exits cleanly between variants).
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

import perf_tpu

perf_tpu.enable_persistent_compilation_cache()

import optax

from perf_tpu.core import Rays
from perf_tpu.fields import NGPFieldConfig, query_density
from perf_tpu.kernels import BrickGridConfig
from perf_tpu.render import RenderConfig
from perf_tpu.train import NeRFScene, SupInfoPool, TrainConfig, load_checkpoint

DEADLINE = float(os.environ.get("PERF_TPU_DEADLINE_TS", "0") or 0)


def deadline_ok(margin=600.0):
    return not DEADLINE or time.time() < DEADLINE - margin


def field_occupancy(geo_params, fc, res: int, tau: float,
                    n_jitter: int = 2, chunk: int = 1 << 21) -> np.ndarray:
    """Binary field occupancy at the occ grid's voxel centers: max density
    over the center + n_jitter jittered in-voxel samples, binarized with
    the reference's nerfacc rule (density * 5e-3 > tau)."""
    idx = np.arange(res ** 3, dtype=np.int64)
    v = np.stack([idx // (res * res), (idx // res) % res, idx % res], -1)
    pts = ((v.astype(np.float32) + 0.5) / res - 0.5) * 2.0
    q = jax.jit(lambda p, x: query_density(p, x, fc)[..., 0])
    best = np.zeros(res ** 3, np.float32)
    rng = np.random.default_rng(0)
    for j in range(1 + n_jitter):
        pj = pts if j == 0 else (
            pts + rng.uniform(-1.0, 1.0, pts.shape).astype(np.float32) / res)
        for s in range(0, res ** 3, chunk):
            d = np.asarray(q(geo_params, jnp.asarray(pj[s:s + chunk])))
            np.maximum(best[s:s + chunk], d, out=best[s:s + chunk])
    return (best * 5e-3) > tau


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tau", type=float, default=1e-2)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated variant labels to run")
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    state = load_checkpoint(args.ckpt)
    fc = NGPFieldConfig(grid=BrickGridConfig())
    rc = RenderConfig()
    scene = NeRFScene(fc, rc, TrainConfig(pixel_loss_batch_size=args.rays),
                      jax.random.PRNGKey(0))
    pool = SupInfoPool()
    if "sup_pool" in state:                       # full runner checkpoint
        scene.load_state_dict(state["scene"])
        pool.load_state_dict(state["sup_pool"])
    else:                                         # bare scene ckpt
        scene.load_state_dict(state)
        raise SystemExit("ckpt has no sup_pool — need a runner checkpoint")
    n_anchor = len(pool.sup_infos)
    arrs = pool.device_arrays()
    print(f"pool: {n_anchor} panos, {int(arrs['n_valid'])} rays, "
          f"platform={jax.devices()[0].platform}", flush=True)

    print("evaluating field occupancy over the voxel grid...", flush=True)
    t0 = time.perf_counter()
    focc = field_occupancy(scene.params["geo"], fc, rc.occ_res, args.tau)
    print(f"field occupancy: {int(focc.sum())} voxels "
          f"({time.perf_counter() - t0:.1f} s)", flush=True)

    # quality-proxy probe: registered pool rays, uniform over the pool
    n_valid = int(arrs["n_valid"])
    ridx = np.linspace(0, n_valid - 1, args.rays).astype(np.int32)
    probe = Rays(o=arrs["rays_o"][ridx], d=arrs["rays_d"][ridx])
    gt_d = np.asarray(arrs["distances"][ridx])[..., 0]

    adam = optax.scale_by_adam(eps=1e-8)
    key = jax.random.PRNGKey(1)
    step0 = jnp.asarray(0.0, jnp.float32)

    variants = [("d1", 1, False), ("d0", 0, False),
                ("d1_prune", 1, True), ("d0_prune", 0, True)]
    if args.only:
        keep = set(args.only.split(","))
        variants = [v for v in variants if v[0] in keep]
    base_occ = {}
    for label, dil, prune in variants:
        if not deadline_ok():
            print(json.dumps({"variant": label, "skipped": "deadline"}),
                  flush=True)
            continue
        if dil not in base_occ:
            base_occ[dil] = np.asarray(
                pool.gen_occ_grid(rc.occ_res, dilation=dil))
        occ = base_occ[dil].copy()
        if prune:
            occ = occ & focc.astype(occ.dtype)
        scene.occ_grid = jnp.asarray(occ)
        budget = scene.select_sample_budget(arrs)
        plan = scene.bucket_plan

        # step timing — the same jitted program family the flagship runs
        run_geo = scene._get_phase_fn("geo", int(arrs["rays_o"].shape[0]))
        out = run_geo(scene.params["geo"], scene.params["app"],
                      adam.init(scene.params["geo"]), scene.occ_grid, arrs,
                      key, step0)
        np.asarray(out[-1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run_geo(scene.params["geo"], scene.params["app"],
                          adam.init(scene.params["geo"]), scene.occ_grid,
                          arrs, key, step0)
        np.asarray(out[-1])
        geo_ms = (time.perf_counter() - t0) / args.iters * 1e3

        # depth parity at registered rays (eval render through this grid)
        out_d = scene.render(probe, query_keys=("distance",))
        pred = np.asarray(out_d["distance"])[..., 0]
        mae = float(np.abs(pred - gt_d).mean())
        p99 = float(np.percentile(np.abs(pred - gt_d), 99))

        print(json.dumps({
            "variant": label, "tau": args.tau, "occ_voxels": int(occ.sum()),
            "budget": budget, "s_low": plan[0] if plan else None,
            "n_high": plan[1] if plan else None,
            "geo_step_ms": round(geo_ms, 1),
            "depth_mae": round(mae, 5), "depth_p99": round(p99, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
