"""Subtractive profile of the BUCKETED geo/app train step at the flagship
pool (VERDICT r3 item 2: publish where the 159 ms goes; if >=30% is neither
gather nor scatter, fuse it).

Builds the same 4-pano flagship-regime pool as bench.py (union occupancy
shell -> 256-cap budgets, bucket plan engaged), then times each stage of
the bucketed step as its own jitted program:

    march_windows (probe+top_k)   - the window selection stage
    sort by occupancy             - argsort + reorder
    low-bucket shade fwd          - majority at s_low
    high-bucket shade fwd         - tail at the full budget
    full fwd (bucketed render)    - all of the above in one program
    loss + grad                   - the remat'd backward
    adam update
    FULL step                     - scene._get_phase_fn program

    python tools/profile_bucketed.py [--cpu] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def timed(fn, *a, iters=10):
    out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


# graceful wall-clock guard (ADVICE r4: a hard `timeout` SIGTERM can kill
# the process mid-dispatch and take the axon tunnel down): callers set
# PERF_TPU_DEADLINE_TS; each stage checks the clock BEFORE starting, with
# margin for a worst-case remote compile + the timed iterations.
_DEADLINE = float(os.environ.get("PERF_TPU_DEADLINE_TS", "0") or 0)


def deadline_ok(margin=540.0):
    if _DEADLINE and time.time() > _DEADLINE - margin:
        print(f"[profile_bucketed] deadline within {margin:.0f}s — "
              "skipping remaining stages", flush=True)
        return False
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rays", type=int, default=8192)
    # parametric grid ablation (BASELINE.md round-4: the geo step is at the
    # platform row-gather floor, rows/sample scales with n_levels — these
    # flags measure the step at alternative ladders; pass --per-level-scale
    # to keep the finest level resolution when shrinking n_levels)
    ap.add_argument("--n-levels", type=int, default=None)
    ap.add_argument("--log2-bricks", type=int, default=None)
    ap.add_argument("--per-level-scale", type=float, default=None)
    ap.add_argument("--full-only", action="store_true",
                    help="time only the FULL geo/app steps (2 compiles "
                         "instead of ~9 — for chip-window ablations)")
    ap.add_argument("--geo-stride", type=int, default=None,
                    help="TrainConfig.geo_sample_stride for the FULL-step "
                         "timing (round-5 lever A/B)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import perf_tpu
    perf_tpu.enable_persistent_compilation_cache()

    import optax
    from perf_tpu.fields import NGPFieldConfig
    from perf_tpu.kernels import BrickGridConfig
    from perf_tpu.render import RenderConfig
    from perf_tpu.render.renderer import (march_windows, shade_rays,
                                          render_rays_bucketed,
                                          _windows_to_samples)
    from perf_tpu.train import SupInfoPool, NeRFScene, TrainConfig
    from perf_tpu.train.schedule import smooth_l1
    from perf_tpu.utils import render_cube_room_pano

    h, w = 1024, 2048
    grid_kw = {}
    if args.n_levels is not None:
        grid_kw["n_levels"] = args.n_levels
    if args.log2_bricks is not None:
        grid_kw["log2_bricks"] = args.log2_bricks
    if args.per_level_scale is not None:
        grid_kw["per_level_scale"] = args.per_level_scale
    grid_cfg = BrickGridConfig(**grid_kw)
    if grid_kw:
        print(f"grid ablation: n_levels={grid_cfg.n_levels} "
              f"log2_bricks={grid_cfg.log2_bricks} "
              f"scale={grid_cfg.per_level_scale:.4f} "
              f"finest_res={grid_cfg.level_res(grid_cfg.n_levels - 1)}")
    field_cfg = NGPFieldConfig(grid=grid_cfg)
    render_cfg = RenderConfig()
    pool = SupInfoPool()
    for off in ((0.0, 0.0, 0.0), (0.38, 0.0, 0.0), (-0.3, 0.18, 0.0),
                (0.08, -0.38, 0.15)):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = off
        pano = render_cube_room_pano(jnp.asarray(pose), h, w)
        pool.register_sup_info(pose, np.ones((h, w)), pano["rgb"],
                               pano["distance"], pano["normal"])
    tc_kw = {}
    if args.geo_stride is not None:
        tc_kw["geo_sample_stride"] = args.geo_stride
    tc = TrainConfig(pixel_loss_batch_size=args.rays, scan_chunk=1, **tc_kw)
    scene = NeRFScene(field_cfg, render_cfg, tc, jax.random.PRNGKey(0))
    scene.occ_grid = pool.gen_occ_grid(render_cfg.occ_res)
    arrs = pool.device_arrays()
    scene.sample_budget = scene.select_sample_budget(arrs)
    budget, plan = scene.sample_budget, scene.bucket_plan
    print(f"flagship pool: budget={budget}, bucket_plan={plan}, "
          f"platform={jax.devices()[0].platform}")
    occ = scene.occ_grid
    params = scene.params

    import dataclasses
    rc = dataclasses.replace(render_cfg, max_samples=budget)
    key = jax.random.PRNGKey(1)
    idx = jax.random.randint(jax.random.PRNGKey(2), (args.rays,), 0,
                             int(arrs["n_valid"]))
    o, d = arrs["rays_o"][idx], arrs["rays_d"][idx]
    gt_dist = arrs["distances"][idx]
    I = args.iters
    res = {}

    if args.full_only:
        adam = optax.scale_by_adam(eps=1e-8)
        step0 = jnp.asarray(0.0, jnp.float32)
        if deadline_ok():
            run_chunk = scene._get_phase_fn(
                "geo", int(arrs["rays_o"].shape[0]))
            res["FULL geo step"] = timed(
                run_chunk, params["geo"], params["app"],
                adam.init(params["geo"]), occ, arrs, key, step0, iters=I)
        if deadline_ok():
            run_app = scene._get_phase_fn(
                "app", int(arrs["rays_o"].shape[0]))
            res["FULL app step"] = timed(
                run_app, params["app"], params["geo"],
                adam.init(params["app"]), occ, arrs, key, step0, iters=I)
        print(f"\nshape: {args.rays} rays, budget {budget}, plan {plan}")
        for k, v in res.items():
            print(f"  {k:34s} {v:8.1f} ms")
        return

    mw = jax.jit(lambda o, d, k: march_windows(occ, o, d, k, rc, True))
    res["march_windows (probe)"] = timed(mw, o, d, key, iters=I)

    widx, wvalid, jitter = mw(o, d, key)

    def sort_stage(widx, wvalid, o, d):
        counts = jnp.sum(wvalid.astype(jnp.int32), axis=1)
        order = jnp.argsort(counts)
        return (widx[order], wvalid[order], o[order], d[order],
                jnp.argsort(order))

    res["sort by occupancy"] = timed(jax.jit(sort_stage), widx, wvalid, o, d,
                                     iters=I)

    spw = rc.samples_per_window
    if plan:
        s_low, n_high = plan
        n_low = args.rays - n_high

        def low_fwd(p, widx, wvalid, o, d, jit_s):
            t_b, v_b = _windows_to_samples(widx[:n_low, :s_low // spw],
                                           wvalid[:n_low, :s_low // spw],
                                           jit_s[:n_low], rc)
            return shade_rays(p, field_cfg, o[:n_low], d[:n_low], t_b, v_b,
                              key, rc, True, stop_app_grad=True,
                              need_rgb=False)["distance"]

        def high_fwd(p, widx, wvalid, o, d, jit_s):
            t_b, v_b = _windows_to_samples(widx[n_low:], wvalid[n_low:],
                                           jit_s[n_low:], rc)
            return shade_rays(p, field_cfg, o[n_low:], d[n_low:], t_b, v_b,
                              key, rc, True, stop_app_grad=True,
                              need_rgb=False)["distance"]

        res[f"low-bucket fwd ({n_low}x{s_low})"] = timed(
            jax.jit(low_fwd), params, widx, wvalid, o, d, jitter, iters=I)
        res[f"high-bucket fwd ({n_high}x{budget})"] = timed(
            jax.jit(high_fwd), params, widx, wvalid, o, d, jitter, iters=I)

        def full_fwd(p, o, d, k):
            return render_rays_bucketed(p, field_cfg, occ, o, d, k, rc,
                                        s_low, n_high, train=True,
                                        stop_app_grad=True,
                                        need_rgb=False)["distance"]
    else:
        def full_fwd(p, o, d, k):
            from perf_tpu.render.renderer import render_rays
            return render_rays(p, field_cfg, occ, o, d, k, rc, train=True,
                               stop_app_grad=True,
                               need_rgb=False)["distance"]

    res["FULL fwd (bucketed)"] = timed(jax.jit(full_fwd), params, o, d, key,
                                       iters=I)

    def loss_fn(geo, o, d, k, gt):
        if plan:
            out = render_rays_bucketed(
                {"geo": geo, "app": params["app"]}, field_cfg, occ, o, d, k,
                rc, plan[0], plan[1], train=True, stop_app_grad=True,
                need_rgb=False)
        else:
            from perf_tpu.render.renderer import render_rays
            out = render_rays({"geo": geo, "app": params["app"]}, field_cfg,
                              occ, o, d, k, rc, train=True,
                              stop_app_grad=True, need_rgb=False)
        return (smooth_l1(out["distance"], gt, beta=1e-2)
                + 0.1 * jnp.mean(out["dist_loss"]))

    vg = jax.jit(jax.value_and_grad(loss_fn))
    res["loss+grad"] = timed(vg, params["geo"], o, d, key, gt_dist, iters=I)

    adam = optax.scale_by_adam(eps=1e-8)
    opt_state = adam.init(params["geo"])
    _, grads = vg(params["geo"], o, d, key, gt_dist)

    @jax.jit
    def adam_up(gr, st, p):
        up, st = adam.update(gr, st)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-2 * b, p, up), st

    res["adam update"] = timed(adam_up, grads, opt_state, params["geo"],
                               iters=I)

    step0 = jnp.asarray(0.0, jnp.float32)
    if deadline_ok():
        run_chunk = scene._get_phase_fn("geo", int(arrs["rays_o"].shape[0]))
        st = adam.init(params["geo"])
        res["FULL geo step"] = timed(run_chunk, params["geo"], params["app"],
                                     st, occ, arrs, key, step0, iters=I)

    if deadline_ok():
        run_app = scene._get_phase_fn("app", int(arrs["rays_o"].shape[0]))
        st_a = adam.init(params["app"])
        res["FULL app step"] = timed(run_app, params["app"], params["geo"],
                                     st_a, occ, arrs, key, step0, iters=I)

    print(f"\nshape: {args.rays} rays, budget {budget}, plan {plan}")
    for k, v in res.items():
        print(f"  {k:34s} {v:8.1f} ms")
    if "FULL geo step" in res:
        full = res["FULL geo step"]
        attributed = res["loss+grad"] + res["adam update"]
        print(f"\nunattributed (FULL - loss+grad - adam): "
              f"{full - attributed:8.1f} ms "
              f"({(full - attributed) / full:.0%})")


if __name__ == "__main__":
    main()
