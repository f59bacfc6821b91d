"""Subtractive profile of the geo train step at the flagship shape.

Times each stage as its own jitted program (march alone, encode fwd, full
forward render, loss+grad, adam update, full step) so the full-step time can
be attributed without trace-viewer tooling. Run on the real TPU:

    python tools/profile_step.py [--samples 256] [--rays 8192]
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
    # force a real D2H readback of one scalar-ish leaf: on the tunneled axon
    # backend block_until_ready alone can return before execution finishes
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def timed(fn, *a, iters=10, **kw):
    out = fn(*a, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--auto-budget", action="store_true",
                    help="use the scene's adaptive sample budget "
                         "(--samples becomes the cap)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax
    from perf_tpu.core import gen_pano_rays
    from perf_tpu.fields import NGPFieldConfig, init_ngp_params
    from perf_tpu.kernels import BrickGridConfig
    from perf_tpu.kernels.distortion import distortion_loss
    from perf_tpu.render import RenderConfig
    from perf_tpu.render.renderer import march_rays, render_rays
    from perf_tpu.train import SupInfoPool, NeRFScene, TrainConfig
    from perf_tpu.train.schedule import smooth_l1
    from perf_tpu.utils import render_cube_room_pano

    h, w = 1024, 2048
    field_cfg = NGPFieldConfig(grid=BrickGridConfig())
    render_cfg = RenderConfig(max_samples=args.samples)
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pool = SupInfoPool()
    pool.register_sup_info(np.eye(4, dtype=np.float32), np.ones((h, w)),
                           pano["rgb"], pano["distance"], pano["normal"])
    occ = pool.gen_occ_grid(render_cfg.occ_res)
    arrs = pool.device_arrays()
    params = init_ngp_params(jax.random.PRNGKey(0), field_cfg)
    tc = TrainConfig(pixel_loss_batch_size=args.rays, scan_chunk=1)
    scene = NeRFScene(field_cfg, render_cfg, tc, jax.random.PRNGKey(0))
    scene.occ_grid = occ
    if args.auto_budget:
        scene.sample_budget = scene.select_sample_budget(arrs)
        args.samples = scene.sample_budget
        import dataclasses
        render_cfg = dataclasses.replace(render_cfg,
                                         max_samples=scene.sample_budget)
    key = jax.random.PRNGKey(1)

    # a fixed sampled batch
    idx = jax.random.randint(jax.random.PRNGKey(2), (args.rays,), 0,
                             int(arrs["n_valid"]))
    o, d = arrs["rays_o"][idx], arrs["rays_d"][idx]
    gt_dist = arrs["distances"][idx]

    I = args.iters
    res = {}

    march = jax.jit(lambda o, d, k: march_rays(occ, o, d, k, render_cfg, True))
    res["march"] = timed(march, o, d, key, iters=I)

    fwd = jax.jit(lambda p, o, d, k: render_rays(
        p, field_cfg, occ, o, d, k, render_cfg, train=True,
        stop_app_grad=True, need_rgb=False)["distance"])
    res["forward(render_rays geo)"] = timed(fwd, params, o, d, key, iters=I)

    def loss_fn(geo, o, d, k, gt):
        out = render_rays({"geo": geo, "app": params["app"]}, field_cfg, occ,
                          o, d, k, render_cfg, train=True,
                          stop_app_grad=True, need_rgb=False)
        return (smooth_l1(out["distance"], gt, beta=1e-2)
                + 0.1 * distortion_loss(out["weights"], out["t_mid"],
                                        render_cfg.step, out["valid"]))

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

    run_chunk = scene._get_phase_fn("geo", int(arrs["rays_o"].shape[0]))
    st = adam.init(params["geo"])
    step0 = jnp.asarray(0.0, jnp.float32)
    res["FULL geo step"] = timed(
        run_chunk, params["geo"], params["app"], st, occ, arrs, key, step0,
        iters=I)

    print(f"\nshape: {args.rays} rays x {args.samples} samples")
    for k, v in res.items():
        print(f"  {k:28s} {v:8.1f} ms")


if __name__ == "__main__":
    main()
