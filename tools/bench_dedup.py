"""Run-dedup encode microbench (round 3, VERDICT #4a).

Measures ``brick_encode_ray_dedup`` (one row gather per brick RUN + one-hot
MXU re-expansion) against the production ``brick_encode_ray`` (one row per
sample) at flagship train shapes, with sample positions marched from the
REAL flagship occupancy grid so the run statistics match production
(measured: 22-57 runs per 128 samples at the stride<=2 levels).

Run on the idle TPU chip:

    python tools/bench_dedup.py [--ckpt runs/.../ckpt.npz] [--samples 112]

Prints fwd and fwd+bwd ms for both paths; the integration decision (wire
into query_density_ray or record a negative verdict in BASELINE.md) hangs
off this number.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *a, iters=10):
    # float() forces a real D2H readback — on the tunneled axon backend
    # block_until_ready alone has been observed to return before execution
    out = fn(*a)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=
                    "runs/flagship_r3/exp/WildDataset_cozy_room/"
                    "nerf_experiment/checkpoints/ckpt.npz")
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=112)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--slack", type=int, default=8,
                    help="run-cap slack above the probed per-level worst")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from perf_tpu.core import gen_pano_rays
    from perf_tpu.kernels.brickgrid import (
        BrickGridConfig, init_brick_table, brick_encode_ray,
        brick_encode_ray_dedup, BRICK)
    from perf_tpu.kernels.hashgrid import level_strides
    from perf_tpu.render.renderer import RenderConfig, march_rays

    cfg = BrickGridConfig()
    rc = RenderConfig(max_samples=args.samples)
    z = np.load(args.ckpt, allow_pickle=True)
    # runner checkpoints nest the scene ("scene/occ_grid"); a bare
    # quality_episode --scene-ckpt saves the scene state dict directly
    occ = jnp.asarray(z["scene/occ_grid" if "scene/occ_grid" in z.files
                        else "occ_grid"])

    rays = gen_pano_rays(jnp.eye(4), 256, 512)
    o = np.asarray(rays.o.reshape(-1, 3))
    d = np.asarray(rays.d.reshape(-1, 3))
    sel = np.random.default_rng(0).choice(o.shape[0], args.rays,
                                          replace=False)
    o, d = jnp.asarray(o[sel]), jnp.asarray(d[sel])
    t_mid, valid = jax.jit(march_rays,
                           static_argnames=("cfg", "stratified"))(
        occ, o, d, jax.random.PRNGKey(0), rc, True)
    px = (o[:, None, :] + d[:, None, :] * t_mid[:, :, None])
    x01 = jnp.clip(px * 0.5 + 0.5, 0.0, 1.0)
    x, y, zc = x01[..., 0], x01[..., 1], x01[..., 2]

    strides = level_strides(cfg, rc.step, args.samples)
    # probe per-level run caps (host side, like the episode budget probe)
    caps = []
    for lvl in range(cfg.n_levels):
        k = strides[lvl]
        if k > 2:
            caps.append(0)
            continue
        res = cfg.level_res(lvl)
        xs = np.asarray(jnp.concatenate([x[:, ::k], x[:, -1:]], 1)
                        if k > 1 else x)
        ys = np.asarray(jnp.concatenate([y[:, ::k], y[:, -1:]], 1)
                        if k > 1 else y)
        zs = np.asarray(jnp.concatenate([zc[:, ::k], zc[:, -1:]], 1)
                        if k > 1 else zc)
        c0 = (np.clip(np.floor(np.stack([xs, ys, zs], -1) * res), 0,
                      res - 1).astype(np.int64) // BRICK)
        nbk = res // BRICK + 1
        r = c0[..., 0] * nbk * nbk + c0[..., 1] * nbk + c0[..., 2]
        worst = int(((r[:, 1:] != r[:, :-1]).sum(1) + 1).max())
        caps.append(min(xs.shape[1], worst + args.slack))
    caps = tuple(caps)
    rows_std = sum(args.samples if k == 1 else args.samples // k + 1
                   for k in strides)
    rows_dd = sum((c or (args.samples if k == 1 else args.samples // k + 1))
                  for c, k in zip(caps, strides))
    print(f"strides {strides}")
    print(f"run caps {caps}  (rows/ray ladder {rows_std} -> {rows_dd})")

    table = init_brick_table(jax.random.PRNGKey(1), cfg)

    std = jax.jit(lambda tb: brick_encode_ray(tb, x, y, zc, cfg, strides))
    dd = jax.jit(lambda tb: brick_encode_ray_dedup(tb, x, y, zc, cfg,
                                                   strides, caps))
    cot = jax.random.normal(jax.random.PRNGKey(2),
                            (args.rays, args.samples, cfg.out_dim))
    g_std = jax.jit(jax.grad(lambda tb: jnp.sum(
        brick_encode_ray(tb, x, y, zc, cfg, strides) * cot)))
    g_dd = jax.jit(jax.grad(lambda tb: jnp.sum(
        brick_encode_ray_dedup(tb, x, y, zc, cfg, strides, caps) * cot)))

    # value agreement at the probed caps
    dv = float(jnp.max(jnp.abs(std(table) - dd(table))))
    print(f"max |std - dedup| value diff: {dv:.3e}")

    for name, fn in (("fwd std", std), ("fwd dedup", dd),
                     ("fwd+bwd std", g_std), ("fwd+bwd dedup", g_dd)):
        print(f"{name:14s} {timed(fn, table, iters=args.iters):8.2f} ms")


if __name__ == "__main__":
    main()
