"""Stride-GROUPED brick ray encode: one gather per distinct stride, A/B'd
against the shipped per-level encode (kernels/brickgrid.brick_encode_ray).

Hypothesis (VERDICT r3 item 2): the bucketed geo step issues one gather +
one scatter PER LEVEL (16 each at the flagship ladder); levels sharing a
subsampling stride read the same sample positions, so stacking them into
the row index (exactly like brick_encode_stacked, kernels/brickgrid.py:268)
turns 16 gather/scatter pairs into <=5 — same rows, same math, fewer ops.
At 8192x112-256 flagship shapes each op carries fixed scheduling cost, and
the round-2 trace attributed ~230 ms of the 620 ms r1 step to scheduling
gaps between exactly these ops.

Run CPU parity first (free), then on the idle chip:

    python tools/bench_grouped_encode.py --cpu      # parity + CPU timing
    python tools/bench_grouped_encode.py            # chip A/B

If the grouped path wins, it moves into kernels/brickgrid.py behind the
same brick_encode_ray contract (strides tuple), replacing the per-level
loop wholesale (no knob — same numerics).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def brick_encode_ray_grouped(table, x, y, z, cfg, strides):
    """Drop-in for brick_encode_ray: x/y/z [N, S] -> [N, S, L*F], ONE
    row gather (and one vjp scatter) per distinct stride value.

    Levels with the same stride share subsampled coords; their rows stack
    along a leading group axis with a +lvl*n_bricks offset into the flat
    [L*n_bricks, C] table view — the brick_encode_stacked plan
    (kernels/brickgrid.py:268-310) applied per stride-group on the ray
    layout. Output ordering matches brick_encode_ray exactly
    (level-major, features interleaved within level).
    """
    from perf_tpu.kernels.brickgrid import (
        _axis_split, _brick_index, _interp_from_rows, corner_interp_lowp,
    )
    from perf_tpu.kernels.hashgrid import _lerp_upsample

    smooth = cfg.interpolation == "smoothstep"
    n, s = x.shape
    nf = cfg.n_features
    nb_rows = table.shape[1]
    flat_table = table.reshape(cfg.n_levels * nb_rows, table.shape[-1])

    groups = {}
    for lvl in range(cfg.n_levels):
        groups.setdefault(strides[lvl], []).append(lvl)

    outs = [None] * (cfg.n_levels * nf)
    for k, lvls in sorted(groups.items()):
        if k == 1:
            xs, ys, zs = x, y, z
        else:
            assert s % k == 0
            xs = jnp.concatenate([x[:, ::k], x[:, -1:]], axis=1)
            ys = jnp.concatenate([y[:, ::k], y[:, -1:]], axis=1)
            zs = jnp.concatenate([z[:, ::k], z[:, -1:]], axis=1)
        rows_l, locs_l, fracs_l = [], [], []
        for lvl in lvls:
            res = cfg.level_res(lvl)
            nb = cfg.level_bricks(lvl)
            bx, lx, fx = _axis_split(xs, res, smooth)
            by, ly, fy = _axis_split(ys, res, smooth)
            bz, lz, fz = _axis_split(zs, res, smooth)
            rows_l.append(_brick_index(bx, by, bz, nb, nb_rows)
                          + lvl * nb_rows)
            locs_l.append((lx, ly, lz))
            fracs_l.append((fx, fy, fz))
        rows = jnp.stack(rows_l)                         # [G, N, P]
        locs = tuple(jnp.stack([locs_l[g][a] for g in range(len(lvls))])
                     for a in range(3))
        fracs = tuple(jnp.stack([fracs_l[g][a] for g in range(len(lvls))])
                      for a in range(3))
        if cfg.bf16_table:
            feats = corner_interp_lowp(nf, flat_table, rows, locs, fracs)
        else:
            feats = _interp_from_rows(flat_table[rows], locs, fracs, nf)
        for gi, lvl in enumerate(lvls):
            for f in range(nf):
                outs[lvl * nf + f] = _lerp_upsample(feats[f][gi], k, s)
    return jnp.stack(outs, axis=-1)


def brick_encode_ray_hybrid(table, x, y, z, cfg, strides):
    """Group ONLY the stride>=2 (coarse, overhead-bound) levels; keep the
    stride-1 fine levels as per-level gathers (millions of rows each — the
    regime where brick_encode_stacked's docstring records stacking as
    slower). Same contract/ordering as brick_encode_ray."""
    from perf_tpu.kernels.brickgrid import encode_brick_level

    smooth = cfg.interpolation == "smoothstep"
    nf = cfg.n_features
    fine = [lvl for lvl in range(cfg.n_levels) if strides[lvl] == 1]
    outs_g = brick_encode_ray_grouped_partial(table, x, y, z, cfg, strides,
                                              skip={1})
    outs = list(outs_g)
    for lvl in fine:
        feats = encode_brick_level(
            table[lvl], cfg.level_res(lvl), cfg.level_bricks(lvl), x, y, z,
            smooth, cfg.bf16_table, nf)
        for f in range(nf):
            outs[lvl * nf + f] = feats[f]
    # grouped_partial leaves skipped stride groups as None — every slot
    # must be filled before the stack or jnp.stack raises opaquely
    assert all(o is not None for o in outs), \
        "unfilled stride group: skip set does not match the fine levels"
    return jnp.stack(outs, axis=-1)


def brick_encode_ray_grouped_partial(table, x, y, z, cfg, strides, skip=()):
    """Grouped encode returning the flat per-(level, feature) list, with
    stride values in ``skip`` left as None (filled by the caller)."""
    from perf_tpu.kernels.brickgrid import (
        _axis_split, _brick_index, _interp_from_rows, corner_interp_lowp,
    )
    from perf_tpu.kernels.hashgrid import _lerp_upsample

    smooth = cfg.interpolation == "smoothstep"
    n, s = x.shape
    nf = cfg.n_features
    nb_rows = table.shape[1]
    flat_table = table.reshape(cfg.n_levels * nb_rows, table.shape[-1])

    groups = {}
    for lvl in range(cfg.n_levels):
        groups.setdefault(strides[lvl], []).append(lvl)

    outs = [None] * (cfg.n_levels * nf)
    for k, lvls in sorted(groups.items()):
        if k in skip:
            continue
        if k == 1:
            xs, ys, zs = x, y, z
        else:
            assert s % k == 0
            xs = jnp.concatenate([x[:, ::k], x[:, -1:]], axis=1)
            ys = jnp.concatenate([y[:, ::k], y[:, -1:]], axis=1)
            zs = jnp.concatenate([z[:, ::k], z[:, -1:]], axis=1)
        rows_l, locs_l, fracs_l = [], [], []
        for lvl in lvls:
            res = cfg.level_res(lvl)
            nb = cfg.level_bricks(lvl)
            bx, lx, fx = _axis_split(xs, res, smooth)
            by, ly, fy = _axis_split(ys, res, smooth)
            bz, lz, fz = _axis_split(zs, res, smooth)
            rows_l.append(_brick_index(bx, by, bz, nb, nb_rows)
                          + lvl * nb_rows)
            locs_l.append((lx, ly, lz))
            fracs_l.append((fx, fy, fz))
        rows = jnp.stack(rows_l)                         # [G, N, P]
        locs = tuple(jnp.stack([locs_l[g][a] for g in range(len(lvls))])
                     for a in range(3))
        fracs = tuple(jnp.stack([fracs_l[g][a] for g in range(len(lvls))])
                      for a in range(3))
        if cfg.bf16_table:
            feats = corner_interp_lowp(nf, flat_table, rows, locs, fracs)
        else:
            feats = _interp_from_rows(flat_table[rows], locs, fracs, nf)
        for gi, lvl in enumerate(lvls):
            for f in range(nf):
                outs[lvl * nf + f] = _lerp_upsample(feats[f][gi], k, s)
    return outs


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=112,
                    help="flagship adaptive budget (also try 256 = cap)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import perf_tpu
    perf_tpu.enable_persistent_compilation_cache()

    from perf_tpu.kernels.brickgrid import BrickGridConfig, brick_encode_ray
    from perf_tpu.kernels.hashgrid import level_strides

    cfg = BrickGridConfig()
    step = 5e-4
    n, s = args.rays, args.samples
    strides = level_strides(cfg, step, s)
    print(f"strides: {strides} -> {len(set(strides))} gather groups "
          f"(vs {cfg.n_levels} per-level ops)")

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    table = jax.random.uniform(k1, (cfg.n_levels, cfg.n_bricks, 128),
                               minval=-1e-1, maxval=1e-1)
    # ray-structured coords: random origins, small increasing t (t-ordered)
    o = jax.random.uniform(k2, (n, 3), minval=0.1, maxval=0.9)
    d = jax.random.normal(k3, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.cumsum(jax.random.uniform(k4, (n, s), minval=2e-4, maxval=1e-3),
                   axis=1)
    x = jnp.clip(o[:, 0:1] + d[:, 0:1] * t, 0.0, 1.0)
    y = jnp.clip(o[:, 1:2] + d[:, 1:2] * t, 0.0, 1.0)
    z = jnp.clip(o[:, 2:3] + d[:, 2:3] * t, 0.0, 1.0)

    variants = {
        "per-level": brick_encode_ray,
        "grouped": brick_encode_ray_grouped,
        "hybrid": brick_encode_ray_hybrid,
    }
    fns = {name: jax.jit(lambda tb, x, y, z, fn=fn: fn(tb, x, y, z, cfg,
                                                       strides))
           for name, fn in variants.items()}

    # -- parity (fwd + table grads) --------------------------------------
    fa = fns["per-level"](table, x, y, z)
    for name in ("grouped", "hybrid"):
        fb = fns[name](table, x, y, z)
        err = float(jnp.max(jnp.abs(fa - fb)))
        print(f"fwd parity [{name}]: max|diff| = {err:.2e}")
        assert err < 1e-5, f"{name} encode diverges from per-level encode"

    def make_loss(fn):
        def loss(tb):
            return jnp.sum(jnp.sin(fn(tb, x, y, z, cfg, strides)))
        return loss

    grads = {name: jax.jit(jax.grad(make_loss(fn)))
             for name, fn in variants.items()}
    ga = grads["per-level"](table)
    scale = float(jnp.max(jnp.abs(ga))) + 1e-12
    for name in ("grouped", "hybrid"):
        gb = grads[name](table)
        gerr = float(jnp.max(jnp.abs(ga - gb)))
        print(f"grad parity [{name}]: max|diff| = {gerr:.2e} "
              f"(rel {gerr / scale:.2e})")
        assert gerr / scale < 1e-4, f"{name} vjp diverges"

    # -- timing -----------------------------------------------------------
    I = args.iters
    res = {}
    for name in variants:
        res[f"{name} fwd"] = timed(fns[name], table, x, y, z, iters=I)
    for name in variants:
        res[f"{name} fwd+bwd"] = timed(grads[name], table, iters=I)
    print(f"\nshape: {n} rays x {s} samples, "
          f"platform {jax.devices()[0].platform}")
    for k, v in res.items():
        print(f"  {k:20s} {v:8.1f} ms")
    base_t = res["per-level fwd+bwd"]
    best = min(("grouped", "hybrid"), key=lambda nm: res[f"{nm} fwd+bwd"])
    speedup = base_t / res[f"{best} fwd+bwd"]
    print(f"\nbest variant: {best}, fwd+bwd speedup {speedup:.2f}x "
          f"({'WIN — wire into brickgrid' if speedup > 1.05 else 'no win'})")


if __name__ == "__main__":
    main()
