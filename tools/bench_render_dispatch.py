"""Snapshot-render dispatch anatomy + grouped-dispatch A/B (VERDICT r3 #3).

The measured 1024x512 snapshot frame is ~456 ms of which ~16 chunk
dispatches x ~25 ms tunnel round-trip is the bulk (BASELINE.md round-3
verdicts: the all-cap one-dispatch frame LOST because it forgoes adaptive
budgets). This tool measures, on a REAL fitted scene ckpt:

  1. the per-chunk adaptive budget distribution at 1024x512 (how much the
     all-cap frame over-shades; how many distinct budget groups exist),
  2. frame time vs eval chunk size (32768 default; 65536 halves dispatches),
  3. BUDGET-GROUPED frame dispatch: chunks sharing a budget render as ONE
     lax.map dispatch over stacked chunks — keeps the adaptive budgets,
     cuts 16 round-trips to <= #distinct-budgets (+1 probe). PSNR-checked
     against the chunked path on the same rays.

    python tools/bench_render_dispatch.py --ckpt /tmp/qscene.npz [--cpu]

If grouped dispatch wins it moves into render/snapshot.py as the default
chunked-path execution plan (same budgets, same math, fewer dispatches).
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


@partial(jax.jit, static_argnames=("field_cfg", "cfg", "query_keys", "res",
                                   "dedup_k"))
def _snapshot_group(table, occ_grid, o_g, d_g, sidx_g, svalid_g,
                    field_cfg, cfg, res, query_keys, dedup_k=0):
    """ONE dispatch for a stacked group of planned chunks [G, chunk, 3]:
    lax.map over the group at the group's shared static budget. Body =
    render/snapshot._snapshot_chunk_planned's math."""
    from perf_tpu.render.snapshot import _composite_snapshot
    from perf_tpu.render.renderer import (_fine_windows_from_segments,
                                          _windows_to_samples)

    def body(args):
        o_c, d_c, si_c, sv_c = args
        jitter = jnp.zeros((o_c.shape[0], 1))
        widx, wvalid = _fine_windows_from_segments(occ_grid, o_c, d_c,
                                                   si_c, sv_c, jitter, cfg)
        t_mid, valid = _windows_to_samples(widx, wvalid, jitter, cfg)
        return _composite_snapshot(table, o_c, d_c, t_mid, valid,
                                   field_cfg, cfg, res, query_keys, dedup_k)

    return jax.lax.map(body, (o_g, d_g, sidx_g, svalid_g))


def render_snapshot_grouped(table, field_cfg, occ_grid, rays, render_cfg,
                            snap_cfg, query_keys=("rgb", "distance"),
                            chunk=32768, group_pad_pow2=True):
    """Chunked snapshot render with BUDGET-GROUPED dispatches.

    Same plan + per-chunk budgets as render_snapshot_image's planned path;
    chunks are then grouped by budget value and each group renders as one
    stacked lax.map dispatch. Group sizes are padded up to powers of two
    (with repeated chunks, discarded on unpack) so the compile cache sees
    at most #budgets x log2(#chunks) programs across a sweep.
    """
    import dataclasses
    from perf_tpu.render.snapshot import snapshot_render_cfg, _dedup_k_for
    from perf_tpu.render.renderer import frame_march_plan, beam_dilation

    cfg = snapshot_render_cfg(render_cfg, snap_cfg)
    pre_shape = rays.o.shape[:-1]
    assert len(pre_shape) == 2 and pre_shape[0] % 4 == 0 \
        and pre_shape[1] % 4 == 0, "2D frame only"
    h, w = pre_shape
    n = h * w
    assert n % chunk == 0
    dil = beam_dilation(rays.d, cfg)
    sidx_b, svalid_b, counts = frame_march_plan(occ_grid, rays.o, rays.d,
                                                cfg, dil)
    s_sel = sidx_b.shape[1]

    def expand(x):
        x = jnp.repeat(jnp.repeat(x.reshape(h // 4, w // 4, s_sel), 4, 0),
                       4, 1)
        return x.reshape(-1, s_sel)

    sidx_px, svalid_px = expand(sidx_b), expand(svalid_b)
    per_chunk = np.asarray(jnp.max(counts.reshape(-1, chunk), axis=1))
    spw = cfg.samples_per_window
    budgets = []
    for w_need in per_chunk:
        s_need = (int(w_need) + 2) * spw
        b = max(4 * spw, 1 << (s_need - 1).bit_length())
        budgets.append(min(cfg.max_samples, b))
    budgets = np.asarray(budgets)

    o = rays.o.reshape(-1, chunk, 3)
    d = rays.d.reshape(-1, chunk, 3)
    sidx_px = sidx_px.reshape(-1, chunk, s_sel)
    svalid_px = svalid_px.reshape(-1, chunk, s_sel)

    n_chunks = n // chunk
    outs = [None] * n_chunks
    for b in np.unique(budgets):
        idx = np.nonzero(budgets == b)[0]
        g = len(idx)
        if group_pad_pow2:
            gp = 1 << (g - 1).bit_length()
            idx_p = np.concatenate([idx, np.repeat(idx[-1:], gp - g)])
        else:
            idx_p = idx
        cfg_b = dataclasses.replace(cfg, max_samples=int(b))
        dk = _dedup_k_for(snap_cfg.dedup_ratio, int(b))
        out = _snapshot_group(table, occ_grid, o[idx_p], d[idx_p],
                              sidx_px[idx_p], svalid_px[idx_p],
                              field_cfg, cfg_b, snap_cfg.res,
                              tuple(query_keys), dk)
        for j, ci in enumerate(idx):
            outs[ci] = {q: out[q][j] for q in query_keys}
    ret = {}
    for q in query_keys:
        cat = jnp.concatenate([c[q] for c in outs], axis=0)
        ret[q] = cat.reshape(h, w, -1)
    return ret, budgets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/qscene.npz",
                    help="fitted scene ckpt from tools/quality_episode.py")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import perf_tpu
    perf_tpu.enable_persistent_compilation_cache()

    from perf_tpu.core import gen_pano_rays
    from perf_tpu.fields import NGPFieldConfig
    from perf_tpu.kernels import BrickGridConfig
    from perf_tpu.render import RenderConfig
    from perf_tpu.render.snapshot import SnapshotConfig
    from perf_tpu.train import NeRFScene, TrainConfig
    from perf_tpu.utils.synthetic import psnr

    from perf_tpu.train.checkpoint import load_checkpoint
    field_cfg = NGPFieldConfig(grid=BrickGridConfig())
    render_cfg = RenderConfig(eval_chunk=8192)
    scene = NeRFScene(field_cfg, render_cfg, TrainConfig(),
                      jax.random.PRNGKey(0))
    # quality_episode --scene-ckpt saves the scene state dict directly
    scene.load_state_dict(load_checkpoint(args.ckpt))
    snap_cfg = SnapshotConfig()
    t0 = time.perf_counter()
    scene.bake_snapshot(snap_cfg)
    _sync(scene.snapshot)
    print(f"bake: {time.perf_counter() - t0:.1f} s")

    h, w = args.hw
    rays = gen_pano_rays(jnp.eye(4), h, w)

    # 1. chunked baseline (the shipped path) at chunk sizes
    results = {}
    ref_rgb = None
    for chunk in (32768, 65536):
        out = scene.render_snapshot(rays, ("rgb", "distance"), chunk=chunk)
        _sync(out["rgb"])
        t0 = time.perf_counter()
        for _ in range(args.frames):
            out = scene.render_snapshot(rays, ("rgb", "distance"),
                                        chunk=chunk)
        _sync(out["rgb"])
        fps = args.frames / (time.perf_counter() - t0)
        results[f"chunked_{chunk}"] = fps
        if chunk == 32768:
            ref_rgb = np.asarray(out["rgb"])
        print(f"chunked chunk={chunk}: {fps:.3f} fps")

    # 2. budget-grouped dispatch
    from perf_tpu.render.snapshot import snapshot_render_cfg
    for chunk in (32768, 65536):
        out, budgets = render_snapshot_grouped(
            scene.snapshot, field_cfg, scene.occ_grid, rays, render_cfg,
            snap_cfg, chunk=chunk)
        _sync(out["rgb"])
        uniq, cnts = np.unique(budgets, return_counts=True)
        t0 = time.perf_counter()
        for _ in range(args.frames):
            out, _ = render_snapshot_grouped(
                scene.snapshot, field_cfg, scene.occ_grid, rays, render_cfg,
                snap_cfg, chunk=chunk)
        _sync(out["rgb"])
        fps = args.frames / (time.perf_counter() - t0)
        results[f"grouped_{chunk}"] = fps
        q = psnr(np.asarray(out["rgb"]), ref_rgb)
        print(f"grouped chunk={chunk}: {fps:.3f} fps, budgets "
              f"{dict(zip(uniq.tolist(), cnts.tolist()))}, "
              f"PSNR vs chunked {q:.1f} dB")

    best = max(results, key=results.get)
    print(f"\nbest: {best} at {results[best]:.3f} fps "
          f"(chunked_32768 baseline {results['chunked_32768']:.3f})")


if __name__ == "__main__":
    main()
