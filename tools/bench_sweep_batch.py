"""K-frame BATCHED snapshot sweep — the render_dense throughput lever.

The dense-travel workload renders ~180 pano frames through the baked
snapshot (reference ``core_exp_runner.py:223-246``). On the tunneled chip
every dispatch costs ~25 ms of HOST time, so the measured 2.27 fps frame is
~16 chunk dispatches + 1 plan readback of overhead per frame. Batching K
frames amortizes BOTH:

  1. ONE jitted plan dispatch computes frame_march_plan for all K poses
     (lax.map over the stacked ray grids) -> one counts readback for K
     frames;
  2. chunks from ALL K frames are pooled, grouped by adaptive budget, and
     rendered as <=G stacked lax.map dispatches (G ~ #distinct budgets) —
     the bench_render_dispatch grouping, K frames wide.

Round trips per frame: (1 plan + G + 1 D2H) / K. Math is bitwise the
per-frame planned path (same plan, same budgets-or-better: grouping across
frames never lowers a chunk's budget), PSNR-checked against the shipped
chunked renderer.

    python tools/bench_sweep_batch.py --ckpt /tmp/qscene.npz [--cpu]

If it wins it moves into app/runner.render_dense as the sweep execution
plan (and render/snapshot grows a batched entry point).
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


@partial(jax.jit, static_argnames=("cfg", "dilate"))
def _sweep_plan(occ_grid, o_b, d_b, cfg, dilate):
    """frame_march_plan for K stacked frames in ONE dispatch.
    o_b/d_b [K, H, W, 3] -> (sidx [K, nb, S], svalid, counts [K, H, W])."""
    from perf_tpu.render.renderer import frame_march_plan

    def body(args):
        o_img, d_img = args
        return frame_march_plan(occ_grid, o_img, d_img, cfg, dilate)

    return jax.lax.map(body, (o_b, d_b))


def render_sweep_batched(table, field_cfg, occ_grid, rays_list, render_cfg,
                         snap_cfg, query_keys=("rgb", "distance"),
                         chunk=32768, group_pad_pow2=True):
    """Render a LIST of [H, W] pano ray grids through the snapshot with
    one pooled plan dispatch + budget-grouped composite dispatches.

    Returns a list of per-frame dicts (same contract as
    render_snapshot_image per frame)."""
    import dataclasses
    from perf_tpu.render.snapshot import snapshot_render_cfg, _dedup_k_for
    from perf_tpu.render.renderer import beam_dilation
    from bench_render_dispatch import _snapshot_group

    cfg = snapshot_render_cfg(render_cfg, snap_cfg)
    kf = len(rays_list)
    h, w = rays_list[0].o.shape[:2]
    n = h * w
    assert n % chunk == 0
    n_chunks = n // chunk

    o_b = jnp.stack([r.o for r in rays_list])
    d_b = jnp.stack([r.d for r in rays_list])
    # pano ray grids share their direction spread across poses: one
    # host-side dilation bound serves the whole batch (max over frames)
    dil = beam_dilation(rays_list[0].d, cfg)

    sidx_b, svalid_b, counts = _sweep_plan(occ_grid, o_b, d_b, cfg, dil)
    s_sel = sidx_b.shape[2]

    # ONE readback for K frames' budgets
    per_chunk = np.asarray(
        jnp.max(counts.reshape(kf, -1, chunk), axis=2))      # [K, n_chunks]
    spw = cfg.samples_per_window
    budgets = np.empty((kf, n_chunks), np.int64)
    for fi in range(kf):
        for ci in range(n_chunks):
            s_need = (int(per_chunk[fi, ci]) + 2) * spw
            b = max(4 * spw, 1 << (s_need - 1).bit_length())
            budgets[fi, ci] = min(cfg.max_samples, b)

    def expand(x):                                            # [K, nb, S]
        x = jnp.repeat(jnp.repeat(
            x.reshape(kf, h // 4, w // 4, s_sel), 4, 1), 4, 2)
        return x.reshape(kf * n_chunks, chunk, s_sel)

    o_c = o_b.reshape(kf * n_chunks, chunk, 3)
    d_c = d_b.reshape(kf * n_chunks, chunk, 3)
    sidx_px = expand(sidx_b)
    svalid_px = expand(svalid_b)
    budgets_flat = budgets.reshape(-1)

    outs = [None] * (kf * n_chunks)
    for b in np.unique(budgets_flat):
        idx = np.nonzero(budgets_flat == b)[0]
        g = len(idx)
        idx_p = idx
        if group_pad_pow2:
            gp = 1 << (g - 1).bit_length()
            idx_p = np.concatenate([idx, np.repeat(idx[-1:], gp - g)])
        cfg_b = dataclasses.replace(cfg, max_samples=int(b))
        dk = _dedup_k_for(snap_cfg.dedup_ratio, int(b))
        out = _snapshot_group(table, occ_grid, o_c[idx_p], d_c[idx_p],
                              sidx_px[idx_p], svalid_px[idx_p],
                              field_cfg, cfg_b, snap_cfg.res,
                              tuple(query_keys), dk)
        for j, ci in enumerate(idx):
            outs[ci] = {q: out[q][j] for q in query_keys}

    frames = []
    for fi in range(kf):
        ret = {}
        for q in query_keys:
            cat = jnp.concatenate(
                [outs[fi * n_chunks + ci][q] for ci in range(n_chunks)],
                axis=0)
            ret[q] = cat.reshape(h, w, -1)
        frames.append(ret)
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/qscene.npz")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-frames", type=int, default=12,
                    help="sweep length to time (one circle arc)")
    ap.add_argument("--batch", type=int, nargs="+", default=(2, 4, 6),
                    help="K values to A/B")
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
    from perf_tpu.train.checkpoint import load_checkpoint
    from perf_tpu.utils.synthetic import psnr

    field_cfg = NGPFieldConfig(grid=BrickGridConfig())
    render_cfg = RenderConfig(eval_chunk=8192)
    scene = NeRFScene(field_cfg, render_cfg, TrainConfig(),
                      jax.random.PRNGKey(0))
    scene.load_state_dict(load_checkpoint(args.ckpt))
    snap_cfg = SnapshotConfig()
    t0 = time.perf_counter()
    scene.bake_snapshot(snap_cfg)
    _sync(scene.snapshot)
    print(f"bake: {time.perf_counter() - t0:.1f} s")

    h, w = args.hw
    # circle-arc sweep poses (render_dense's pano trajectory shape)
    nf = args.n_frames
    poses = []
    for i in range(nf):
        th = 2 * np.pi * i / max(nf, 1)
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = (0.12 * np.cos(th), 0.12 * np.sin(th), 0.0)
        poses.append(p)
    rays_all = [gen_pano_rays(jnp.asarray(p), h, w) for p in poses]

    # baseline: shipped chunked per-frame path
    out0 = scene.render_snapshot(rays_all[0], ("rgb", "distance"))
    _sync(out0["rgb"])
    t0 = time.perf_counter()
    for r in rays_all:
        out = scene.render_snapshot(r, ("rgb", "distance"))
    _sync(out["rgb"])
    fps_chunked = nf / (time.perf_counter() - t0)
    ref0 = np.asarray(out0["rgb"])
    print(f"chunked per-frame: {fps_chunked:.3f} fps")

    results = {"chunked": fps_chunked}
    for kf in args.batch:
        assert nf % kf == 0, (nf, kf)
        # warmup (compile all budget-group programs for this K)
        frames = render_sweep_batched(scene.snapshot, field_cfg,
                                      scene.occ_grid, rays_all[:kf],
                                      render_cfg, snap_cfg)
        _sync(frames[-1]["rgb"])
        q = psnr(np.asarray(frames[0]["rgb"]), ref0)
        t0 = time.perf_counter()
        for s in range(0, nf, kf):
            frames = render_sweep_batched(scene.snapshot, field_cfg,
                                          scene.occ_grid,
                                          rays_all[s:s + kf],
                                          render_cfg, snap_cfg)
        _sync(frames[-1]["rgb"])
        fps = nf / (time.perf_counter() - t0)
        results[f"batched_K{kf}"] = fps
        print(f"batched K={kf}: {fps:.3f} fps, frame-0 PSNR vs chunked "
              f"{q:.1f} dB")

    best = max(results, key=results.get)
    print(f"\nbest: {best} at {results[best]:.3f} fps "
          f"(chunked {fps_chunked:.3f}, "
          f"{results[best] / fps_chunked:.2f}x)")


if __name__ == "__main__":
    main()
