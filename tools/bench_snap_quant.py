"""int8-quantized snapshot table A/B (VERDICT r3 item 3, quantize lever).

The snapshot composite's per-sample cost is ONE 256-lane bf16 row gather
(render/snapshot.py). bf16 -> int8 halves the row bytes; whether that buys
frame time depends on whether wide gathers are byte-bound or row-bound on
this chip (BASELINE.md has both regimes). This tool measures it on a real
fitted scene, with the quality gate inline:

  - rgb lanes: affine int8 codes over [0, 1] (the composite clips there);
    linear interp of codes == interp of values (affine commutes), so the
    only error is the 1/254 quantization step.
  - sigma lane: affine int8 codes over log1p(sigma) in [0, max]; codes are
    interpolated linearly (= log-space interpolation, a different but
    monotone interpolant at bake-voxel scale) then expm1'd after interp.
  - scales are two GLOBAL floats baked into the jit (no per-brick scale
    table: a second narrow gather would cost a full per-row fetch and
    cancel the win).

    python tools/bench_snap_quant.py --ckpt /tmp/qscene.npz [--cpu]

Wins only if fps improves AND PSNR vs the bf16 composite stays >= 50 dB
(the snapshot quality bar). If it wins it becomes a SnapshotConfig dtype
knob in render/snapshot.py.
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


def quantize_snapshot(table_bf16: jnp.ndarray):
    """[R, 256] bf16 (sigma, r, g, b interleaved, lane = corner*4 + f)
    -> (int8 table [R, 256], sigma_logscale float)."""
    t = np.asarray(table_bf16, np.float32).reshape(-1, 64, 4)
    sig = np.log1p(np.maximum(t[..., 0], 0.0))
    s_sig = float(sig.max()) or 1.0
    q = np.empty_like(t)
    q[..., 0] = sig / s_sig
    q[..., 1:] = np.clip(t[..., 1:], 0.0, 1.0)
    codes = np.round(q * 254.0 - 127.0).astype(np.int8)
    return jnp.asarray(codes.reshape(-1, 256)), s_sig


@partial(jax.jit, static_argnames=("field_cfg", "cfg", "query_keys", "res",
                                   "s_sig"))
def _snapshot_chunk_planned_q(table_q, occ_grid, o_c, d_c, sidx_c, svalid_c,
                              field_cfg, cfg, res, query_keys, s_sig):
    """_snapshot_chunk_planned with an int8 code table: one int8 row gather,
    interp the CODES, dequant after interp (rgb affine / sigma expm1)."""
    from perf_tpu.render.renderer import (_fine_windows_from_segments,
                                          _windows_to_samples)
    from perf_tpu.kernels.brickgrid import _interp_from_rows, _axis_split, BRICK

    jitter = jnp.zeros((o_c.shape[0], 1))
    widx, wvalid = _fine_windows_from_segments(occ_grid, o_c, d_c,
                                               sidx_c, svalid_c, jitter, cfg)
    t_mid, valid = _windows_to_samples(widx, wvalid, jitter, cfg)

    span = field_cfg.aabb_max - field_cfg.aabb_min
    nx = (o_c[:, 0:1] + d_c[:, 0:1] * t_mid - field_cfg.aabb_min) / span
    ny = (o_c[:, 1:2] + d_c[:, 1:2] * t_mid - field_cfg.aabb_min) / span
    nz = (o_c[:, 2:3] + d_c[:, 2:3] * t_mid - field_cfg.aabb_min) / span
    sel = ((nx > 0.0) & (nx < 1.0) & (ny > 0.0) & (ny < 1.0)
           & (nz > 0.0) & (nz < 1.0)).astype(jnp.float32)

    bx, lx, fx = _axis_split(nx, res, False)
    by, ly, fy = _axis_split(ny, res, False)
    bz, lz, fz = _axis_split(nz, res, False)
    nb = res // BRICK + 1
    rows = bx * (nb * nb) + by * nb + bz
    sig_c, r_c, g_c, b_c = _interp_from_rows(table_q[rows], (lx, ly, lz),
                                             (fx, fy, fz), 4)
    # dequant after interp: codes -> [0,1] (affine), sigma through expm1
    def deq(c):
        return (c + 127.0) * (1.0 / 254.0)

    sig = jnp.expm1(jnp.maximum(deq(sig_c), 0.0) * s_sig) * valid * sel
    r, g, b = deq(r_c), deq(g_c), deq(b_c)

    tau = sig * (cfg.step * cfg.sample_stride)
    trans = jnp.exp(-(jnp.cumsum(tau, axis=-1) - tau))
    weights = trans * (1.0 - jnp.exp(-tau))
    opacity = jnp.sum(weights, axis=-1, keepdims=True)
    distance = jnp.sum(weights * t_mid, axis=-1, keepdims=True)
    colors = jnp.stack([jnp.sum(weights * jnp.clip(v, 0.0, 1.0), axis=-1)
                        for v in (r, g, b)], axis=-1)
    rest = 1.0 - opacity
    distance = distance + cfg.eval_bg_distance * rest
    colors = colors + 0.5 * rest
    out = {"rgb": colors, "distance": distance, "opacity": opacity}
    return {q: out[q] for q in query_keys}


def render_snapshot_q(table_q, s_sig, field_cfg, occ_grid, rays, render_cfg,
                      snap_cfg, query_keys=("rgb", "distance"), chunk=32768):
    """Chunked planned snapshot render over the int8 table (same plan +
    adaptive budgets as render_snapshot_image's planned path)."""
    import dataclasses
    from perf_tpu.render.snapshot import snapshot_render_cfg
    from perf_tpu.render.renderer import frame_march_plan, beam_dilation

    cfg = snapshot_render_cfg(render_cfg, snap_cfg)
    h, w = rays.o.shape[:2]
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
    o = rays.o.reshape(-1, chunk, 3)
    d = rays.d.reshape(-1, chunk, 3)
    sidx_px = sidx_px.reshape(-1, chunk, s_sel)
    svalid_px = svalid_px.reshape(-1, chunk, s_sel)
    outs = []
    for ci in range(n // chunk):
        s_need = (int(per_chunk[ci]) + 2) * spw
        b = min(cfg.max_samples, max(4 * spw, 1 << (s_need - 1).bit_length()))
        cfg_c = dataclasses.replace(cfg, max_samples=int(b))
        outs.append(_snapshot_chunk_planned_q(
            table_q, occ_grid, o[ci], d[ci], sidx_px[ci], svalid_px[ci],
            field_cfg, cfg_c, snap_cfg.res, tuple(query_keys), s_sig))
    return {q: jnp.concatenate([c[q] for c in outs], 0).reshape(h, w, -1)
            for q in query_keys}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/qscene.npz")
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

    table_q, s_sig = quantize_snapshot(scene.snapshot)
    print(f"quantized: int8 {table_q.shape}, sigma logscale {s_sig:.2f} "
          f"({table_q.nbytes / 2**20:.0f} MiB vs "
          f"{scene.snapshot.nbytes / 2**20:.0f} MiB bf16)")

    h, w = args.hw
    rays = gen_pano_rays(jnp.eye(4), h, w)

    out_bf = scene.render_snapshot(rays, ("rgb", "distance"))
    _sync(out_bf["rgb"])
    t0 = time.perf_counter()
    for _ in range(args.frames):
        out_bf = scene.render_snapshot(rays, ("rgb", "distance"))
    _sync(out_bf["rgb"])
    fps_bf = args.frames / (time.perf_counter() - t0)
    ref = np.asarray(out_bf["rgb"])
    ref_d = np.asarray(out_bf["distance"])
    print(f"bf16 chunked: {fps_bf:.3f} fps")

    out_q = render_snapshot_q(table_q, s_sig, field_cfg, scene.occ_grid,
                              rays, render_cfg, snap_cfg)
    _sync(out_q["rgb"])
    t0 = time.perf_counter()
    for _ in range(args.frames):
        out_q = render_snapshot_q(table_q, s_sig, field_cfg, scene.occ_grid,
                                  rays, render_cfg, snap_cfg)
    _sync(out_q["rgb"])
    fps_q = args.frames / (time.perf_counter() - t0)
    q_psnr = psnr(np.asarray(out_q["rgb"]), ref)
    d_mae = float(np.abs(np.asarray(out_q["distance"]) - ref_d).mean())
    print(f"int8 chunked: {fps_q:.3f} fps, PSNR vs bf16 {q_psnr:.1f} dB, "
          f"depth MAE {d_mae:.4f}")
    win = fps_q > fps_bf * 1.05 and q_psnr >= 50.0
    print(f"\nverdict: {'WIN — add dtype knob' if win else 'no win'} "
          f"({fps_q / fps_bf:.2f}x, gate >=1.05x and >=50 dB)")


if __name__ == "__main__":
    main()
