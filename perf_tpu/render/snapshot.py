"""Baked snapshot renderer — the TPU-first fast eval path.

Why this exists (all rates measured on the chip, BASELINE.md): TPU random
row gathers run at a fixed per-ROW rate (~70-200M rows/s depending on
table size), independent of row width up to 256 lanes. Field eval costs
~6 gather rows per sample (one per active hash level), so eval rendering
is gather-row-bound — the regime where CUDA's L2 makes tcnn cheap and the
TPU is ~10x slower per row. The appearance head is view-INDEPENDENT
(``fields/ngp.py:10``, reference ``modules/fields/ngp_nerf.py``
use_viewdirs=False), so after an episode the whole radiance field can be
baked once into ONE dense brick-packed grid whose rows carry
(sigma, r, g, b) x 4^3 corners in 256 bf16 lanes:

- every eval sample costs exactly ONE 256-lane row gather (6x fewer rows),
- the bake grid's Nyquist step lets the march sample ~4x sparser inside
  occupied windows (``RenderConfig.sample_stride``),
- the bake itself is a streaming sweep over occupied voxels only
  (one-shot, amortized over e.g. the 180-frame ``render_dense`` sweep —
  reference ``core_exp_runner.py:223-246``).

The reference has no baked path; it re-queries tcnn per sample per frame.
This is the redesign, not a port: same compositing semantics as
``renderer.render_rays`` eval (checked by the parity test), different
execution plan. Brick packing mirrors ``kernels/brickgrid.py`` (dense
brick indexing, feature-interleaved lanes) so the same factored
interpolation applies with n_features=4.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.ngp import (NGPFieldConfig, query_density_coords,
                          query_rgb_coords)
from ..kernels.brickgrid import BRICK, BLANE, _interp_from_rows, _axis_split
from .renderer import (RenderConfig, march_rays, count_occupied_windows,
                       beam_dilation, frame_march_plan,
                       _fine_windows_from_segments, _windows_to_samples)

SNAP_F = 4   # lanes per corner: sigma, r, g, b


@dataclasses.dataclass(frozen=True)
class SnapshotConfig:
    # bake grid resolution over the aabb. Flagship ablation (full episode,
    # tools/quality_episode.py --scene-ckpt): 384 matches 512 in PSNR
    # (54.0 vs 53.7 dB; field path 38.5) with a 2.3x smaller table and
    # proportionally faster gathers/bake.
    res: int = 384
    # march-step multiplier; None -> largest divisor of march_coarse that
    # keeps the sample spacing <= ~one bake voxel. Measured at flagship:
    # voxel-rate sampling loses 0.3-0.8 dB vs half-voxel (53.2 vs 54.0 at
    # res 384) and both depth-MAEs IMPROVE, while halving the dominant
    # per-sample gather rows (1.57 -> 2.14 fps at 1024x512). A fixed value
    # is a footgun: the right stride depends on the RenderConfig step.
    sample_stride: int | None = None
    # snapshot-path march window granularity (fine steps per window);
    # None -> inherit RenderConfig.march_coarse. The stride must divide the
    # window, so 2-voxel sampling (sample_stride=16) needs 16-step windows —
    # this knob gives the SNAPSHOT march its own granularity instead of
    # forcing a second march_coarse=16 scene (the round-4 bench A/B hack).
    # Gated by the 50 dB snapshot bar on a converged flagship scene
    # (tools/bench_snap_coarse.py; BASELINE.md round-5).
    march_coarse: int | None = None
    bake_chunk: int = 1 << 21   # field-eval points per bake dispatch
    # host-side bake (pre-round-5 path): per-chunk D2H of the evals, a host
    # scatter, then one ~456 MB H2D of the dense volume through the tunnel.
    # The default device path keeps everything resident: occupied-corner
    # indices come from a device nonzero over the (device) occupancy grid
    # (ONE scalar readback), eval + scatter + pack all run on device. Same
    # corners, same math, bitwise-equal table (tests/test_snapshot.py).
    bake_host: bool = False
    # eval sample cap at the snapshot stride; None -> 256 // stride
    # (the field path's cap, shrunk by the sparser in-window sampling)
    max_samples: int | None = None
    # run-dedup in the composite: gather one 256-lane row per brick RUN
    # (K = ceil(ratio * S) candidates) and re-expand with a one-hot MXU
    # matmul — same trick as kernels/brickgrid.brick_encode_ray_dedup, on
    # the dense bake grid where t-adjacent samples share bricks for ~4
    # samples at the default stride. 0.0 = off; rays with more runs than K
    # clip to the last candidate (eval-only approximation, gate with the
    # quality tool before enabling in production).
    dedup_ratio: float = 0.0
    # ONE dispatch per frame: fold the march plan, the per-pixel expansion
    # and every composite chunk (lax.map over stacked chunks) into a single
    # jitted call at a FIXED per-frame sample budget (the snapshot cap —
    # small, 256/stride). Trades the per-chunk adaptive budgets (<=2x extra
    # device samples on a ~tens-of-ms compute) for 16+ fewer ~25 ms tunnel
    # round-trips and zero mid-frame host readbacks — the measured 2.25 fps
    # frame is mostly dispatch overhead (BASELINE.md round-3 backlog). One
    # compile per (H, W, chunk). OFF until the chip A/B (runbook) records
    # the win; 2D ray grids only (flat batches fall back to chunked).
    frame_dispatch: bool = False

    @property
    def n_bricks(self) -> int:
        return self.res // BRICK + 1

    def resolve_stride(self, render_cfg: RenderConfig) -> int:
        mc = self.march_coarse or render_cfg.march_coarse
        if self.sample_stride is not None:
            return self.sample_stride
        voxel = 2.0 / self.res          # aabb spans [-1, 1]
        want = max(1, int(round(voxel / render_cfg.step)))
        stride = 1
        for d in range(1, mc + 1):
            if mc % d == 0 and d <= want:
                stride = d
        return stride


@partial(jax.jit, static_argnames=("nb",))
def _brick_pack_dense(vol: jnp.ndarray, nb: int) -> jnp.ndarray:
    """[res+1, res+1, res+1, F] corner values -> [nb^3, 64*F] rows.

    Brick b covers corners [3b, 3b+3] per axis (overlap 1, exactly as
    kernels/brickgrid.py); lane = ((cx*4+cy)*4+cz)*F + f. Built from 64
    strided slices — pure reshapes/slices, no gathers. Jitted: at flagship
    res the packed table is ~2.6 GB and an eager pack materializes every
    slice separately (OOM on a 16 GB chip)."""
    f = vol.shape[-1]
    pad = 3 * nb + 1 - vol.shape[0]
    vol = jnp.pad(vol, ((0, pad), (0, pad), (0, pad), (0, 0)))
    lanes = []
    for a in range(BLANE):
        for b in range(BLANE):
            for c in range(BLANE):
                lanes.append(jax.lax.slice(
                    vol, (a, b, c, 0),
                    (a + 3 * (nb - 1) + 1, b + 3 * (nb - 1) + 1,
                     c + 3 * (nb - 1) + 1, f),
                    (3, 3, 3, 1)))                     # [nb, nb, nb, F]
    packed = jnp.stack(lanes, axis=-2)                 # [nb, nb, nb, 64, F]
    return packed.reshape(nb ** 3, 64 * f).astype(jnp.bfloat16)


@partial(jax.jit, donate_argnums=(0,),
         static_argnames=("field_cfg", "chunk", "res"))
def _bake_chunk_device(vol: jnp.ndarray, params: dict, flat_idx: jnp.ndarray,
                       start: jnp.ndarray, n_occ: jnp.ndarray,
                       field_cfg: NGPFieldConfig, chunk: int,
                       res: int) -> jnp.ndarray:
    """Eval one chunk of occupied corners and scatter into the flat volume.

    ``vol`` is donated: the loop's ~27 dispatches update one resident
    [(res+1)^3, 4] bf16 buffer in place. ``start``/``n_occ`` are traced
    scalars so every chunk reuses one compiled program; padding slots
    (position >= n_occ) scatter out of bounds and are dropped, so a corner
    that IS occupied is never overwritten by padding."""
    rp1 = res + 1
    idx = jax.lax.dynamic_slice(flat_idx, (start,), (chunk,))
    i = idx // (rp1 * rp1)
    rem = idx % (rp1 * rp1)
    j, k = rem // rp1, rem % rp1
    span = field_cfg.aabb_max - field_cfg.aabb_min
    scale = span / res
    x = field_cfg.aabb_min + scale * i.astype(jnp.float32)
    y = field_cfg.aabb_min + scale * j.astype(jnp.float32)
    z = field_cfg.aabb_min + scale * k.astype(jnp.float32)
    sig = query_density_coords(params["geo"], x, y, z, field_cfg)
    r, g, b = query_rgb_coords(params["app"], x, y, z, field_cfg)
    vals = jnp.stack([sig, r, g, b], axis=-1).astype(jnp.bfloat16)
    valid = (start + jnp.arange(chunk, dtype=idx.dtype)) < n_occ
    idx = jnp.where(valid, idx, rp1 ** 3)
    return vol.at[idx].set(vals, mode="drop")


def _bake_snapshot_device(params: dict, field_cfg: NGPFieldConfig,
                          occ_grid: jnp.ndarray, occ_res: int,
                          cfg: SnapshotConfig) -> jnp.ndarray:
    """Fully device-resident bake: same occupied corners as the host path
    (1-dilated occupancy), but the index selection (device nonzero), the
    field evals, the scatter, and the brick pack never leave the chip.
    Host traffic is ONE scalar (the occupied-corner count) vs the host
    path's per-chunk D2H + ~456 MB dense-volume H2D through the tunnel."""
    res, rp1 = cfg.res, cfg.res + 1
    g = occ_grid.reshape(occ_res, occ_res, occ_res)
    g = jax.lax.reduce_window(g, np.uint8(0), jax.lax.max,
                              (3, 3, 3), (1, 1, 1), "SAME")
    corner01 = jnp.arange(rp1, dtype=jnp.float32) / res
    vox = jnp.clip((corner01 * occ_res).astype(jnp.int32), 0, occ_res - 1)
    m = jnp.take(g, vox, axis=0)
    m = jnp.take(m, vox, axis=1)
    m = jnp.take(m, vox, axis=2)                       # [rp1, rp1, rp1]
    n_occ = int(jax.device_get(jnp.sum(m.astype(jnp.uint32))))
    chunk = cfg.bake_chunk
    n_pad = max(chunk, -(-n_occ // chunk) * chunk)
    (flat_idx,) = jnp.nonzero(m.ravel(), size=n_pad, fill_value=0)
    flat_idx = flat_idx.astype(jnp.int32) if rp1 ** 3 < 2 ** 31 \
        else flat_idx
    vol = jnp.zeros((rp1 ** 3, SNAP_F), jnp.bfloat16)
    n_occ_dev = jnp.asarray(n_occ, flat_idx.dtype)
    for start in range(0, n_pad, chunk):
        vol = _bake_chunk_device(vol, params, flat_idx,
                                 jnp.asarray(start, flat_idx.dtype),
                                 n_occ_dev, field_cfg, chunk, res)
    return _brick_pack_dense(vol.reshape(rp1, rp1, rp1, SNAP_F),
                             cfg.n_bricks)


def bake_snapshot(params: dict, field_cfg: NGPFieldConfig,
                  occ_grid: jnp.ndarray, occ_res: int,
                  cfg: SnapshotConfig) -> jnp.ndarray:
    """Evaluate (sigma, rgb) on the bake grid's occupied corners and pack.

    Only corners whose (1-dilated) occupancy voxel is set are evaluated —
    the march never samples outside occupied windows, and the dilation
    covers interpolation support at shell boundaries. Returns the packed
    [nb^3, 256] bf16 table. Default path is fully device-resident
    (``_bake_snapshot_device``); ``cfg.bake_host`` restores the round-3/4
    host-scatter bake (kept for A/B and as a low-HBM fallback).
    """
    if not cfg.bake_host:
        return _bake_snapshot_device(params, field_cfg, occ_grid, occ_res,
                                     cfg)
    res = cfg.res
    # dilate occupancy once (device), then select corners on host
    g = occ_grid.reshape(occ_res, occ_res, occ_res)
    g = jax.lax.reduce_window(g, np.uint8(0), jax.lax.max,
                              (3, 3, 3), (1, 1, 1), "SAME")
    occ_np = np.asarray(g).astype(bool)

    # corner i -> world -1 + 2*i/res -> occupancy voxel
    corner01 = np.arange(res + 1, dtype=np.float64) / res
    vox = np.clip((corner01 * occ_res).astype(np.int64), 0, occ_res - 1)
    occ_corner = occ_np[np.ix_(vox, vox, vox)]
    ii, jj, kk = np.nonzero(occ_corner)
    n_occ = ii.shape[0]

    span = field_cfg.aabb_max - field_cfg.aabb_min
    vol = np.zeros((res + 1, res + 1, res + 1, SNAP_F), np.float32)

    @jax.jit
    def eval_chunk(params, x, y, z):
        sig = query_density_coords(params["geo"], x, y, z, field_cfg)
        r, g_, b = query_rgb_coords(params["app"], x, y, z, field_cfg)
        return sig, r, g_, b

    chunk = cfg.bake_chunk
    corner_w = (corner01 * span + field_cfg.aabb_min).astype(np.float32)
    for start in range(0, n_occ, chunk):
        sl = slice(start, start + chunk)
        i_c, j_c, k_c = ii[sl], jj[sl], kk[sl]
        n = i_c.shape[0]
        n_pad = (-n) % 1024
        if n_pad:
            i_c = np.concatenate([i_c, np.zeros(n_pad, i_c.dtype)])
            j_c = np.concatenate([j_c, np.zeros(n_pad, j_c.dtype)])
            k_c = np.concatenate([k_c, np.zeros(n_pad, k_c.dtype)])
        outs = eval_chunk(params, jnp.asarray(corner_w[i_c]),
                          jnp.asarray(corner_w[j_c]),
                          jnp.asarray(corner_w[k_c]))
        outs = np.stack([np.asarray(o) for o in outs], axis=-1)[:n]
        vol[ii[sl], jj[sl], kk[sl]] = outs

    # ship the volume bf16 (halves the H2D transfer through the tunnel;
    # the table is bf16 anyway) and pack on device under jit
    return _brick_pack_dense(jnp.asarray(vol.astype(jnp.bfloat16)),
                             cfg.n_bricks)


def snapshot_render_cfg(render_cfg: RenderConfig,
                        cfg: SnapshotConfig) -> RenderConfig:
    """March config for the snapshot: same ladder/occupancy as the field
    path, sparser in-window sampling at the bake grid's Nyquist; the window
    granularity itself can be overridden (``SnapshotConfig.march_coarse``)."""
    if cfg.march_coarse:
        render_cfg = dataclasses.replace(render_cfg,
                                         march_coarse=cfg.march_coarse)
    stride = cfg.resolve_stride(render_cfg)
    assert render_cfg.march_coarse % stride == 0
    max_samples = cfg.max_samples or max(
        render_cfg.march_coarse // stride, 256 // stride)
    return dataclasses.replace(render_cfg, sample_stride=stride,
                               max_samples=max_samples)


@partial(jax.jit, static_argnames=("field_cfg", "cfg", "query_keys", "res",
                                   "dedup_k"))
def _snapshot_chunk(table, occ_grid, o_c, d_c, field_cfg, cfg, res,
                    query_keys, dedup_k=0):
    """One snapshot eval dispatch: march -> ONE row gather per sample ->
    factored interp of (sigma, r, g, b) -> composite (eval semantics of
    render_rays: gray bg, eval_bg_distance fill)."""
    t_mid, valid = march_rays(occ_grid, o_c, d_c,
                              jax.random.PRNGKey(0), cfg, stratified=False)
    return _composite_snapshot(table, o_c, d_c, t_mid, valid,
                               field_cfg, cfg, res, query_keys, dedup_k)


@partial(jax.jit, static_argnames=("field_cfg", "cfg", "query_keys", "res",
                                   "dedup_k"))
def _snapshot_chunk_planned(table, occ_grid, o_c, d_c, sidx_c, svalid_c,
                            field_cfg, cfg, res, query_keys, dedup_k=0):
    """Planned variant: the coarse segment selection comes from the
    per-block frame plan (renderer.frame_march_plan); only the fine
    window probes run per ray."""
    jitter = jnp.zeros((o_c.shape[0], 1))
    widx, wvalid = _fine_windows_from_segments(occ_grid, o_c, d_c,
                                               sidx_c, svalid_c, jitter, cfg)
    t_mid, valid = _windows_to_samples(widx, wvalid, jitter, cfg)
    return _composite_snapshot(table, o_c, d_c, t_mid, valid,
                               field_cfg, cfg, res, query_keys, dedup_k)


def _composite_snapshot(table, o_c, d_c, t_mid, valid, field_cfg, cfg, res,
                        query_keys, dedup_k=0):
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
    if dedup_k and dedup_k < t_mid.shape[1]:
        # one row per brick RUN + one-hot MXU re-expansion (see
        # SnapshotConfig.dedup_ratio); rid clips at K-1
        tr = (rows[:, 1:] != rows[:, :-1]).astype(jnp.int32)
        rid = jnp.concatenate(
            [jnp.zeros((rows.shape[0], 1), jnp.int32),
             jnp.cumsum(tr, axis=1)], axis=1)
        rid = jnp.minimum(rid, dedup_k - 1)
        rep_idx = jnp.sum(
            rid[:, None, :] < jnp.arange(dedup_k, dtype=jnp.int32)
            [None, :, None], axis=-1)
        rep_idx = jnp.minimum(rep_idx, rows.shape[1] - 1)
        rep_rows = jnp.take_along_axis(rows, rep_idx, axis=1)
        cand = table[rep_rows]                              # [N, K, 256]
        onehot = jax.nn.one_hot(rid, dedup_k, dtype=jnp.bfloat16)
        vals = jnp.einsum("nsk,nkc->nsc", onehot, cand,
                          preferred_element_type=jnp.float32)
        sig, r, g, b = _interp_from_rows(vals, (lx, ly, lz),
                                         (fx, fy, fz), SNAP_F)
    else:
        sig, r, g, b = _interp_from_rows(table[rows], (lx, ly, lz),
                                         (fx, fy, fz), SNAP_F)
    sig = jnp.maximum(sig, 0.0) * valid * sel

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


def _dedup_k_for(ratio: float, samples: int) -> int:
    """Run-candidate count for the composite's dedup gather: ceil(ratio *
    samples) rounded up to a multiple of 8 (sublane-friendly one-hot),
    floored at 8. 0 disables."""
    if not ratio:
        return 0
    return int(max(8, -(-ratio * samples // 8) * 8))


@partial(jax.jit, static_argnames=("field_cfg", "cfg", "query_keys", "res",
                                   "dedup_k", "dilate", "chunk", "use_plan"))
def _snapshot_frame(table, occ_grid, o_img, d_img, field_cfg, cfg, res,
                    query_keys, dedup_k, dilate, chunk, use_plan):
    """ONE dispatch for a whole [H, W] snapshot frame.

    The beam plan (frame_march_plan), its per-pixel expansion, and a
    lax.map over fixed-size composite chunks all trace into this single
    jit, so a frame costs one tunnel round-trip and no host readbacks
    until the image D2H. Every shape is static in (H, W, chunk, cfg):
    the render_dense sweep compiles exactly once. The per-chunk memory
    profile matches the chunked path (the map body IS one chunk)."""
    h, w = o_img.shape[:2]
    n = h * w
    o = o_img.reshape(-1, 3)
    d = d_img.reshape(-1, 3)
    n_pad = (-n) % chunk
    if n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad, 3), o.dtype)], 0)
        d = jnp.concatenate([d, jnp.ones((n_pad, 3), d.dtype)], 0)
    g = (n + n_pad) // chunk
    o_g = o.reshape(g, chunk, 3)
    d_g = d.reshape(g, chunk, 3)

    if use_plan:
        sidx_b, svalid_b, _ = frame_march_plan(occ_grid, o_img, d_img,
                                               cfg, dilate)
        s_sel = sidx_b.shape[1]

        def expand(x):
            x = jnp.repeat(jnp.repeat(
                x.reshape(h // 4, w // 4, s_sel), 4, 0), 4, 1)
            x = x.reshape(-1, s_sel)
            if n_pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((n_pad, s_sel), x.dtype)], 0)
            return x.reshape(g, chunk, s_sel)

        def body(args):
            o_c, d_c, si_c, sv_c = args
            jitter = jnp.zeros((o_c.shape[0], 1))
            widx, wvalid = _fine_windows_from_segments(
                occ_grid, o_c, d_c, si_c, sv_c, jitter, cfg)
            t_mid, valid = _windows_to_samples(widx, wvalid, jitter, cfg)
            return _composite_snapshot(table, o_c, d_c, t_mid, valid,
                                       field_cfg, cfg, res, query_keys,
                                       dedup_k)

        outs = jax.lax.map(body, (o_g, d_g, expand(sidx_b),
                                  expand(svalid_b)))
    else:
        def body(args):
            o_c, d_c = args
            t_mid, valid = march_rays(occ_grid, o_c, d_c,
                                      jax.random.PRNGKey(0), cfg,
                                      stratified=False)
            return _composite_snapshot(table, o_c, d_c, t_mid, valid,
                                       field_cfg, cfg, res, query_keys,
                                       dedup_k)

        outs = jax.lax.map(body, (o_g, d_g))
    return {q: outs[q].reshape(g * chunk, -1)[:n].reshape(h, w, -1)
            for q in query_keys}


def render_snapshot_image(table: jnp.ndarray, field_cfg: NGPFieldConfig,
                          occ_grid: jnp.ndarray, rays, render_cfg: RenderConfig,
                          snap_cfg: SnapshotConfig,
                          query_keys=("rgb", "distance"),
                          chunk: int = 32768) -> dict:
    """Chunked snapshot render with the same per-chunk adaptive budgets as
    renderer.render_image."""
    cfg = snapshot_render_cfg(render_cfg, snap_cfg)
    pre_shape = rays.o.shape[:-1]
    if snap_cfg.frame_dispatch and len(pre_shape) == 2:
        h, w = pre_shape
        use_plan = (h % 4 == 0 and w % 4 == 0 and cfg.hier_march
                    and cfg.occ_res % 4 == 0)
        dil = 0
        if use_plan:
            dil = beam_dilation(rays.d, cfg)
            use_plan = dil <= 3
        return _snapshot_frame(
            table, occ_grid, jnp.asarray(rays.o), jnp.asarray(rays.d),
            field_cfg, cfg, snap_cfg.res, tuple(query_keys),
            _dedup_k_for(snap_cfg.dedup_ratio, cfg.max_samples),
            dil, chunk, use_plan)
    o = rays.o.reshape(-1, 3)
    d = rays.d.reshape(-1, 3)
    n = o.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad, 3), o.dtype)], 0)
        d = jnp.concatenate([d, jnp.ones((n_pad, 3), d.dtype)], 0)

    # beam plan: per-4x4-block coarse segments + per-pixel window bounds,
    # computed once per frame (16x fewer coarse probe rows; probe count IS
    # the march cost on TPU)
    use_plan = (len(pre_shape) == 2 and pre_shape[0] % 4 == 0
                and pre_shape[1] % 4 == 0 and cfg.hier_march
                and cfg.occ_res % 4 == 0)
    if use_plan:
        dil = beam_dilation(rays.d, cfg)
        use_plan = dil <= 3         # beam wider than 3 voxels: plan admits
                                    # too much, fall back to per-ray march
    sidx_px = svalid_px = None
    counts = slack = None
    if use_plan:
        sidx_b, svalid_b, counts = frame_march_plan(
            occ_grid, rays.o, rays.d, cfg, dil)
        h4, w4 = pre_shape[0] // 4, pre_shape[1] // 4
        s_sel = sidx_b.shape[1]

        def expand(x):
            x = jnp.repeat(jnp.repeat(x.reshape(h4, w4, s_sel), 4, 0), 4, 1)
            x = x.reshape(-1, s_sel)
            if n_pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((n_pad, s_sel), x.dtype)], 0)
            return x

        sidx_px, svalid_px = expand(sidx_b), expand(svalid_b)
        counts = counts.reshape(-1)
        if n_pad:
            counts = jnp.concatenate(
                [counts, jnp.zeros((n_pad,), counts.dtype)])
        slack = 2
    elif cfg.adaptive_eval:
        counts = jax.jit(count_occupied_windows, static_argnums=3)(
            occ_grid, o, d, cfg)      # o/d are already padded
        slack = 1

    budgets = None
    if cfg.adaptive_eval and counts is not None:
        per_chunk = np.asarray(jnp.max(counts.reshape(-1, chunk), axis=1))
        spw = cfg.samples_per_window
        budgets = []
        for w_need in per_chunk:
            s_need = (int(w_need) + slack) * spw
            b = max(4 * spw, 1 << (s_need - 1).bit_length())
            budgets.append(min(cfg.max_samples, b))

    outs = []
    for ci, start in enumerate(range(0, n + n_pad, chunk)):
        cfg_c = cfg if budgets is None else dataclasses.replace(
            cfg, max_samples=budgets[ci])
        dk = _dedup_k_for(snap_cfg.dedup_ratio, cfg_c.max_samples)
        sl = slice(start, start + chunk)
        if use_plan:
            outs.append(_snapshot_chunk_planned(
                table, occ_grid, o[sl], d[sl], sidx_px[sl], svalid_px[sl],
                field_cfg, cfg_c, snap_cfg.res, tuple(query_keys), dk))
        else:
            outs.append(_snapshot_chunk(table, occ_grid, o[sl], d[sl],
                                        field_cfg, cfg_c, snap_cfg.res,
                                        tuple(query_keys), dk))
    ret = {}
    for q in query_keys:
        cat = jnp.concatenate([c[q] for c in outs], axis=0)[:n]
        ret[q] = cat.reshape(*pre_shape, cat.shape[-1])
    return ret
