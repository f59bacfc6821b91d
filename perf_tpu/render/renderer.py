"""Volume rendering over dense masked sample arrays.

TPU-native counterpart of ``NeRFOCCRenderer`` + nerfacc's occupancy-grid
marching (reference ``modules/scene/nerf_renderer.py:112-209``). Where the
reference produces variable-length packed samples (CSR: ray_indices/t_starts/
t_ends) via a CUDA DDA kernel, we:

1. probe the binary occupancy grid at every fixed march step
   (``step=5e-4`` over [near, far], same ladder as nerfacc's marcher),
2. compact the first ``max_samples`` occupied steps per ray into a dense
   ``[rays, max_samples]`` buffer with one ``lax.top_k`` (monotone keys keep
   t-order), and
3. run the field + transmittance scan + accumulation on the dense masked
   layout — static shapes, fully jittable, shardable along the ray axis.

Semantics matched to the reference renderer:
- density -> weights via exclusive-cumsum transmittance (render_weight_from_density)
- color accumulates with STOP-GRADIENT weights (``weights.detach()``,
  ``nerf_renderer.py:183``) so the color loss never trains geometry
- ``stop_geo_grad`` / ``stop_app_grad`` mirror geo_inference/app_inference
  (``no_grad`` heads, ``nerf_renderer.py:164-183``)
- train-time background: random-noise color bg (detached opacity) + random
  distance fill through a relu (opacity NOT detached — matching the
  reference's asymmetry, ``nerf_renderer.py:190-192``)
- eval background: 0.5-gray + distance 5 (``nerf_renderer.py:193-197``)
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.ngp import (
    NGPFieldConfig, query_density_coords, query_rgb_coords,
    query_density_ray, query_rgb_ray,
)
from ..kernels.hashgrid import level_strides
from ..kernels.distortion import distortion_per_ray


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    near: float = 0.0
    far: float = 1.5
    step: float = 5e-4
    max_samples: int = 256
    occ_res: int = 256
    # supervision-shell dilation for the pool-derived occupancy grid
    # (occ_grid_from_points): 1 = reference-exact 26-neighbor shell;
    # 0 = thin shell (smaller adaptive budgets, perf knob)
    occ_dilation: int = 1
    bg_color: str = "rand_noise"  # 'rand_noise' | 'white' | 'black'
    eval_bg_distance: float = 5.0
    remat: bool = True
    eval_chunk: int = 32768   # rays per eval-render dispatch (HBM-bound)
    # TPU-perf knobs (both are principled approximations, see march_rays /
    # kernels.hashgrid.level_strides):
    march_coarse: int = 8       # occupancy probed once per this many steps
    level_subsampling: bool = True
    # hierarchical march: probe a dilated 4x-downsampled grid first (TPU
    # narrow gathers are per-ROW bound, so probe count is the march cost;
    # two-level probing cuts it ~2.5x). Conservative: the coarse grid is
    # max-pooled AND 3^3-dilated, so it can only ADMIT extra windows.
    hier_march: bool = True
    segment_windows: int = 4    # windows per coarse segment
    # eval-only: composite color from the top-K weight WINDOWS instead of
    # every sample (0 = off). Weights come from the full density pass, so
    # this only drops rgb evaluation where the ray is transparent; window
    # granularity keeps the samples ray-structured for per-level Nyquist
    # subsampling. Typical rays concentrate >99% of their weight in 1-2
    # windows around the surface crossing.
    eval_rgb_windows: int = 4
    # same trick on the TRAIN path (app-phase color steps): the color loss
    # composites with DETACHED weights (``nerf_renderer.py:183``), so
    # evaluating rgb only where the weight actually lives leaves the
    # appearance gradient signal intact while cutting the app step's rgb
    # encode rows ~2.5-3.5x. 0 = off (exact reference compositing).
    train_rgb_windows: int = 4
    # eval-only: per-chunk sample budget picked from a full-ladder
    # occupancy probe of the actual frame rays (see render_image)
    adaptive_eval: bool = True
    # sample every Nth march step inside selected windows (quadrature
    # delta becomes step*sample_stride). 1 on the train path; the baked
    # snapshot renderer uses the bake grid's Nyquist step (~4) — the march
    # LADDER (probes, windows) is unchanged, only in-window sampling
    # density drops.
    sample_stride: int = 1
    # per-level brick-run candidate caps for the run-dedup encode
    # (kernels/brickgrid.brick_encode_ray_dedup; brick grids only; probed
    # per episode by NeRFScene when TrainConfig.dedup_runs is on). None =
    # standard per-sample gathers.
    run_caps: tuple | None = None

    @property
    def n_march(self) -> int:
        m = int(math.ceil((self.far - self.near) / self.step))
        c = self.march_coarse
        return ((m + c - 1) // c) * c

    @property
    def n_windows(self) -> int:
        return self.n_march // self.march_coarse

    @property
    def samples_per_window(self) -> int:
        assert self.march_coarse % self.sample_stride == 0
        return self.march_coarse // self.sample_stride

    @property
    def max_windows(self) -> int:
        assert self.max_samples % self.samples_per_window == 0
        return self.max_samples // self.samples_per_window

    @property
    def n_segments(self) -> int:
        w = self.n_windows
        s = self.segment_windows
        return (w + s - 1) // s

    @property
    def max_segments(self) -> int:
        # enough selected segments to fill the window budget, +2 slack for
        # segments that are only partially occupied at shell edges
        return min(self.n_segments, self.max_windows // self.segment_windows + 2)


def coarse_occ_grid(occ_grid: jnp.ndarray, res: int,
                    dilate: int = 1) -> jnp.ndarray:
    """4x-downsampled, (2*dilate+1)^3-dilated occupancy: flat uint8.

    Max-pool makes the coarse grid an over-approximation of the fine one;
    the 1-cell dilation guarantees a single center probe per march
    segment cannot miss occupancy anywhere in the segment (segment length
    0.016 world << dilated reach 0.031). ``dilate > 1`` widens the reach
    so ONE probe ray can stand in for a whole pixel block (beam marching,
    ``frame_march_plan``)."""
    g = occ_grid.reshape(res, res, res)
    coarse = jax.lax.reduce_window(g, np.uint8(0), jax.lax.max,
                                   (4, 4, 4), (4, 4, 4), "VALID")
    k = 2 * dilate + 1
    dilated = jax.lax.reduce_window(coarse, np.uint8(0), jax.lax.max,
                                    (k, k, k), (1, 1, 1), "SAME")
    return dilated.reshape(-1)


def _probe_points(occ_grid: jnp.ndarray, rays_o: jnp.ndarray,
                  rays_d: jnp.ndarray, t: jnp.ndarray, res: int):
    """Occupancy at ray points: t [N, P] -> int32 [N, P] (one narrow gather;
    narrow gathers cost per ROW, so probe count is the march cost)."""
    def axis_voxel(a):
        w = rays_o[:, a:a + 1] + rays_d[:, a:a + 1] * t
        return ((jnp.clip(w, -0.999, 0.999) * 0.5 + 0.5) * res).astype(
            jnp.int32)
    flat = (axis_voxel(0) * (res * res) + axis_voxel(1) * res + axis_voxel(2))
    return occ_grid[flat].astype(jnp.int32)


def count_occupied_windows(occ_grid: jnp.ndarray, rays_o: jnp.ndarray,
                           rays_d: jnp.ndarray, cfg: RenderConfig):
    """Per-ray count of occupied march windows over the FULL flat ladder.

    Upper bound of the windows ``march_rays`` can select (the hierarchical
    path only ever drops windows relative to the flat ladder), probed at
    both jitter extremes so a stratified shift cannot exceed it by more
    than the +1 slack the budget selector adds. Drives the adaptive
    per-episode sample budget (``NeRFScene.select_sample_budget``): on
    pool-derived occupancy shells most rays occupy a small fraction of the
    ``max_samples`` cap, and encode cost is proportional to sample rows.
    """
    c = cfg.march_coarse
    wsteps = jnp.arange(cfg.n_windows, dtype=jnp.float32)
    counts = jnp.zeros((rays_o.shape[0],), jnp.int32)
    for jit_off in (0.0, 0.999):
        t = cfg.near + (wsteps[None, :] * c + 0.5 * c + jit_off) * cfg.step
        occ = _probe_points(occ_grid, rays_o, rays_d, t, cfg.occ_res)
        occ = occ * (t < cfg.far)
        counts = jnp.maximum(counts, jnp.sum(occ, axis=1))
    return counts


def _select_segments(occ_grid: jnp.ndarray, rays_o: jnp.ndarray,
                     rays_d: jnp.ndarray, jitter: jnp.ndarray,
                     cfg: RenderConfig, dilate: int = 1):
    """Coarse stage of the hierarchical march: probe the dilated
    4x-downsampled grid once per ``segment_windows``-window segment and
    keep the first ``max_segments`` occupied segments (t-ordered).

    Returns (sidx int32 [N, max_segments], svalid bool [N, max_segments]).
    """
    n = rays_o.shape[0]
    c = cfg.march_coarse
    sw = cfg.segment_windows
    nseg = cfg.n_segments
    coarse = coarse_occ_grid(occ_grid, cfg.occ_res, dilate=dilate)
    segs = jnp.arange(nseg, dtype=jnp.float32)
    t_seg = cfg.near + ((segs[None, :] * sw + 0.5 * sw) * c + jitter) * cfg.step
    seg_occ = (_probe_points(coarse, rays_o, rays_d, t_seg, cfg.occ_res // 4)
               * (t_seg < cfg.far))
    skeys = seg_occ * (nseg - jnp.arange(nseg, dtype=jnp.int32))[None, :]
    svals, sidx = jax.lax.top_k(skeys, cfg.max_segments)       # t-ordered
    return sidx, (svals > 0)


def _fine_windows_from_segments(occ_grid: jnp.ndarray, rays_o: jnp.ndarray,
                                rays_d: jnp.ndarray, sidx: jnp.ndarray,
                                svalid: jnp.ndarray, jitter: jnp.ndarray,
                                cfg: RenderConfig):
    """Fine stage: probe the full-res grid only inside the selected
    segments, compact the first ``max_windows`` occupied windows in t
    order (widx_cand ascends along the candidate axis, so monotone keys
    preserve t order)."""
    n = rays_o.shape[0]
    c = cfg.march_coarse
    sw = cfg.segment_windows
    n_seg_sel = sidx.shape[1]
    j = jnp.arange(sw, dtype=jnp.int32)
    widx_cand = (sidx[:, :, None] * sw + j[None, None, :]).reshape(n, -1)
    t_w = cfg.near + (widx_cand.astype(jnp.float32) * c + 0.5 * c
                      + jitter) * cfg.step
    occ_w = (_probe_points(occ_grid, rays_o, rays_d, t_w, cfg.occ_res)
             * (t_w < cfg.far))
    occ_w = occ_w * jnp.broadcast_to(
        svalid[:, :, None].astype(jnp.int32),
        (n, n_seg_sel, sw)).reshape(n, -1)
    keys = occ_w * (cfg.n_windows - widx_cand)
    # tiny ladders (short far / coarse steps) can have fewer candidate
    # windows than the budget allows — k must not exceed the axis
    vals, pos = jax.lax.top_k(keys, min(cfg.max_windows, keys.shape[1]))
    wvalid = (vals > 0).astype(jnp.float32)
    widx = jnp.take_along_axis(widx_cand, pos, axis=1)
    return widx, wvalid


def _windows_to_samples(widx: jnp.ndarray, wvalid: jnp.ndarray,
                        jitter: jnp.ndarray, cfg: RenderConfig):
    """Expand selected windows into per-sample (t_mid, valid)."""
    n = widx.shape[0]
    st = cfg.sample_stride
    spw = cfg.samples_per_window
    fine = (jnp.arange(spw, dtype=jnp.float32) + 0.5) * st
    t_mid = (cfg.near
             + ((widx.astype(jnp.float32) * cfg.march_coarse)[:, :, None]
                + fine[None, None, :] + jitter[:, :, None] * st)
             * cfg.step).reshape(n, -1)
    valid = jnp.broadcast_to(wvalid[:, :, None],
                             (n, wvalid.shape[1], spw)).reshape(n, -1)
    return t_mid, valid * (t_mid < cfg.far)


def march_windows(occ_grid: jnp.ndarray, rays_o: jnp.ndarray,
                  rays_d: jnp.ndarray, key: jax.Array, cfg: RenderConfig,
                  stratified: bool):
    """Window-selection stage of the march: occupancy-probe the ladder and
    compact the first ``max_windows`` occupied windows in t order.

    Returns (widx int32 [N, max_windows], wvalid f32 [N, max_windows],
    jitter [N, 1]); expand with ``_windows_to_samples``. Split out of
    ``march_rays`` so the bucketed train path can sort rays by occupied-
    window count BEFORE paying for sample expansion + field evaluation.
    """
    n = rays_o.shape[0]
    res = cfg.occ_res
    c = cfg.march_coarse
    if stratified:
        jitter = jax.random.uniform(key, (n, 1))
    else:
        jitter = jnp.zeros((n, 1))

    if cfg.hier_march and res % 4 == 0:
        sidx, svalid = _select_segments(occ_grid, rays_o, rays_d, jitter, cfg)
        widx, wvalid = _fine_windows_from_segments(
            occ_grid, rays_o, rays_d, sidx, svalid, jitter, cfg)
    else:
        wsteps = jnp.arange(cfg.n_windows, dtype=jnp.float32)
        t_probe = cfg.near + (wsteps[None, :] * c + 0.5 * c + jitter) * cfg.step
        occ = (_probe_points(occ_grid, rays_o, rays_d, t_probe, res)
               * (t_probe < cfg.far))
        keys = occ * (cfg.n_windows
                      - jnp.arange(cfg.n_windows, dtype=jnp.int32))[None, :]
        vals, widx = jax.lax.top_k(keys, min(cfg.max_windows,
                                             keys.shape[1]))    # [N, W]
        wvalid = (vals > 0).astype(jnp.float32)
    return widx, wvalid, jitter


def march_rays(occ_grid: jnp.ndarray, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
               key: jax.Array, cfg: RenderConfig, stratified: bool):
    """Occupancy-culled fixed-step marching with top-k compaction.

    TPU shape of nerfacc's DDA marcher (``nerf_renderer.py:145-155``): narrow
    gathers cost per ROW, so the march cost IS the probe count. The
    hierarchical path probes a dilated 4x-coarse grid once per
    ``segment_windows``-window segment, selects the first ``max_segments``
    occupied segments, and probes the fine grid only inside those — ~2.5x
    fewer probe rows than the flat ladder at the reference geometry.

    Returns (t_mid [N, max_samples] ascending, valid [N, max_samples] f32).
    """
    widx, wvalid, jitter = march_windows(occ_grid, rays_o, rays_d, key, cfg,
                                         stratified)
    return _windows_to_samples(widx, wvalid, jitter, cfg)


def _exclusive_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.cumsum(x, axis=-1) - x


def render_rays(params: dict, field_cfg: NGPFieldConfig, occ_grid: jnp.ndarray,
                rays_o: jnp.ndarray, rays_d: jnp.ndarray, key: jax.Array,
                cfg: RenderConfig, train: bool,
                stop_geo_grad: bool = False,
                stop_app_grad: bool = False,
                need_rgb: bool = True) -> dict:
    """Render a flat batch of rays [N, 3] -> dict of per-ray quantities.

    ``train`` is static: controls stratified sampling and background
    compositing mode (reference switches on ``nerf.training``).
    ``need_rgb=False`` skips the appearance network entirely (the geometry
    phase's loss never reads color — the reference still pays for the
    no-grad rgb pass on every packed sample, we don't).
    """
    key_march, key_shade = jax.random.split(key)
    t_mid, valid = march_rays(occ_grid, rays_o, rays_d, key_march, cfg,
                              stratified=train)
    return shade_rays(params, field_cfg, rays_o, rays_d, t_mid, valid,
                      key_shade, cfg, train, stop_geo_grad, stop_app_grad,
                      need_rgb)


def shade_rays(params: dict, field_cfg: NGPFieldConfig,
               rays_o: jnp.ndarray, rays_d: jnp.ndarray,
               t_mid: jnp.ndarray, valid: jnp.ndarray, key: jax.Array,
               cfg: RenderConfig, train: bool,
               stop_geo_grad: bool = False,
               stop_app_grad: bool = False,
               need_rgb: bool = True) -> dict:
    """Field evaluation + compositing at pre-marched samples.

    The sample count is taken from ``t_mid.shape[1]`` (NOT
    ``cfg.max_samples``), so buckets with different static budgets share
    one implementation. ``dist_loss`` [N] (per-ray distortion) rides along
    on the train path so heterogeneous-budget callers can concatenate
    per-ray losses.
    """
    key_bg_c, key_bg_d = jax.random.split(key)
    # sample world coords as three [N, S] arrays (no trailing-3 tensors)
    px = rays_o[:, 0:1] + rays_d[:, 0:1] * t_mid
    py = rays_o[:, 1:2] + rays_d[:, 1:2] * t_mid
    pz = rays_o[:, 2:3] + rays_d[:, 2:3] * t_mid

    n_samples = t_mid.shape[1]
    if cfg.level_subsampling:
        strides = level_strides(field_cfg.grid, cfg.step, n_samples)
        dens_fn = lambda x, y, z: query_density_ray(params["geo"], x, y, z,
                                                    field_cfg, strides,
                                                    cfg.run_caps)
        rgb_fn = lambda x, y, z: query_rgb_ray(params["app"], x, y, z,
                                               field_cfg, strides,
                                               cfg.run_caps)
    else:
        dens_fn = lambda x, y, z: query_density_coords(params["geo"], x, y, z,
                                                       field_cfg)
        rgb_fn = lambda x, y, z: query_rgb_coords(params["app"], x, y, z,
                                                  field_cfg)
    if cfg.remat:
        # save the bf16 encodings across the remat boundary: backward
        # recomputes only the (cheap) interp weights + MLP, not the gathers
        policy = jax.checkpoint_policies.save_only_these_names("enc_feats")
        dens_fn = jax.checkpoint(dens_fn, policy=policy)
        rgb_fn = jax.checkpoint(rgb_fn, policy=policy)

    sigma = dens_fn(px, py, pz)
    if stop_geo_grad:
        sigma = jax.lax.stop_gradient(sigma)
    # where-select, not multiply: padding samples must contribute exactly
    # 0 even if the field saturates there (inf * 0 = NaN poisons the ray)
    sigma = jnp.where(valid > 0.0, sigma, 0.0)

    tau = sigma * (cfg.step * cfg.sample_stride)
    trans = jnp.exp(-_exclusive_cumsum(tau))
    alpha = 1.0 - jnp.exp(-tau)
    weights = trans * alpha                                     # [N, S]

    opacity = jnp.sum(weights, axis=-1, keepdims=True)          # [N, 1]
    distance = jnp.sum(weights * t_mid, axis=-1, keepdims=True)

    n = rays_o.shape[0]
    if need_rgb:
        kw = cfg.train_rgb_windows if train else cfg.eval_rgb_windows
        c = cfg.samples_per_window
        s = t_mid.shape[1]
        if kw and kw * c < s:
            # top-K fast path: color only the top-kw weight windows (window
            # sums keep the picked samples ray-structured, so per-level
            # Nyquist subsampling still applies at the shrunk length);
            # train=True composites color with detached weights anyway, so
            # the app-phase gradient only needs rgb where the weight lives
            wwin = jnp.sum(weights.reshape(n, -1, c), axis=-1)  # [N, W]
            _, widx = jax.lax.top_k(wwin, kw)
            widx = jnp.sort(widx, axis=1)                       # t order
            sidx = (widx[:, :, None] * c
                    + jnp.arange(c, dtype=widx.dtype)[None, None, :]
                    ).reshape(n, kw * c)
            take = lambda a: jnp.take_along_axis(a, sidx, axis=1)
            pxk, pyk, pzk = take(px), take(py), take(pz)
            if cfg.level_subsampling:
                strides_k = level_strides(field_cfg.grid, cfg.step, kw * c)
                r, g, b = query_rgb_ray(params["app"], pxk, pyk, pzk,
                                        field_cfg, strides_k, cfg.run_caps)
            else:
                r, g, b = query_rgb_coords(params["app"], pxk, pyk, pzk,
                                           field_cfg)
            w_detached = jax.lax.stop_gradient(take(weights))
        else:
            r, g, b = rgb_fn(px, py, pz)                        # each [N, S]
            w_detached = jax.lax.stop_gradient(weights)
        if stop_app_grad:
            r, g, b = map(jax.lax.stop_gradient, (r, g, b))
        colors = jnp.stack([jnp.sum(w_detached * r, axis=-1),
                            jnp.sum(w_detached * g, axis=-1),
                            jnp.sum(w_detached * b, axis=-1)], axis=-1)
    else:
        colors = jnp.zeros((n, 3))
    if cfg.bg_color == "rand_noise":
        bg = jax.random.uniform(key_bg_c, (n, 3))
    elif cfg.bg_color == "white":
        bg = jnp.ones((n, 3))
    else:
        bg = jnp.zeros((n, 3))

    if train:
        noise = jax.random.uniform(key_bg_d, distance.shape) * 2.0 - 1.0
        distance = jax.nn.relu(distance + noise * (1.0 - opacity))
        colors = colors + bg * jax.lax.stop_gradient(1.0 - opacity)
    else:
        rest = jax.lax.stop_gradient(1.0 - opacity)
        distance = distance + cfg.eval_bg_distance * rest
        colors = colors + 0.5 * rest

    out = {
        "rgb": colors,
        "distance": distance,
        "opacity": opacity,
        "weights": weights,
        "t_mid": t_mid,
        "valid": valid,
        "trans": trans,
    }
    if train:
        out["dist_loss"] = distortion_per_ray(
            weights, t_mid, cfg.step * cfg.sample_stride, valid)
    return out


def render_rays_bucketed(params: dict, field_cfg: NGPFieldConfig,
                         occ_grid: jnp.ndarray, rays_o: jnp.ndarray,
                         rays_d: jnp.ndarray, key: jax.Array,
                         cfg: RenderConfig, s_low: int, n_high: int,
                         train: bool = True,
                         stop_geo_grad: bool = False,
                         stop_app_grad: bool = False,
                         need_rgb: bool = True) -> dict:
    """Two-budget train-batch rendering: sort rays by occupied-window count
    and shade the low-occupancy majority at a smaller static sample budget.

    Train batches are random pool draws, so per-chunk adaptive budgets (the
    eval trick) cannot help — every batch mixes sky rays with wall-grazers
    and the whole batch pays the worst case. Measured flagship shell
    distribution: 98.6% of pool rays occupy <= 8 of the budget's 14-16
    windows, so shading the sorted head at ``s_low`` cuts encode/interp/MLP/
    scatter rows ~1.8x with identical ray math (the march selects the same
    t-ordered windows; a low-bucket ray keeps its FIRST s_low samples,
    which for 98%+ of rays is all of them). The ``n_high`` tail keeps the
    full ``cfg.max_samples`` budget; per-episode plan selection
    (``NeRFScene.select_sample_budget``) sizes ``n_high`` ~8x above the
    expected over-``s_low`` ray count, so truncation is the same rare
    worst-case event the adaptive budget already tolerates.

    Per-ray outputs are restored to input ray order; sample-level arrays
    (weights/t_mid) are per-bucket and intentionally NOT returned — use
    ``dist_loss`` for the distortion term.
    """
    n = rays_o.shape[0]
    spw = cfg.samples_per_window
    assert s_low % spw == 0 and 0 < n_high < n
    key_march, key_lo, key_hi = jax.random.split(key, 3)
    widx, wvalid, jitter = march_windows(occ_grid, rays_o, rays_d, key_march,
                                         cfg, stratified=train)
    counts = jnp.sum(wvalid.astype(jnp.int32), axis=1)
    order = jnp.argsort(counts)                       # ascending occupancy
    inv = jnp.argsort(order)
    o_s, d_s = rays_o[order], rays_d[order]
    widx_s, wvalid_s, jit_s = widx[order], wvalid[order], jitter[order]
    n_low = n - n_high

    def bucket(sl, keyb, w_budget):
        t_b, v_b = _windows_to_samples(widx_s[sl, :w_budget],
                                       wvalid_s[sl, :w_budget], jit_s[sl], cfg)
        return shade_rays(params, field_cfg, o_s[sl], d_s[sl], t_b, v_b,
                          keyb, cfg, train, stop_geo_grad, stop_app_grad,
                          need_rgb)

    out_lo = bucket(slice(0, n_low), key_lo, s_low // spw)
    out_hi = bucket(slice(n_low, n), key_hi, widx.shape[1])
    keys = ["rgb", "distance", "opacity"] + (["dist_loss"] if train else [])
    return {k: jnp.concatenate([out_lo[k], out_hi[k]], axis=0)[inv]
            for k in keys}


def beam_dilation(rays_d, cfg: RenderConfig) -> int:
    """Extra coarse-grid dilation (voxels) so ONE block-center probe ray
    covers every ray of its 4x4 pixel block out to ``cfg.far``.

    Host-side and static: the bound is far * max chord(center_dir,
    member_dir) / coarse_voxel. Frame origins are shared (one pose), so
    direction spread is the only beam term. Typical values: 1024x512 pano
    -> 2; tighter rasters -> 1."""
    d = np.asarray(rays_d, np.float64)
    h4, w4 = d.shape[0] // 4 * 4, d.shape[1] // 4 * 4
    d = d[:h4, :w4]
    blocks = d.reshape(h4 // 4, 4, w4 // 4, 4, 3)
    db = blocks.mean(axis=(1, 3))
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    cosmin = np.min(np.sum(blocks * db[:, None, :, None, :], axis=-1))
    chord = np.sqrt(max(0.0, 2.0 - 2.0 * cosmin))
    voxel = 8.0 / cfg.occ_res            # coarse voxel: 2 / (occ_res / 4)
    return int(np.ceil(cfg.far * chord / voxel))


@partial(jax.jit, static_argnames=("cfg", "dilate"))
def frame_march_plan(occ_grid, o_img, d_img, cfg: RenderConfig, dilate: int):
    """Beam march plan for a full [H, W] ray frame (eval only).

    Coarse segment selection runs ONCE per 4x4 pixel block on the block's
    mean direction against a beam-dilated coarse grid (16x fewer coarse
    probe rows than per-ray marching; narrow probes cost per ROW, so probe
    count IS the march cost). The same pass yields the per-pixel
    occupied-window bound that drives adaptive per-chunk sample budgets.

    Returns (sidx [nblocks, S], svalid [nblocks, S], counts [H, W]).
    """
    h, w = o_img.shape[:2]
    ob = o_img[::4, ::4].reshape(-1, 3)      # shared origin per frame pose
    db = jax.lax.reduce_window(d_img, 0.0, jax.lax.add,
                               (4, 4, 1), (4, 4, 1), "VALID") / 16.0
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    db = db.reshape(-1, 3)
    zeros = jnp.zeros((db.shape[0], 1))
    sidx, svalid = _select_segments(occ_grid, ob, db, zeros, cfg,
                                    dilate=1 + dilate)
    _, wvalid = _fine_windows_from_segments(occ_grid, ob, db, sidx, svalid,
                                            zeros, cfg)
    counts = jnp.sum(wvalid.astype(jnp.int32), axis=1).reshape(h // 4, w // 4)
    counts = jax.lax.reduce_window(counts, jnp.int32(0), jax.lax.max,
                                   (3, 3), (1, 1), "SAME")
    return sidx, svalid, jnp.repeat(jnp.repeat(counts, 4, 0), 4, 1)


@partial(jax.jit, static_argnames=("cfg",))
def _frame_window_counts(occ_grid, o_img, d_img, cfg):
    """Dilated occupied-window bound for every pixel of an [H, W] ray grid,
    probed at 1/16 of the rays (see render_image)."""
    os = o_img[::4, ::4].reshape(-1, 3)
    ds = d_img[::4, ::4].reshape(-1, 3)
    sub = count_occupied_windows(occ_grid, os, ds, cfg)
    h4, w4 = o_img.shape[0] // 4, o_img.shape[1] // 4
    dil = jax.lax.reduce_window(sub.reshape(h4, w4), jnp.int32(0),
                                jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.repeat(jnp.repeat(dil, 4, axis=0), 4, axis=1)


@partial(jax.jit, static_argnames=("field_cfg", "cfg", "query_keys"))
def _render_chunk(params, occ_grid, o_c, d_c, k, field_cfg, cfg, query_keys):
    """One eval-render dispatch. TOP-LEVEL jit: the jit cache is keyed on
    the function object, so a closure defined per frame would recompile
    every frame (measured: the entire round-1 render deficit). Distance-only
    renders (e.g. per-anchor visibility masks) skip the appearance network
    entirely — half the eval encode cost."""
    out = render_rays(params, field_cfg, occ_grid, o_c, d_c, k, cfg,
                      train=False, need_rgb="rgb" in query_keys)
    return {q: out[q] for q in query_keys}


def render_image(params: dict, field_cfg: NGPFieldConfig, occ_grid: jnp.ndarray,
                 rays, key: jax.Array, cfg: RenderConfig,
                 query_keys=("rgb", "distance"), chunk: int = 32768) -> dict:
    """Chunked eval render of an arbitrary ray grid (Rays pytree [..., 3]).

    Counterpart of ``NeRFScene.render`` (``nerf.py:74-99``): flattens, renders
    in fixed-size chunks through one cached jit, reshapes back to the grid.
    """
    pre_shape = rays.o.shape[:-1]
    o = rays.o.reshape(-1, 3)
    d = rays.d.reshape(-1, 3)
    n = o.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        o = jnp.concatenate([o, jnp.zeros((n_pad, 3), o.dtype)], 0)
        d = jnp.concatenate([d, jnp.ones((n_pad, 3), d.dtype)], 0)

    budgets = None
    if cfg.adaptive_eval:
        # occupancy probe of the frame picks a per-chunk sample budget
        # (quantized to powers of two -> at most 4 compiled chunk programs).
        # Encode cost is proportional to sample rows, and e.g. sky/ceiling
        # chunks need a fraction of the worst-case budget. Narrow probes run
        # at only ~25M rows/s on TPU, so for image grids we probe every 4th
        # pixel and take a dilated 3x3 max (a silhouette spike confined to a
        # single unprobed pixel is the only miss mode; +2 windows of slack
        # and pow2 rounding cover it).
        if (len(pre_shape) == 2 and pre_shape[0] % 4 == 0
                and pre_shape[1] % 4 == 0):
            counts = _frame_window_counts(occ_grid, rays.o, rays.d, cfg)
            counts = counts.reshape(-1)
            if n_pad:
                counts = jnp.concatenate(
                    [counts, jnp.zeros((n_pad,), counts.dtype)])
            slack = 2
        else:
            counts = jax.jit(count_occupied_windows, static_argnums=3)(
                occ_grid, o, d, cfg)
            slack = 1
        per_chunk = np.asarray(jnp.max(counts.reshape(-1, chunk), axis=1))
        c = cfg.samples_per_window
        budgets = []
        for w_need in per_chunk:
            s_need = (int(w_need) + slack) * c
            b = max(4 * c, 1 << (s_need - 1).bit_length())
            budgets.append(min(cfg.max_samples, b))

    def _chunk(params, occ_grid, o_c, d_c, k, cfg_c):
        return _render_chunk(params, occ_grid, o_c, d_c, k, field_cfg, cfg_c,
                             tuple(query_keys))

    outs = []
    for ci, start in enumerate(range(0, n + n_pad, chunk)):
        key, k = jax.random.split(key)
        cfg_c = cfg if budgets is None else dataclasses.replace(
            cfg, max_samples=budgets[ci])
        outs.append(_chunk(params, occ_grid, o[start:start + chunk],
                           d[start:start + chunk], k, cfg_c))
    ret = {}
    for q in query_keys:
        cat = jnp.concatenate([c[q] for c in outs], axis=0)[:n]
        ret[q] = cat.reshape(*pre_shape, cat.shape[-1])
    return ret
