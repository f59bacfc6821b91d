"""NeRFScene: the per-episode training state machine.

Counterpart of the reference's ``modules/scene/nerf.py``. One ``fit(pool)``
episode =

1. rebuild the occupancy grid from the pool's back-projected points
   (the reference warm-starts a fresh nerfacc estimator from the same grid
   over 256 EMA steps — a fixpoint we take directly; the grid then stays
   FIXED for the episode, as in the reference's executed path),
2. reset the geometry network (``nerf.py:170``),
3. geometry phase: ``raw_phase_iter_geo`` steps of depth smooth-L1 (beta
   1e-2) + ramped distortion loss, appearance frozen (``app_inference``),
4. appearance phase: ``raw_phase_iter_app`` steps of color smooth-L1
   (beta 5e-2), geometry frozen (``geo_inference``),

with the trapezoid+cosine LR schedule per phase and a fresh Adam per episode.

TPU shape: each phase runs as ``lax.scan`` chunks of one fully-jitted step
(sample batch -> march -> field -> composite -> loss -> adam update), so an
episode is a handful of device dispatches. Batches are sampled inside the
step from the padded pool arrays; the pool's valid count is a device scalar,
so growing supervision never recompiles (until capacity doubles).

Faithfully reproduced quirks (documented, load-bearing):
- the distortion ramp uses progress measured in APP-phase iterations even
  during the geo phase (``nerf.py:178``: ``progress=iter_i / app_res_iters``),
- torch Adam defaults (betas 0.9/0.999, eps 1e-8); the reference's
  GradScaler(2^7) never unscales, which plain Adam absorbs — but its
  skip-step-on-nonfinite-grads behavior IS load-bearing (one blown-up batch
  in 75k steps poisoned the round-5 flagship record) and is reproduced via
  ``core.optim.guarded_step`` (scalar where, no host sync).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import (
    Rays, apply_rot, direction_to_img_coord, bilinear_sample,
    binary_open_close,
)
from ..core.optim import guarded_step
from ..fields import NGPFieldConfig, init_ngp_params, reset_geo
from ..render import RenderConfig, render_rays, render_image
from ..render.renderer import count_occupied_windows, render_rays_bucketed
from .schedule import OptimConfig, lr_at, smooth_l1
from .sup_pool import SupInfoPool
from ..utils.metrics import MetricsWriter, phase_timer


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    raw_phase_iter_geo: int = 3000
    raw_phase_iter_app: int = 1500
    pixel_loss_batch_size: int = 8192
    color_loss_weight: float = 1.0
    depth_loss_weight: float = 1.0
    distortion_loss_weight: float = 0.1
    density_loss_weight: float = 0.0
    geo_optimizer: OptimConfig = OptimConfig()
    app_optimizer: OptimConfig = OptimConfig()
    # proposal-field schedule (prop estimator only; reference
    # ``configs/nerf.yaml:50-54``)
    prop_optimizer: OptimConfig = OptimConfig(
        init_lr=1e-4, peak_lr=1e-3, peak_at=0.1, lr_alpha=0.1)
    scan_chunk: int = 1   # >1 only pays on CPU (tests); scan is ~4x slower on TPU
    # two-budget train batches (render_rays_bucketed): sort each batch by
    # occupied-window count and shade the low-occupancy majority at a
    # smaller static budget — measured flagship shells put 98.6% of rays
    # at <= half the worst-case budget. Identical ray math; disable to get
    # the single-budget reference shape.
    bucket_train: bool = True
    # run-dedup encode on train steps (brick grids): gather one row per
    # brick RUN with per-level caps probed each episode. OFF until the
    # on-chip tools/bench_dedup.py measurement decides it (BASELINE.md).
    dedup_runs: bool = False
    # app-phase in-window sample stride: geometry is FROZEN in the app
    # phase, so the density/weights quadrature can run at a coarser step
    # (the baked snapshot renders at stride 4-8 with BETTER quality than
    # stride-1 field eval, BASELINE.md ablation). Halves app-step density
    # and rgb rows; the march ladder (windows) is unchanged. 1 = exact
    # reference quadrature.
    app_sample_stride: int = 2
    # geo-phase in-window sample stride. Unlike the app phase, this coarsens
    # the quadrature of the TRAINED density (depth + distortion losses see
    # delta = step*stride with half the samples), so it changes training
    # numerics — gated by the CPU golden-fit test and the flagship quality
    # bars (pytest -m flagship) before any default flip. Why it's the
    # biggest remaining train lever: the geo phase is 99% fwd+bwd and
    # ~75-80% encode-row traffic at the platform gather floor (BASELINE.md
    # round-4 subtractive profile) — halving sample density halves the
    # dominant row traffic, which no structural attack could (dedup /
    # grouped / int8 all measured dead). The march ladder (windows) is
    # unchanged. 1 = exact reference quadrature (nerf_renderer.py:145-155).
    # Default 2 (round-5 measured): FULL geo step 90.3 -> 51.9 ms (1.74x)
    # at the flagship bucketed pool, flagship quality fit IDENTICAL to
    # stride-1 (38.53/53.65/34.00 dB vs 38.5/53.3/34.0 bars 35/50/31,
    # depth MAEs equal or better — BASELINE.md round-5).
    geo_sample_stride: int = 2
    # deep-pool occupancy pruning (round-5 budget-creep counter, VERDICT r4
    # item 3): before each episode, drop pool-shell voxels that (a) were in
    # the PREVIOUS episode's grid (so the field trained through them) and
    # (b) the fitted field marks empty under the reference's nerfacc
    # binarization (density * 5e-3 > occ_thre 1e-2, nerf.py:150,164).
    # Self-healing by construction: a wrongly dropped voxel is absent from
    # the next episode's prune set, so it is restored and retrained — the
    # prune can oscillate but never ratchet. Counters the bucket_s_low
    # 80->176 creep of the 14-anchor record (BASELINE.md round-5 verdict).
    occ_field_prune: bool = False
    # mid-episode visual diagnostics: every vis_freq train iterations render
    # a small pano preview from the CURRENT phase params (TB image + PNG in
    # the scene's vis_dir). The reference declares vis_freq in every config
    # (configs/nerf.yaml:68) but no reference code path reads it — here it
    # works, so 7-min flagship episodes are not flown blind. 0 = off.
    vis_freq: int = 0
    # declared by the reference (configs/nerf.yaml:69) with no reader there;
    # accepted for config parity, intentionally unused (like ignore_near)
    vis_video_freq: int = 0
    # quirk parity: geo-phase distortion ramp divides by app iters (nerf.py:178)
    # DEAD by parity: the reference declares these in every config
    # (configs/nerf.yaml:30-31) but no reference code path reads them;
    # kept so reference config files load unchanged, intentionally unused.
    ignore_near: bool = True
    cross_depth_check: bool = True


def _adam():
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def pano_visibility_from_distance(sup_pool: SupInfoPool, rays: Rays,
                                  distance: jnp.ndarray) -> jnp.ndarray:
    """Shared core of ``get_pano_visibility_mask`` (``nerf.py:321-358``):
    given the rendered surface distance, 1 where some registered pano already
    sees the surface, 0 where it is new content, then 5/9 ellipse open."""
    pts = rays.o + rays.d * distance
    maps = sup_pool.device_pano_maps()
    if maps is not None:
        # one dispatch over a cached [P, H, W, 1] device stack
        # (sup_pool._visibility_mask_core) instead of ~8 eager ops and an
        # ~8 MB distance-map re-upload per pano per call
        from .sup_pool import _visibility_mask_core
        return _visibility_mask_core(pts, *maps)
    h, w = pts.shape[:2]
    mask = jnp.zeros((h, w, 1))
    for info in sup_pool.sup_infos:
        sup_dmap = jnp.asarray(info.distance_map * info.mask)
        rel = pts - jnp.asarray(info.pose[:3, 3])
        local = apply_rot(rel, jnp.asarray(info.pose[:3, :3].T))
        new_d = jnp.linalg.norm(local, axis=-1, keepdims=True)
        coords = direction_to_img_coord(local / new_d)
        proj_d = bilinear_sample(sup_dmap, coords, padding="border")
        visible = (new_d < proj_d + 1.0 / 256.0).astype(jnp.float32)
        mask = jnp.maximum(mask, visible)
    return binary_open_close((mask[..., 0] > 0.5).astype(jnp.float32),
                             small=5, large=9)


class Scene:
    """Scene interface (reference ``modules/scene/scene.py:6-31``)."""

    def render(self, rays, query_keys=("rgb",), **kw):
        raise NotImplementedError

    def fit(self, sup_pool):
        raise NotImplementedError

    def get_pano_visibility_mask(self, sup_pool, rays):
        raise NotImplementedError

    def state_dict(self) -> dict:
        raise NotImplementedError

    def load_state_dict(self, state: dict):
        raise NotImplementedError


class NeRFScene(Scene):
    """Owns field params + train/render configs; provides fit/render."""

    def __init__(self, field_cfg: NGPFieldConfig, render_cfg: RenderConfig,
                 train_cfg: TrainConfig, key: jax.Array,
                 writer: MetricsWriter | None = None, mesh=None):
        self.field_cfg = field_cfg
        self.render_cfg = render_cfg
        self.train_cfg = train_cfg
        # optional jax.sharding.Mesh: shards the PRODUCTION bucketed train
        # step's ray axis over the mesh's 'data' axis (params replicated,
        # XLA inserts the grad psum; the occupancy argsort runs as a global
        # distributed sort, so results match the single-device program).
        # None = single-chip (identical program, no constraints). The
        # reference is strictly single-GPU (core_exp_runner.py:266); this is
        # the SURVEY §2.4 DP axis applied to the REAL trainer, not a
        # simplified sibling.
        self.mesh = mesh
        self.writer = writer or MetricsWriter(None)
        key, k = jax.random.split(key)
        self.key = key
        self.params = init_ngp_params(k, field_cfg)
        self.occ_grid = jnp.zeros((render_cfg.occ_res ** 3,), jnp.uint8)
        self.global_iter_geo = 0
        self.global_iter_app = 0
        # adaptive per-episode sample budget (None -> cfg.max_samples cap):
        # encode cost is proportional to sample ROWS, and on pool-derived
        # occupancy shells most rays occupy a small fraction of the cap
        self.sample_budget: int | None = None
        # per-episode (s_low, n_high) from select_sample_budget, or None
        self.bucket_plan: tuple | None = None
        # per-episode per-level run-dedup caps (TrainConfig.dedup_runs)
        self.run_caps: tuple | None = None
        # baked snapshot table for the fast eval path (render/snapshot.py);
        # invalidated whenever the field trains
        self.snapshot: jnp.ndarray | None = None
        # default SnapshotConfig for lazy bakes (runner sets it from the
        # config's `snapshot:` section; None -> SnapshotConfig())
        self.snap_cfg = None
        # mid-episode previews (TrainConfig.vis_freq) also land here as PNGs
        # when set (the runner points it at exp_dir/fit_vis)
        self.vis_dir: str | None = None
        # the occupancy grid the PREVIOUS episode trained through — the
        # prune set for TrainConfig.occ_field_prune (deliberately NOT
        # checkpointed: after a resume the first episode runs unpruned and
        # the chain restarts, by design — see _field_prune_occ)
        self._prev_occ: jnp.ndarray | None = None
        self._phase_fns = {}

    # -- helpers -------------------------------------------------------------

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _sample_batch(self, arrs, key):
        b = self.train_cfg.pixel_loss_batch_size
        u = jax.random.uniform(key, (b,))
        idx = jnp.minimum((u * arrs["n_valid"]).astype(jnp.int32),
                          arrs["n_valid"] - 1)
        out = (arrs["rays_o"][idx], arrs["rays_d"][idx], arrs["colors"][idx],
               arrs["distances"][idx])
        if self.mesh is not None:
            # data-parallel train step: the sampled batch's ray axis shards
            # over 'data' (pool arrays stay replicated — random gathers from
            # a sharded pool would all-gather anyway); everything downstream
            # (march, encode, MLP, composite, loss) partitions per-device
            # and the replicated-param grads psum over ICI.
            from ..parallel.mesh import ray_sharding
            sh = ray_sharding(self.mesh)
            out = tuple(jax.lax.with_sharding_constraint(x, sh) for x in out)
        return out

    def select_sample_budget(self, arrs, probe_rays: int = 16384) -> int:
        """Smallest safe ``max_samples`` for the current occupancy grid.

        Marches a probe batch of pool rays over the FULL flat ladder, takes
        the worst-case occupied-window count, adds one window of slack, and
        rounds up to a power of two (so the per-level Nyquist strides still
        divide the sample count), clamped to [4*march_coarse, cfg cap].
        The cap is the reference's fixed budget, so this is never worse;
        with the pool-derived shell grid it is typically 2-4x smaller,
        which cuts encode rows (the dominant train cost) by the same factor.
        """
        rc = self.render_cfg
        # Probe a UNIFORM subsample of the whole pool: the pool is
        # concatenated per-anchor in row-major pixel order, so a head slice
        # would only see the first pano's top rows (ceiling/sky — few
        # occupied windows) and under-estimate wall-grazing rays from later
        # anchors beyond the +1-window slack.
        n_valid = int(arrs["n_valid"])
        n = min(probe_rays, n_valid)
        idx = np.linspace(0, n_valid - 1, n).astype(np.int32)
        o, d = arrs["rays_o"][idx], arrs["rays_d"][idx]
        counts = np.asarray(jax.jit(count_occupied_windows, static_argnums=3)(
            self.occ_grid, o, d, rc))
        mc = rc.march_coarse
        worst = int(counts.max()) + 1
        # multiple-of-16 quantization (level_strides caps strides at 16 so
        # any such budget divides them) — power-of-two rounding cost up to
        # 33% of every downstream row at the flagship shell (104 -> 128)
        budget = max(4 * mc, -(-worst * mc // 16) * 16)
        budget = min(rc.max_samples, budget)

        # two-budget bucket plan for train batches (render_rays_bucketed):
        # s_low covers the 98th-percentile ray + 1 window; the high bucket
        # keeps ~8x the expected over-s_low draw count, so truncation needs
        # a >=8x-out-of-distribution batch (same risk class as the +1-window
        # budget slack)
        self.bucket_plan = None
        tc = self.train_cfg
        if tc.bucket_train:
            batch = tc.pixel_loss_batch_size
            w_low = int(np.percentile(counts, 98.0)) + 1
            s_low = max(4 * mc, -(-w_low * mc // 16) * 16)
            n_high = max(64, batch // 8)
            frac_high = float(np.mean(counts > s_low // mc))
            if s_low < budget and n_high < batch \
                    and frac_high * batch * 8.0 <= n_high:
                self.bucket_plan = (s_low, n_high)

        self.run_caps = None
        if tc.dedup_runs:
            self.run_caps = self._probe_run_caps(o, d, budget)
        return budget

    def _probe_run_caps(self, o, d, budget: int, slack: int = 8):
        """Per-level brick-run candidate caps for the dedup encode: march
        the probe rays at the episode budget and take each stride<=2
        level's worst run count + slack (same exactness class as the
        budget's +1-window slack)."""
        from ..kernels.brickgrid import BrickGridConfig, BRICK
        from ..kernels.hashgrid import level_strides
        grid = self.field_cfg.grid
        if not isinstance(grid, BrickGridConfig):
            return None
        rc = dataclasses.replace(self.render_cfg, max_samples=budget)
        from ..render.renderer import march_rays
        t_mid, _ = jax.jit(march_rays, static_argnames=("cfg", "stratified"))(
            self.occ_grid, o, d, self._next_key(), rc, True)
        pts = (np.asarray(o)[:, None, :]
               + np.asarray(d)[:, None, :] * np.asarray(t_mid)[:, :, None])
        span = self.field_cfg.aabb_max - self.field_cfg.aabb_min
        x01 = np.clip((pts - self.field_cfg.aabb_min) / span, 0.0, 1.0)
        strides = level_strides(grid, rc.step, budget)
        caps = []
        for lvl in range(grid.n_levels):
            k = strides[lvl]
            if k > 2:
                caps.append(0)
                continue
            xs = (np.concatenate([x01[:, ::k], x01[:, -1:]], axis=1)
                  if k > 1 else x01)
            res = grid.level_res(lvl)
            c0 = (np.clip(np.floor(xs * res), 0, res - 1).astype(np.int64)
                  // BRICK)
            nbk = res // BRICK + 1
            r = c0[..., 0] * nbk * nbk + c0[..., 1] * nbk + c0[..., 2]
            worst = int(((r[:, 1:] != r[:, :-1]).sum(1) + 1).max())
            cap = worst + slack
            caps.append(cap if cap < xs.shape[1] else 0)
        return tuple(caps) if any(caps) else None

    def _field_prune_occ(self, occ_grid: jnp.ndarray, prev_occ: jnp.ndarray,
                         tau: float = 1e-2, n_jitter: int = 2,
                         chunk: int = 1 << 21) -> jnp.ndarray:
        """Drop pool-shell voxels the previous episode's FITTED field marks
        empty (see ``TrainConfig.occ_field_prune``). A voxel is kept iff it
        passes the reference's nerfacc occupancy binarization — max density
        over the center + ``n_jitter`` jittered in-voxel samples, thresholded
        at ``density * 5e-3 > tau`` (``nerf.py:150,164``) — OR it is absent
        from ``prev_occ`` (newly registered geometry the field has not
        trained through yet). Fully device-side: ~3 density sweeps over the
        voxel grid, a small fraction of one bake."""
        from ..fields import query_density
        res = self.render_cfg.occ_res
        chunk = min(chunk, res ** 3)
        fc = self.field_cfg
        cache_key = ("prune", res, chunk, n_jitter, tau)
        if cache_key not in self._phase_fns:

            @jax.jit
            def prune_chunk(geo, occ_c, prev_c, start, key):
                idx = start + jnp.arange(chunk)
                v = jnp.stack([idx // (res * res), (idx // res) % res,
                               idx % res], -1)
                base = ((v.astype(jnp.float32) + 0.5) / res - 0.5) * 2.0
                dens = query_density(geo, base, fc)[..., 0]
                for j in range(n_jitter):
                    kj = jax.random.fold_in(key, j)
                    pts = base + (jax.random.uniform(kj, base.shape) - 0.5) \
                        * (2.0 / res)
                    dens = jnp.maximum(dens, query_density(geo, pts, fc)[..., 0])
                keep = ((dens * 5e-3) > tau) | (prev_c == 0)
                return jnp.where(keep, occ_c, jnp.uint8(0))

            self._phase_fns[cache_key] = prune_chunk
        prune_chunk = self._phase_fns[cache_key]
        key = self._next_key()
        outs = []
        n = res ** 3
        for start in range(0, n, chunk):
            sl = slice(start, min(start + chunk, n))
            pad = chunk - (sl.stop - sl.start)
            occ_c, prev_c = occ_grid[sl], prev_occ[sl]
            if pad:
                occ_c = jnp.concatenate([occ_c, jnp.zeros(pad, occ_c.dtype)])
                prev_c = jnp.concatenate(
                    [prev_c, jnp.zeros(pad, prev_c.dtype)])
            out = prune_chunk(self.params["geo"], occ_c, prev_c,
                              jnp.asarray(start, jnp.int32), key)
            outs.append(out[:sl.stop - sl.start] if pad else out)
        return jnp.concatenate(outs)

    # -- jitted phase runners --------------------------------------------------

    def _get_phase_fn(self, phase: str, capacity: int):
        budget = self.sample_budget or self.render_cfg.max_samples
        plan = self.bucket_plan if self.train_cfg.bucket_train else None
        caps = self.run_caps if self.train_cfg.dedup_runs else None
        cache_key = (phase, capacity, budget, plan, caps)
        if cache_key in self._phase_fns:
            return self._phase_fns[cache_key]

        tc = self.train_cfg
        fc = self.field_cfg
        rc = dataclasses.replace(self.render_cfg, max_samples=budget,
                                 run_caps=caps)
        stride = (tc.app_sample_stride if phase == "app"
                  else tc.geo_sample_stride)
        if (stride > 1 and rc.march_coarse % stride == 0
                and budget % (2 * stride) == 0):
            # coarser in-window quadrature: same march windows (max_windows
            # is unchanged), 1/stride the samples/rows (see
            # TrainConfig.{app,geo}_sample_stride)
            st = stride
            rc = dataclasses.replace(rc, sample_stride=st,
                                     max_samples=budget // st)
            if plan:
                plan = (max(4 * rc.samples_per_window, plan[0] // st),
                        plan[1])
        adam = _adam()

        def _render_train(geo_p, app_p, occ, o, d, k_render, **flags):
            if plan:
                return render_rays_bucketed(
                    {"geo": geo_p, "app": app_p}, fc, occ, o, d, k_render,
                    rc, plan[0], plan[1], train=True, **flags)
            out = render_rays({"geo": geo_p, "app": app_p}, fc, occ, o, d,
                              k_render, rc, train=True, **flags)
            return out

        def geo_step(app_params, occ, arrs, carry, i):
            geo, opt_state, key = carry
            key, k_idx, k_render, k_dens = jax.random.split(key, 4)
            o, d, _, gt_dist = self._sample_batch(arrs, k_idx)
            progress_lr = i / tc.raw_phase_iter_geo
            progress_dist = i / tc.raw_phase_iter_app  # reference quirk

            def loss_fn(geo_p):
                out = _render_train(geo_p, app_params, occ, o, d, k_render,
                                    stop_app_grad=True, need_rgb=False)
                depth_l = smooth_l1(out["distance"], gt_dist, beta=1e-2)
                dist_l = jnp.mean(out["dist_loss"])
                ratio = jnp.minimum(progress_dist * 2.0, 1.0)
                loss = (depth_l * tc.depth_loss_weight
                        + dist_l * tc.distortion_loss_weight * ratio)
                if tc.density_loss_weight > 1e-7:
                    pts = (jax.random.uniform(k_dens, (8192, 3)) * 2 - 1) * 0.99
                    from ..fields import query_density
                    loss = loss + tc.density_loss_weight * jnp.mean(
                        query_density(geo_p, pts, fc))
                return loss, (depth_l, dist_l)

            (loss, (depth_l, dist_l)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(geo)
            updates, new_opt = adam.update(grads, opt_state)
            lr = lr_at(progress_lr, tc.geo_optimizer)
            new_geo = jax.tree_util.tree_map(
                lambda p, u: p - lr * u, geo, updates)
            geo, opt_state, finite = guarded_step(
                grads, new_geo, new_opt, geo, opt_state)
            return (geo, opt_state, key), jnp.stack(
                [loss, depth_l, dist_l, lr, finite.astype(loss.dtype)])

        def app_step(geo_params, occ, arrs, carry, i):
            app, opt_state, key = carry
            key, k_idx, k_render = jax.random.split(key, 3)
            o, d, gt_col, _ = self._sample_batch(arrs, k_idx)
            progress = i / tc.raw_phase_iter_app

            def loss_fn(app_p):
                out = _render_train(geo_params, app_p, occ, o, d, k_render,
                                    stop_geo_grad=True)
                color_l = smooth_l1(out["rgb"], gt_col, beta=5e-2)
                return color_l * tc.color_loss_weight, color_l

            (loss, color_l), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(app)
            updates, new_opt = adam.update(grads, opt_state)
            lr = lr_at(progress, tc.app_optimizer)
            new_app = jax.tree_util.tree_map(
                lambda p, u: p - lr * u, app, updates)
            app, opt_state, finite = guarded_step(
                grads, new_app, new_opt, app, opt_state)
            return (app, opt_state, key), jnp.stack(
                [loss, color_l, lr, finite.astype(loss.dtype)])

        step_fn = geo_step if phase == "geo" else app_step

        if tc.scan_chunk == 1:
            # direct jit: wrapping the heavy step in lax.scan measured ~5x
            # slower on TPU (the scheduler serializes the remat'd backward
            # inside the loop); per-step dispatch costs only ~25 ms
            @jax.jit
            def run_chunk(train_params, frozen_params, opt_state, occ, arrs,
                          key, step0):
                carry, losses = step_fn(frozen_params, occ, arrs,
                                        (train_params, opt_state, key), step0)
                train_params, opt_state, key = carry
                return train_params, opt_state, key, losses[None]
        else:
            @jax.jit
            def run_chunk(train_params, frozen_params, opt_state, occ, arrs,
                          key, step0):
                def body(carry, i):
                    return step_fn(frozen_params, occ, arrs, carry, step0 + i)
                (train_params, opt_state, key), losses = jax.lax.scan(
                    body, (train_params, opt_state, key),
                    jnp.arange(tc.scan_chunk, dtype=jnp.float32))
                return train_params, opt_state, key, losses

        self._phase_fns[cache_key] = run_chunk
        return run_chunk

    def _run_phase(self, phase: str, arrs, capacity: int, n_iters: int):
        run_chunk = self._get_phase_fn(phase, capacity)
        tc = self.train_cfg
        if phase == "geo":
            train_params, frozen = self.params["geo"], self.params["app"]
        else:
            train_params, frozen = self.params["app"], self.params["geo"]
        opt_state = _adam().init(train_params)
        key = self._next_key()
        all_losses = []
        assert n_iters % tc.scan_chunk == 0, \
            f"{phase} iters {n_iters} must be divisible by scan_chunk {tc.scan_chunk}"
        base = self.global_iter_geo if phase == "geo" else self.global_iter_app
        for c in range(n_iters // tc.scan_chunk):
            train_params, opt_state, key, losses = run_chunk(
                train_params, frozen, opt_state, self.occ_grid, arrs, key,
                jnp.asarray(c * tc.scan_chunk, jnp.float32))
            all_losses.append(losses)
            if tc.vis_freq:
                done = base + (c + 1) * tc.scan_chunk
                if done // tc.vis_freq > (done - tc.scan_chunk) // tc.vis_freq:
                    self._write_vis(phase, done, train_params, frozen)
        losses = np.asarray(jnp.concatenate(all_losses, 0))

        skipped = int((losses[:, -1] == 0.0).sum())
        if skipped:
            # GradScaler-style skip fired: non-finite grads in `skipped`
            # steps were dropped instead of poisoning the params.
            print(f"[perf_tpu] WARNING: {phase} phase skipped {skipped} "
                  f"non-finite-grad step(s) of {n_iters}", flush=True)
            self.writer.add_scalars(
                {f"others/skipped_steps_{phase}": float(skipped)},
                self.global_iter_geo if phase == "geo"
                else self.global_iter_app)

        if phase == "geo":
            self.params = {**self.params, "geo": train_params}
            for j in range(0, n_iters, max(n_iters // 30, 1)):
                self.writer.add_scalars(
                    {"nerf_loss/depth_loss": losses[j, 1],
                     "nerf_loss/dist_loss": losses[j, 2],
                     "others/lr_geo": losses[j, 3]},
                    self.global_iter_geo + j)
            self.global_iter_geo += n_iters
        else:
            self.params = {**self.params, "app": train_params}
            for j in range(0, n_iters, max(n_iters // 30, 1)):
                self.writer.add_scalars(
                    {"nerf_loss/color_loss": losses[j, 1],
                     "others/lr_app": losses[j, 2]},
                    self.global_iter_app + j)
            self.global_iter_app += n_iters
        return losses

    def _write_vis(self, phase: str, global_iter: int, train_params, frozen):
        """Mid-episode preview: render a small identity-pose pano from the
        CURRENT phase params (the episode's in-flight state, not
        ``self.params``) to TB and, when ``vis_dir`` is set, to PNG.
        Off the hot path — one small adaptive eval render per vis_freq
        iterations."""
        from ..core import gen_pano_rays
        if phase == "geo":
            params = {"geo": train_params, "app": frozen}
        else:
            params = {"geo": frozen, "app": train_params}
        rays = gen_pano_rays(jnp.eye(4), 128, 256)
        # FIXED render config: adaptive per-chunk budgets pick a fresh
        # max_samples per episode, and every new value is a new remote
        # compile (~minutes through the tunnel) — measured stalling
        # flagship anchors ~10 min per vis firing. One static shape
        # compiles once for the whole run.
        rc_vis = dataclasses.replace(self.render_cfg, adaptive_eval=False,
                                     run_caps=None)
        out = render_image(params, self.field_cfg, self.occ_grid, rays,
                           self._next_key(), rc_vis,
                           query_keys=("rgb", "distance"),
                           chunk=min(self.render_cfg.eval_chunk, 8192))
        rgb = np.clip(np.asarray(out["rgb"]), 0.0, 1.0)
        dist = np.asarray(out["distance"])[..., 0]
        inv = np.clip(dist.min() / np.maximum(dist, 1e-6), 0.0, 1.0)
        self.writer.add_image(f"fit_vis/{phase}_rgb", rgb, global_iter)
        self.writer.add_image(f"fit_vis/{phase}_inv_distance",
                              inv[..., None].repeat(3, -1), global_iter)
        if self.vis_dir:
            import os
            from ..utils.io import write_image
            os.makedirs(self.vis_dir, exist_ok=True)
            write_image(os.path.join(
                self.vis_dir, f"{phase}_{global_iter:06d}.png"), rgb)

    # -- public API ------------------------------------------------------------

    def fit(self, sup_pool: SupInfoPool):
        """One training episode over the current pool (``nerf.py:125-184``)."""
        tc = self.train_cfg
        occ = sup_pool.gen_occ_grid(self.render_cfg.occ_res,
                                    self.render_cfg.occ_dilation)
        if tc.occ_field_prune and self._prev_occ is not None \
                and self.global_iter_geo > 0:
            # prune with the PRE-reset field (fitted last episode) — must
            # run before reset_geo below
            occ = self._field_prune_occ(occ, self._prev_occ)
        self._prev_occ = occ
        self.occ_grid = occ
        self.params = reset_geo(self.params, self._next_key(), self.field_cfg)
        arrs = sup_pool.device_arrays()
        self.sample_budget = self.select_sample_budget(arrs)
        self.snapshot = None            # field changes -> stale bake
        plan = self.bucket_plan or (0, 0)
        self.writer.add_scalars(
            {"budget/max_samples": self.sample_budget,
             "budget/bucket_s_low": plan[0],
             "budget/bucket_n_high": plan[1]}, self.global_iter_geo)
        capacity = int(arrs["rays_o"].shape[0])
        n_rays = tc.pixel_loss_batch_size
        with phase_timer(self.writer, "fit_geo", self.global_iter_geo,
                         tc.raw_phase_iter_geo * n_rays, "rays"):
            geo_losses = self._run_phase("geo", arrs, capacity,
                                         tc.raw_phase_iter_geo)
        with phase_timer(self.writer, "fit_app", self.global_iter_app,
                         tc.raw_phase_iter_app * n_rays, "rays"):
            app_losses = self._run_phase("app", arrs, capacity,
                                         tc.raw_phase_iter_app)
        self.writer.flush()
        return {"geo_losses": geo_losses, "app_losses": app_losses}

    def bake_snapshot(self, snap_cfg=None):
        """Bake the current field into the dense snapshot table
        (render/snapshot.py) for gather-minimal eval rendering. Re-baked
        lazily after every fit; call before a long render sweep."""
        from ..render.snapshot import SnapshotConfig, bake_snapshot
        self._snap_cfg = snap_cfg or self.snap_cfg or SnapshotConfig()
        self.snapshot = bake_snapshot(self.params, self.field_cfg,
                                      self.occ_grid, self.render_cfg.occ_res,
                                      self._snap_cfg)
        return self.snapshot

    def render_snapshot(self, rays: Rays, query_keys=("rgb", "distance"),
                        chunk: int = 32768):
        """Eval render through the baked snapshot (bakes on first use)."""
        from ..render.snapshot import render_snapshot_image
        if self.snapshot is None:
            self.bake_snapshot()
        return render_snapshot_image(self.snapshot, self.field_cfg,
                                     self.occ_grid, rays, self.render_cfg,
                                     self._snap_cfg, query_keys=query_keys,
                                     chunk=chunk)

    def render(self, rays: Rays, query_keys=("rgb",), key=None, chunk=None):
        """Chunked eval render (``nerf.py:74-99``).

        Eval rays come from arbitrary poses (circle/travel cameras), so the
        train budget gets a 2x slack for grazing rays the pool probe never
        saw; the chunk grows by the same factor (rays x samples stays at
        the cap's memory footprint), so frames need fewer dispatches too.
        """
        rc = self.render_cfg
        if self.sample_budget and 2 * self.sample_budget < rc.max_samples:
            scale = rc.max_samples // (2 * self.sample_budget)
            if rc.adaptive_eval:
                # per-chunk budgets usually stay near 2x the train budget,
                # but they are only capped at max_samples — so a grown
                # chunk whose local budget hits the cap would materialize
                # chunk*max_samples gather rows, past the verified-safe
                # footprint (brick fields measured OOM at 32768x256 on a
                # 16 GB chip; the runner's 8192x256 is the verified-safe
                # ceiling). Grow the chunk for dispatch efficiency but cap
                # the grown chunk's per-chunk budget so chunk*budget never
                # exceeds the ungrown config's footprint. The cap is >=
                # 2*sample_budget by construction, so quality never drops
                # below the non-adaptive branch's.
                grown = min(rc.eval_chunk * scale, 32768)
                cap = max(rc.eval_chunk * rc.max_samples // grown,
                          2 * self.sample_budget)
                rc = dataclasses.replace(
                    rc, eval_chunk=grown,
                    max_samples=min(rc.max_samples, cap))
            else:
                rc = dataclasses.replace(rc,
                                         max_samples=2 * self.sample_budget,
                                         eval_chunk=rc.eval_chunk * scale)
        return render_image(self.params, self.field_cfg, self.occ_grid, rays,
                            key if key is not None else self._next_key(),
                            rc, query_keys=query_keys,
                            chunk=chunk or rc.eval_chunk)

    def get_pano_visibility_mask(self, sup_pool: SupInfoPool,
                                 rays: Rays,
                                 use_snapshot: bool = True) -> jnp.ndarray:
        """1 where the rendered surface is already seen by some registered
        pano, 0 where it is new content (``nerf.py:321-358``).

        The surface distance is rendered through the baked snapshot by
        default: it is both ~12x faster and MORE accurate than the field
        eval path (flagship ablation, BASELINE.md — snapshot depth MAE 0.011
        vs 0.019), and the bake amortizes over the anchor cycle's other
        renders. ``use_snapshot=False`` restores the field path."""
        if use_snapshot:
            distance = self.render_snapshot(
                rays, query_keys=("distance",))["distance"]
        else:
            distance = self.render(rays, query_keys=("distance",))["distance"]
        return pano_visibility_from_distance(sup_pool, rays, distance)

    # -- state -----------------------------------------------------------------

    def state_dict(self) -> dict:
        return {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "occ_grid": np.asarray(self.occ_grid),
            "global_iter_geo": self.global_iter_geo,
            "global_iter_app": self.global_iter_app,
            "sample_budget": self.sample_budget or 0,
        }

    def load_state_dict(self, state: dict):
        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        self.occ_grid = jnp.asarray(state["occ_grid"])
        self.snapshot = None   # loaded field -> any existing bake is stale
        self.global_iter_geo = int(state["global_iter_geo"])
        self.global_iter_app = int(state["global_iter_app"])
        self.sample_budget = int(state.get("sample_budget", 0)) or None
