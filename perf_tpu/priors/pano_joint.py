"""PanoJointPredictor — the geometry engine.

Counterpart of the reference's ``modules/geo_predictors/pano_joint_predictor.py``:
fuse per-tangent-view monocular depth + normal predictions into one coherent
spherical distance field by distillation, then read back full-res pano
distance + normal maps.

Pipeline (faithful to ``pano_joint_predictor.py:101-305``):
1. 20 icosahedral tangent views x 3 FOV ratios (1.1/1.4/1.7), random yaw.
2. Depth + normal inference per view — here ONE batched call over all 60
   views instead of 120 sequential CUDA forwards with CPU<->GPU shuffles.
3. Two-phase distillation (global scale -> + local bias maps), 1500 iters
   each: smooth-L1 distance loss, normal consistency via the field's
   direction-gradients, scale regularizer, TV on local biases, and a
   progress-ramped anchor to the known (unmasked) reference distance.
4. Query the field at full pano res; normals from analytic gradients.

TPU shape: the whole distillation step (sample -> field -> losses -> 3-group
Adam) is one jitted scan chunk.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import (
    tangent_cameras, tangent_c2w, direction_to_img_coord, bilinear_sample,
    img_coord_from_hw, img_coord_to_pano_direction, pano_sample,
)
from ..fields.sphere_field import (
    SphereFieldConfig, init_sphere_field, sphere_field_distance,
    sphere_field_distance_and_grad, grads_to_normal,
)
from ..train.schedule import smooth_l1
from ..core.optim import guarded_step
from ..utils.metrics import phase_timer
from .interface import DepthPredictor, NormalPredictor


def smooth_l1_none(pred, target, beta: float):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def normal_projection_errors(dirs, grads, ref_normals, key):
    """The reference's tangent-basis normal consistency terms
    (``pano_joint_predictor.py:245-258``): tilt two random tangent vectors by
    the distance gradient; both must be orthogonal to the reference normal."""
    ortho_a = jax.random.normal(key, dirs.shape, dirs.dtype)
    ortho_b = jnp.cross(dirs, ortho_a)
    ortho_b = ortho_b / jnp.linalg.norm(ortho_b, axis=-1, keepdims=True)
    ortho_a = jnp.cross(ortho_b, dirs)
    ortho_a = ortho_a / jnp.linalg.norm(ortho_a, axis=-1, keepdims=True)
    val_a = jnp.sum(grads * ortho_a, -1, keepdims=True) * dirs + ortho_a
    val_a = val_a / jnp.linalg.norm(val_a, axis=-1, keepdims=True)
    val_b = jnp.sum(grads * ortho_b, -1, keepdims=True) * dirs + ortho_b
    val_b = val_b / jnp.linalg.norm(val_b, axis=-1, keepdims=True)
    err_a = jnp.sum(val_a * ref_normals, -1, keepdims=True)
    err_b = jnp.sum(val_b * ref_normals, -1, keepdims=True)
    return jnp.concatenate([err_a, err_b], -1)


@dataclasses.dataclass(frozen=True)
class JointPredictorConfig:
    gen_res: int = 384
    ratios: tuple = (1.1, 1.4, 1.7)
    local_batch: int = 256
    iters_per_phase: int = 1500
    init_lr: float = 1e-1        # global (scale) group
    init_lr_sp: float = 1e-2     # sphere field
    init_lr_local: float = 1e-1  # local bias maps
    lr_alpha: float = 1e-2
    normal_bias_res: int = 128
    # 1 = per-step dispatch (TPU production: lax.scan around heavy steps
    # measured ~4-5x slower on this backend — BASELINE.md); >1 = scan chunks
    # (CPU tests, where scan wins).
    scan_chunk: int = 1
    # TPU flagship: brick-packed sphere field with analytic first-order
    # gradients (ONE row gather fwd + ONE scatter bwd per step instead of
    # the hash layout's 8 narrow gathers/level and second-order AD chain).
    # Reference-parity variant: SphereFieldConfig(fine_res=2048)
    # (hash + 'ad'), selectable via priors.joint.{encoding,grad_mode}.
    field: SphereFieldConfig = SphereFieldConfig(
        fine_res=2048, encoding="brick", grad_mode="analytic")


class PanoJointPredictor:
    def __init__(self, depth_predictor: DepthPredictor,
                 normal_predictor: NormalPredictor,
                 cfg: JointPredictorConfig = JointPredictorConfig(),
                 seed: int = 0, writer=None):
        self.depth = depth_predictor
        self.normal = normal_predictor
        self.cfg = cfg
        self.writer = writer
        self._np_rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        # jitted programs cached ACROSS __call__s: the runner invokes the
        # predictor once per anchor (24x at flagship) with identical shapes,
        # so per-call closures would recompile the distillation step every
        # anchor (remote compiles are minutes here). Keyed by input shapes;
        # per-call arrays flow as arguments, not captures.
        self._jit_cache: dict = {}

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    # -- view generation -----------------------------------------------------

    def _make_views(self, img):
        cfg = self.cfg
        dirs_l, ratios_l, tos_l, downs_l, rights_l = [], [], [], [], []
        for ratio in cfg.ratios:
            yaw = float(self._np_rng.uniform(0.0, 2 * np.pi))
            d, r, t, dn, rt = tangent_cameras(cfg.gen_res, ratio, yaw=yaw)
            dirs_l.append(d); ratios_l.append(r); tos_l.append(t)
            downs_l.append(dn); rights_l.append(rt)
        dirs = np.concatenate(dirs_l)
        pers_ratios = np.concatenate(ratios_l)
        tos = np.concatenate(tos_l)
        downs = np.concatenate(downs_l)
        rights = np.concatenate(rights_l)
        c2w, _, _ = tangent_c2w(tos, downs, rights)
        coords = direction_to_img_coord(jnp.asarray(dirs))
        views = pano_sample(jnp.asarray(img), coords)  # [V, r, r, 3]
        return (jnp.asarray(dirs), jnp.asarray(pers_ratios), jnp.asarray(c2w),
                views)

    # -- main ------------------------------------------------------------------

    def __call__(self, img, ref_distance, mask,
                 reg_loss_weight: float = 1e-1,
                 normal_loss_weight: float = 1e-2,
                 normal_tv_loss_weight: float = 1e-2):
        """img [H, W, 3]; ref_distance [H, W(, 1)]; mask [H, W(, 1)] (1 =
        unknown / to be predicted freely, 0 = anchor to ref_distance).
        Returns (distance [H, W, 1], normal [H, W, 3])."""
        cfg = self.cfg
        h, w = img.shape[0], img.shape[1]
        ref_distance = jnp.asarray(ref_distance).reshape(h, w, -1)[..., :1]
        mask = jnp.asarray(mask).reshape(h, w, -1)[..., :1].astype(jnp.float32)

        dirs, pers_ratios, c2w, views = self._make_views(img)
        n_views = views.shape[0]

        # batched priors (fakes get geometry; real nets ignore it)
        with phase_timer(self.writer, "joint_priors", n_items=n_views,
                         item_name="views"):
            pred_depth = self.depth.predict_depth(views, dirs=dirs)      # [V,r,r,1]
            pred_depth = jnp.clip(pred_depth, 0.0, None)
            pred_depth = pred_depth / (jnp.mean(pred_depth, axis=(1, 2, 3),
                                                keepdims=True) + 1e-5)
            pred_dist = (pred_depth * pers_ratios)[..., 0]               # [V,r,r]

            pred_n = self.normal.predict_normal(views, dirs=dirs, c2w=c2w)
            pred_n = pred_n * 2.0 - 1.0
            pred_n = pred_n / jnp.linalg.norm(pred_n, axis=-1, keepdims=True)
            pred_n = jnp.einsum("vij,vhwj->vhwi", c2w, pred_n)           # world
            float(jnp.sum(pred_n[0, 0, 0]))                              # D2H sync

        params = {
            "scale": jnp.zeros((n_views,)),
            "bias_ld": jnp.zeros((n_views, cfg.gen_res, cfg.gen_res)),
            "bias_ln": jnp.zeros((n_views, cfg.normal_bias_res,
                                  cfg.normal_bias_res, 3)),
            "sp": init_sphere_field(self._next_key(), cfg.field),
        }
        adam = optax.scale_by_adam(eps=1e-8)
        opt_state = {
            "global": adam.init(params["scale"]),
            "sp": adam.init(params["sp"]),
            "local": adam.init({"bias_ld": params["bias_ld"],
                                "bias_ln": params["bias_ln"]}),
        }

        data = {"dirs": dirs, "pred_dist": pred_dist, "pred_n": pred_n,
                "ref_distance": ref_distance, "mask": mask}
        wts = jnp.asarray([reg_loss_weight, normal_loss_weight,
                           normal_tv_loss_weight], jnp.float32)
        run_chunk = self._get_distill_fn((n_views, h, w))

        key = self._next_key()
        n_iters = cfg.iters_per_phase
        assert n_iters % cfg.scan_chunk == 0
        losses = []
        for phase_i, hybrid in enumerate((False, True)):
            with phase_timer(self.writer, f"joint_distill_p{phase_i + 1}",
                             n_items=n_iters, item_name="iters"):
                for c in range(n_iters // cfg.scan_chunk):
                    i0 = jnp.asarray(phase_i * n_iters + c * cfg.scan_chunk,
                                     jnp.float32)
                    (params, opt_state, key), ls = run_chunk(
                        data, wts, params, opt_state, key, i0, hybrid=hybrid)
                    losses.append(ls)
                # force a scalar D2H readback: on the tunneled axon backend
                # block_until_ready can return before execution completes
                float(losses[-1][-1])

        # full-res readback
        with phase_timer(self.writer, "joint_readback", n_items=h * w,
                         item_name="px"):
            pano_dirs = img_coord_to_pano_direction(img_coord_from_hw(h, w))
            flat = pano_dirs.reshape(-1, 3)
            dists, grads = [], []
            chunk = 1 << 16
            n_pad = (-flat.shape[0]) % chunk
            flat_p = jnp.concatenate(
                [flat, jnp.ones((n_pad, 3)) / np.sqrt(3.0)], 0)
            qfn = self._jit_cache.get("qfn")
            if qfn is None:
                qfn = jax.jit(lambda p, d: sphere_field_distance_and_grad(
                    p, d, cfg.field))
                self._jit_cache["qfn"] = qfn
            for s in range(0, flat_p.shape[0], chunk):
                dd, gg = qfn(params["sp"], flat_p[s:s + chunk])
                dists.append(dd)
                grads.append(gg)
            dist = jnp.concatenate(dists)[: h * w].reshape(h, w, 1)
            grad = jnp.concatenate(grads)[: h * w].reshape(h, w, 3)
            normal = grads_to_normal(pano_dirs, grad, self._next_key())
            float(dist[0, 0, 0])                                         # D2H sync
        return dist, normal

    # -- cached distillation program ----------------------------------------

    def _get_distill_fn(self, shapes_key):
        """Build (once per input-shape signature) the jitted distillation
        step. Per-anchor arrays (``data``) and loss weights (``wts`` =
        [reg, normal, normal_tv]) are ARGUMENTS so 24 anchor calls share one
        compiled program."""
        cache_key = ("distill", shapes_key)
        if cache_key in self._jit_cache:
            return self._jit_cache[cache_key]
        cfg = self.cfg
        adam = optax.scale_by_adam(eps=1e-8)
        sample_view = jax.vmap(lambda im, c: bilinear_sample(im, c, "border"))

        def step(hybrid: bool, data, wts, carry, i):
            params, opt_state, key = carry
            n_views = data["dirs"].shape[0]
            key, k_coord, k_ortho = jax.random.split(key, 3)
            progress = i / (2.0 * cfg.iters_per_phase)   # spans both phases
            lr_ratio = ((jnp.cos(progress * jnp.pi) + 1.0)
                        * (1.0 - cfg.lr_alpha) + cfg.lr_alpha)

            coords = jax.random.uniform(k_coord,
                                        (n_views, cfg.local_batch, 2))

            def loss_fn(p):
                cur_dirs = sample_view(data["dirs"], coords)          # [V,B,3]
                cur_dirs = cur_dirs / jnp.linalg.norm(cur_dirs, axis=-1,
                                                      keepdims=True)
                cur_dist = sample_view(data["pred_dist"][..., None],
                                       coords)[..., 0]
                cur_norm = sample_view(data["pred_n"], coords)
                d_bias = sample_view(p["bias_ld"][..., None], coords)[..., 0]
                n_bias = sample_view(p["bias_ln"], coords)

                ref_d = cur_dist * jax.nn.softplus(p["scale"])[:, None] + d_bias
                ref_nrm = cur_norm + n_bias
                ref_nrm = ref_nrm / jnp.linalg.norm(ref_nrm, axis=-1,
                                                    keepdims=True)

                flat_dirs = cur_dirs.reshape(-1, 3)
                pd, pg = sphere_field_distance_and_grad(p["sp"], flat_dirs,
                                                        cfg.field)
                pd = pd.reshape(n_views, cfg.local_batch)
                pg = pg.reshape(n_views, cfg.local_batch, 3)

                distance_loss = smooth_l1(ref_d, pd, beta=0.5)
                errors = normal_projection_errors(cur_dirs, pg, ref_nrm,
                                                  k_ortho)
                normal_loss = smooth_l1(errors, jnp.zeros_like(errors),
                                        beta=0.5)
                reg_loss = (jnp.mean(jax.nn.softplus(p["scale"])) - 1.0) ** 2

                if hybrid:
                    ld = p["bias_ld"]
                    tv_d = (smooth_l1(ld[:, 1:], ld[:, :-1], beta=1e-2)
                            + smooth_l1(ld[:, :, 1:], ld[:, :, :-1], beta=1e-2))
                    ln = p["bias_ln"]
                    tv_n = (smooth_l1(ln[:, 1:], ln[:, :-1], beta=1e-2)
                            + smooth_l1(ln[:, :, 1:], ln[:, :, :-1], beta=1e-2))
                else:
                    tv_d = 0.0
                    tv_n = 0.0

                # anchor to known reference distance where mask==0
                pano_coords = direction_to_img_coord(flat_dirs)
                s_ref = bilinear_sample(data["ref_distance"],
                                        pano_coords)[..., 0]
                s_mask = bilinear_sample(data["mask"], pano_coords)[..., 0]
                ref_loss = jnp.mean(
                    smooth_l1_none(s_ref, pd.reshape(-1), beta=1e-2)
                    * (s_mask < 0.5))

                loss = (ref_loss * 20.0 * progress
                        + distance_loss
                        + reg_loss * wts[0]
                        + normal_loss * wts[1]
                        + tv_d * 1.0
                        + tv_n * wts[2])
                return loss, (distance_loss, normal_loss)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

            up_g, st_g = adam.update(grads["scale"], opt_state["global"])
            up_s, st_s = adam.update(grads["sp"], opt_state["sp"])
            new_scale = params["scale"] - cfg.init_lr * lr_ratio * up_g
            new_sp = jax.tree_util.tree_map(
                lambda a, u: a - cfg.init_lr_sp * lr_ratio * u,
                params["sp"], up_s)
            new = {**params, "scale": new_scale, "sp": new_sp}
            ostate = {**opt_state, "global": st_g, "sp": st_s}
            if hybrid:
                loc = {"bias_ld": params["bias_ld"], "bias_ln": params["bias_ln"]}
                up_l, st_l = adam.update(
                    {"bias_ld": grads["bias_ld"], "bias_ln": grads["bias_ln"]},
                    opt_state["local"])
                new["bias_ld"] = loc["bias_ld"] - cfg.init_lr_local * lr_ratio * up_l["bias_ld"]
                new["bias_ln"] = loc["bias_ln"] - cfg.init_lr_local * lr_ratio * up_l["bias_ln"]
                ostate["local"] = st_l
            new, ostate, _ = guarded_step(grads, new, ostate,
                                          params, opt_state)
            return (new, ostate, key), loss

        if cfg.scan_chunk == 1:
            # per-step dispatch: lax.scan around heavy optimizer steps
            # measured ~4-5x slower on this TPU backend (BASELINE.md); the
            # ~25 ms dispatch round-trip is the cheaper overhead
            @partial(jax.jit, static_argnames=("hybrid",))
            def run_chunk(data, wts, params, opt_state, key, i0, hybrid):
                carry, loss = step(hybrid, data, wts,
                                   (params, opt_state, key), i0)
                return carry, loss[None]
        else:
            @partial(jax.jit, static_argnames=("hybrid",))
            def run_chunk(data, wts, params, opt_state, key, i0, hybrid):
                def body(carry, j):
                    return step(hybrid, data, wts, carry, i0 + j)
                return jax.lax.scan(body, (params, opt_state, key),
                                    jnp.arange(cfg.scan_chunk,
                                               dtype=jnp.float32))

        self._jit_cache[cache_key] = run_chunk
        return run_chunk
