"""CoreRunner: end-to-end orchestration (train / render_dense).

Counterpart of the reference's ``core_exp_runner.py:36-256``, preserving the
CLI-observable behavior: build dataset -> scene -> pose sampler -> sup pool
-> predictors -> inpainter; run the progressive train loop (raw fit, then per
anchor: visibility mask -> render -> inpaint -> geometry -> geo-check ->
register -> re-fit) with phase-level checkpoint/resume; render the dense
traverse video.

Deviations (all improvements, documented):
- checkpoints restore the FULL state including the sup pool (the reference
  drops it on resume — ``core_exp_runner.py:217-221``);
- prior/inpainter backends are pluggable ('fake' backends keep the pipeline
  runnable without multi-GB checkpoints);
- source-code backup into the exp dir is opt-in (off by default).
"""

from __future__ import annotations

import os
import time
from os.path import join as pjoin

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core import gen_pano_rays, gen_pers_rays, Rays
from ..data import WildDataset
from ..fields import NGPFieldConfig
from ..render import RenderConfig
from ..train import (
    SupInfoPool, NeRFScene, TrainConfig, OptimConfig,
    pano_visibility_from_distance, save_checkpoint, load_checkpoint,
)
from ..pose import CirclePoseSampler, DenseTravelPoseSampler
from ..inpaint import FakeInpainter, PanoPersFusionInpainter
from ..priors import (
    PanoJointPredictor, JointPredictorConfig,
    FakeCubeRoomDepthPredictor, FakeCubeRoomNormalPredictor,
)
from ..utils.io import write_image, write_video, colorize_single_channel_image
from ..utils.metrics import MetricsWriter, phase_timer


def build_prior_backends(conf: Config):
    """Depth/normal prior backends by config ('fake' | 'dpt')."""
    backend = conf.get_path("priors.backend", "fake")
    if backend == "dpt":
        from ..priors.dpt import DPTDepthBackend, DPTNormalBackend
        ckpt_dir = conf.get_path("priors.checkpoint_dir", "./pre_checkpoints")
        return (DPTDepthBackend(ckpt_dir), DPTNormalBackend(ckpt_dir))
    room = conf.get_path("priors.fake_room", 0.8)
    return (FakeCubeRoomDepthPredictor(room=room),
            FakeCubeRoomNormalPredictor(room=room))


def build_inpainter(conf: Config):
    kind = conf.get_path("pers_inpainter_type", "stable_diffusion")
    gen_res = conf.get_path("inpaint.gen_res", 512)
    if kind == "fake":
        return PanoPersFusionInpainter(FakeInpainter(), gen_res=gen_res)
    if kind == "stable_diffusion":
        try:
            from ..inpaint.lama import LamaInpainterBackend
            from ..inpaint.diffusion import DiffusionInpainterBackend
            return PanoPersFusionInpainter(
                LamaInpainterBackend(conf.get_path(
                    "inpaint.checkpoint_dir", "./pre_checkpoints")),
                DiffusionInpainterBackend(conf.get_path(
                    "inpaint.checkpoint_dir", "./pre_checkpoints")),
                gen_res=gen_res)
        except Exception as e:  # missing checkpoints / module
            if conf.get_path("inpaint.allow_fake_fallback", True):
                print(f"[perf_tpu] inpainter '{kind}' unavailable ({e}); "
                      "falling back to the fake fill backend")
                return PanoPersFusionInpainter(FakeInpainter(),
                                               gen_res=gen_res)
            raise
    raise ValueError(f"unknown pers_inpainter_type {kind!r}")


def _train_config(tc: Config) -> TrainConfig:
    # accepted-for-parity keys with NO reader in the reference's executed
    # path (configs/nerf.yaml:30-31,69; see TrainConfig docstrings): loading
    # a reference config must not error, but a user who CHANGES one away
    # from its default deserves a warning instead of a silent no-op
    _parity_only = {"vis_video_freq": 25000, "ignore_near": True,
                    "cross_depth_check": True}  # reference nerf.yaml:30-31,69
    for key, default in _parity_only.items():
        if key in tc and tc[key] != default:
            import warnings
            warnings.warn(
                f"config key '{key}'={tc[key]!r} is accepted for reference-"
                "config parity but has no effect (the reference declares it "
                "and never reads it; perf_tpu preserves that behavior)",
                stacklevel=2)

    def optim(oc):
        return OptimConfig(init_lr=oc["init_lr"], peak_lr=oc["peak_lr"],
                           peak_at=oc["peak_at"], lr_alpha=oc["lr_alpha"])
    return TrainConfig(
        raw_phase_iter_geo=tc["raw_phase_iter_geo"],
        raw_phase_iter_app=tc["raw_phase_iter_app"],
        pixel_loss_batch_size=tc["pixel_loss_batch_size"],
        color_loss_weight=tc.get("color_loss_weight", 1.0),
        depth_loss_weight=tc.get("depth_loss_weight", 1.0),
        distortion_loss_weight=tc.get("distortion_loss_weight", 0.1),
        density_loss_weight=tc.get("density_loss_weight", 0.0),
        geo_optimizer=optim(tc["geo_optimizer"]),
        app_optimizer=optim(tc["app_optimizer"]),
        **({"prop_optimizer": optim(tc["prop_optimizer"])}
           if "prop_optimizer" in tc else {}),
        scan_chunk=tc.get("scan_chunk", 1),
        bucket_train=tc.get("bucket_train", True),
        dedup_runs=tc.get("dedup_runs", False),
        app_sample_stride=tc.get("app_sample_stride", 2),
        geo_sample_stride=tc.get("geo_sample_stride", 1),
        occ_field_prune=tc.get("occ_field_prune", False),
        vis_freq=tc.get("vis_freq", 0),
        vis_video_freq=tc.get("vis_video_freq", 0),
        ignore_near=tc.get("ignore_near", True),
        cross_depth_check=tc.get("cross_depth_check", True),
    )


class CoreRunner:
    def __init__(self, conf: Config):
        self.conf = conf
        seed = conf.get_path("seed", 0)
        self.key = jax.random.PRNGKey(seed)

        depth_backend, normal_backend = build_prior_backends(conf)
        self.geo_predictor = PanoJointPredictor(
            depth_backend, normal_backend,
            cfg=self._joint_cfg(), seed=seed)

        self.dataset = WildDataset(conf["dataset"], self.geo_predictor)

        self.base_exp_dir = conf["device"]["base_exp_dir"]
        self.exp_dir = pjoin(
            self.base_exp_dir,
            f"{conf['dataset_class_name']}_{self.dataset.case_name}",
            conf["exp_name"])
        os.makedirs(self.exp_dir, exist_ok=True)
        record_dir = pjoin(self.exp_dir, "record")
        os.makedirs(record_dir, exist_ok=True)
        with open(pjoin(record_dir, "config.yaml"), "w") as f:
            f.write(conf.to_yaml())
        # source backup for reproducibility (reference parity:
        # core_exp_runner.py:49-62 copies the code tree into exp_dir/record;
        # one zip of the package + configs keeps the exp self-describing
        # without a 10k-file copy)
        try:
            import zipfile
            pkg_root = os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))
            with zipfile.ZipFile(pjoin(record_dir, "src_backup.zip"), "w",
                                 zipfile.ZIP_DEFLATED) as zf:
                for base in (pkg_root,
                             pjoin(os.path.dirname(pkg_root), "configs")):
                    for root, _, files in os.walk(base):
                        if "__pycache__" in root:
                            continue
                        for fn in files:
                            if fn.endswith((".py", ".yaml", ".cpp")):
                                p = pjoin(root, fn)
                                zf.write(p, os.path.relpath(
                                    p, os.path.dirname(pkg_root)))
        except OSError:            # never fail a run over a backup
            pass

        # scene
        sc = conf["scene"]
        estimator_type = sc.get("estimator_type", "occ")
        assert estimator_type in ("occ", "prop"), estimator_type
        rc = sc.get("renderer_conf", {})
        fc = conf.get_path("scene.field", {}) or {}
        kind = fc.get("kind", "hash")
        self.render_cfg = RenderConfig(
            bg_color=rc.get("bg_color", "rand_noise"),
            max_samples=conf.get_path("scene.max_samples", 256),
            step=conf.get_path("scene.march_step", 5e-4),
            occ_res=conf.get_path("scene.occ_res", 256),
            occ_dilation=conf.get_path("scene.occ_dilation", 1),
            # brick eval materializes [chunk*samples, 128] gather rows;
            # 8192-ray chunks keep the field-path render under ~1 GB on a
            # 16 GB chip (measured OOM at 32768 once the pool grows)
            eval_chunk=rc.get("eval_chunk",
                              8192 if kind == "brick" else 32768),
        )
        if kind == "brick":
            from ..kernels import BrickGridConfig
            grid = BrickGridConfig(
                n_levels=fc.get("n_levels", 16),
                n_features=fc.get("n_features", 2),
                log2_bricks=fc.get("log2_bricks", 12),
                base_res=fc.get("base_res", 16),
                per_level_scale=fc.get("per_level_scale", 1.4472692012786865))
            self.field_cfg = NGPFieldConfig(grid=grid)
        elif fc:
            from ..kernels import HashGridConfig
            self.field_cfg = NGPFieldConfig(grid=HashGridConfig(
                n_levels=fc.get("n_levels", 16),
                n_features=fc.get("n_features", 2),
                log2_table_size=fc.get("log2_table_size", 18),
                base_res=fc.get("base_res", 16),
                per_level_scale=fc.get("per_level_scale", 1.4472692012786865)))
        else:
            self.field_cfg = NGPFieldConfig()
        writer = MetricsWriter(pjoin(self.exp_dir, "ts_log"))
        self.writer = writer
        # the predictor is constructed before the exp dir exists (the
        # dataset bootstrap needs it); attach the writer now so the anchor
        # cycle's distill/readback phase timers are recorded
        self.geo_predictor.writer = writer
        if estimator_type == "prop":
            # proposal-cascade estimator (reference nerf.py:42-66; its CUDA
            # renderer is broken — see train/prop_scene.py)
            from ..render.prop import PropRenderConfig
            from ..train.prop_scene import PropNeRFScene
            self.scene = PropNeRFScene(
                self.field_cfg,
                PropRenderConfig(bg_color=rc.get("bg_color", "rand_noise")),
                _train_config(sc["train_conf"]), self._next_key(),
                writer=writer)
        else:
            self.scene = NeRFScene(self.field_cfg, self.render_cfg,
                                   _train_config(sc["train_conf"]),
                                   self._next_key(), writer=writer)
        # mid-episode previews (TrainConfig.vis_freq) land here
        self.scene.vis_dir = pjoin(self.exp_dir, "fit_vis")
        # snapshot knobs for every lazy bake (anchor renders, visibility
        # masks, render_dense) — see render/snapshot.py SnapshotConfig
        from ..render.snapshot import SnapshotConfig
        _sd = SnapshotConfig()
        self.scene.snap_cfg = SnapshotConfig(
            res=int(self.conf.get_path("snapshot.res", _sd.res)),
            sample_stride=self.conf.get_path("snapshot.sample_stride",
                                             _sd.sample_stride),
            march_coarse=self.conf.get_path("snapshot.march_coarse",
                                            _sd.march_coarse),
            dedup_ratio=float(self.conf.get_path("snapshot.dedup_ratio",
                                                 _sd.dedup_ratio)),
            frame_dispatch=bool(self.conf.get_path(
                "snapshot.frame_dispatch", _sd.frame_dispatch)),
            bake_host=bool(self.conf.get_path(
                "snapshot.bake_host", _sd.bake_host)))

        # startup vis (reference core_exp_runner.py:67-72)
        write_image(pjoin(self.exp_dir, "distance_vis.png"),
                    colorize_single_channel_image(
                        (float(jnp.min(self.dataset.ref_distance)) + 1e-6)
                        / (np.asarray(self.dataset.ref_distance) + 1e-6)))
        if self.dataset.ref_normal is not None:
            write_image(pjoin(self.exp_dir, "normal_vis.png"),
                        np.asarray(self.dataset.ref_normal) * 0.5 + 0.5)

        self.pose_sampler = CirclePoseSampler(
            np.asarray(self.dataset.ref_distance),
            traverse_ratios=tuple(conf["pose_sampler"]["traverse_ratios"]),
            n_anchors_per_ratio=tuple(conf["pose_sampler"]["n_anchors_per_ratio"]))

        self.sup_pool = SupInfoPool()
        self.sup_pool.register_sup_info(
            pose=np.eye(4, dtype=np.float32),
            mask=np.ones((self.dataset.height, self.dataset.width)),
            rgb=self.dataset.image,
            distance=self.dataset.ref_distance,
            normal=self.dataset.ref_normal)

        self.inpainter = build_inpainter(conf)
        self.phase = -1

        if conf.get("is_continue", False):
            ckpt = pjoin(self.exp_dir, "checkpoints", "ckpt.npz")
            if os.path.exists(ckpt):
                self.load_checkpoint("ckpt.npz")
            else:
                # is_continue=true on a fresh exp dir is a documented no-op
                # (unattended runbooks pass it unconditionally so a resumed
                # run and a bootstrap-from-scratch run share one command)
                print(f"[perf_tpu] is_continue=true but no checkpoint at "
                      f"{ckpt} — starting fresh")

    # -- helpers ---------------------------------------------------------------

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _joint_cfg(self) -> JointPredictorConfig:
        import dataclasses as _dc
        over = self.conf.get_path("priors.joint", {}) or {}
        kw = {k: over[k] for k in
              ("gen_res", "local_batch", "iters_per_phase", "scan_chunk")
              if k in over}
        if "ratios" in over:
            kw["ratios"] = tuple(over["ratios"])
        cfg = JointPredictorConfig(**kw)
        # sphere-field overrides (priors.joint.field.*): encoding/grad_mode
        # select the TPU-flagship (brick+analytic, default) vs the
        # reference-parity (hash+ad) distillation path
        fld = over.get("field", {}) or {}
        fkw = {k: fld[k] for k in
               ("n_levels", "log2_table_size", "fine_res", "encoding",
                "grad_mode") if k in fld}
        if fkw:
            cfg = _dc.replace(cfg, field=_dc.replace(cfg.field, **fkw))
        return cfg

    def execute(self, mode: str):
        if mode == "train":
            self.train()
        elif mode == "render_dense":
            self.render_dense()
        elif mode == "serve":
            # beyond-reference: HTTP novel-view serving over the baked
            # snapshot (app/serve.py); typically with is_continue=true
            from .serve import serve_scene
            serve_scene(self.scene, self.conf)
        else:
            raise ValueError(f"unknown mode {mode!r}")

    # -- training loop -----------------------------------------------------------

    def train(self, raw_only: bool = False):
        h, w = self.dataset.height, self.dataset.width
        if self.phase < 0:
            self.scene.fit(self.sup_pool)
            out = self.scene.render_snapshot(
                gen_pano_rays(jnp.eye(4), 512, 1024),
                query_keys=("rgb", "distance"))
            write_image(pjoin(self.exp_dir, "1.png"), np.asarray(out["rgb"]))
            disp = (float(jnp.min(out["distance"]))
                    / np.asarray(out["distance"])).squeeze()
            write_image(pjoin(self.exp_dir, "1_distance.png"),
                        colorize_single_channel_image(disp))
            self.phase += 1
            self.save_checkpoint()
            if raw_only:
                return

        # graceful wall-clock deadline: long records (24 anchors ~ 5 h) must
        # never be killed mid-dispatch (a mid-flight kill can take the axon
        # tunnel down with it). PERF_TPU_DEADLINE_TS (unix seconds) makes the
        # loop exit cleanly at the last anchor checkpoint instead; resuming
        # with is_continue=true picks up at the same anchor.
        deadline = float(os.environ.get("PERF_TPU_DEADLINE_TS", "0") or 0)
        for anchor_idx in range(self.pose_sampler.n_anchors):
            if anchor_idx < self.phase:
                continue
            if deadline and time.time() > deadline:
                print(f"[perf_tpu] deadline reached — stopping before anchor "
                      f"{anchor_idx} ({self.phase}/{self.pose_sampler.n_anchors}"
                      f" done, checkpoint saved)")
                return
            anchor_t0 = time.perf_counter()
            pose = jnp.asarray(self.pose_sampler.sample_pose(anchor_idx))
            rays = gen_pano_rays(pose, h, w)

            # both the visibility mask and the anchor RGB-D render go
            # through the baked snapshot (bakes lazily after the preceding
            # fit): ~12x faster than the field eval path AND higher-PSNR
            # (flagship ablation, BASELINE.md). Reference renders these
            # through the live field (nerf.py:321-358, core_exp_runner.py:139)
            # because CUDA tcnn queries are L2-cheap; on TPU they are
            # gather-row-bound. The render is shared: the visibility mask
            # (nerf.py:321-358 renders its OWN distance pass) derives from
            # the same deterministic snapshot render as the anchor RGB-D,
            # so each anchor renders the pano once, not twice.
            with phase_timer(self.writer, "anchor_render", anchor_idx):
                out = self.scene.render_snapshot(
                    rays, query_keys=("rgb", "distance"))
                colors, distances = out["rgb"], out["distance"]
                float(distances.max())      # D2H sync for truthful timing
            with phase_timer(self.writer, "anchor_visibility", anchor_idx):
                visi_mask = pano_visibility_from_distance(
                    self.sup_pool, rays, distances)
                float(visi_mask.min())
            inpaint_mask = 1.0 - visi_mask

            normals = None
            if float(visi_mask.min()) <= 0.5:
                colors, distances, normals = self.inpaint_new_panorama(
                    0, anchor_idx, colors, distances, inpaint_mask)
                with phase_timer(self.writer, "anchor_geo_check", anchor_idx):
                    conflict = 1.0 - self.sup_pool.geo_check(rays, distances)
                    inpaint_mask = inpaint_mask * conflict

            distances = jnp.asarray(distances).reshape(h, w, 1)
            # never supervise content that came out too close (reference
            # core_exp_runner.py:165-167)
            inpaint_mask = jnp.maximum(inpaint_mask,
                                       (distances[..., 0] < 0.1).astype(jnp.float32))
            inpaint_mask = jnp.minimum(inpaint_mask, 1.0 - visi_mask)

            vis_dir = pjoin(self.exp_dir, "inpaint_vis", f"{anchor_idx:04d}")
            write_image(pjoin(vis_dir, "final_mask.jpg"),
                        np.asarray(inpaint_mask))
            write_image(pjoin(vis_dir, "final_masked.jpg"),
                        np.asarray(colors * (1.0 - inpaint_mask)[..., None]))

            sup_mask = (1.0 - visi_mask)
            sup_mask = sup_mask - jnp.minimum(sup_mask, inpaint_mask)

            self.sup_pool.register_sup_info(
                pose=np.asarray(pose), mask=np.asarray(sup_mask),
                rgb=np.asarray(colors), distance=np.asarray(distances),
                normal=np.asarray(normals) if normals is not None else None)
            with phase_timer(self.writer, "anchor_refit", anchor_idx):
                self.scene.fit(self.sup_pool)

            self.phase += 1
            self.save_checkpoint()
            dt = time.perf_counter() - anchor_t0
            self.writer.add_scalar("time/anchor_total_sec", dt, anchor_idx)
            self.writer.flush()
            print(f"[perf_tpu] anchor {anchor_idx}: {dt:.1f} s")

    def inpaint_new_panorama(self, sub_i: int, anchor_idx: int,
                             colors, distances, mask):
        h, w = colors.shape[0], colors.shape[1]
        distances = jnp.asarray(distances).reshape(h, w, 1)
        mask = jnp.asarray(mask).reshape(h, w)
        vis_dir = pjoin(self.exp_dir, "inpaint_vis", f"{anchor_idx:04d}")
        write_image(pjoin(vis_dir, f"uninpainted_{sub_i}.jpg"), np.asarray(colors))
        write_image(pjoin(vis_dir, f"mask_{sub_i}.jpg"), np.asarray(mask))
        write_image(pjoin(vis_dir, f"masked_{sub_i}.jpg"),
                    np.asarray(colors * (1.0 - mask)[..., None]))

        if self.conf.get("rgbd_inpaint", False):
            # joint RGB-D inpainting path (reference core_exp_runner.py:192-195)
            inpainted, new_dist = self.inpainter.inpaint_rgbd(colors,
                                                              distances, mask)
            write_image(pjoin(vis_dir, f"inpainted_{sub_i}.jpg"),
                        np.asarray(inpainted))
            return inpainted, new_dist, None

        with phase_timer(self.writer, "anchor_inpaint", anchor_idx):
            inpainted = self.inpainter.inpaint(colors, mask)
        write_image(pjoin(vis_dir, f"inpainted_{sub_i}.jpg"), np.asarray(inpainted))

        with phase_timer(self.writer, "anchor_geometry", anchor_idx):
            new_dist, new_normal = self.geo_predictor(
                inpainted, distances, mask,
                reg_loss_weight=0.0, normal_loss_weight=5e-2,
                normal_tv_loss_weight=5e-2)
        write_image(pjoin(vis_dir, f"aligned_disparity_{sub_i}.jpg"),
                    colorize_single_channel_image(
                        float(jnp.min(new_dist)) / np.asarray(new_dist)))
        write_image(pjoin(vis_dir, f"aligned_normals_{sub_i}.jpg"),
                    np.clip(np.asarray(new_normal) * 0.5 + 0.5, 0, 1))
        return inpainted, new_dist, new_normal

    # -- dense render --------------------------------------------------------------

    def render_dense(self, n_poses: int | None = None,
                     cam_type: str | None = None):
        n_poses = n_poses or self.conf.get_path("render_dense.n_poses", 180)
        cam_type = cam_type or self.conf.get_path("render_dense.cam_type", "pano")
        rh = self.conf.get_path("render_dense.height", 512)
        rw = self.conf.get_path("render_dense.width", 1024)
        dense = DenseTravelPoseSampler(self.pose_sampler,
                                       n_dense_poses=n_poses)
        out_dir = pjoin(self.exp_dir, "dense_images_new_" + cam_type)
        os.makedirs(out_dir, exist_ok=True)
        # bake the field once, then render every frame through the snapshot
        # (one 256-lane gather per sample; the bake amortizes over the
        # sweep — reference re-queries the field per sample per frame,
        # core_exp_runner.py:223-246)
        use_snapshot = bool(self.conf.get_path("render_dense.snapshot", True))
        if use_snapshot:
            self.scene.bake_snapshot()
        frames = [None] * dense.n_poses

        def drain(i, out):
            # D2H + PNG encode for frame i, AFTER frame i+1 was dispatched:
            # the ~25 ms tunnel readback overlaps the next frame's device
            # work (matters most with snapshot.frame_dispatch, where a
            # frame is one async dispatch)
            rgb = np.clip(np.asarray(out["rgb"]), 0.0, 1.0)
            frames[i] = (rgb * 255).astype(np.uint8)
            write_image(pjoin(out_dir, f"image_{i}.png"), rgb)
            write_image(pjoin(out_dir, f"distance_{i}.png"),
                        colorize_single_channel_image(
                            1.0 / np.asarray(out["distance"])))

        pending = []
        for i in range(dense.n_poses):
            pose = dense.sample_pose(i).copy()
            if cam_type == "pano":
                pose[:3, :3] = np.eye(3)
                rays = gen_pano_rays(jnp.asarray(pose), rh, rw)
            else:
                rays = gen_pers_rays(jnp.asarray(pose),
                                     fov=float(np.deg2rad(75.0)), res=rh)
            if use_snapshot:
                out = self.scene.render_snapshot(
                    rays, query_keys=("rgb", "distance"))
            else:
                out = self.scene.render(rays, query_keys=("rgb", "distance"))
            pending.append((i, out))
            if len(pending) > 1:
                drain(*pending.pop(0))
        for item in pending:
            drain(*item)
        write_video(pjoin(out_dir, "video.mp4"),
                    [f for f in frames if f is not None], fps=30)

    # -- checkpointing ----------------------------------------------------------------

    def save_checkpoint(self):
        path = pjoin(self.exp_dir, "checkpoints", "ckpt.npz")
        save_checkpoint(path, {
            "scene": self.scene.state_dict(),
            "sup_pool": self.sup_pool.state_dict(),
            "phase": self.phase,
        })

    def load_checkpoint(self, name: str):
        state = load_checkpoint(pjoin(self.exp_dir, "checkpoints", name))
        self.scene.load_state_dict(state["scene"])
        self.phase = int(state["phase"])
        # full sup-pool restore — the reference silently drops this
        pool = SupInfoPool()
        pool.load_state_dict(state["sup_pool"])
        self.sup_pool = pool
