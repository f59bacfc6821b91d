"""Hermetic end-to-end pipeline test through the CLI surface.

Covers the full progressive loop at micro scale: dataset bootstrap (joint
predictor with fake priors), raw fit, anchor visibility -> inpaint (fake) ->
geometry -> geo-check -> register -> re-fit, checkpoint/resume, and
render_dense. This is the test the reference never had (SURVEY §4).
"""

import json
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from perf_tpu.utils import render_cube_room_pano
from perf_tpu.utils.io import write_image, read_image

OVERRIDES = [
    "pers_inpainter_type=fake",
    "priors.backend=fake",
    "priors.joint.gen_res=24",
    "priors.joint.ratios=[1.1]",
    "priors.joint.local_batch=64",
    "priors.joint.iters_per_phase=50",
    "priors.joint.scan_chunk=25",
    "inpaint.gen_res=24",
    "pose_sampler.traverse_ratios=[0.3]",
    "pose_sampler.n_anchors_per_ratio=[1]",
    "scene.max_samples=64",
    "scene.march_step=8.0e-3",
    "scene.occ_res=48",
    "scene.field.n_levels=6",
    "scene.field.log2_bricks=9",   # default kind=brick (production encoding)
    "scene.field.base_res=4",
    "scene.field.per_level_scale=2.0",
    "scene.train_conf.raw_phase_iter_geo=50",
    "scene.train_conf.raw_phase_iter_app=50",
    "scene.train_conf.pixel_loss_batch_size=256",
    "scene.train_conf.scan_chunk=25",
    "render_dense.n_poses=12",
    "render_dense.height=32",
    "render_dense.width=64",
    # exercise the snapshot config plumbing + the one-dispatch frame path
    # (render/snapshot.py frame_dispatch) end-to-end; res 96 matches the
    # micro scene (default 384 is flagship-sized)
    "snapshot.res=96",
    "snapshot.frame_dispatch=true",
]


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    case_dir = d / "cozy_room"
    case_dir.mkdir()
    pano = render_cube_room_pano(jnp.eye(4), 32, 64)
    write_image(str(case_dir / "image.png"), np.asarray(pano["rgb"]))
    return d


def _run(scene_dir, tmp, extra):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import core_exp_runner
    core_exp_runner.main([
        "--config-name", "nerf",
        f"dataset.image_path={scene_dir}/cozy_room/image.png",
        "dataset.image_resize=[64, 32]",
        f"device.base_exp_dir={tmp}",
        *OVERRIDES, *extra,
    ])
    return os.path.join(str(tmp), "WildDataset_cozy_room", "nerf_experiment")


def test_full_pipeline_train_and_render(scene_dir, tmp_path):
    exp = _run(scene_dir, tmp_path, ["mode=train"])

    # artifacts of the raw phase + both anchors
    assert os.path.exists(os.path.join(exp, "1.png"))
    assert os.path.exists(os.path.join(exp, "1_distance.png"))
    assert os.path.exists(os.path.join(exp, "checkpoints", "ckpt.npz"))
    assert os.path.exists(os.path.join(exp, "record", "config.yaml"))
    assert os.path.isdir(os.path.join(exp, "inpaint_vis", "0000"))
    
    # ref geometry cached next to the image
    assert os.path.exists(os.path.join(str(scene_dir), "cozy_room",
                                       "image_ref_distance.npy"))
    assert os.path.exists(os.path.join(str(scene_dir), "cozy_room",
                                       "image_ref_geometry.ply"))
    # the raw-phase preview is a sane image (not flat, not NaN)
    img = read_image(os.path.join(exp, "1.png"))
    assert np.isfinite(img).all() and img.std() > 0.02

    # resume + dense render through the same CLI
    _run(scene_dir, tmp_path, ["mode=render_dense", "is_continue=true"])
    out_dir = os.path.join(exp, "dense_images_new_pano")
    assert os.path.exists(os.path.join(out_dir, "video.mp4"))
    frames = [f for f in os.listdir(out_dir) if f.startswith("image_")]
    assert len(frames) >= 10


def _load_conf(scene_dir, tmp, extra):
    """The CLI's config composition without executing a mode."""
    from perf_tpu.config import load_config
    config_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    return load_config(config_dir, "nerf", [
        f"dataset.image_path={scene_dir}/cozy_room/image.png",
        "dataset.image_resize=[64, 32]",
        f"device.base_exp_dir={tmp}",
        *OVERRIDES, *extra,
    ])


def test_is_continue_fresh_dir_is_noop(scene_dir, tmp_path, capsys):
    """is_continue=true with NO checkpoint must start fresh, not crash —
    unattended runbooks pass it unconditionally (tools/resume_flagship.sh).
    Runs after the pipeline test so the dataset geometry cache is warm."""
    from perf_tpu.app import CoreRunner
    conf = _load_conf(scene_dir, tmp_path / "fresh", ["is_continue=true"])
    runner = CoreRunner(conf)
    assert runner.phase == -1  # fresh start, nothing loaded
    assert "starting fresh" in capsys.readouterr().out


def test_parity_only_config_keys_warn(scene_dir, tmp_path):
    """Reference-declared keys with no reader (cross_depth_check,
    ignore_near, vis_video_freq) load fine at defaults but WARN when a user
    changes them — a silent no-op would misrepresent coverage."""
    import warnings
    from perf_tpu.app.runner import _train_config
    conf = _load_conf(scene_dir, tmp_path, [
        "scene.train_conf.cross_depth_check=false"])
    with pytest.warns(UserWarning, match="cross_depth_check"):
        _train_config(conf["scene"]["train_conf"])
    # defaults stay silent
    conf = _load_conf(scene_dir, tmp_path, [])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _train_config(conf["scene"]["train_conf"])
