"""Tests for the priors layer: fakes + fusion/distillation optimizers."""

import jax
import jax.numpy as jnp
import numpy as np

from perf_tpu.core import tangent_cameras, tangent_c2w
from perf_tpu.fields.sphere_field import SphereFieldConfig
from perf_tpu.priors import (
    FakeCubeRoomDepthPredictor, FakeCubeRoomNormalPredictor,
    PanoJointPredictor, JointPredictorConfig,
    PanoFusionInvPredictor, PanoFusionConfig, PanoFusionNormalPredictor,
    PanoGeoRefiner, RefinerConfig,
)
from perf_tpu.utils import render_cube_room_pano


def _tiny_joint_cfg():
    return JointPredictorConfig(
        gen_res=32, ratios=(1.1,), local_batch=64, iters_per_phase=200,
        normal_bias_res=16, scan_chunk=50,
        field=SphereFieldConfig(n_levels=6, log2_table_size=12, fine_res=128))


def test_fake_priors_shapes_and_consistency():
    dirs, ratios, tos, downs, rights = tangent_cameras(16, 1.1)
    c2w, _, _ = tangent_c2w(tos, downs, rights)
    dirs = jnp.asarray(dirs)
    depth = FakeCubeRoomDepthPredictor()
    d = depth.predict_depth(None, dirs=dirs)
    assert d.shape == (20, 16, 16, 1)
    assert (np.asarray(d) > 0).all()
    normal = FakeCubeRoomNormalPredictor()
    n = normal.predict_normal(None, dirs=dirs, c2w=jnp.asarray(c2w))
    assert n.shape == (20, 16, 16, 3)
    # decoded world normals must be inward (dot with dir < 0)
    nw = jnp.einsum("vij,vhwj->vhwi", jnp.asarray(c2w), n * 2 - 1)
    dots = np.asarray(jnp.sum(nw * dirs / jnp.linalg.norm(dirs, axis=-1,
                                                          keepdims=True), -1))
    assert (dots < 1e-4).all()


def test_pano_joint_predictor_recovers_room():
    h, w = 32, 64
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pred = PanoJointPredictor(FakeCubeRoomDepthPredictor(),
                              FakeCubeRoomNormalPredictor(),
                              cfg=_tiny_joint_cfg())
    dist, normal = pred(pano["rgb"], jnp.ones((h, w, 1)), jnp.ones((h, w)))
    assert dist.shape == (h, w, 1) and normal.shape == (h, w, 3)
    gt = np.asarray(pano["distance"])
    # scale-free comparison: the fake depths are up-to-scale, the reg loss
    # pulls scale toward matching mean 1, gt room has mean distance ~1
    rel = np.abs(np.asarray(dist) / np.asarray(dist).mean()
                 - gt / gt.mean()) / (gt / gt.mean())
    assert np.median(rel) < 0.15, np.median(rel)
    # normals are unit and inward
    nn = np.asarray(normal)
    np.testing.assert_allclose(np.linalg.norm(nn, axis=-1), 1.0, atol=1e-4)


def test_pano_joint_predictor_anchors_to_ref():
    # with mask=0 everywhere (all anchored), output must track ref closely
    h, w = 16, 32
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pred = PanoJointPredictor(FakeCubeRoomDepthPredictor(),
                              FakeCubeRoomNormalPredictor(),
                              cfg=_tiny_joint_cfg())
    dist, _ = pred(pano["rgb"], pano["distance"], jnp.zeros((h, w)),
                   reg_loss_weight=0.0)
    gt = np.asarray(pano["distance"])
    rel = np.abs(np.asarray(dist) - gt) / gt
    assert np.median(rel) < 0.1, np.median(rel)


def test_pano_fusion_inv_predictor():
    h, w = 16, 32
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pred = PanoFusionInvPredictor(
        FakeCubeRoomDepthPredictor(scale_jitter=0.2),
        cfg=PanoFusionConfig(gen_res=24, iters=300, scan_chunk=50))
    dist, _ = pred.inpaint_distance(pano["rgb"], jnp.zeros((h, w)),
                                    jnp.ones((h, w)))
    assert dist.shape == (h, w)
    gt = np.asarray(pano["distance"])[..., 0]
    d = np.asarray(dist)
    rel = np.abs(d / d.mean() - gt / gt.mean()) / (gt / gt.mean())
    assert np.median(rel) < 0.2, np.median(rel)


def test_pano_fusion_normal_predictor():
    h, w = 16, 32
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pred = PanoFusionNormalPredictor(
        FakeCubeRoomNormalPredictor(),
        cfg=PanoFusionConfig(gen_res=24, iters=200, scan_chunk=50))
    normal = pred.inpaint_normal(pano["rgb"],
                                 jnp.ones((h, w, 3)) / np.sqrt(3.0),
                                 jnp.ones((h, w)))
    assert normal.shape == (h, w, 3)
    gt = np.asarray(pano["normal"])
    cos = np.sum(np.asarray(normal) * gt, -1) / (
        np.linalg.norm(np.asarray(normal), axis=-1) + 1e-9)
    assert np.median(cos) > 0.8, np.median(cos)


def test_pano_geo_refiner_smooths_and_preserves():
    h, w = 16, 32
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    ref = PanoGeoRefiner(cfg=RefinerConfig(
        n_iters=800, batch_size=1024, scan_chunk=100,
        field=SphereFieldConfig(n_levels=6, log2_table_size=12, fine_res=128,
                                weight_norm=True, output="raw")))
    dist, normal = ref.refine(pano["distance"], pano["normal"])
    assert dist.shape == (h, w, 1) and normal.shape == (h, w, 3)
    gt = np.asarray(pano["distance"])
    rel = np.abs(np.asarray(dist) - gt) / gt
    # short distillation budget: coarse agreement is the contract here
    assert np.median(rel) < 0.15, np.median(rel)


def test_pano_geo_refiner_brick_fd_variant():
    """The TPU-perf sphere-field variant (brick encoding + central-diff
    direction gradients) meets the same distillation contract as the
    reference-parity hash+autodiff path."""
    h, w = 16, 32
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    ref = PanoGeoRefiner(cfg=RefinerConfig(
        n_iters=800, batch_size=1024, scan_chunk=100,
        field=SphereFieldConfig(n_levels=6, log2_table_size=12, fine_res=128,
                                weight_norm=True, output="raw",
                                encoding="brick", grad_mode="fd")))
    dist, normal = ref.refine(pano["distance"], pano["normal"])
    gt = np.asarray(pano["distance"])
    rel = np.abs(np.asarray(dist) - gt) / gt
    assert np.median(rel) < 0.15, np.median(rel)
    assert np.isfinite(np.asarray(normal)).all()
