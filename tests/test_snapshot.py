"""Baked-snapshot renderer parity: the fast eval path must agree with the
field renderer (same compositing semantics, bake-grid-resolution error only).

The reference has no baked path (it re-queries tcnn per sample per frame,
``modules/scene/nerf_renderer.py:164-183``); the snapshot is the TPU-first
redesign, so this test anchors it to the field render instead of to torch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from perf_tpu.core import gen_pano_rays
from perf_tpu.render.snapshot import SnapshotConfig
from perf_tpu.utils import render_cube_room_pano, psnr

from test_train import _make_pool, _tiny_scene


def test_snapshot_matches_field_render():
    pool, pano = _make_pool(32, 64)
    scene = _tiny_scene()
    scene.fit(pool)

    rays = gen_pano_rays(jnp.eye(4), 32, 64)
    ref = scene.render(rays, query_keys=("rgb", "distance"), chunk=1024)

    snap_cfg = SnapshotConfig(res=192, sample_stride=4, max_samples=64)
    scene.bake_snapshot(snap_cfg)
    assert scene.snapshot.dtype == jnp.bfloat16
    out = scene.render_snapshot(rays, query_keys=("rgb", "distance"),
                                chunk=1024)

    mask = np.asarray(pool.sup_infos[0].mask)[..., 0]
    gt_rgb = np.asarray(pano["rgb"])
    p_field = psnr(np.asarray(ref["rgb"])[mask], gt_rgb[mask])
    p_snap = psnr(np.asarray(out["rgb"])[mask], gt_rgb[mask])
    # snapshot reaches reference-grade quality (golden bar is 18 dB;
    # measured: field 43.4 dB, snapshot 39.6 dB at res=192 — the gap is
    # bake-grid quantization, shrinking with res)
    assert p_snap > 30.0, (p_snap, p_field)
    assert p_snap > p_field - 5.0, (p_snap, p_field)

    # and agrees with it directly
    p_agree = psnr(np.asarray(out["rgb"]), np.asarray(ref["rgb"]))
    assert p_agree > 25.0, p_agree
    d_err = np.abs(np.asarray(out["distance"]) -
                   np.asarray(ref["distance"]))[mask].mean()
    assert d_err < 0.05, d_err

    # bake invalidation: training again clears the snapshot
    scene.snapshot = scene.snapshot  # still set
    scene.fit(pool)
    assert scene.snapshot is None


def test_device_bake_matches_host_bake():
    """The round-5 device-resident bake (_bake_snapshot_device: device
    nonzero index selection + eval + scatter + pack, ONE scalar readback)
    must produce the exact table of the host-scatter path (bake_host=True:
    per-chunk D2H + host scatter + dense-volume H2D) — same corners, same
    math, bf16 cast at the same point. Bitwise equality, not tolerance."""
    pool, _ = _make_pool(32, 64)
    scene = _tiny_scene()
    scene.fit(pool)

    host = scene.bake_snapshot(SnapshotConfig(res=128, bake_host=True))
    host = np.asarray(host)
    dev = scene.bake_snapshot(SnapshotConfig(res=128, bake_host=False))
    dev = np.asarray(dev)
    assert host.shape == dev.shape and host.dtype == dev.dtype
    assert np.array_equal(host, dev)
    # and the table is non-trivial (the fit produced occupied corners)
    assert np.abs(host.astype(np.float32)).sum() > 0


def test_snapshot_march_coarse_override():
    """``SnapshotConfig.march_coarse`` gives the snapshot march its own
    window granularity (2-voxel sampling = march_coarse=16 + stride 16)
    without rebuilding the scene at a different RenderConfig — the round-4
    bench A/B needed a second full NeRFScene for this. Mechanical parity
    gate only; the QUALITY verdict at flagship scale is
    tools/bench_snap_coarse.py on a converged scene (BASELINE.md)."""
    pool, pano = _make_pool(32, 64)
    scene = _tiny_scene()
    scene.fit(pool)
    rays = gen_pano_rays(jnp.eye(4), 32, 64)

    s8 = SnapshotConfig(res=192, sample_stride=4, max_samples=64)
    scene.bake_snapshot(s8)
    ref = scene.render_snapshot(rays, ("rgb", "distance"), chunk=1024)
    ref_rgb = np.asarray(ref["rgb"])

    s16 = SnapshotConfig(res=192, march_coarse=16, sample_stride=16)
    assert s16.resolve_stride(scene.render_cfg) == 16
    scene.bake_snapshot(s16)
    out = scene.render_snapshot(rays, ("rgb", "distance"), chunk=1024)

    # 4x coarser in-window quadrature on a tiny low-res scene: agreement
    # bar is loose (the chip tool owns the flagship 50 dB bar); this gate
    # catches mechanical breakage (window bookkeeping, budget plumbing)
    p_agree = psnr(np.asarray(out["rgb"]), ref_rgb)
    assert p_agree > 18.0, p_agree
    mask = np.asarray(pool.sup_infos[0].mask)[..., 0]
    d_err = np.abs(np.asarray(out["distance"]) -
                   np.asarray(ref["distance"]))[mask].mean()
    assert d_err < 0.1, d_err


def test_beam_plan_matches_per_ray_march():
    """The beam-plan path (frame_march_plan + planned chunks) must agree
    with the per-ray hierarchical march: the plan's dilated coarse grid
    can only ADMIT extra segments, never lose a surface."""
    from perf_tpu.render.renderer import beam_dilation
    from perf_tpu.render.snapshot import snapshot_render_cfg

    pool, pano = _make_pool(32, 64)
    scene = _tiny_scene()
    scene.fit(pool)
    snap_cfg = SnapshotConfig(res=128)
    scene.bake_snapshot(snap_cfg)

    # 128x256 raster: block beam fits the dilation bound -> plan is used
    rays = gen_pano_rays(jnp.eye(4), 128, 256)
    cfg = snapshot_render_cfg(scene.render_cfg, snap_cfg)
    assert beam_dilation(rays.d, cfg) <= 3, "plan not exercised"
    planned = scene.render_snapshot(rays, ("rgb", "distance"), chunk=8192)

    # flat ray list of the same rays -> per-ray fallback path
    flat = type(rays)(o=rays.o.reshape(-1, 3), d=rays.d.reshape(-1, 3))
    perray = scene.render_snapshot(flat, ("rgb", "distance"), chunk=8192)

    p = psnr(np.asarray(planned["rgb"]).reshape(-1, 3),
             np.asarray(perray["rgb"]))
    assert p > 40.0, p
    d_err = np.abs(np.asarray(planned["distance"]).reshape(-1, 1)
                   - np.asarray(perray["distance"])).mean()
    assert d_err < 0.01, d_err


def test_snapshot_perspective_render():
    """render_dense's perspective path through the snapshot: finite,
    non-flat, and the wall distance at the image center is right."""
    from perf_tpu.core import gen_pers_rays

    pool, pano = _make_pool(32, 64)
    scene = _tiny_scene()
    scene.fit(pool)
    scene.bake_snapshot(SnapshotConfig(res=128))

    pose = np.eye(4, dtype=np.float32)
    rays = gen_pers_rays(jnp.asarray(pose), fov=float(np.deg2rad(75.0)),
                         res=64)
    out = scene.render_snapshot(rays, ("rgb", "distance"), chunk=4096)
    rgb = np.asarray(out["rgb"])
    dist = np.asarray(out["distance"])[..., 0]
    assert rgb.shape == (64, 64, 3) and np.isfinite(rgb).all()
    assert rgb.std() > 0.02
    # center pixel sees a wall (half-extent 0.8) at a sane distance —
    # not the 5.0 background fill and not degenerate zero (tiny-fit depth
    # error is ~0.05, so the bound is loose)
    assert 0.6 < dist[32, 32] < 1.1, dist[32, 32]


def test_visibility_mask_snapshot_parity():
    """get_pano_visibility_mask now routes the surface render through the
    snapshot (round-3: the anchor cycle's masks+renders use the bake);
    it must agree with the field path almost everywhere."""
    pool, pano = _make_pool(32, 64)
    scene = _tiny_scene()
    scene.fit(pool)
    scene.bake_snapshot(SnapshotConfig(res=192, sample_stride=4,
                                       max_samples=64))

    # a displaced anchor pose inside the room
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0.2, 0.1, 0.0)
    rays = gen_pano_rays(jnp.asarray(pose), 32, 64)
    m_snap = np.asarray(scene.get_pano_visibility_mask(pool, rays))
    m_field = np.asarray(scene.get_pano_visibility_mask(
        pool, rays, use_snapshot=False))
    assert m_snap.shape == m_field.shape
    agree = (m_snap == m_field).mean()
    assert agree > 0.95, agree
    # the input pose itself is fully visible from the registered pano
    rays0 = gen_pano_rays(jnp.eye(4), 32, 64)
    m0 = np.asarray(scene.get_pano_visibility_mask(pool, rays0))
    assert m0.mean() > 0.98, m0.mean()


def test_snapshot_frame_dispatch_parity():
    """SnapshotConfig.frame_dispatch: the one-dispatch whole-frame path
    (plan + expansion + lax.map over chunks inside a single jit, fixed
    per-frame budget) must agree with the chunked adaptive path — the
    fixed budget is the cap, a superset of every adaptive chunk budget."""
    pool, _ = _make_pool(32, 64)
    scene = _tiny_scene()
    scene.fit(pool)

    rays = gen_pano_rays(jnp.eye(4), 128, 256)
    scene.bake_snapshot(SnapshotConfig(res=128))
    ref = scene.render_snapshot(rays, ("rgb", "distance"), chunk=8192)
    scene.bake_snapshot(SnapshotConfig(res=128, frame_dispatch=True))
    out = scene.render_snapshot(rays, ("rgb", "distance"), chunk=8192)

    assert out["rgb"].shape == ref["rgb"].shape
    p = psnr(np.asarray(out["rgb"]), np.asarray(ref["rgb"]))
    assert p > 40.0, p
    d_err = np.abs(np.asarray(out["distance"])
                   - np.asarray(ref["distance"])).mean()
    assert d_err < 0.01, d_err

    # flat ray lists fall back to the chunked path (shape-compatible)
    flat = type(rays)(o=rays.o.reshape(-1, 3), d=rays.d.reshape(-1, 3))
    out_flat = scene.render_snapshot(flat, ("rgb",), chunk=8192)
    assert out_flat["rgb"].shape == (128 * 256, 3)
    p_flat = psnr(np.asarray(out_flat["rgb"]),
                  np.asarray(out["rgb"]).reshape(-1, 3))
    assert p_flat > 40.0, p_flat


def test_snapshot_dedup_parity():
    """SnapshotConfig.dedup_ratio: run-dedup composite matches the standard
    per-sample gather when K covers the scene's run counts."""
    pool, _ = _make_pool(32, 64)
    scene = _tiny_scene()
    scene.fit(pool)
    rays = gen_pano_rays(jnp.eye(4), 16, 32)

    scene.bake_snapshot(SnapshotConfig(res=192, sample_stride=4,
                                       max_samples=64))
    ref = scene.render_snapshot(rays, query_keys=("rgb", "distance"),
                                chunk=512)
    scene.bake_snapshot(SnapshotConfig(res=192, sample_stride=4,
                                       max_samples=64, dedup_ratio=0.9))
    out = scene.render_snapshot(rays, query_keys=("rgb", "distance"),
                                chunk=512)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["distance"]),
                               np.asarray(ref["distance"]), atol=1e-3)
