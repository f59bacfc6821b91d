"""The non-Wild dataset path: get_ref_distance / get_ref_normal /
refine_geometry (reference ``modules/dataset/dataset.py:30-68``), wired on the
Dataset base with dependency-injected predictors and exercised hermetically
with the fake cube-room priors."""

import numpy as np
import jax.numpy as jnp

from perf_tpu.data.dataset import Dataset
from perf_tpu.priors import (
    PanoFusionInvPredictor, PanoFusionNormalPredictor, PanoGeoRefiner,
)
from perf_tpu.priors.pano_fusion import PanoFusionConfig
from perf_tpu.priors.pano_refiner import RefinerConfig
from perf_tpu.priors.fake import (
    FakeCubeRoomDepthPredictor, FakeCubeRoomNormalPredictor,
)
from perf_tpu.fields.sphere_field import SphereFieldConfig
from perf_tpu.utils import render_cube_room_pano


def _dataset(h=32, w=64):
    ds = Dataset()
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    ds.image = pano["rgb"]
    ds.height, ds.width = h, w
    return ds, pano


def test_get_ref_distance_and_normal():
    ds, pano = _dataset()
    dist = ds.get_ref_distance(PanoFusionInvPredictor(
        FakeCubeRoomDepthPredictor(),
        cfg=PanoFusionConfig(gen_res=24, iters=200, scan_chunk=50)))
    dist = np.asarray(dist).reshape(ds.height, ds.width)
    assert np.isfinite(dist).all() and (dist > 0).all()

    normal = ds.get_ref_normal(PanoFusionNormalPredictor(
        FakeCubeRoomNormalPredictor(),
        cfg=PanoFusionConfig(gen_res=24, iters=200, scan_chunk=50)))
    normal = np.asarray(normal)
    assert normal.shape == (ds.height, ds.width, 3)
    assert np.isfinite(normal).all()


def test_get_ref_distance_cache(tmp_path):
    ds, pano = _dataset()
    cached = np.asarray(pano["distance"]).reshape(ds.height, ds.width)
    path = tmp_path / "x_ref_distance.npy"
    np.save(path, cached)
    ds.ref_distance_path = str(path)
    out = ds.get_ref_distance(distance_predictor=None)  # must not be called
    np.testing.assert_allclose(np.asarray(out), cached)


def test_refine_geometry():
    ds, pano = _dataset()
    refiner = PanoGeoRefiner(cfg=RefinerConfig(
        n_iters=200, batch_size=2048, scan_chunk=50,
        field=SphereFieldConfig(n_levels=4, log2_table_size=12, fine_res=64,
                                weight_norm=True, output="raw")))
    dist, normal = ds.refine_geometry(pano["distance"], pano["normal"],
                                      refiner)
    assert np.asarray(dist).shape[:2] == (ds.height, ds.width)
    assert np.asarray(normal).shape == (ds.height, ds.width, 3)
    assert np.isfinite(np.asarray(dist)).all()
    assert np.isfinite(np.asarray(normal)).all()
