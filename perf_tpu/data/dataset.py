"""Datasets: a single wild panorama + bootstrapped reference geometry.

Counterpart of the reference's ``modules/dataset/dataset.py``: load one
equirectangular image, resize, bootstrap a metric-ish distance+normal map
through the joint predictor (cached as ``*_ref_distance.npy`` /
``*_ref_normal.npy`` next to the image), normalize scale so the max distance
is 1/1.05, and export the reference point cloud.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..core import img_coord_from_hw, img_coord_to_pano_direction
from ..utils.io import read_image, write_ply


class Dataset:
    def __init__(self):
        self.image_path = None
        self.ref_distance_path = None
        self.ref_normal_path = None
        self.ref_geometry_path = None
        self.image = None
        self.ref_distance = None
        self.ref_normal = None
        self.height = 0
        self.width = 0
        self.case_name = "wp"

    def get_ref_distance(self, distance_predictor):
        """Bootstrap (or load cached) a distance map through the older
        depth-only fusion predictor — the non-Wild path (reference
        ``dataset.py:30-46``). ``distance_predictor`` is a
        ``PanoFusionInvPredictor`` (dependency-injected; the reference
        constructs it inline)."""
        if self.ref_distance_path and os.path.exists(self.ref_distance_path):
            return jnp.asarray(np.load(self.ref_distance_path)
                               .astype(np.float32))
        dist, _ = distance_predictor(
            self.image, jnp.zeros((self.height, self.width)),
            jnp.ones((self.height, self.width)))
        return dist

    def get_ref_normal(self, normal_predictor):
        """Bootstrap (or load cached) a normal map (reference
        ``dataset.py:48-64``); ``normal_predictor`` is a
        ``PanoFusionNormalPredictor``."""
        if self.ref_normal_path and os.path.exists(self.ref_normal_path):
            return jnp.asarray(np.load(self.ref_normal_path)
                               .astype(np.float32))
        init = jnp.full((self.height, self.width, 3), 1.0 / np.sqrt(3.0))
        return normal_predictor.inpaint_normal(
            self.image, init, jnp.ones((self.height, self.width)))

    def refine_geometry(self, distance_map, normal_map, refiner):
        """Distill distance+normal into a sphere field and re-extract the
        smoothed maps (reference ``dataset.py:66-68``); ``refiner`` is a
        ``PanoGeoRefiner``."""
        return refiner.refine(distance_map, normal_map)

    def get_joint_distance_normal(self, joint_predictor):
        """Bootstrap (or load cached) distance+normal maps
        (reference ``dataset.py:70-95``)."""
        if (os.path.exists(self.ref_distance_path)
                and os.path.exists(self.ref_normal_path)):
            dist = np.load(self.ref_distance_path).astype(np.float32)
            normal = np.load(self.ref_normal_path).astype(np.float32)
            return jnp.asarray(dist), jnp.asarray(normal)
        dist, normal = joint_predictor(
            self.image, jnp.ones((self.height, self.width, 1)),
            jnp.ones((self.height, self.width)))
        return dist, normal

    def normalization(self):
        scale = float(jnp.max(self.ref_distance)) * 1.05
        self.ref_distance = self.ref_distance / scale

    def save_ref_geometry(self):
        if self.ref_distance_path:
            np.save(self.ref_distance_path, np.asarray(self.ref_distance))
        if self.ref_normal_path and self.ref_normal is not None:
            np.save(self.ref_normal_path, np.asarray(self.ref_normal))
        if self.ref_geometry_path:
            pts = np.asarray(self.ref_point_cloud()).reshape(-1, 3)
            colors = (np.asarray(self.image).reshape(-1, 3)
                      if self.image is not None else None)
            write_ply(self.ref_geometry_path, pts, colors)

    def ref_point_cloud(self):
        dirs = img_coord_to_pano_direction(
            img_coord_from_hw(self.height, self.width))
        return dirs * jnp.asarray(self.ref_distance).reshape(
            self.height, self.width, 1)


class WildDataset(Dataset):
    def __init__(self, conf, joint_predictor):
        super().__init__()
        self.image_path = conf["image_path"]
        stem = ".".join(self.image_path.split(".")[:-1])
        self.ref_distance_path = stem + "_ref_distance.npy"
        self.ref_normal_path = stem + "_ref_normal.npy"
        self.ref_geometry_path = stem + "_ref_geometry.ply"
        self.case_name = self.image_path.split("/")[-2] if "/" in self.image_path else "wp"

        img = read_image(self.image_path)
        if "image_resize" in conf and conf["image_resize"]:
            import cv2
            self.width, self.height = conf["image_resize"]
            img = cv2.resize(img, (self.width, self.height),
                             interpolation=cv2.INTER_AREA)
        else:
            self.height, self.width = img.shape[:2]
        self.image = jnp.asarray(img)

        self.ref_distance, self.ref_normal = self.get_joint_distance_normal(
            joint_predictor)
        self.normalization()
        self.save_ref_geometry()
