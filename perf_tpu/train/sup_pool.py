"""Supervision pool: registered RGB-D(-N) panoramas -> flat ray supervision.

Counterpart of the reference's ``modules/dataset/sup_info.py`` (PanoSupInfo /
SupInfoPool). Per registered pano we

- filter supervision pixels: mask AND distance > 1e-5 AND non-edge (depth
  Laplacian opening) AND, when normals exist, normal·(-view dir) > 0.15
  (``sup_info.py:73-86``),
- precompute flat rays / colors / distances / normals at the kept pixels.

TPU-first storage: the concatenated pool arrays live as NumPy on the host
(appends happen ~25 times per run — cold path) and are uploaded per episode
PADDED to a power-of-two capacity, so the jitted train step never changes
shape as the pool grows; the valid count rides along as a device scalar and
samplers draw ``floor(u * n_valid)``. This fixes the reference's broken
sup-pool serialization as a side effect (``sup_info.py:332-347`` saves
unformatted keys and never restores — our pool round-trips losslessly).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (
    Rays, img_coord_from_hw, img_coord_to_pano_direction, apply_rot,
    edge_keep_mask, direction_to_img_coord, bilinear_sample,
    binary_open_close,
)
from ..render import occ_grid_from_points


@dataclasses.dataclass
class PanoSupInfo:
    """One registered pano's full maps + flat filtered supervision arrays."""

    pose: np.ndarray          # [4, 4]
    height: int
    width: int
    color_map: np.ndarray     # [H, W, 3]
    distance_map: np.ndarray  # [H, W, 1]
    normal_map: np.ndarray    # [H, W, 3]
    mask: np.ndarray          # [H, W, 1] bool — filtered supervision mask
    mask_raw: np.ndarray      # [H, W, 1] bool — input mask & distance>0
    sup_rays_o: np.ndarray    # [M, 3]
    sup_rays_d: np.ndarray    # [M, 3]
    sup_colors: np.ndarray    # [M, 3]
    sup_distances: np.ndarray # [M, 1]
    sup_normals: np.ndarray   # [M, 3]


def build_pano_sup_info(pose, mask, color_map, distance_map,
                        normal_map=None) -> PanoSupInfo:
    """Filter + flatten one pano (reference ``PanoSupInfo.__init__``)."""
    pose = np.asarray(pose, np.float32)
    color_map = np.asarray(color_map, np.float32)
    h, w, _ = color_map.shape
    if distance_map is None:
        distance_map = np.ones((h, w, 1), np.float32)
    distance_map = np.asarray(distance_map, np.float32).reshape(h, w, -1)[..., :1]
    if mask is None:
        m = np.ones((h, w, 1), bool)
    else:
        m = (np.asarray(mask, np.float32).reshape(h, w, -1)[..., :1] > 0.5)

    has_normal = normal_map is not None
    if normal_map is None:
        normal_map = np.zeros((h, w, 3), np.float32)
    normal_map = np.asarray(normal_map, np.float32)

    m = m & (distance_map > 1e-5)
    mask_raw = m.copy()

    # depth-discontinuity filter (jnp morphology, pulled back to host)
    keep = np.asarray(edge_keep_mask(jnp.asarray(distance_map), 0.01))
    m = m & keep

    if has_normal:
        pano_dirs = -np.asarray(img_coord_to_pano_direction(img_coord_from_hw(h, w)))
        normal_cos = np.clip((pano_dirs * normal_map).sum(-1, keepdims=True), 0.0, 1.0)
        m = m & (normal_cos > 0.15)

    dirs = np.asarray(apply_rot(
        img_coord_to_pano_direction(img_coord_from_hw(h, w)),
        jnp.asarray(pose[:3, :3])))
    sel = m[..., 0]
    return PanoSupInfo(
        pose=pose, height=h, width=w,
        color_map=color_map, distance_map=distance_map,
        normal_map=normal_map, mask=m, mask_raw=mask_raw,
        sup_rays_o=np.broadcast_to(pose[:3, 3], dirs.shape)[sel],
        sup_rays_d=dirs[sel],
        sup_colors=color_map[sel],
        sup_distances=distance_map[sel],
        sup_normals=normal_map[sel],
    )


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@jax.jit
def _pano_proj_depths(pts, poses, dmaps):
    """Per-pano projection of candidate points against registered surfaces.

    pts [H, W, 3] world points, poses [P, 4, 4], dmaps [P, H', W', 1]
    masked distance maps -> (proj_d, new_d), each [P, H, W, 1]: the pano's
    stored surface depth sampled along each candidate direction, and the
    candidate's own depth in that pano's frame. Shared core of geo_check
    (``sup_info.py:261-302``) and the visibility mask (``nerf.py:321-358``);
    one dispatch for ALL panos (vmap) instead of ~8 eager ops x P panos x
    ~8 MB re-uploads per call through the tunnel."""

    def one(pose, dmap):
        rel = pts - pose[:3, 3]
        local = apply_rot(rel, pose[:3, :3].T)
        new_d = jnp.linalg.norm(local, axis=-1, keepdims=True)
        coords = direction_to_img_coord(local / new_d)
        proj_d = bilinear_sample(dmap, coords, padding="border")
        return proj_d, new_d

    return jax.vmap(one)(poses, dmaps)


@jax.jit
def _visibility_mask_core(pts, poses, dmaps):
    """1 where ANY registered pano already sees the candidate surface
    (-1-filled padded panos are neutral: visible bit always 0), then the
    reference's 5/9 open (``nerf.py:345-358``)."""
    proj_d, new_d = _pano_proj_depths(pts, poses, dmaps)
    visible = (new_d < proj_d + 1.0 / 256.0).astype(jnp.float32)
    mask = jnp.max(visible, axis=0)
    return binary_open_close((mask[..., 0] > 0.5).astype(jnp.float32),
                             small=5, large=9)


@jax.jit
def _geo_check_core(pts, poses, dmaps):
    """1 OK / 0 conflict over ALL panos (-1-filled padded panos are
    neutral: -1 < new_d -> ok bit always 1), then the reference's 3/9 open
    (``sup_info.py:289-301``)."""
    proj_d, new_d = _pano_proj_depths(pts, poses, dmaps)
    ok = (proj_d < new_d).astype(jnp.float32)
    mask = jnp.min(ok, axis=0)
    return binary_open_close((mask[..., 0] > 0.5).astype(jnp.float32),
                             small=3, large=9)


class SupInfoPool:
    """Growing pool of registered panos + concatenated supervision arrays."""

    def __init__(self):
        self.sup_infos: list[PanoSupInfo] = []
        self._cat = None  # dict of concatenated numpy arrays
        self._device_maps = None  # (n, poses [P,4,4], dmaps [P,H,W,1])

    # -- registration -------------------------------------------------------

    def register_sup_info(self, pose, mask, rgb, distance, normal=None):
        # Fail-loud finiteness gate: registered panos come from our own
        # render -> predictor -> inpaint chain, so a non-finite map means an
        # upstream numerical blowup.  Registering it anyway poisons every
        # later episode silently (round-5 flagship record: a diverged scene
        # rendered anchors 20-23, and 4 all-NaN panos entered the pool).
        for name, arr in (("rgb", rgb), ("distance", distance),
                          ("normal", normal)):
            if arr is not None and not np.isfinite(np.asarray(arr)).all():
                raise FloatingPointError(
                    f"register_sup_info: non-finite values in '{name}' map "
                    f"for pano {len(self.sup_infos)} — upstream "
                    f"render/predictor produced NaN/inf; refusing to "
                    f"register corrupted supervision")
        info = build_pano_sup_info(pose, mask, rgb, distance, normal)
        self.sup_infos.append(info)
        arrays = {
            "rays_o": info.sup_rays_o, "rays_d": info.sup_rays_d,
            "colors": info.sup_colors, "distances": info.sup_distances,
            "normals": info.sup_normals,
        }
        if self._cat is None:
            self._cat = {k: v.copy() for k, v in arrays.items()}
        else:
            self._cat = {k: np.concatenate([self._cat[k], arrays[k]], 0)
                         for k in self._cat}
        self._device_maps = None   # stacked device view is stale

    @property
    def n_valid(self) -> int:
        return 0 if self._cat is None else self._cat["rays_o"].shape[0]

    # -- device views -------------------------------------------------------

    def device_arrays(self, capacity: int | None = None) -> dict:
        """Padded device arrays + n_valid scalar. Capacity defaults to the
        next power of two (shape-stable across episodes)."""
        n = self.n_valid
        cap = capacity or _next_pow2(max(n, 1))
        assert cap >= n
        out = {}
        for k, v in self._cat.items():
            pad = np.zeros((cap - n,) + v.shape[1:], v.dtype)
            out[k] = jnp.asarray(np.concatenate([v, pad], 0))
        out["n_valid"] = jnp.asarray(n, jnp.int32)
        return out

    def rand_ray_color_data(self, key, batch_size: int,
                            rand_mode: str = "by_all_pixels"):
        """Uniform supervision batch (reference ``rand_ray_color_data``):
        'by_all_pixels' samples the whole pool, 'only_first'/'only_last' one
        pano. Host-convenience wrapper; the hot path samples inside the
        jitted step via the same formula."""
        import jax
        assert rand_mode in ("by_all_pixels", "only_first", "only_last")
        if rand_mode == "by_all_pixels":
            arrs = self.device_arrays()
            n = arrs["n_valid"]
        else:
            info = (self.sup_infos[0] if rand_mode == "only_first"
                    else self.sup_infos[-1])
            arrs = {"rays_o": jnp.asarray(info.sup_rays_o),
                    "rays_d": jnp.asarray(info.sup_rays_d),
                    "colors": jnp.asarray(info.sup_colors),
                    "distances": jnp.asarray(info.sup_distances),
                    "normals": jnp.asarray(info.sup_normals)}
            n = jnp.asarray(info.sup_rays_o.shape[0], jnp.int32)
        u = jax.random.uniform(key, (batch_size,))
        idx = jnp.minimum((u * n).astype(jnp.int32), n - 1)
        rays = Rays(arrs["rays_o"][idx], arrs["rays_d"][idx])
        return (rays, arrs["colors"][idx], arrs["distances"][idx],
                arrs["normals"][idx])

    # -- geometry -----------------------------------------------------------

    def gen_occ_grid(self, res: int = 256, dilation: int = 1) -> jnp.ndarray:
        """Binary occupancy from all back-projected supervision points
        (reference ``gen_occ_grid``, ``sup_info.py:304-330``; ``dilation``
        controls the shell thickness — 1 is reference-exact)."""
        pts = jnp.asarray(self._cat["rays_o"]
                          + self._cat["rays_d"] * self._cat["distances"])
        return occ_grid_from_points(pts, res, dilation)

    def device_pano_maps(self):
        """Stacked device view for the projection cores: (poses [P, 4, 4],
        masked distance maps [P, H, W, 1]), P padded to the next power of
        two with zero maps (neutral in both cores) so the jits stay
        shape-stable as the pool grows. Cached — registering a pano
        invalidates; ~8 MB/pano H2D re-uploads per call were the dominant
        cost of the eager per-pano loop on the tunneled backend. None when
        pano resolutions are heterogeneous (callers fall back)."""
        if len({i.distance_map.shape for i in self.sup_infos}) != 1:
            return None
        n = len(self.sup_infos)
        if self._device_maps is None or self._device_maps[0] != n:
            cap = _next_pow2(n)
            # padded slots hold -1 so both cores stay neutral for EVERY
            # candidate depth (visible: new_d < -1+eps never; geo ok:
            # -1 < new_d always). Zero would flip bits for pts within
            # 1/256 of the padded pose's origin.
            dmaps = np.full((cap,) + self.sup_infos[0].distance_map.shape,
                            -1.0, np.float32)
            poses = np.tile(np.eye(4, dtype=np.float32), (cap, 1, 1))
            for i, info in enumerate(self.sup_infos):
                dmaps[i] = info.distance_map * info.mask
                poses[i] = info.pose
            self._device_maps = (n, jnp.asarray(poses), jnp.asarray(dmaps))
        return self._device_maps[1:]

    def geo_check(self, rays: Rays, distances) -> jnp.ndarray:
        """Cross-pano conflict mask: 1 OK, 0 conflict.

        A candidate point conflicts when EVERY registered pano sees it BEHIND
        its own surface (reference ``geo_check``, ``sup_info.py:261-302``:
        per-pano OK bit is ``proj < new`` i.e. candidate farther than pano
        surface -> candidate is occluded there, clamped-min over panos, then
        3/9 ellipse open)."""
        distances = jnp.asarray(distances).reshape(rays.o.shape[:-1])[..., None]
        pts = rays.o + rays.d * distances
        maps = self.device_pano_maps()
        if maps is not None:
            return _geo_check_core(pts, *maps)
        h, w = pts.shape[:2]
        mask = jnp.ones((h, w, 1))
        for info in self.sup_infos:
            sup_dmap = jnp.asarray(info.distance_map * info.mask)
            rel = pts - jnp.asarray(info.pose[:3, 3])
            local = apply_rot(rel, jnp.asarray(info.pose[:3, :3].T))
            new_d = jnp.linalg.norm(local, axis=-1, keepdims=True)
            coords = direction_to_img_coord(local / new_d)
            proj_d = bilinear_sample(sup_dmap, coords, padding="border")
            ok = (proj_d < new_d).astype(jnp.float32)
            mask = jnp.minimum(mask, ok)
        opened = binary_open_close((mask[..., 0] > 0.5).astype(jnp.float32),
                                   small=3, large=9)
        return opened

    # -- (de)serialization ---------------------------------------------------

    def state_dict(self) -> dict:
        """Full, restorable state (fixes the reference's lossy version)."""
        out = {"n_sup_infos": len(self.sup_infos)}
        for i, info in enumerate(self.sup_infos):
            out[f"sup_info_{i}"] = {
                "pose": info.pose, "color_map": info.color_map,
                "distance_map": info.distance_map,
                "normal_map": info.normal_map,
                "mask_input": info.mask_raw.astype(np.float32),
                "has_normal": np.any(info.normal_map != 0),
            }
        return out

    def load_state_dict(self, state: dict):
        assert not self.sup_infos, "load into a fresh pool"
        for i in range(int(state["n_sup_infos"])):
            s = state[f"sup_info_{i}"]
            normal = s["normal_map"] if bool(s["has_normal"]) else None
            self.register_sup_info(
                pose=s["pose"], mask=s["mask_input"], rgb=s["color_map"],
                distance=s["distance_map"], normal=normal)
