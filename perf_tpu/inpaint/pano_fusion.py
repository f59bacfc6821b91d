"""PanoPersFusionInpainter: progressive per-tangent-view pano inpainting.

Counterpart of the reference's ``pano_pers_fusion_inpainter.py:31-79``: for
each of 20 tangent views (gen_res 512, ratio 1.1) IN SEQUENCE — later views
must see earlier results —

1. resample the current pano + hole mask into the view,
2. coarse-fill the full per-view hole with the primary inpainter (LaMa in
   the reference),
3. refine the morphologically-opened "smooth" sub-hole with the secondary
   inpainter (Stable Diffusion in the reference) on top of the coarse fill,
4. reproject the view into the pano and clear the hole there.

The sequential structure is kept (it is algorithmic); each view's resample /
morphology / reprojection runs as jitted device work, and the inpainting
backends are pluggable (fake / LaMa / diffusion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (
    tangent_cameras, direction_to_img_coord, pano_sample, bilinear_sample,
    img_coord_from_hw, img_coord_to_pano_direction,
    direction_to_pers_img_coord, ellipse_kernel, erosion, dilation,
)
from .interface import Inpainter


class PanoPersFusionInpainter(Inpainter):
    def __init__(self, inpainter, smooth_inpainter=None,
                 gen_res: int = 512, ratio: float = 1.1):
        """``inpainter`` fills the full per-view hole (reference: LaMa);
        ``smooth_inpainter`` optionally refines the opened sub-hole on top
        (reference: SD2). With ``smooth_inpainter=None`` the coarse fill is
        final (the reference's ``use_lama_assist=False`` arm inverted — we
        treat the coarse model as always-on)."""
        self.inpainter = inpainter
        self.smooth_inpainter = smooth_inpainter
        self.gen_res = gen_res
        self.ratio = ratio
        dirs, _, tos, downs, rights = tangent_cameras(gen_res, ratio)
        self._dirs = jnp.asarray(dirs)
        self._tos, self._downs, self._rights = tos, downs, rights
        self._view_coords = direction_to_img_coord(self._dirs)  # [V, r, r, 2]
        self._kernel11 = ellipse_kernel(11)

    def inpaint(self, img, mask):
        img = jnp.asarray(img)
        h, w = img.shape[0], img.shape[1]
        mask = jnp.asarray(mask).reshape(h, w, -1)[..., :1].astype(jnp.float32)
        pano = img
        pano_dirs = img_coord_to_pano_direction(img_coord_from_hw(h, w))

        n_views = self._dirs.shape[0]
        for i in range(n_views):
            view_img = pano_sample(pano, self._view_coords[i])
            view_mask = (pano_sample(mask, self._view_coords[i]) > 0.5
                         ).astype(jnp.float32)
            if float(view_mask.max()) <= 0.5:
                # nothing to fill in this view; still clear the (empty) hole
                pass
            else:
                filled = jnp.asarray(self.inpainter.inpaint(view_img,
                                                            view_mask))
                if self.smooth_inpainter is not None:
                    smooth = erosion(view_mask[..., 0], self._kernel11)
                    smooth = dilation(smooth, self._kernel11)
                    smooth = jnp.minimum(smooth, view_mask[..., 0])
                    if float(smooth.max()) > 0.5:
                        filled = jnp.asarray(
                            self.smooth_inpainter.inpaint(filled, smooth))
                view_img = filled

            proj_coord, proj_mask = direction_to_pers_img_coord(
                pano_dirs, jnp.asarray(self._tos[i]),
                jnp.asarray(self._downs[i]), jnp.asarray(self._rights[i]))
            view_in_pano = bilinear_sample(view_img, proj_coord, "border")
            pano = pano * (1.0 - proj_mask) + view_in_pano * proj_mask
            mask = mask * (1.0 - proj_mask)

        return pano

    def inpaint_rgbd(self, img, distance, mask):
        out = self.inpaint(img, mask)
        dist3 = jnp.repeat(jnp.asarray(distance).reshape(
            out.shape[0], out.shape[1], 1), 3, axis=-1)
        dist = self.inpaint(dist3, mask)[..., :1]
        return out, dist
