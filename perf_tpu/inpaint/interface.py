"""Inpainting interfaces.

Counterpart of the reference's ``modules/inpainters/inpainter.py`` ABC. Image
convention here is channels-last float [H, W, 3] in [0, 1]; masks are
[H, W] or [H, W, 1] with 1 = hole (to be filled).

Backends implement ``inpaint_views`` (batched over a leading view axis) —
the pano fusion loop is inherently sequential (later views must see earlier
results), but within one view the model runs as one device batch and stays
resident (the reference shuttles LaMa/SD CPU<->GPU around every call,
``lama_inpainter.py:33,45``, ``diffusion_local_inpainter.py:84,102,154``).
"""

from __future__ import annotations


class Inpainter:
    def inpaint(self, img, mask):
        """img [H, W, 3], mask [H, W(, 1)] (1 = hole) -> [H, W, 3]."""
        raise NotImplementedError

    def inpaint_rgbd(self, img, distance, mask):
        raise NotImplementedError
