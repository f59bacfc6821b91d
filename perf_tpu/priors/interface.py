"""Prior-model interfaces: monocular depth / surface normals.

Counterpart of the reference's ``GeoPredictor`` ABC + Omnidata wrappers
(``geo_predictor.py:2-7``, ``omnidata_predictor.py``,
``omnidata_normal_predictor.py``) with one deliberate change: predictors are
BATCHED over the view axis. The reference runs 60-120 sequential single-image
DPT forwards, moving the model CPU<->GPU around every call
(``omnidata_predictor.py:57,60``); on TPU the whole tangent-view stack is one
inference batch and models stay resident.

Images are [n, h, w, 3] float in [0, 1]; depth is [n, h, w, 1] >= 0 (scale
free — callers normalize per view); normals are [n, h, w, 3] in [0, 1]
(callers map to [-1, 1] and rotate to world, like the reference).

Fake backends additionally accept the view geometry (``dirs``/``origin``)
so hermetic tests can return ground-truth-consistent priors; real backends
ignore those kwargs.
"""

from __future__ import annotations


class DepthPredictor:
    def predict_depth(self, imgs, intri=None, dirs=None, origin=None):
        raise NotImplementedError


class NormalPredictor:
    def predict_normal(self, imgs, dirs=None, origin=None, c2w=None):
        raise NotImplementedError
