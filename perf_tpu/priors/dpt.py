"""DPT (dense prediction transformer) with the ViT-B/R50 hybrid backbone, in Flax.

TPU-native equivalent of the reference's vendored Omnidata midas stack
(``modules/geo_predictors/omnidata/modules/midas/{vit,blocks,dpt_depth}.py``)
at the exact configuration PeRF uses: ``DPTDepthModel(backbone='vitb_rn50_384',
num_channels=1|3)`` — the monocular depth and surface-normal priors.

Architecture (per the vendored code + timm's ``vit_base_resnet50_384``):
- ResNetV2 stem+3 stages (layers 3/4/9) with weight-standardized convs and
  GroupNorm(32), TF-SAME padding; taps after stages 0 (256ch, /4) and 1
  (512ch, /8);
- 1x1 projection of the 1024ch /16 map to 768 tokens + cls token + (resized)
  position embeddings + 12 ViT-B blocks; taps after blocks 8 and 11 with
  'project' readout (cls token concat -> linear -> GELU);
- reassembly (1x1 convs; /32 branch adds a stride-2 3x3), scratch 3x3 convs
  to 256, four RefineNet fusion blocks (residual conv units, x2 bilinear
  align-corners upsampling, 1x1 out conv), and the depth head
  (3x3 -> x2 up -> 3x3 -> ReLU -> 1x1 -> ReLU).

Inference-only; layout NHWC. ``convert_dpt_state_dict`` maps the omnidata
torch checkpoints (``omnidata_dpt_depth_v2.ckpt`` /
``omnidata_dpt_normal_v2.ckpt``) onto this module tree. TPU-first inference:
the whole 60-view tangent stack runs as ONE batch (vs 120 sequential
single-image forwards with CPU<->GPU model shuffles in the reference,
``omnidata_predictor.py:57-74``).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .interface import DepthPredictor, NormalPredictor

VIT_FEATURES = 768
N_BLOCKS = 12
N_HEADS = 12
FEATURES = 256
REASSEMBLE = (256, 512, 768, 768)
IMG_SIZE = 384


# ---------------------------------------------------------------------------
# ResNetV2 (weight-standardized convs + GroupNorm, TF-SAME padding)
# ---------------------------------------------------------------------------

class StdConv(nn.Module):
    features: int
    kernel: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features))
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        w = (kernel - mean) / jnp.sqrt(var + 1e-6)
        return jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class GN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, epsilon=1e-5)(x)


class Bottleneck(nn.Module):
    """Non-preact ResNetV2 bottleneck: (1x1 -> 3x3(s) -> 1x1) each with
    GN+ReLU (last GN before the residual add), optional projection shortcut."""
    mid: int
    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.out or self.stride != 1:
            shortcut = StdConv(self.out, 1, self.stride, name="downsample_conv")(x)
            shortcut = GN(name="downsample_norm")(shortcut)
        y = nn.relu(GN(name="norm1")(StdConv(self.mid, 1, name="conv1")(x)))
        y = nn.relu(GN(name="norm2")(StdConv(self.mid, 3, self.stride,
                                             name="conv2")(y)))
        y = GN(name="norm3")(StdConv(self.out, 1, name="conv3")(y))
        return nn.relu(y + shortcut)


class ResNetV2Backbone(nn.Module):
    """Stem + 3 stages (3/4/9 blocks); returns (stage0, stage1, stage2)."""

    @nn.compact
    def __call__(self, x):
        x = StdConv(64, 7, 2, name="stem_conv")(x)
        x = nn.relu(GN(name="stem_norm")(x))
        # TF-SAME 3x3/2 max pool
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        feats = []
        widths = ((64, 256), (128, 512), (256, 1024))
        depths = (3, 4, 9)
        for s, (mid, out) in enumerate(widths):
            for b in range(depths[s]):
                stride = 2 if (b == 0 and s > 0) else 1
                x = Bottleneck(mid, out, stride, name=f"stage{s}_block{b}")(x)
            feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# ViT blocks
# ---------------------------------------------------------------------------

class Attention(nn.Module):
    @nn.compact
    def __call__(self, x):
        n, t, c = x.shape
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(n, t, 3, N_HEADS, c // N_HEADS), 3, 2)
        q, k, v = (z[:, :, 0].transpose(0, 2, 1, 3) for z in (q, k, v))
        scale = (c // N_HEADS) ** -0.5
        att = jax.nn.softmax((q * scale) @ k.transpose(0, 1, 3, 2), axis=-1)
        out = (att @ v).transpose(0, 2, 1, 3).reshape(n, t, c)
        return nn.Dense(c, name="proj")(out)


class ViTBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + Attention(name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(4 * VIT_FEATURES, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(VIT_FEATURES, name="mlp_fc2")(y)
        return x + y


# ---------------------------------------------------------------------------
# DPT decoder pieces
# ---------------------------------------------------------------------------

def _resize_align_corners(x, h, w):
    # jax.image.resize is half-pixel (align_corners=False); DPT uses
    # align_corners=True. Implement with explicit coordinate mapping.
    n, h0, w0, c = x.shape
    if (h0, w0) == (h, w):
        return x
    yy = jnp.linspace(0.0, h0 - 1.0, h)
    xx = jnp.linspace(0.0, w0 - 1.0, w)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h0 - 1)
    x1 = jnp.minimum(x0 + 1, w0 - 1)
    wy = (yy - y0)[None, :, None, None]
    wx = (xx - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c_ = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c_ * wy * (1 - wx) + d * wy * wx)


class ResidualConvUnit(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(FEATURES, (3, 3), padding=[(1, 1), (1, 1)], name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(FEATURES, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        return y + x


class FeatureFusion(nn.Module):
    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(name="rcu1")(skip)
        x = ResidualConvUnit(name="rcu2")(x)
        n, h, w, c = x.shape
        x = _resize_align_corners(x, 2 * h, 2 * w)
        return nn.Conv(FEATURES, (1, 1), name="out_conv")(x)


class DPTHybrid(nn.Module):
    """Full model: [N, 384, 384, 3] (normalized to [-1,1]) -> [N, 384, 384, C]."""
    num_channels: int = 1
    non_negative: bool = True

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        feats = ResNetV2Backbone(name="backbone")(x)
        layer_1, layer_2, deep = feats  # /4 256ch, /8 512ch, /16 1024ch

        # tokenize
        tok = nn.Conv(VIT_FEATURES, (1, 1), name="patch_proj")(deep)
        gh, gw = tok.shape[1], tok.shape[2]
        tok = tok.reshape(n, gh * gw, VIT_FEATURES)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, VIT_FEATURES))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, (IMG_SIZE // 16) ** 2 + 1, VIT_FEATURES))
        # resize grid pos-embed if the input grid differs (vit.py:105-119)
        pos_tok, pos_grid = pos[:, :1], pos[0, 1:]
        gs_old = int(np.sqrt(pos_grid.shape[0]))
        if (gh, gw) != (gs_old, gs_old):
            pg = pos_grid.reshape(1, gs_old, gs_old, VIT_FEATURES)
            # antialias=False: torch F.interpolate (vit.py:111) never
            # antialiases, jax.image.resize does by default on downscale
            pg = jax.image.resize(pg, (1, gh, gw, VIT_FEATURES), "bilinear",
                                  antialias=False)
            pos_grid = pg.reshape(gh * gw, VIT_FEATURES)
        tok = jnp.concatenate([jnp.tile(cls, (n, 1, 1)), tok], axis=1)
        tok = tok + jnp.concatenate([pos_tok, pos_grid[None]], axis=1)

        taps = {}
        for i in range(N_BLOCKS):
            tok = ViTBlock(name=f"block{i}")(tok)
            if i in (8, 11):
                taps[i] = tok
        # final norm runs but its output is unused by the decoder taps
        _ = nn.LayerNorm(epsilon=1e-6, name="norm")(tok)

        def project_readout(t, name):
            cls_t = jnp.broadcast_to(t[:, :1], t[:, 1:].shape)
            cat = jnp.concatenate([t[:, 1:], cls_t], axis=-1)
            out = nn.Dense(VIT_FEATURES, name=name + "_proj")(cat)
            return nn.gelu(out, approximate=False).reshape(
                n, gh, gw, VIT_FEATURES)

        layer_3 = project_readout(taps[8], "readout3")
        layer_3 = nn.Conv(REASSEMBLE[2], (1, 1), name="post3_conv")(layer_3)
        layer_4 = project_readout(taps[11], "readout4")
        layer_4 = nn.Conv(REASSEMBLE[3], (1, 1), name="post4_conv")(layer_4)
        layer_4 = nn.Conv(REASSEMBLE[3], (3, 3), strides=(2, 2),
                          padding=[(1, 1), (1, 1)], name="post4_down")(layer_4)

        rn = []
        for i, layer in enumerate((layer_1, layer_2, layer_3, layer_4)):
            rn.append(nn.Conv(FEATURES, (3, 3), padding=[(1, 1), (1, 1)],
                              use_bias=False, name=f"layer{i + 1}_rn")(layer))

        path4 = FeatureFusion(name="refinenet4")(rn[3])
        path3 = FeatureFusion(name="refinenet3")(path4, rn[2])
        path2 = FeatureFusion(name="refinenet2")(path3, rn[1])
        path1 = FeatureFusion(name="refinenet1")(path2, rn[0])

        y = nn.Conv(FEATURES // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    name="head_conv1")(path1)
        nh, hh, ww, _ = y.shape
        y = _resize_align_corners(y, 2 * hh, 2 * ww)
        y = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], name="head_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_channels, (1, 1), name="head_conv3")(y)
        if self.non_negative:
            y = nn.relu(y)
        return y


# ---------------------------------------------------------------------------
# checkpoint conversion (omnidata torch ckpt -> flax variables)
# ---------------------------------------------------------------------------

def _cw(t):  # conv OIHW -> HWIO
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def convert_dpt_state_dict(sd: dict) -> dict:
    """Map omnidata DPT state dict keys onto the DPTHybrid module tree.

    Accepts the checkpoint's inner state dict (with the 'model.' prefix
    already stripped, as the reference wrapper does —
    ``omnidata_predictor.py:41-47``).
    """
    p: dict = {}

    def put(path, v):
        node = p
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(v)

    def conv(tk, path, bias=True):
        put(path + ("kernel",), _cw(sd[tk + ".weight"]))
        if bias and tk + ".bias" in sd:
            put(path + ("bias",), np.asarray(sd[tk + ".bias"]))

    def gn(tk, path):
        put(path + ("scale",), np.asarray(sd[tk + ".weight"]))
        put(path + ("bias",), np.asarray(sd[tk + ".bias"]))

    def dense(tk, path):
        put(path + ("kernel",), np.transpose(np.asarray(sd[tk + ".weight"])))
        put(path + ("bias",), np.asarray(sd[tk + ".bias"]))

    def ln(tk, path):
        put(path + ("scale",), np.asarray(sd[tk + ".weight"]))
        put(path + ("bias",), np.asarray(sd[tk + ".bias"]))

    bb = "pretrained.model.patch_embed.backbone"
    conv(f"{bb}.stem.conv", ("backbone", "stem_conv"), bias=False)
    gn(f"{bb}.stem.norm", ("backbone", "stem_norm", "GroupNorm_0"))
    for s, depth in enumerate((3, 4, 9)):
        for b in range(depth):
            tb = f"{bb}.stages.{s}.blocks.{b}"
            fb = ("backbone", f"stage{s}_block{b}")
            for i in (1, 2, 3):
                conv(f"{tb}.conv{i}", fb + (f"conv{i}",), bias=False)
                gn(f"{tb}.norm{i}", fb + (f"norm{i}", "GroupNorm_0"))
            if f"{tb}.downsample.conv.weight" in sd:
                conv(f"{tb}.downsample.conv", fb + ("downsample_conv",),
                     bias=False)
                gn(f"{tb}.downsample.norm",
                   fb + ("downsample_norm", "GroupNorm_0"))

    conv("pretrained.model.patch_embed.proj", ("patch_proj",))
    put(("cls_token",), np.asarray(sd["pretrained.model.cls_token"]))
    put(("pos_embed",), np.asarray(sd["pretrained.model.pos_embed"]))
    for i in range(N_BLOCKS):
        tb = f"pretrained.model.blocks.{i}"
        fb = (f"block{i}",)
        ln(f"{tb}.norm1", fb + ("norm1",))
        ln(f"{tb}.norm2", fb + ("norm2",))
        dense(f"{tb}.attn.qkv", fb + ("attn", "qkv"))
        dense(f"{tb}.attn.proj", fb + ("attn", "proj"))
        dense(f"{tb}.mlp.fc1", fb + ("mlp_fc1",))
        dense(f"{tb}.mlp.fc2", fb + ("mlp_fc2",))
    ln("pretrained.model.norm", ("norm",))

    # readouts + reassembly (act_postprocess3/4: [proj-readout, T, unflatten,
    # conv1x1(, conv3x3 s2)])
    dense("pretrained.act_postprocess3.0.project.0", ("readout3_proj",))
    conv("pretrained.act_postprocess3.3", ("post3_conv",))
    dense("pretrained.act_postprocess4.0.project.0", ("readout4_proj",))
    conv("pretrained.act_postprocess4.3", ("post4_conv",))
    conv("pretrained.act_postprocess4.4", ("post4_down",))

    for i in range(1, 5):
        conv(f"scratch.layer{i}_rn", (f"layer{i}_rn",), bias=False)
    for i in range(1, 5):
        tb = f"scratch.refinenet{i}"
        fb = (f"refinenet{i}",)
        conv(f"{tb}.out_conv", fb + ("out_conv",))
        for j in (1, 2):
            if i == 4 and j == 1:
                # refinenet4 takes no skip input; torch still allocates
                # resConfUnit1 but never runs it — our module omits it
                continue
            conv(f"{tb}.resConfUnit{j}.conv1", fb + (f"rcu{j}", "conv1"))
            conv(f"{tb}.resConfUnit{j}.conv2", fb + (f"rcu{j}", "conv2"))

    conv("scratch.output_conv.0", ("head_conv1",))
    conv("scratch.output_conv.2", ("head_conv2",))
    conv("scratch.output_conv.4", ("head_conv3",))
    return {"params": p}


# ---------------------------------------------------------------------------
# prior backends
# ---------------------------------------------------------------------------

def _center_crop_resize(imgs: jnp.ndarray, size: int) -> jnp.ndarray:
    """torchvision Resize(384) + CenterCrop(384) on [N, H, W, 3]."""
    n, h, w, c = imgs.shape
    scale = size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    imgs = jax.image.resize(imgs, (n, nh, nw, c), "bilinear")
    top = (nh - size) // 2
    left = (nw - size) // 2
    return imgs[:, top: top + size, left: left + size]


class _DPTBackend:
    num_channels = 1
    ckpt_name = "omnidata_dpt_depth_v2.ckpt"

    def __init__(self, ckpt_dir: str = "./pre_checkpoints",
                 variables: dict | None = None):
        self.model = DPTHybrid(num_channels=self.num_channels,
                               non_negative=(self.num_channels == 1))
        if variables is None:
            path = os.path.join(ckpt_dir, self.ckpt_name)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"{path} not found — download the omnidata checkpoint or "
                    "use the fake prior backend")
            import torch
            ckpt = torch.load(path, map_location="cpu")
            sd = ckpt.get("state_dict", ckpt)
            if not any(k.startswith("model.") for k in sd):
                sd = {"model." + k: v for k, v in sd.items()}
            from ..utils.manifest import validate_state_dict
            validate_state_dict(
                sd, "dpt_depth" if self.num_channels == 1 else "dpt_normal")
            sd = {k[6:]: v for k, v in sd.items() if k.startswith("model.")}
            variables = convert_dpt_state_dict(sd)
        self.variables = variables
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    def _forward(self, imgs):
        imgs = _center_crop_resize(jnp.asarray(imgs), IMG_SIZE)
        x = (imgs - 0.5) / 0.5  # Normalize(mean=0.5, std=0.5)
        return self._apply(self.variables, x)


class DPTDepthBackend(_DPTBackend, DepthPredictor):
    num_channels = 1
    ckpt_name = "omnidata_dpt_depth_v2.ckpt"

    def predict_depth(self, imgs, intri=None, dirs=None, origin=None):
        out = self._forward(imgs)
        return jnp.clip(out, 0.0, 1.0)  # reference clips to [0,1]


class DPTNormalBackend(_DPTBackend, NormalPredictor):
    num_channels = 3
    ckpt_name = "omnidata_dpt_normal_v2.ckpt"

    def predict_normal(self, imgs, dirs=None, origin=None, c2w=None):
        return self._forward(imgs)
