"""LaMa (big-lama) Fast-Fourier-Convolution inpainting generator in Flax.

TPU-native equivalent of the reference's vendored
``modules/inpainters/lama/saicinpainting/training/modules/ffc.py``
(``FFCResNetGenerator``) with the big-lama hyperparameters
(``pre_checkpoints/big-lama-config.yaml``: input_nc 4, ngf 64,
3 downsamples, 18 FFC blocks at ratio 0.75, LFU off, sigmoid output) and the
inference wrapper semantics of ``DefaultInpaintingTrainingModule.forward``
(mask-concat input, composite output) + ``LamaInpainter.inpaint``'s uint8
quantization quirk (``lama_inpainter.py:35``).

Layout is NHWC (TPU-native); FFTs use jnp.fft.rfft2 (XLA lowers these well).
Checkpoint conversion from the torch state dict is provided
(``convert_lama_state_dict``) — weights are NOT bundled, load big-lama.ckpt.
Inference-only: BatchNorm uses running statistics.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .interface import Inpainter

RATIO_BOTTLENECK = 0.75
NGF = 64
N_DOWN = 3
N_BLOCKS = 18
MAX_FEATURES = 1024


def _reflect_pad(x, pad):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class ConvBN(nn.Module):
    """Conv (optionally reflect-padded) + inference BatchNorm + optional ReLU."""
    features: int
    kernel: int = 1
    stride: int = 1
    use_bias: bool = False
    relu: bool = True
    bn: bool = True
    reflect: bool = True

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        if pad and self.reflect:
            x = _reflect_pad(x, pad)
            padding = "VALID"
        else:
            padding = [(pad, pad), (pad, pad)]
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=padding,
                    use_bias=self.use_bias, name="conv")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class FourierUnit(nn.Module):
    """rfft2 -> 1x1 conv+bn+relu in the spectrum -> irfft2
    (reference ``ffc.py:49-113``, fft_norm='ortho')."""
    features: int

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        ff = jnp.fft.rfft2(x, axes=(1, 2), norm="ortho")   # [N, H, W/2+1, C]
        ff = jnp.concatenate([jnp.real(ff), jnp.imag(ff)], axis=-1)
        ff = ConvBN(self.features * 2, kernel=1, name="spec")(ff)
        re, im = jnp.split(ff, 2, axis=-1)
        out = jnp.fft.irfft2(re + 1j * im, s=(h, w), axes=(1, 2), norm="ortho")
        return out


class SpectralTransform(nn.Module):
    """conv1(1x1) -> FourierUnit residual -> conv2(1x1)
    (reference ``ffc.py:116-163``; big-lama disables LFU)."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        if self.stride == 2:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBN(self.features // 2, kernel=1, name="conv1")(x)
        fu = FourierUnit(self.features // 2, name="fu")(x)
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      name="conv2")(x + fu)
        return out


class FFC(nn.Module):
    """Four-branch local/global fast Fourier convolution
    (reference ``ffc.py:166-225``)."""
    out_channels: int
    kernel: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1

    @nn.compact
    def __call__(self, x_l, x_g):
        out_cg = int(self.out_channels * self.ratio_gout)
        out_cl = self.out_channels - out_cg
        in_cl = 0 if x_l is None else x_l.shape[-1]
        in_cg = 0 if x_g is None else x_g.shape[-1]

        def conv(name, feats):
            pad = (self.kernel - 1) // 2
            def apply(v):
                vv = _reflect_pad(v, pad) if pad else v
                return nn.Conv(feats, (self.kernel, self.kernel),
                               strides=(self.stride, self.stride),
                               padding="VALID", use_bias=False, name=name)(vv)
            return apply

        out_l = None
        out_g = None
        if out_cl:
            acc = 0.0
            if in_cl:
                acc = acc + conv("convl2l", out_cl)(x_l)
            if in_cg:
                acc = acc + conv("convg2l", out_cl)(x_g)
            out_l = acc
        if out_cg:
            acc = 0.0
            if in_cl:
                acc = acc + conv("convl2g", out_cg)(x_l)
            if in_cg:
                acc = acc + SpectralTransform(out_cg, self.stride,
                                              name="convg2g")(x_g)
            out_g = acc
        return out_l, out_g


class FFCBnAct(nn.Module):
    out_channels: int
    kernel: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1

    @nn.compact
    def __call__(self, x_l, x_g):
        x_l, x_g = FFC(self.out_channels, self.kernel, self.ratio_gin,
                       self.ratio_gout, self.stride, name="ffc")(x_l, x_g)
        if x_l is not None:
            x_l = nn.relu(nn.BatchNorm(use_running_average=True,
                                       epsilon=1e-5, name="bn_l")(x_l))
        if x_g is not None:
            x_g = nn.relu(nn.BatchNorm(use_running_average=True,
                                       epsilon=1e-5, name="bn_g")(x_g))
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    dim: int
    ratio: float = RATIO_BOTTLENECK

    @nn.compact
    def __call__(self, x_l, x_g):
        id_l, id_g = x_l, x_g
        x_l, x_g = FFCBnAct(self.dim, 3, self.ratio, self.ratio,
                            name="conv1")(x_l, x_g)
        x_l, x_g = FFCBnAct(self.dim, 3, self.ratio, self.ratio,
                            name="conv2")(x_l, x_g)
        return id_l + x_l, id_g + x_g


class FFCResNetGenerator(nn.Module):
    """big-lama generator: [N, H, W, 4] masked-rgb+mask -> [N, H, W, 3]."""
    output_nc: int = 3

    @nn.compact
    def __call__(self, x):
        # torch: ReflectionPad2d(3) + FFC(k7, padding=0) == our FFC's
        # internal reflect pad of (k-1)//2 = 3; no extra outer pad.
        x_l, x_g = FFCBnAct(NGF, 7, 0.0, 0.0, name="init")(x, None)

        for i in range(N_DOWN):
            mult = 2 ** i
            gout = RATIO_BOTTLENECK if i == N_DOWN - 1 else 0.0
            x_l, x_g = FFCBnAct(min(MAX_FEATURES, NGF * mult * 2), 3, 0.0,
                                gout, stride=2, name=f"down{i}")(x_l, x_g)

        for i in range(N_BLOCKS):
            x_l, x_g = FFCResnetBlock(min(MAX_FEATURES, NGF * 2 ** N_DOWN),
                                      name=f"block{i}")(x_l, x_g)

        x = jnp.concatenate([x_l, x_g], axis=-1)
        for i in range(N_DOWN):
            mult = 2 ** (N_DOWN - i)
            feats = min(MAX_FEATURES, NGF * mult // 2)
            # torch ConvTranspose2d(k3, s2, p1, output_padding=1): full
            # transposed output is (2H+1); torch keeps rows/cols [1, 2H+1)
            x = nn.ConvTranspose(feats, (3, 3), strides=(2, 2),
                                 padding="VALID", transpose_kernel=True,
                                 use_bias=True, name=f"up{i}_conv")(x)
            x = x[:, 1:, 1:, :]  # keep rows/cols [1, 2H+1) of the 2H+1

            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             name=f"up{i}_bn")(x)
            x = nn.relu(x)

        x = _reflect_pad(x, 3)
        x = nn.Conv(self.output_nc, (7, 7), padding="VALID", use_bias=True,
                    name="out_conv")(x)
        return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _torch_layer_indices():
    """Sequential indices of the torch ``generator.model`` list -> our names.

    The torch generator is an nn.Sequential: [pad, init, down0..2,
    block0..17, concat, (convT, bn, relu) x3, pad, out_conv, sigmoid]
    (reference ``ffc.py:305-371``)."""
    mapping = {}
    mapping[1] = "init"
    for i in range(N_DOWN):
        mapping[2 + i] = f"down{i}"
    for i in range(N_BLOCKS):
        mapping[2 + N_DOWN + i] = f"block{i}"
    base = 2 + N_DOWN + N_BLOCKS + 1  # skip ConcatTupleLayer
    for i in range(N_DOWN):
        mapping[base + 3 * i] = f"up{i}_conv"
        mapping[base + 3 * i + 1] = f"up{i}_bn"
    mapping[base + 3 * N_DOWN + 1] = "out_conv"
    return mapping


def _conv_w(t):  # torch OIHW -> flax HWIO
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _convT_w(t):
    # torch ConvTranspose2d weight [in, out, H, W] -> flax transpose_kernel
    # convention [H, W, out, in] (flax flips the spatial axes internally)
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def convert_lama_state_dict(sd: dict) -> dict:
    """torch big-lama generator state dict -> flax variables.

    Accepts either the raw ``generator.model.*`` keys of big-lama.ckpt's
    ``state_dict`` or already-stripped ``model.*`` keys.
    """
    sd = {k.replace("generator.", "", 1) if k.startswith("generator.") else k: v
          for k, v in sd.items() if ".model." in k or k.startswith("model.")}
    idx_map = _torch_layer_indices()

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    def conv_entry(prefix_t, path):
        put(params, path + ("kernel",), _conv_w(sd[prefix_t + ".weight"]))
        if prefix_t + ".bias" in sd:
            put(params, path + ("bias",), np.asarray(sd[prefix_t + ".bias"]))

    def bn_entry(prefix_t, path):
        put(params, path + ("scale",), np.asarray(sd[prefix_t + ".weight"]))
        put(params, path + ("bias",), np.asarray(sd[prefix_t + ".bias"]))
        put(stats, path + ("mean",), np.asarray(sd[prefix_t + ".running_mean"]))
        put(stats, path + ("var",), np.asarray(sd[prefix_t + ".running_var"]))

    def ffc_bn_act(prefix_t, path):
        # four conv branches
        for branch in ("convl2l", "convl2g", "convg2l"):
            key = f"{prefix_t}.ffc.{branch}.weight"
            if key in sd:
                conv_entry(f"{prefix_t}.ffc.{branch}", path + ("ffc", branch))
        # spectral transform
        st = f"{prefix_t}.ffc.convg2g"
        if st + ".conv1.0.weight" in sd:
            conv_entry(st + ".conv1.0", path + ("ffc", "convg2g", "conv1", "conv"))
            bn_entry(st + ".conv1.1", path + ("ffc", "convg2g", "conv1", "bn"))
            conv_entry(st + ".fu.conv_layer",
                       path + ("ffc", "convg2g", "fu", "spec", "conv"))
            bn_entry(st + ".fu.bn", path + ("ffc", "convg2g", "fu", "spec", "bn"))
            conv_entry(st + ".conv2", path + ("ffc", "convg2g", "conv2"))
        # norms
        if f"{prefix_t}.bn_l.weight" in sd:
            bn_entry(f"{prefix_t}.bn_l", path + ("bn_l",))
        if f"{prefix_t}.bn_g.weight" in sd:
            bn_entry(f"{prefix_t}.bn_g", path + ("bn_g",))

    for idx, name in idx_map.items():
        t = f"model.{idx}"
        if name.endswith("_bn"):
            bn_entry(t, (name,))
        elif name.endswith("_conv") and name.startswith("up"):
            put(params, (name, "kernel"), _convT_w(sd[t + ".weight"]))
            put(params, (name, "bias"), np.asarray(sd[t + ".bias"]))
        elif name == "out_conv":
            conv_entry(t, (name,))
        elif name.startswith("block"):
            for sub in ("conv1", "conv2"):
                ffc_bn_act(f"{t}.{sub}", (name, sub))
        else:
            ffc_bn_act(t, (name,))

    return {"params": params, "batch_stats": stats}


class LamaInpainterBackend(Inpainter):
    """Checkpoint-loading inference wrapper (reference ``lama_inpainter.py``)."""

    def __init__(self, ckpt_dir: str = "./pre_checkpoints",
                 variables: dict | None = None):
        self.model = FFCResNetGenerator()
        if variables is None:
            path = os.path.join(ckpt_dir, "big-lama.ckpt")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"{path} not found — download big-lama.ckpt or use the "
                    "fake inpainter backend")
            import torch
            ckpt = torch.load(path, map_location="cpu")
            sd = ckpt.get("state_dict", ckpt)
            from ..utils.manifest import validate_state_dict
            validate_state_dict(sd, "lama")
            variables = convert_lama_state_dict(sd)
        self.variables = variables
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    def inpaint(self, img, mask):
        img = jnp.asarray(img)
        h, w = img.shape[0], img.shape[1]
        mask = (jnp.asarray(mask).reshape(h, w, -1)[..., :1] > 0).astype(jnp.float32)
        # reference quantizes the image to uint8 first (lama_inpainter.py:35)
        img = jnp.round(img * 255.0) / 255.0
        masked = img * (1.0 - mask)
        x = jnp.concatenate([masked, mask], axis=-1)[None]
        pred = self._apply(self.variables, x)[0]
        return mask * pred + (1.0 - mask) * img
