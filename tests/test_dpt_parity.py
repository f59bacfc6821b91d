"""Numerical parity of the Flax DPT-hybrid vs the vendored torch DPT.

The vendored omnidata stack builds its backbone via
``timm.create_model("vit_base_resnet50_384")`` (reference
``modules/geo_predictors/omnidata/modules/midas/vit.py:483``); timm is not in
this environment, so a minimal timm-compatible stand-in (same module tree,
same semantics: TF-SAME weight-standardized convs, GroupNorm(32), non-preact
ResNetV2 bottlenecks, ViT-B blocks) is injected through a ``timm`` stub. The
vendored DPT decoder code itself (``dpt_depth.py``, ``blocks.py``, ``vit.py``
readout/reassembly plumbing) runs UNMODIFIED, so this checks the Flax port +
``convert_dpt_state_dict`` end to end on RANDOM weights — the same protocol
as ``test_lama_parity.py``.

Run at 192x192 so the position-embedding resize path (``vit.py:102-116``) is
exercised too (at 384 it is an identity).
"""

import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/modules/geo_predictors/omnidata/modules/midas"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference midas tree not available")


def _build_torch_standin(torch):
    """timm-0.4.x-compatible ``vit_base_resnet50_384`` (random weights)."""
    nn = torch.nn
    F = torch.nn.functional

    def pad_same(x, k, s, value=0.0):
        ih, iw = x.shape[-2:]
        ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
        pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
        return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2],
                     value=value)

    class StdConv2dSame(nn.Conv2d):
        def __init__(self, cin, cout, k, stride=1, bias=False):
            super().__init__(cin, cout, k, stride=stride, padding=0, bias=bias)

        def forward(self, x):
            var, mean = torch.var_mean(self.weight, dim=[1, 2, 3],
                                       keepdim=True, unbiased=False)
            w = (self.weight - mean) / torch.sqrt(var + 1e-6)
            x = pad_same(x, self.kernel_size[0], self.stride[0])
            return F.conv2d(x, w, self.bias, self.stride)

    class Bottleneck(nn.Module):
        def __init__(self, cin, mid, cout, stride=1):
            super().__init__()
            if cin != cout or stride != 1:
                self.downsample = nn.Module()
                self.downsample.conv = StdConv2dSame(cin, cout, 1, stride)
                self.downsample.norm = nn.GroupNorm(32, cout)
            else:
                self.downsample = None
            self.conv1 = StdConv2dSame(cin, mid, 1)
            self.norm1 = nn.GroupNorm(32, mid)
            self.conv2 = StdConv2dSame(mid, mid, 3, stride)
            self.norm2 = nn.GroupNorm(32, mid)
            self.conv3 = StdConv2dSame(mid, cout, 1)
            self.norm3 = nn.GroupNorm(32, cout)

        def forward(self, x):
            sc = x if self.downsample is None else \
                self.downsample.norm(self.downsample.conv(x))
            y = F.relu(self.norm1(self.conv1(x)))
            y = F.relu(self.norm2(self.conv2(y)))
            y = self.norm3(self.conv3(y))
            return F.relu(y + sc)

    class Stage(nn.Module):
        def __init__(self, cin, mid, cout, depth, stride):
            super().__init__()
            blocks = []
            for b in range(depth):
                blocks.append(Bottleneck(cin if b == 0 else cout, mid, cout,
                                         stride if b == 0 else 1))
            self.blocks = nn.ModuleList(blocks)

        def forward(self, x):
            for b in self.blocks:
                x = b(x)
            return x

    class ResNetV2(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Module()
            self.stem.conv = StdConv2dSame(3, 64, 7, 2)
            self.stem.norm = nn.GroupNorm(32, 64)
            self.stages = nn.ModuleList([
                Stage(64, 64, 256, 3, 1),
                Stage(256, 128, 512, 4, 2),
                Stage(512, 256, 1024, 9, 2),
            ])

        def forward(self, x):
            x = F.relu(self.stem.norm(self.stem.conv(x)))
            x = F.max_pool2d(pad_same(x, 3, 2, value=float("-inf")), 3, 2)
            for s in self.stages:
                x = s(x)
            return x

    class Attention(nn.Module):
        def __init__(self, dim=768, heads=12):
            super().__init__()
            self.num_heads = heads
            self.qkv = nn.Linear(dim, dim * 3, bias=True)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                      C // self.num_heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)) * (C // self.num_heads) ** -0.5
            x = (att.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, dim=768):
            super().__init__()
            self.fc1 = nn.Linear(dim, 4 * dim)
            self.act = nn.GELU()
            self.fc2 = nn.Linear(4 * dim, dim)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(768, eps=1e-6)
            self.attn = Attention()
            self.norm2 = nn.LayerNorm(768, eps=1e-6)
            self.mlp = Mlp()

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class MiniHybridViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Module()
            self.patch_embed.backbone = ResNetV2()
            self.patch_embed.proj = nn.Conv2d(1024, 768, 1)
            self.cls_token = nn.Parameter(torch.zeros(1, 1, 768))
            self.pos_embed = nn.Parameter(torch.zeros(1, 577, 768))
            self.pos_drop = nn.Dropout(0.0)
            self.blocks = nn.ModuleList([Block() for _ in range(12)])
            self.norm = nn.LayerNorm(768, eps=1e-6)

    return MiniHybridViT


def _load_vendored_dpt(torch):
    """Import the vendored midas package with a timm stub injected."""
    standin_cls = _build_torch_standin(torch)
    timm_stub = types.ModuleType("timm")

    def create_model(name, pretrained=False, **kw):
        assert name == "vit_base_resnet50_384", name
        return standin_cls()

    timm_stub.create_model = create_model
    sys.modules["timm"] = timm_stub

    pkg = types.ModuleType("refmidas")
    pkg.__path__ = [REF]
    sys.modules["refmidas"] = pkg

    def load(modname):
        spec = importlib.util.spec_from_file_location(
            f"refmidas.{modname}", os.path.join(REF, f"{modname}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmidas.{modname}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("base_model")
    load("vit")
    load("blocks")
    return load("dpt_depth")


@pytest.mark.parametrize("num_channels", [1, 3])
def test_dpt_matches_vendored_torch(num_channels):
    torch = pytest.importorskip("torch")
    dpt_depth = _load_vendored_dpt(torch)

    import jax.numpy as jnp
    from perf_tpu.priors.dpt import DPTHybrid, convert_dpt_state_dict

    torch.manual_seed(0)
    model_t = dpt_depth.DPTDepthModel(
        backbone="vitb_rn50_384", num_channels=num_channels,
        non_negative=(num_channels == 1)).eval()
    # randomize EVERY parameter (incl. norm scales/biases, cls/pos tokens) so
    # a swapped scale/bias or a missed leaf cannot pass silently
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in model_t.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    x_t = torch.randn(2, 3, 192, 192, generator=g)
    with torch.no_grad():
        y_t = model_t(x_t).numpy()
    if y_t.ndim == 3:            # DPTDepthModel squeezes the channel dim
        y_t = y_t[:, None]

    variables = convert_dpt_state_dict(model_t.state_dict())
    model_j = DPTHybrid(num_channels=num_channels,
                        non_negative=(num_channels == 1))
    y_j = model_j.apply(variables, jnp.asarray(
        x_t.numpy().transpose(0, 2, 3, 1)))
    y_j = np.asarray(y_j).transpose(0, 3, 1, 2)

    assert y_j.shape == y_t.shape, (y_j.shape, y_t.shape)
    assert np.abs(y_t).max() > 1e-3  # non-degenerate output
    # outputs reach ~15; observed max |diff| ~1.2e-3 (f32 accumulation order)
    np.testing.assert_allclose(y_j, y_t, atol=5e-3, rtol=1e-3)
