"""Numerical parity of the Flax LaMa generator vs the vendored torch one.

Uses RANDOM weights converted through ``convert_lama_state_dict`` (no
big-lama checkpoint ships in this environment); if conversion + forward agree
on random weights, they agree on the real checkpoint too. Skipped when the
reference tree is unavailable.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/modules/inpainters/lama"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference LaMa tree not available")


def _load_torch_ffc():
    """Import the vendored ffc.py with its absolute-import chain stubbed."""
    base = "modules.inpainters.lama.saicinpainting"
    for name in ["modules", "modules.inpainters", "modules.inpainters.lama",
                 base, base + ".training", base + ".training.modules"]:
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package so submodule imports resolve
        sys.modules.setdefault(name, mod)
    # stub heavy third-party deps the module chain references but the
    # generator never executes
    pl = types.ModuleType("pytorch_lightning")
    pl.seed_everything = lambda *a, **k: None
    sys.modules.setdefault("pytorch_lightning", pl)
    kornia = types.ModuleType("kornia")
    kg = types.ModuleType("kornia.geometry")
    kgt = types.ModuleType("kornia.geometry.transform")
    kgt.rotate = lambda x, *a, **k: x
    kg.transform = kgt
    kornia.geometry = kg
    sys.modules.setdefault("kornia", kornia)
    sys.modules.setdefault("kornia.geometry", kg)
    sys.modules.setdefault("kornia.geometry.transform", kgt)

    def load(modname, relpath):
        spec = importlib.util.spec_from_file_location(
            modname, os.path.join(REF, relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        return mod

    # ffc only needs get_shape from utils; the real utils drags in
    # pytorch_lightning at import time, so provide a functional stub.
    utils_stub = types.ModuleType(base + ".utils")
    utils_stub.get_shape = lambda t: tuple(t.shape)
    sys.modules[base + ".utils"] = utils_stub
    load(base + ".training.modules.depthwise_sep_conv",
         "saicinpainting/training/modules/depthwise_sep_conv.py")
    load(base + ".training.modules.multidilated_conv",
         "saicinpainting/training/modules/multidilated_conv.py")
    load(base + ".training.modules.base", "saicinpainting/training/modules/base.py")
    load(base + ".training.modules.spatial_transform",
         "saicinpainting/training/modules/spatial_transform.py")
    load(base + ".training.modules.squeeze_excitation",
         "saicinpainting/training/modules/squeeze_excitation.py")
    return load(base + ".training.modules.ffc",
                "saicinpainting/training/modules/ffc.py")


def test_lama_generator_matches_torch():
    torch = pytest.importorskip("torch")
    try:
        ffc = _load_torch_ffc()
    except Exception as e:
        pytest.skip(f"vendored ffc import failed: {e}")

    import jax.numpy as jnp
    from perf_tpu.inpaint.lama import (
        FFCResNetGenerator, convert_lama_state_dict, N_BLOCKS,
    )

    torch.manual_seed(0)
    g = ffc.FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=3, n_blocks=N_BLOCKS,
        add_out_act="sigmoid",
        init_conv_kwargs={"ratio_gin": 0, "ratio_gout": 0, "enable_lfu": False},
        downsample_conv_kwargs={"ratio_gin": 0, "ratio_gout": 0,
                                "enable_lfu": False},
        resnet_conv_kwargs={"ratio_gin": 0.75, "ratio_gout": 0.75,
                            "enable_lfu": False},
    ).eval()

    x_t = torch.randn(1, 4, 64, 64)
    with torch.no_grad():
        y_t = g(x_t).numpy()

    variables = convert_lama_state_dict(
        {f"model.{k}" if not k.startswith("model.") else k: v
         for k, v in g.model.state_dict().items()})
    model = FFCResNetGenerator()
    y_j = model.apply(variables, jnp.asarray(
        x_t.numpy().transpose(0, 2, 3, 1)))
    y_j = np.asarray(y_j).transpose(0, 3, 1, 2)

    assert y_j.shape == y_t.shape, (y_j.shape, y_t.shape)
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-3)
