"""Structural + parity tests for the Flax SD2 inpainting stack."""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perf_tpu.inpaint.diffusion import (
    UNetModel, VAEEncoder, VAEDecoder, OpenCLIPText, DiffusionInpainterBackend,
    empty_prompt_tokens, make_ddim_schedule, Z_CHANNELS, TEXT_CTX, TEXT_WIDTH,
)


def test_unet_shapes():
    m = UNetModel()
    x = jnp.zeros((1, 32, 32, 9))
    ctx = jnp.zeros((1, TEXT_CTX, 1024))
    v = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx)
    out = m.apply(v, x, jnp.full((1,), 500.0), ctx)
    assert out.shape == (1, 32, 32, 4)
    assert np.isfinite(np.asarray(out)).all()
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(v))
    # SD2 UNet is ~865M params
    assert 8.0e8 < n_params < 9.5e8, n_params / 1e6


def test_vae_roundtrip_shapes():
    enc = VAEEncoder()
    dec = VAEDecoder()
    x = jnp.zeros((1, 64, 64, 3))
    ve = enc.init(jax.random.PRNGKey(0), x)
    moments = enc.apply(ve, x)
    assert moments.shape == (1, 8, 8, 2 * Z_CHANNELS)
    vd = dec.init(jax.random.PRNGKey(1), moments[..., :Z_CHANNELS])
    out = dec.apply(vd, moments[..., :Z_CHANNELS])
    assert out.shape == (1, 64, 64, 3)


def test_text_tower_shapes():
    m = OpenCLIPText(layers=4)  # shallow for test speed; same structure
    toks = empty_prompt_tokens(2)
    v = m.init(jax.random.PRNGKey(0), toks)
    out = m.apply(v, toks)
    assert out.shape == (2, TEXT_CTX, TEXT_WIDTH)


def test_ddim_schedule_matches_ldm():
    t, a_t, a_prev = make_ddim_schedule(20)
    assert t.shape == (20,)
    assert float(t[0]) == 1.0 and float(t[-1]) == 951.0
    # alphas decrease with t
    assert (np.diff(np.asarray(a_t)) < 0).all()
    assert float(a_prev[0]) >= float(a_t[0])


def test_unet_matches_vendored_ldm():
    """Numerical parity vs the reference's torch UNet on converted random
    weights — skipped (conversion lands with real-weight validation); the
    vendored-import smoke keeps the door open."""
    if not os.path.isdir("/root/reference/ldm"):
        pytest.skip("reference ldm tree not available")
    sys.path.insert(0, "/root/reference")
    # stub omegaconf (openaimodel only isinstance-checks ListConfig)
    oc = types.ModuleType("omegaconf")
    lc = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    lc.ListConfig = ListConfig
    oc.listconfig = lc
    oc.ListConfig = ListConfig
    sys.modules.setdefault("omegaconf", oc)
    sys.modules.setdefault("omegaconf.listconfig", lc)
    try:
        from ldm.modules.diffusionmodules.openaimodel import UNetModel as TU
    except Exception as e:
        pytest.skip(f"vendored UNet import failed: {e}")
    import torch
    tu = TU(image_size=32, in_channels=9, out_channels=4, model_channels=320,
            attention_resolutions=[4, 2, 1], num_res_blocks=2,
            channel_mult=[1, 2, 4, 4], num_head_channels=64,
            use_spatial_transformer=True, use_linear_in_transformer=True,
            transformer_depth=1, context_dim=1024, legacy=False,
            use_checkpoint=False).eval()
    n_torch = sum(p.numel() for p in tu.parameters())
    m = UNetModel()
    v = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 32, 32, 9)),
                                        jnp.zeros((1,)),
                                        jnp.zeros((1, 77, 1024))),
                       jax.random.PRNGKey(0))
    n_flax = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(v))
    # identical parameter counts => identical architecture skeleton
    assert n_torch == n_flax, (n_torch, n_flax)
