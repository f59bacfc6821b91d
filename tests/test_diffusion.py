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


def test_unet_numerical_parity_with_vendored_ldm():
    """Convert RANDOM torch weights and compare forward outputs."""
    if not os.path.isdir("/root/reference/ldm"):
        pytest.skip("reference ldm tree not available")
    sys.path.insert(0, "/root/reference")
    oc = types.ModuleType("omegaconf")
    lc = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    lc.ListConfig = ListConfig
    oc.listconfig = lc
    oc.ListConfig = ListConfig
    sys.modules.setdefault("omegaconf", oc)
    sys.modules.setdefault("omegaconf.listconfig", lc)
    torch = pytest.importorskip("torch")
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TU
    from perf_tpu.inpaint.diffusion import convert_sd_unet

    torch.manual_seed(0)
    tu = TU(image_size=32, in_channels=9, out_channels=4, model_channels=320,
            attention_resolutions=[4, 2, 1], num_res_blocks=2,
            channel_mult=[1, 2, 4, 4], num_head_channels=64,
            use_spatial_transformer=True, use_linear_in_transformer=True,
            transformer_depth=1, context_dim=1024, legacy=False,
            use_checkpoint=False).eval()
    x_t = torch.randn(1, 9, 32, 32)
    t_t = torch.tensor([500.0])
    ctx_t = torch.randn(1, 77, 1024)
    with torch.no_grad():
        y_t = tu(x_t, t_t, ctx_t).numpy()

    variables = convert_sd_unet(
        {"model.diffusion_model." + k: v for k, v in tu.state_dict().items()})
    m = UNetModel()
    y_j = m.apply(variables, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)),
                  jnp.asarray([500.0]), jnp.asarray(ctx_t.numpy()))
    y_j = np.asarray(y_j).transpose(0, 3, 1, 2)
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, atol=5e-4, rtol=1e-3)


def test_vae_converter_tree_matches_modules():
    """Converter trees must exactly match the flax modules' variable trees."""
    from perf_tpu.inpaint.diffusion import _convert_vae_half

    enc = VAEEncoder()
    dec = VAEDecoder()
    v_enc = jax.eval_shape(lambda k: enc.init(k, jnp.zeros((1, 64, 64, 3))),
                           jax.random.PRNGKey(0))
    v_dec = jax.eval_shape(lambda k: dec.init(k, jnp.zeros((1, 8, 8, 4))),
                           jax.random.PRNGKey(0))

    # synthesize a torch-style sd with correct shapes by walking the trees
    def synth(tree, kind):
        sd = {}

        def walk(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, path + (k,))
                return
            sd[path] = node.shape
        walk(tree["params"], ())
        return sd

    # run the converter against a fabricated state dict: build it from the
    # inverse transposes the converter applies
    import re
    sd = {}

    def add_from(tree_vars, is_encoder):
        flat = jax.tree_util.tree_flatten_with_path(tree_vars)[0]
        for keypath, leaf in flat:
            path = tuple(getattr(k, "key", None) for k in keypath)[1:]
            name = path[0]
            tk = None
            half = "encoder" if is_encoder else "decoder"
            shape = tuple(leaf.shape)
            leafname = path[-1]
            if name == "conv_in":
                tk = f"first_stage_model.{half}.conv_in"
            elif name == "quant_conv":
                tk = "first_stage_model.quant_conv"
            elif name == "post_quant_conv":
                tk = "first_stage_model.post_quant_conv"
            elif name in ("norm_out",):
                tk = f"first_stage_model.{half}.norm_out"
            elif name == "conv_out":
                tk = f"first_stage_model.{half}.conv_out"
            elif name == "mid_attn":
                sub = path[1]
                tk = f"first_stage_model.{half}.mid.attn_1." + (
                    "norm" if sub == "norm" else sub)
            elif name in ("mid_block1", "mid_block2"):
                blk = "block_1" if name.endswith("1") else "block_2"
                sub = {"norm1": "norm1", "conv1": "conv1", "norm2": "norm2",
                       "conv2": "conv2", "nin": "nin_shortcut"}[path[1]]
                tk = f"first_stage_model.{half}.mid.{blk}.{sub}"
            else:
                m = re.match(r"(down|up)(\d)_(block(\d)|ds|us)", name)
                lvl, what = m.group(2), m.group(3)
                if what in ("ds", "us"):
                    tk = (f"first_stage_model.{half}.{m.group(1)}.{lvl}."
                          + ("downsample" if what == "ds" else "upsample")
                          + ".conv")
                else:
                    sub = {"norm1": "norm1", "conv1": "conv1",
                           "norm2": "norm2", "conv2": "conv2",
                           "nin": "nin_shortcut"}[path[1]]
                    tk = (f"first_stage_model.{half}.{m.group(1)}.{lvl}"
                          f".block.{what[5:]}.{sub}")
            if leafname == "kernel":
                sd[tk + ".weight"] = np.zeros(
                    (shape[3], shape[2], shape[0], shape[1]), np.float32)
            elif leafname == "bias" and "GroupNorm" not in path:
                sd[tk + ".bias"] = np.zeros(shape, np.float32)
            elif leafname == "scale":
                sd[tk + ".weight"] = np.zeros(shape, np.float32)
            elif leafname == "bias":
                sd[tk + ".bias"] = np.zeros(shape, np.float32)

    add_from(v_enc, True)
    add_from(v_dec, False)
    conv_enc = _convert_vae_half(sd, "first_stage_model.", True)
    conv_dec = _convert_vae_half(sd, "first_stage_model.", False)
    shapes = lambda t: jax.tree_util.tree_map(lambda x: tuple(x.shape), t)
    assert shapes(conv_enc) == shapes(jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape), v_enc))
    assert shapes(conv_dec) == shapes(jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape), v_dec))


def test_text_converter_tree_matches_module():
    from perf_tpu.inpaint.diffusion import convert_sd_text, TEXT_LAYERS
    m = OpenCLIPText()
    v = jax.eval_shape(lambda k: m.init(k, empty_prompt_tokens(1)),
                       jax.random.PRNGKey(0))
    sd = {}
    pre = "cond_stage_model.model."
    sd[pre + "token_embedding.weight"] = np.zeros((49408, 1024), np.float32)
    sd[pre + "positional_embedding"] = np.zeros((77, 1024), np.float32)
    for i in range(TEXT_LAYERS):
        tk = pre + f"transformer.resblocks.{i}"
        for ln in ("ln_1", "ln_2"):
            sd[f"{tk}.{ln}.weight"] = np.zeros((1024,), np.float32)
            sd[f"{tk}.{ln}.bias"] = np.zeros((1024,), np.float32)
        sd[f"{tk}.attn.in_proj_weight"] = np.zeros((3072, 1024), np.float32)
        sd[f"{tk}.attn.in_proj_bias"] = np.zeros((3072,), np.float32)
        sd[f"{tk}.attn.out_proj.weight"] = np.zeros((1024, 1024), np.float32)
        sd[f"{tk}.attn.out_proj.bias"] = np.zeros((1024,), np.float32)
        sd[f"{tk}.mlp.c_fc.weight"] = np.zeros((4096, 1024), np.float32)
        sd[f"{tk}.mlp.c_fc.bias"] = np.zeros((4096,), np.float32)
        sd[f"{tk}.mlp.c_proj.weight"] = np.zeros((1024, 4096), np.float32)
        sd[f"{tk}.mlp.c_proj.bias"] = np.zeros((1024,), np.float32)
    sd[pre + "ln_final.weight"] = np.zeros((1024,), np.float32)
    sd[pre + "ln_final.bias"] = np.zeros((1024,), np.float32)
    conv = convert_sd_text(sd)
    shapes = lambda t: jax.tree_util.tree_map(lambda x: tuple(x.shape), t)
    ref = jax.tree_util.tree_map(lambda x: tuple(x.shape), v)
    assert shapes(conv) == ref
