"""SD2 stack numerical parity beyond the UNet (which has its own test).

- VAE encoder/decoder: vendored ``ldm.modules.diffusionmodules.model``
  Encoder/Decoder run UNMODIFIED with random weights at the real
  v2-inpainting config (``ldm/configs/stable-diffusion/
  v2-inpainting-inference.yaml:31-45``), converted and compared.
- Text tower: the vendored FrozenOpenCLIPEmbedder is a thin wrapper around
  open_clip (not in this env), so the stand-in is built from torch's own
  nn.MultiheadAttention — the exact module open_clip uses — with the real
  checkpoint key layout (``cond_stage_model.model.transformer.resblocks...``).
- DDIM loop: our lax.scan sampler vs the vendored ``DDIMSampler`` running a
  shared ANALYTIC eps-model (no weights to convert), eta=0 so both sides are
  deterministic. Validates timestep order, alpha pairing, pred_x0/dir_xt.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "ldm")),
                                reason="reference ldm tree not available")


def _setup_ldm_imports():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    oc = types.ModuleType("omegaconf")
    lc = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    lc.ListConfig = ListConfig
    oc.listconfig = lc
    oc.ListConfig = ListConfig
    sys.modules.setdefault("omegaconf", oc)
    sys.modules.setdefault("omegaconf.listconfig", lc)


def _randomize(torch, module, seed=1, scale=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


def test_vae_encoder_parity():
    torch = pytest.importorskip("torch")
    _setup_ldm_imports()
    from ldm.modules.diffusionmodules.model import Encoder

    import jax.numpy as jnp
    from perf_tpu.inpaint.diffusion import VAEEncoder, _convert_vae_half

    enc_t = Encoder(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                    attn_resolutions=[], in_channels=3, resolution=256,
                    z_channels=4, double_z=True).eval()
    quant_t = torch.nn.Conv2d(8, 8, 1)
    _randomize(torch, enc_t)
    _randomize(torch, quant_t, seed=2)

    g = torch.Generator().manual_seed(3)
    x_t = torch.randn(1, 3, 64, 64, generator=g)
    with torch.no_grad():
        y_t = quant_t(enc_t(x_t)).numpy()

    sd = {f"first_stage_model.encoder.{k}": v
          for k, v in enc_t.state_dict().items()}
    sd.update({f"first_stage_model.quant_conv.{k}": v
               for k, v in quant_t.state_dict().items()})
    variables = _convert_vae_half(sd, "first_stage_model.", True)
    y_j = VAEEncoder().apply(variables,
                             jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)))
    y_j = np.asarray(y_j).transpose(0, 3, 1, 2)
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-3)


def test_vae_decoder_parity():
    torch = pytest.importorskip("torch")
    _setup_ldm_imports()
    from ldm.modules.diffusionmodules.model import Decoder

    import jax.numpy as jnp
    from perf_tpu.inpaint.diffusion import VAEDecoder, _convert_vae_half

    dec_t = Decoder(ch=128, out_ch=3, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                    attn_resolutions=[], in_channels=3, resolution=256,
                    z_channels=4).eval()
    post_t = torch.nn.Conv2d(4, 4, 1)
    _randomize(torch, dec_t)
    _randomize(torch, post_t, seed=2)

    g = torch.Generator().manual_seed(3)
    z_t = torch.randn(1, 4, 8, 8, generator=g)
    with torch.no_grad():
        y_t = dec_t(post_t(z_t)).numpy()

    sd = {f"first_stage_model.decoder.{k}": v
          for k, v in dec_t.state_dict().items()}
    sd.update({f"first_stage_model.post_quant_conv.{k}": v
               for k, v in post_t.state_dict().items()})
    variables = _convert_vae_half(sd, "first_stage_model.", False)
    y_j = VAEDecoder().apply(variables,
                             jnp.asarray(z_t.numpy().transpose(0, 2, 3, 1)))
    y_j = np.asarray(y_j).transpose(0, 3, 1, 2)
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-3)


def test_text_tower_parity():
    torch = pytest.importorskip("torch")
    nn = torch.nn

    import jax.numpy as jnp
    from perf_tpu.inpaint.diffusion import (
        OpenCLIPText, convert_sd_text, empty_prompt_tokens, TEXT_CTX)

    LAYERS, WIDTH, HEADS = 4, 1024, 16

    class Resblock(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(WIDTH)
            self.attn = nn.MultiheadAttention(WIDTH, HEADS)
            self.ln_2 = nn.LayerNorm(WIDTH)
            self.mlp = nn.Module()
            self.mlp.c_fc = nn.Linear(WIDTH, 4 * WIDTH)
            self.mlp.c_proj = nn.Linear(4 * WIDTH, WIDTH)

        def forward(self, x, attn_mask):
            y = self.ln_1(x)
            x = x + self.attn(y, y, y, need_weights=False,
                              attn_mask=attn_mask)[0]
            y = self.ln_2(x)
            return x + self.mlp.c_proj(
                torch.nn.functional.gelu(self.mlp.c_fc(y)))

    class TextStandin(nn.Module):
        """open_clip text tower layout (LND, causal mask, penultimate tap)."""

        def __init__(self):
            super().__init__()
            self.token_embedding = nn.Embedding(49408, WIDTH)
            self.positional_embedding = nn.Parameter(torch.empty(TEXT_CTX,
                                                                 WIDTH))
            self.transformer = nn.Module()
            self.transformer.resblocks = nn.ModuleList(
                [Resblock() for _ in range(LAYERS)])
            self.ln_final = nn.LayerNorm(WIDTH)

        def forward(self, tokens):
            mask = torch.full((TEXT_CTX, TEXT_CTX), float("-inf"))
            mask.triu_(1)
            x = self.token_embedding(tokens) + self.positional_embedding
            x = x.permute(1, 0, 2)           # LND
            for blk in self.transformer.resblocks[:-1]:  # penultimate
                x = blk(x, mask)
            return self.ln_final(x.permute(1, 0, 2))

    model_t = TextStandin().eval()
    _randomize(torch, model_t)
    toks = np.asarray(empty_prompt_tokens(2))
    with torch.no_grad():
        y_t = model_t(torch.tensor(toks, dtype=torch.long)).numpy()

    sd = {f"cond_stage_model.model.{k}": v
          for k, v in model_t.state_dict().items()}
    variables = convert_sd_text(sd, layers=LAYERS)
    y_j = OpenCLIPText(layers=LAYERS).apply(variables, jnp.asarray(toks))
    y_j = np.asarray(y_j)
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-3)


def test_ddim_loop_parity_vs_vendored_sampler():
    torch = pytest.importorskip("torch")
    _setup_ldm_imports()
    from ldm.models.diffusion.ddim import DDIMSampler

    import jax
    import jax.numpy as jnp
    from perf_tpu.inpaint.diffusion import ddim_sample

    STEPS = 5
    rng = np.random.default_rng(0)
    x_T = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    cc = rng.standard_normal((1, 5, 8, 8)).astype(np.float32)

    class AnalyticLDM:
        """Duck-typed LatentInpaintDiffusion: eps is a closed-form function
        both frameworks evaluate identically."""

        def __init__(self):
            betas = np.linspace(0.00085 ** 0.5, 0.0120 ** 0.5, 1000,
                                dtype=np.float64) ** 2
            ac = np.cumprod(1.0 - betas)
            self.num_timesteps = 1000
            self.betas = torch.tensor(betas, dtype=torch.float32)
            self.alphas_cumprod = torch.tensor(ac, dtype=torch.float32)
            self.alphas_cumprod_prev = torch.tensor(
                np.append(1.0, ac[:-1]), dtype=torch.float32)
            self.device = torch.device("cpu")
            self.parameterization = "eps"

        def apply_model(self, x, t, cond):
            c_concat = torch.cat(cond["c_concat"], dim=1)
            xin = torch.cat([x, c_concat], dim=1)
            tt = t.float().view(-1, 1, 1, 1)
            return torch.sin(2.0 * x + 0.3 * xin.mean(dim=1, keepdim=True)
                             + 0.002 * tt)

    model = AnalyticLDM()
    sampler = DDIMSampler(model, device=torch.device("cpu"))
    ctx = torch.zeros(1, 77, 1024)
    with torch.no_grad():
        z_t, _ = sampler.sample(
            STEPS, 1, (4, 8, 8),
            conditioning={"c_concat": [torch.tensor(cc)],
                          "c_crossattn": [ctx]},
            eta=0.0, verbose=False, unconditional_guidance_scale=1.0,
            x_T=torch.tensor(x_T))
    z_t = z_t.numpy()

    def unet_apply(variables, xin, t, context):
        x = xin[..., :4]
        return jnp.sin(2.0 * x + 0.3 * jnp.mean(xin, axis=-1, keepdims=True)
                       + 0.002 * t[:, None, None, None])

    z_j = ddim_sample(unet_apply, None,
                      jnp.asarray(x_T.transpose(0, 2, 3, 1)),
                      jnp.asarray(cc.transpose(0, 2, 3, 1)),
                      None, jax.random.PRNGKey(0), ddim_steps=STEPS, eta=0.0)
    z_j = np.asarray(z_j).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(z_j, z_t, atol=1e-5, rtol=1e-5)
