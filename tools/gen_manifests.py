"""Generate real-checkpoint state-dict manifests (key -> shape) for the
three model stacks, from the VENDORED torch model code instantiated at the
published checkpoints' configs:

- big-lama.ckpt        (reference ``modules/inpainters/lama_inpainter.py:15-28``
                        + ``pre_checkpoints/big-lama-config.yaml``)
- omnidata_dpt_{depth,normal}_v2.ckpt
                       (``modules/geo_predictors/omnidata_predictor.py:38-49``)
- 512-inpainting-ema.ckpt
                       (``ldm/configs/stable-diffusion/v2-inpainting-inference.yaml``)

The torch module trees define the exact key/shape layout of the published
checkpoints (weights differ, metadata doesn't), so converters validated
against these manifests are load-and-go when real weights appear.

    python tools/gen_manifests.py          # writes perf_tpu/manifests/*.json
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

OUT = os.path.join(ROOT, "perf_tpu", "manifests")


def dump(name, sd):
    man = {k: list(v.shape) for k, v in sd.items()}
    path = os.path.join(OUT, name + ".json")
    with open(path, "w") as f:
        json.dump(man, f, indent=0, sort_keys=True)
    print(f"{path}: {len(man)} keys")


def lama(torch):
    from test_lama_parity import _load_torch_ffc
    from perf_tpu.inpaint.lama import N_BLOCKS
    ffc = _load_torch_ffc()
    g = ffc.FFCResNetGenerator(
        input_nc=4, output_nc=3, ngf=64, n_downsampling=3, n_blocks=N_BLOCKS,
        add_out_act="sigmoid",
        init_conv_kwargs={"ratio_gin": 0, "ratio_gout": 0, "enable_lfu": False},
        downsample_conv_kwargs={"ratio_gin": 0, "ratio_gout": 0,
                                "enable_lfu": False},
        resnet_conv_kwargs={"ratio_gin": 0.75, "ratio_gout": 0.75,
                            "enable_lfu": False})
    # big-lama.ckpt stores the whole trainer; generator keys sit under
    # "generator." (loaded strict=False, lama_inpainter.py:28)
    dump("lama", {"generator." + k: v for k, v in g.state_dict().items()})


def dpt(torch):
    from test_dpt_parity import _load_vendored_dpt
    dpt_depth = _load_vendored_dpt(torch)
    for name, ch in (("dpt_depth", 1), ("dpt_normal", 3)):
        m = dpt_depth.DPTDepthModel(backbone="vitb_rn50_384", num_channels=ch)
        # omnidata ckpt: state_dict keys carry a "model." prefix
        # (omnidata_predictor.py:43-46 strips k[6:])
        dump(name, {"model." + k: v for k, v in m.state_dict().items()})


def sd2(torch):
    from test_sd2_parity import _setup_ldm_imports
    _setup_ldm_imports()
    from ldm.modules.diffusionmodules.openaimodel import UNetModel
    from ldm.modules.diffusionmodules.model import Encoder, Decoder

    # v2-inpainting-inference.yaml unet_config.params
    unet = UNetModel(
        use_checkpoint=False, image_size=32, in_channels=9, out_channels=4,
        model_channels=320, attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_head_channels=64,
        use_spatial_transformer=True, use_linear_in_transformer=True,
        transformer_depth=1, context_dim=1024, legacy=False)
    sd = {"model.diffusion_model." + k: v for k, v in unet.state_dict().items()}

    # first_stage_config ddconfig (AutoencoderKL = Encoder + Decoder +
    # quant_conv + post_quant_conv, ldm/models/autoencoder.py:13)
    dd = dict(double_z=True, z_channels=4, resolution=256, in_channels=3,
              out_ch=3, ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
              attn_resolutions=[], dropout=0.0)
    enc, dec = Encoder(**dd), Decoder(**dd)
    sd.update({"first_stage_model.encoder." + k: v
               for k, v in enc.state_dict().items()})
    sd.update({"first_stage_model.decoder." + k: v
               for k, v in dec.state_dict().items()})
    sd.update({"first_stage_model.quant_conv." + k: v
               for k, v in torch.nn.Conv2d(8, 8, 1).state_dict().items()})
    sd.update({"first_stage_model.post_quant_conv." + k: v
               for k, v in torch.nn.Conv2d(4, 4, 1).state_dict().items()})

    # cond_stage: FrozenOpenCLIPEmbedder wraps open_clip's text tower
    # (ViT-H text cfg: width 1024, heads 16, layers 24, vocab 49408, ctx 77);
    # open_clip is not vendored, so lay the keys out per its naming. The
    # tower is pure LayerNorm/MultiheadAttention/Linear — shapes follow.
    W, L = 1024, 24
    sd["cond_stage_model.model.token_embedding.weight"] = torch.empty(49408, W)
    sd["cond_stage_model.model.positional_embedding"] = torch.empty(77, W)
    for i in range(L):
        p = f"cond_stage_model.model.transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = torch.empty(W)
        sd[p + "ln_1.bias"] = torch.empty(W)
        sd[p + "attn.in_proj_weight"] = torch.empty(3 * W, W)
        sd[p + "attn.in_proj_bias"] = torch.empty(3 * W)
        sd[p + "attn.out_proj.weight"] = torch.empty(W, W)
        sd[p + "attn.out_proj.bias"] = torch.empty(W)
        sd[p + "ln_2.weight"] = torch.empty(W)
        sd[p + "ln_2.bias"] = torch.empty(W)
        sd[p + "mlp.c_fc.weight"] = torch.empty(4 * W, W)
        sd[p + "mlp.c_fc.bias"] = torch.empty(4 * W)
        sd[p + "mlp.c_proj.weight"] = torch.empty(W, 4 * W)
        sd[p + "mlp.c_proj.bias"] = torch.empty(W)
    sd["cond_stage_model.model.ln_final.weight"] = torch.empty(W)
    sd["cond_stage_model.model.ln_final.bias"] = torch.empty(W)
    # NOT in the manifest (benign extras, utils/manifest.py): the DDPM
    # schedule buffers (betas, alphas_cumprod, ... — ddpm.py:155-175,
    # recomputed by our DDIM), scale_factor, and open_clip's
    # text_projection/logit_scale (unused for penultimate-layer
    # conditioning). The manifest records exactly what the converters
    # consume, so it can't wrongly reject a real checkpoint.
    dump("sd2_inpaint", sd)


def main():
    import torch
    os.makedirs(OUT, exist_ok=True)
    with torch.no_grad():
        lama(torch)
        dpt(torch)
        sd2(torch)


if __name__ == "__main__":
    main()
