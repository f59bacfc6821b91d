"""Checkpoint state-dict manifests.

``perf_tpu/manifests/*.json`` record the exact key -> shape layout of the
published checkpoints the reference loads (big-lama.ckpt,
omnidata_dpt_{depth,normal}_v2.ckpt, 512-inpainting-ema.ckpt — reference
``lama_inpainter.py:15-28``, ``omnidata_predictor.py:38-49``,
``diffusion_local_inpainter.py:82-83``). They are generated from the
vendored torch model code at the published configs (tools/gen_manifests.py),
so a state dict that validates here is exactly what the converters were
parity-tested on — real-weight runs are load-and-go.
"""

from __future__ import annotations

import json
import os

MANIFEST_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "manifests")

# keys a real checkpoint may carry beyond the manifest without concern:
# training-time bookkeeping our inference stacks never read
_BENIGN_PATTERNS = (
    "num_batches_tracked",      # torch BN counters
    "model_ema.",               # EMA shadow copies
    "discriminator.",           # lama adversarial head
    "loss.",                    # VAE/posthoc loss nets (lpips etc.)
    "cond_stage_model.model.visual.",   # open_clip image tower (unused)
    "cond_stage_model.model.text_projection",   # unused: penultimate layer
    "cond_stage_model.model.logit_scale",
    "val_evaluator.", "test_evaluator.",  # lama trainer metrics
    # DDPM schedule buffers (ldm ddpm.py:155-175) — recomputed by our DDIM
    "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_variance", "posterior_log_variance", "posterior_mean_coef",
    "scale_factor", "logvar", "lvlb_weights", "attn_mask",
)


def load_manifest(name: str) -> dict:
    with open(os.path.join(MANIFEST_DIR, name + ".json")) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


def validate_state_dict(sd: dict, name: str, strict: bool = True) -> dict:
    """Compare a loaded checkpoint ``state_dict`` against the manifest.

    Returns {"missing": [...], "extra": [...], "mismatched": [(k, got,
    want)]}; raises ValueError when strict and the checkpoint is missing
    manifest keys or has shape mismatches (extra keys beyond the benign
    patterns are reported, never fatal — published checkpoints carry
    trainer baggage).
    """
    man = load_manifest(name)
    missing = [k for k in man if k not in sd]
    mismatched = [(k, tuple(sd[k].shape), man[k]) for k in man
                  if k in sd and tuple(sd[k].shape) != man[k]]
    extra = [k for k in sd if k not in man
             and not any(p in k for p in _BENIGN_PATTERNS)]
    report = {"missing": missing, "extra": extra, "mismatched": mismatched}
    if strict and (missing or mismatched):
        detail = "; ".join(
            [f"missing {len(missing)} keys (e.g. {missing[:3]})"] * bool(missing)
            + [f"{len(mismatched)} shape mismatches (e.g. {mismatched[:2]})"]
            * bool(mismatched))
        raise ValueError(f"checkpoint does not match manifest '{name}': "
                         f"{detail}")
    return report


def random_state_dict(name: str, seed: int = 0, scale: float = 0.02) -> dict:
    """Shape-faithful random numpy state dict for a manifest (tests)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    return {k: rng.normal(0.0, scale, s).astype(np.float32)
            for k, s in load_manifest(name).items()}
