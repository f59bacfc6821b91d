"""One-shot real-checkpoint load-and-forward validation (VERDICT r2 #7).

For each published checkpoint present in --ckpt-dir this script loads it,
hard-validates every tensor name/shape against the repo manifest
(``perf_tpu/manifests/*.json``), converts to the Flax layout, runs ONE real
forward on a synthetic input, and writes the outputs + summary stats.

Reference checkpoint sources (cannot be downloaded in this environment —
zero egress; run this wherever the files exist):
- omnidata_dpt_depth_v2.ckpt / omnidata_dpt_normal_v2.ckpt
  (``modules/geo_predictors/omnidata/.../omnidata_predictor.py:38``)
- big-lama.ckpt (``modules/inpainters/lama_inpainter.py:15-28``)
- 512-inpainting-ema.ckpt
  (``modules/inpainters/diffusion_local_inpainter.py:82-83``)
- bpe_simple_vocab_16e6.txt.gz (open_clip; enables non-empty prompts)

Usage:
    python tools/validate_real_weights.py [--ckpt-dir pre_checkpoints]
        [--out /tmp/real_weights_vis] [--cpu]

Exit code 0 with a per-checkpoint PRESENT/ABSENT report; any present
checkpoint that fails validation or produces non-finite outputs exits 1.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default="./pre_checkpoints")
    ap.add_argument("--out", default="/tmp/real_weights_vis")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from perf_tpu.utils import render_cube_room_pano
    from perf_tpu.utils.io import write_image

    os.makedirs(args.out, exist_ok=True)
    pano = render_cube_room_pano(jnp.eye(4), 256, 512)
    img384 = jax.image.resize(pano["rgb"][:, :256], (384, 384, 3), "linear")
    failures, ran = [], []

    def report(name, fn):
        path = os.path.join(args.ckpt_dir, name)
        if not os.path.exists(path):
            print(f"[ABSENT ] {name}")
            return
        try:
            fn()
            ran.append(name)
            print(f"[OK     ] {name}")
        except Exception as e:  # noqa: BLE001 — summarize all failures
            failures.append((name, e))
            print(f"[FAILED ] {name}: {e}")

    def dpt_depth():
        from perf_tpu.priors.dpt import DPTDepthBackend
        out = DPTDepthBackend(args.ckpt_dir).predict_depth(img384[None])
        d = np.asarray(out)[0]
        assert np.isfinite(d).all() and d.std() > 1e-4, (d.min(), d.max())
        write_image(os.path.join(args.out, "dpt_depth.png"),
                    (d - d.min()) / (d.ptp() + 1e-6))
        print(f"    depth range [{d.min():.4f}, {d.max():.4f}] "
              f"std {d.std():.4f}")

    def dpt_normal():
        from perf_tpu.priors.dpt import DPTNormalBackend
        out = DPTNormalBackend(args.ckpt_dir).predict_normal(img384[None])
        n = np.asarray(out)[0]
        assert np.isfinite(n).all() and n.std() > 1e-4
        write_image(os.path.join(args.out, "dpt_normal.png"), n)
        print(f"    normal mean {n.mean(axis=(0, 1))}")

    def lama():
        from perf_tpu.inpaint.lama import LamaInpainterBackend
        mask = np.zeros((256, 512), np.float32)
        mask[96:160, 192:320] = 1.0
        out = LamaInpainterBackend(args.ckpt_dir).inpaint(
            pano["rgb"], jnp.asarray(mask))
        o = np.asarray(out)
        assert np.isfinite(o).all() and 0.0 <= o.min() and o.max() <= 1.0
        write_image(os.path.join(args.out, "lama_inpaint.png"), o)
        hole = o[96:160, 192:320]
        print(f"    inpainted hole std {hole.std():.4f}")

    def sd2():
        from perf_tpu.inpaint.diffusion import DiffusionInpainterBackend
        img = jax.image.resize(pano["rgb"][:, :256], (512, 512, 3), "linear")
        mask = np.zeros((512, 512), np.float32)
        mask[192:320, 192:320] = 1.0
        be = DiffusionInpainterBackend(args.ckpt_dir, ddim_steps=20)
        out = be.inpaint(img, jnp.asarray(mask))
        o = np.asarray(out)
        assert np.isfinite(o).all()
        write_image(os.path.join(args.out, "sd2_inpaint.png"), o)
        print(f"    hole std {o[192:320, 192:320].std():.4f}")

    def bpe():
        from perf_tpu.inpaint.tokenizer import ClipBPETokenizer, SOT, EOT
        tok = ClipBPETokenizer(
            os.path.join(args.ckpt_dir, "bpe_simple_vocab_16e6.txt.gz"))
        empty = tok([""])
        assert list(empty[0, :2]) == [SOT, EOT], empty[0, :4]
        ids = tok(["a photo of a cozy room"])[0]
        n = int((ids != 0).sum())
        assert ids[0] == SOT and ids[n - 1] == EOT and n > 4
        print(f"    'a photo of a cozy room' -> {list(ids[:n])}")

    report("omnidata_dpt_depth_v2.ckpt", dpt_depth)
    report("omnidata_dpt_normal_v2.ckpt", dpt_normal)
    report("big-lama.ckpt", lama)
    report("512-inpainting-ema.ckpt", sd2)
    report("bpe_simple_vocab_16e6.txt.gz", bpe)

    print(f"\nran {len(ran)} checkpoint validations, "
          f"{len(failures)} failures; outputs in {args.out}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
