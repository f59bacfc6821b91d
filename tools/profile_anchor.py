"""Profile the per-anchor GEOMETRY stage (the round-3 perf target).

Round-2 record: ~21 min/anchor of geometry distillation at flagship scale
(BASELINE.md full-pipeline table) — the dominant pipeline cost. This tool
times the PanoJointPredictor stages (priors, distill phase 1/2, readback) at
flagship scale (2048x1024 pano, fake priors) across execution variants:

    python tools/profile_anchor.py --variant brick_analytic --iters 150
    python tools/profile_anchor.py --variant hash_ad_scan100 --iters 100
    python tools/profile_anchor.py --refiner --variant brick_analytic

Per-iteration costs extrapolate linearly to the production 2x1500 (joint) /
5000 (refiner) iteration counts; readback and prior costs are constant.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

VARIANTS = {
    # name: (encoding, grad_mode, scan_chunk)
    "hash_ad_scan100": ("hash", "ad", 100),
    "hash_ad": ("hash", "ad", 1),
    "hash_fd": ("hash", "fd", 1),
    "brick_analytic": ("brick", "analytic", 1),
    "brick_analytic_scan10": ("brick", "analytic", 10),
    "brick_analytic_scan100": ("brick", "analytic", 100),
    "brick_fd": ("brick", "fd", 1),
}


def read_timings(log_dir):
    out = {}
    path = os.path.join(log_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"].startswith("time/"):
                out[rec["tag"][5:]] = rec["value"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="brick_analytic",
                    choices=sorted(VARIANTS))
    ap.add_argument("--iters", type=int, default=100,
                    help="iters per phase for the timing run")
    ap.add_argument("--refiner", action="store_true",
                    help="profile PanoGeoRefiner instead of the joint")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--repeat", type=int, default=1,
                    help="call the predictor N times on one instance; later "
                         "calls reuse the jit cache (= per-anchor steady "
                         "state in the production runner)")
    ap.add_argument("--h", type=int, default=1024)
    ap.add_argument("--w", type=int, default=2048)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from perf_tpu.fields.sphere_field import SphereFieldConfig
    from perf_tpu.priors import (
        PanoJointPredictor, JointPredictorConfig,
        FakeCubeRoomDepthPredictor, FakeCubeRoomNormalPredictor,
        PanoGeoRefiner, RefinerConfig,
    )
    from perf_tpu.utils import render_cube_room_pano
    from perf_tpu.utils.metrics import MetricsWriter

    encoding, grad_mode, scan_chunk = VARIANTS[args.variant]
    h, w = args.h, args.w
    print(f"variant={args.variant} iters={args.iters} pano={w}x{h} "
          f"devices={jax.devices()}")

    pano = render_cube_room_pano(jnp.eye(4), h, w)
    log_dir = tempfile.mkdtemp(prefix="profile_anchor_")
    writer = MetricsWriter(log_dir)

    if args.refiner:
        cfg = RefinerConfig(
            n_iters=args.iters, scan_chunk=scan_chunk,
            field=SphereFieldConfig(fine_res=4096, weight_norm=True,
                                    output="raw", encoding=encoding,
                                    grad_mode=grad_mode))
        ref = PanoGeoRefiner(cfg=cfg, writer=writer)
        for rep in range(args.repeat):
            t0 = time.perf_counter()
            dist, normal = ref.refine(pano["distance"], pano["normal"])
            total = time.perf_counter() - t0
            writer.flush()
            t = read_timings(log_dir)
            per_iter = t.get("refiner_distill_sec", 0.0) / max(args.iters, 1)
            tag = "cold" if rep == 0 else "warm"
            print(f"[{tag}] total {total:.1f}s | distill "
                  f"{t.get('refiner_distill_sec', 0):.1f}s "
                  f"({per_iter * 1e3:.1f} ms/iter) | readback "
                  f"{t.get('refiner_readback_sec', 0):.1f}s")
            full = per_iter * 5000 + t.get("refiner_readback_sec", 0.0)
            print(f"[{tag}] extrapolated production refine (5000 iters): "
                  f"{full / 60:.1f} min")
    else:
        cfg = JointPredictorConfig(
            iters_per_phase=args.iters, scan_chunk=scan_chunk,
            field=SphereFieldConfig(fine_res=2048, encoding=encoding,
                                    grad_mode=grad_mode))
        pred = PanoJointPredictor(FakeCubeRoomDepthPredictor(),
                                  FakeCubeRoomNormalPredictor(),
                                  cfg=cfg, writer=writer)
        for rep in range(args.repeat):
            t0 = time.perf_counter()
            dist, normal = pred(pano["rgb"], jnp.ones((h, w, 1)),
                                jnp.ones((h, w)), reg_loss_weight=0.0,
                                normal_loss_weight=5e-2,
                                normal_tv_loss_weight=5e-2)
            total = time.perf_counter() - t0
            writer.flush()
            t = read_timings(log_dir)
            p1 = t.get("joint_distill_p1_sec", 0.0)
            p2 = t.get("joint_distill_p2_sec", 0.0)
            per_iter = (p1 + p2) / max(2 * args.iters, 1)
            tag = "cold" if rep == 0 else "warm"
            print(f"[{tag}] total {total:.1f}s | priors "
                  f"{t.get('joint_priors_sec', 0):.1f}s | "
                  f"p1 {p1:.1f}s p2 {p2:.1f}s ({per_iter * 1e3:.1f} ms/iter) "
                  f"| readback {t.get('joint_readback_sec', 0):.1f}s")
            full = (per_iter * 3000 + t.get("joint_priors_sec", 0.0)
                    + t.get("joint_readback_sec", 0.0))
            print(f"[{tag}] extrapolated production joint call "
                  f"(2x1500 iters): {full / 60:.1f} min")
        # quick quality proxy at the shortened budget
        gt = np.asarray(pano["distance"])
        rel = np.abs(np.asarray(dist) - gt) / gt
        print(f"distance median rel err vs GT (short budget): "
              f"{float(np.median(rel)):.4f}")


if __name__ == "__main__":
    main()
