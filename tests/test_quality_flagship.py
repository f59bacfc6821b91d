"""Flagship-scale quality regression (VERDICT r2 #10).

Runs tools/quality_episode.py — one full raw-fit episode at reference scale
(2048x1024 supervision, 3000 geo + 1500 app steps, brick field; matches the
reference workload pinned at /root/reference/configs/nerf.yaml:12,32-33,66) —
in a subprocess so it escapes conftest's CPU pin and uses the real chip, then
asserts the recorded round-2 quality bars so render/train perf work cannot
silently trade away quality.

Bars are the round-2 flagship ablation numbers (BASELINE.md) minus margin:

    field eval path      38.53 dB            -> >= 35.0
    snapshot (default)   53.17 dB / 0.0109   -> >= 50.0 / <= 0.02
    novel pose (0.3 off) 33.99 dB / 0.026    -> >= 31.0 / <= 0.04

Excluded from the default suite via pytest.ini (`-m "not flagship"`); run as

    python -m pytest -m flagship tests/test_quality_flagship.py -q

with the TPU idle (takes ~15 min: ~12.5 min fit + bake + renders).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.flagship
def test_flagship_quality_bars(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "quality_episode.py"),
         "--scene-ckpt", str(tmp_path / "scene.npz")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    print(json.dumps(rec))

    assert rec["psnr"] >= 35.0, rec
    assert rec["psnr_snapshot"] >= 50.0, rec
    assert rec["depth_mae_snapshot"] <= 0.02, rec
    assert rec["psnr_novel_pose"] >= 31.0, rec
    assert rec["depth_mae_novel_pose"] <= 0.04, rec
