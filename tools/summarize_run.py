"""Summarize a pipeline run's metrics.jsonl into per-stage tables.

Usage:
    python tools/summarize_run.py runs/flagship_r3/exp/*/nerf_experiment

Prints (a) per-anchor cycle stage timings, (b) fit-phase history, and
(c) totals — the exact numbers the BASELINE.md run records use. Pure host
tool; no jax.
"""

import glob
import json
import os
import sys


def main():
    exp = sys.argv[1] if len(sys.argv) > 1 else "."
    paths = glob.glob(os.path.join(exp, "ts_log", "metrics.jsonl")) \
        or glob.glob(os.path.join(exp, "metrics.jsonl"))
    if not paths:
        sys.exit(f"no metrics.jsonl under {exp}")
    rows = [json.loads(l) for l in open(paths[0])]

    stages = {}
    for r in rows:
        if r["tag"].startswith("time/"):
            stages.setdefault(r["tag"][5:], []).append(
                (r["step"], r["value"], r["t"]))

    anchor_keys = sorted(k for k in stages if k.startswith("anchor_"))
    anchors = sorted({s for k in anchor_keys for s, _, _ in stages[k]})
    if anchors:
        print("== per-anchor stages (s) ==")
        hdr = ["anchor"] + [k[7:-4] for k in anchor_keys]
        print("  ".join(f"{h:>12s}" for h in hdr))
        for a in anchors:
            vals = []
            for k in anchor_keys:
                v = [val for s, val, _ in stages[k] if s == a]
                vals.append(f"{v[-1]:12.1f}" if v else " " * 12)
            print(f"{a:>12d}  " + "  ".join(vals))

    for phase in ("fit_geo_sec", "fit_app_sec"):
        if phase in stages:
            print(f"\n== {phase} history ==")
            for s, v, _ in stages[phase]:
                print(f"  iter {s:>6d}: {v:8.1f} s")

    ts = [r["t"] for r in rows]
    total = sum(v for k in stages for _, v, _ in stages[k]
                if k.startswith(("fit_", "anchor_")) and k != "anchor_total_sec")
    print(f"\nspan: {max(ts) - min(ts):.0f} s wall; "
          f"summed stage time {total:.0f} s")


if __name__ == "__main__":
    main()
