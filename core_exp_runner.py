"""CLI entry point — preserves the reference's Hydra surface.

    python core_exp_runner.py --config-name nerf \
        dataset.image_path=./example_data/kitchen/image.png \
        device.base_exp_dir=./exp                      # mode=train
    python core_exp_runner.py ... mode=render_dense is_continue=true

(reference README.md:67,75 / core_exp_runner.py:259-272). Hydra itself is
not in this image; ``perf_tpu.config`` provides the same composition +
override semantics.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(add_help=True)
    ap.add_argument("--config-name", default="nerf")
    ap.add_argument("--config-path", default=None,
                    help="config directory (default: ./configs next to this file)")
    ap.add_argument("overrides", nargs="*",
                    help="hydra-style dotted overrides, e.g. mode=render_dense")
    args = ap.parse_args(argv)

    config_dir = args.config_path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "configs")

    from perf_tpu.config import load_config
    conf = load_config(config_dir, args.config_name, args.overrides)

    import numpy as np
    np.random.seed(int(conf.get("seed", 0)))

    # remote TPU compiles cost 1-7 min/program; persist executables so
    # resumes/restarts/benches hit the cache (disable: PERF_TPU_COMPILE_CACHE=)
    if os.environ.get("PERF_TPU_COMPILE_CACHE", None) != "":
        import perf_tpu
        perf_tpu.enable_persistent_compilation_cache()

    from perf_tpu.app import CoreRunner
    runner = CoreRunner(conf)
    runner.execute(str(conf["mode"]))


if __name__ == "__main__":
    main()
