"""Generate the pinned substitute reference scene (tools/reference_baseline.md).

The reference's example kitchen pano is a stripped blob, so cross-framework
quality comparisons pin THIS deterministic 2048x1024 cube-room pano instead.
Writes tools/reference_scene/image.png + SHA256SUMS; re-running must
reproduce the identical file (checked against an existing SHA256SUMS).

    python tools/gen_reference_scene.py
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host-side scene gen only

import numpy as np  # noqa: E402


def main():
    from perf_tpu.utils import render_cube_room_pano
    from perf_tpu.utils.io import write_image

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "reference_scene")
    os.makedirs(out_dir, exist_ok=True)
    pano = render_cube_room_pano(np.eye(4, dtype=np.float32), 1024, 2048)
    path = os.path.join(out_dir, "image.png")
    write_image(path, np.asarray(pano["rgb"]))

    with open(path, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    sums = os.path.join(out_dir, "SHA256SUMS")
    line = f"{digest}  image.png\n"
    if os.path.exists(sums):
        with open(sums) as f:
            pinned = f.read()
        assert pinned == line, (
            f"regenerated scene hash {digest} != pinned\n{pinned}"
            " — the generator must stay deterministic; do not re-pin")
        print(f"reproduced pinned scene: {digest}")
    else:
        with open(sums, "w") as f:
            f.write(line)
        print(f"pinned new scene: {digest}")


if __name__ == "__main__":
    main()
