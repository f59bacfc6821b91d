"""Image / video / geometry IO.

Counterpart of the reference's ``utils/utils.py`` (cv2 BGR<->RGB image IO,
imageio mp4 writing, Sintel .dpt depth reader, JET colorization) plus a
dependency-free PLY point-cloud writer (the reference uses trimesh, absent
here).
"""

from __future__ import annotations

import os
import struct

import numpy as np


def read_image(path: str, to_float: bool = True) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if to_float:
        img = img.astype(np.float32) / 255.0
    return img


def write_image(path: str, img) -> None:
    """img: float [0,1] or [0,255]; accepts [H,W], [H,W,1] or [H,W,3]."""
    import cv2
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    if img.dtype != np.uint8:
        if img.max() <= 1.0 + 1e-6:
            img = img * 255.0
        img = np.clip(img, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


def write_video(path: str, frames, fps: int = 30) -> None:
    """mp4 writer: imageio(ffmpeg) when available, cv2.VideoWriter fallback
    (this image has no imageio-ffmpeg plugin)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import imageio
        with imageio.get_writer(path, fps=fps) as w:
            for f in frames:
                w.append_data(np.asarray(f))
        return
    except Exception:
        pass
    import cv2
    frames = [np.asarray(f) for f in frames]
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not vw.isOpened():
        raise RuntimeError(f"no video backend available for {path}")
    for f in frames:
        if f.dtype != np.uint8:
            f = np.clip(f * 255.0, 0, 255).astype(np.uint8)
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


def colorize_single_channel_image(img) -> np.ndarray:
    """Normalize to [0,1] and apply the JET colormap (reference
    ``utils.py:92-107``). Returns float RGB in [0,1]."""
    import cv2
    img = np.asarray(img).squeeze().astype(np.float32)
    lo, hi = float(img.min()), float(img.max())
    img = (img - lo) / max(hi - lo, 1e-9)
    u8 = (img * 255.0).astype(np.uint8)
    jet = cv2.applyColorMap(u8, cv2.COLORMAP_JET)
    return cv2.cvtColor(jet, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def read_dpt(path: str) -> np.ndarray:
    """Sintel .dpt depth format (reference ``utils.py:10-45``)."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != b"PIEH":
            raise ValueError(f"{path}: invalid .dpt magic {magic!r}")
        width = struct.unpack("<i", f.read(4))[0]
        height = struct.unpack("<i", f.read(4))[0]
        data = np.fromfile(f, dtype=np.float32, count=width * height)
    return data.reshape(height, width)


def write_ply(path: str, pts: np.ndarray, colors: np.ndarray | None = None):
    """Binary little-endian PLY point cloud (trimesh replacement)."""
    pts = np.asarray(pts, np.float32).reshape(-1, 3)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = len(pts)
    has_color = colors is not None
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if has_color:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
        colors = np.asarray(colors).reshape(-1, 3)
        if colors.dtype != np.uint8:
            colors = np.clip(colors * 255.0, 0, 255).astype(np.uint8)
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if has_color:
            rec = np.zeros(n, dtype=[("xyz", np.float32, 3),
                                     ("rgb", np.uint8, 3)])
            rec["xyz"] = pts
            rec["rgb"] = colors
            rec.tofile(f)
        else:
            pts.tofile(f)
