"""Snapshot dedup + frame-dispatch fps/quality A/B on a saved flagship
scene ckpt: every (dedup_ratio, frame_dispatch) pair, one JSON line each."""
import sys, time, json
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
import perf_tpu
perf_tpu.enable_persistent_compilation_cache()
from perf_tpu.core import gen_pano_rays
from perf_tpu.fields import NGPFieldConfig
from perf_tpu.kernels import BrickGridConfig
from perf_tpu.render import RenderConfig
from perf_tpu.render.snapshot import SnapshotConfig
from perf_tpu.train import NeRFScene, TrainConfig, load_checkpoint
from perf_tpu.utils import render_cube_room_pano

ckpt = sys.argv[1] if len(sys.argv) > 1 else '/tmp/qscene.npz'
fc = NGPFieldConfig(grid=BrickGridConfig())
rc = RenderConfig(max_samples=256, eval_chunk=16384)
scene = NeRFScene(fc, rc, TrainConfig(), jax.random.PRNGKey(0))
scene.load_state_dict(load_checkpoint(ckpt))
rays = gen_pano_rays(jnp.eye(4), 512, 1024)
gt = render_cube_room_pano(jnp.eye(4), 512, 1024)
gt_rgb = np.asarray(gt['rgb'], np.float64)

for frame_dispatch in (False, True):
    for ratio in (0.0, 0.75, 0.625, 0.5):
        scene.bake_snapshot(SnapshotConfig(dedup_ratio=ratio,
                                           frame_dispatch=frame_dispatch))
        out = scene.render_snapshot(rays, ('rgb', 'distance'))
        float(out['rgb'][0,0,0])
        t0 = time.perf_counter()
        for _ in range(10):
            out = scene.render_snapshot(rays, ('rgb', 'distance'))
        float(out['rgb'][0,0,0])
        dt = (time.perf_counter() - t0) / 10
        mse = float(np.mean((np.asarray(out['rgb'], np.float64) - gt_rgb) ** 2))
        p = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        print(json.dumps({"ratio": ratio, "frame_dispatch": frame_dispatch,
                          "ms_per_frame": round(dt*1e3, 1),
                          "fps": round(1.0/dt, 2), "psnr": round(p, 2)}))
