"""Benchmark: train rays/sec + render frames/sec on the reference workload.

Workload parity (BASELINE.md): 2048x1024 pano supervision, 8192-ray train
batches, march step 5e-4 over [0, 1.5] against a 256^3 occupancy grid,
render at 1024x512 in 32768-ray chunks. Scene content is the synthetic cube
room (the reference's example panos are stripped blobs in this snapshot).

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s/chip",
   "vs_baseline": N, ...extras}

vs_baseline divides by the assumed A100 reference training throughput of
1.0e6 rays/s (torch+tcnn+nerfacc; the reference repo publishes no numbers —
see BASELINE.md for the assumption and protocol). Because no CUDA box is
available to measure the reference, extras also report vs_baseline_derived
against an ANALYTIC speed-of-light bound for the reference step on A100
(hardware limits x in-repo workload counts — derivation in BASELINE.md
"Derived A100 bound"). The derived bound is an upper bound on what the
reference could achieve, so vs_baseline_derived is the conservative ratio.
"""

import argparse
import json
import time

A100_TRAIN_RAYS_PER_SEC = 1.0e6   # documented assumption, BASELINE.md
A100_RENDER_FPS = 2.0             # documented assumption, BASELINE.md
# Analytic speed-of-light bound for the reference on A100 (BASELINE.md
# "Derived A100 bound"): gather/scatter traffic of the tcnn encode at the
# measured sample counts over A100 effective random-access bandwidth, plus
# launch overheads. Upper bound on reference throughput.
A100_TRAIN_RAYS_PER_SEC_DERIVED = 1.6e6
A100_RENDER_FPS_DERIVED = 8.0

# Round-5: coarse snapshot marching (SnapshotConfig.march_coarse +
# sample_stride) cuts samples/pixel on the compute/row-bound frame. The
# bench scene is not converged, so the 50 dB quality gate CANNOT run here —
# it ran on the converged flagship scene (tools/bench_snap_coarse.py,
# BASELINE.md round-5 ladder): s16 3.20 fps but 47.7 dB (FAILS the bar),
# s12 2.94 fps at 50.67 dB (HOLDS, novel-pose +1.0 dB) -> s12 is the
# production default (configs/nerf.yaml snapshot block) and this flag
# headlines its fps. The A/B below measures the production variant.
COARSE_SNAPSHOT_QUALITY_OK = True
COARSE_VARIANT = {"march_coarse": 12, "sample_stride": 12}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-sized smoke configuration")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    # BASELINE.md protocol: throughput averaged over >=500 steps / >=60
    # frames (first-compile warmup excluded)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--max-samples", type=int, default=None)
    ap.add_argument("--field", choices=("hash", "brick"), default="brick",
                    help="grid encoding; 'brick' is the TPU-flagship layout")
    args = ap.parse_args()

    import os
    if not args.cpu and os.environ.get("JAX_PLATFORMS", "axon") == "axon":
        # the axon tunnel relay can die (round 3); jax.devices() then hangs
        # forever on the dead loopback ports. Poll for a grace window (the
        # relay is host-managed and can come back), then fail with one
        # honest JSON line instead of stalling the driver's round-end step.
        import socket
        wait_s = float(os.environ.get("PERF_TPU_TUNNEL_WAIT", "600"))
        deadline = time.monotonic() + wait_s
        last_err = None
        while True:
            s = socket.socket()
            s.settimeout(5)
            try:
                s.connect(("127.0.0.1", 8082))
                break
            except OSError as e:
                last_err = e
                if time.monotonic() >= deadline:
                    print(json.dumps({
                        "metric": "train_rays_per_sec", "value": 0,
                        "unit": "rays/s/chip", "vs_baseline": 0,
                        "extras": {"error": "axon tunnel unreachable for "
                                            f"{wait_s:.0f}s: {last_err}"}}))
                    return
                time.sleep(15)
            finally:
                s.close()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if os.environ.get("PERF_TPU_COMPILE_CACHE", None) != "":
        import perf_tpu
        perf_tpu.enable_persistent_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from perf_tpu.core import gen_pano_rays
    from perf_tpu.fields import NGPFieldConfig, init_ngp_params
    from perf_tpu.kernels import HashGridConfig
    from perf_tpu.render import RenderConfig, render_image
    from perf_tpu.train import SupInfoPool, NeRFScene, TrainConfig
    from perf_tpu.utils import render_cube_room_pano

    if args.tiny:
        h, w = 128, 256
        field_cfg = NGPFieldConfig(grid=HashGridConfig(
            n_levels=8, n_features=2, log2_table_size=14, base_res=4,
            per_level_scale=1.9))
        render_cfg = RenderConfig(step=4e-3, max_samples=128, occ_res=64)
        batch, render_hw = 1024, (64, 128)
        # keep the CPU smoke fast: frame_dispatch renders the fixed cap
        # (no adaptive budgets), ~0.07 fps on this 1-core box, and the
        # raw+flagship double series doubles the compile count
        args.steps = min(args.steps, 25)
        args.frames = min(args.frames, 6)
    else:
        h, w = 1024, 2048
        if args.field == "brick":
            from perf_tpu.kernels import BrickGridConfig
            field_cfg = NGPFieldConfig(grid=BrickGridConfig())
        else:
            field_cfg = NGPFieldConfig()
        # brick gathers materialize [chunk*samples, 128] rows; 8192-ray
        # chunks keep that under 1 GB on a 16 GB chip
        render_cfg = RenderConfig(
            max_samples=args.max_samples or 256,
            eval_chunk=8192 if args.field == "brick" else 32768)
        batch, render_hw = 8192, (512, 1024)
    if args.max_samples:
        import dataclasses
        render_cfg = dataclasses.replace(render_cfg,
                                         max_samples=args.max_samples)

    t0 = time.perf_counter()
    pano = render_cube_room_pano(jnp.eye(4), h, w)
    pool = SupInfoPool()
    pool.register_sup_info(np.eye(4, dtype=np.float32), np.ones((h, w)),
                           pano["rgb"], pano["distance"], pano["normal"])
    # scan_chunk=1: lax.scan over this step measured ~4x SLOWER than
    # per-step dispatch on TPU (scheduler can't overlap the remat'd
    # backward inside the loop), and the ~25 ms tunnel dispatch overhead
    # is negligible against the ~0.7 s step.
    train_cfg = TrainConfig(pixel_loss_batch_size=batch,
                            scan_chunk=1 if not args.tiny else 5)
    scene = NeRFScene(field_cfg, render_cfg, train_cfg, jax.random.PRNGKey(0))
    scene.occ_grid = pool.gen_occ_grid(render_cfg.occ_res)
    arrs = pool.device_arrays()
    # adaptive sample budget, exactly as scene.fit() would pick it
    scene.sample_budget = scene.select_sample_budget(arrs)
    capacity = int(arrs["rays_o"].shape[0])
    setup_s = time.perf_counter() - t0

    def time_phase(sc, phase, arrs, n_steps):
        capacity = int(arrs["rays_o"].shape[0])
        run_chunk = sc._get_phase_fn(phase, capacity)
        if phase == "geo":
            tp, fz = sc.params["geo"], sc.params["app"]
        else:
            tp, fz = sc.params["app"], sc.params["geo"]
        import optax
        opt_state = optax.scale_by_adam(eps=1e-8).init(tp)
        key = jax.random.PRNGKey(1)
        # warmup (compile) — one chunk
        # NOTE: match the loop's STRONG f32 dtype — a weak-typed 0.0 warms up a
        # different aval and the first timed dispatch silently recompiles
        tp, opt_state, key, losses = run_chunk(tp, fz, opt_state,
                                               sc.occ_grid, arrs, key,
                                               jnp.asarray(0.0, jnp.float32))
        # scalar D2H readback: on the tunneled backend block_until_ready has
        # been observed to return before execution completes
        float(losses[-1, 0])
        t0 = time.perf_counter()
        done = 0
        while done < n_steps:
            tp, opt_state, key, losses = run_chunk(
                tp, fz, opt_state, sc.occ_grid, arrs, key,
                jnp.asarray(float(done), jnp.float32))
            done += sc.train_cfg.scan_chunk
        float(losses[-1, 0])
        dt = time.perf_counter() - t0
        return done / dt, float(np.asarray(losses)[-1, 1])

    def episode_rays_per_sec(geo, app):
        # reference episode mix: 3000 geo + 1500 app steps
        return 4500.0 * batch / (3000.0 / geo + 1500.0 / app)

    # single-pano (raw-fit) regime — SECONDARY series: small budgets, no
    # bucketing. Kept for cross-round comparability with BENCH_r01-r03.
    raw_steps = min(args.steps, 10) if args.tiny else min(args.steps, 150)
    geo_sps_raw, _ = time_phase(scene, "geo", arrs, raw_steps)
    app_sps_raw, _ = time_phase(scene, "app", arrs, raw_steps)
    raw_budget, raw_plan = scene.sample_budget, scene.bucket_plan

    # FLAGSHIP regime — the HEADLINE (VERDICT r3 item 4): register
    # synthetic anchor panos at displaced poses (as the progressive loop
    # does after a few anchors, runner.py train loop), so the union
    # occupancy shell drives the budget toward the 256 cap and the
    # two-budget bucket_plan actually engages. Without this the recorded
    # number structurally excludes the bucketing + top-K wins that set
    # the real per-anchor cycle time (BASELINE.md round-3 record).
    room = 0.8
    for off in ((0.38, 0.0, 0.0), (-0.3, 0.18, 0.0), (0.08, -0.38, 0.15)):
        apose = np.eye(4, dtype=np.float32)
        apose[:3, 3] = np.asarray(off, np.float32) * (room / 0.8)
        ap = render_cube_room_pano(jnp.asarray(apose), h, w)
        pool.register_sup_info(apose, np.ones((h, w)),
                               ap["rgb"], ap["distance"], ap["normal"])
    scene.occ_grid = pool.gen_occ_grid(render_cfg.occ_res)
    arrs_f = pool.device_arrays()
    scene.sample_budget = scene.select_sample_budget(arrs_f)

    geo_sps, geo_loss = time_phase(scene, "geo", arrs_f, args.steps)
    app_sps, app_loss = time_phase(scene, "app", arrs_f, args.steps)
    train_rays_per_sec = episode_rays_per_sec(geo_sps, app_sps)

    # run-dedup A/B: REMOVED round 5 — the verdict is final (LOSES at real
    # flagship occupancy, BASELINE.md round-4: rows halve 698->386 but the
    # one-hot re-expansion costs more than the rows saved); re-proving a
    # loss burned ~300 steps of driver wall-clock every round.

    # render throughput — the production path (render_dense) bakes the
    # field once into the snapshot grid and renders every frame through
    # it; the bake is timed separately and amortizes over the sweep.
    rays = gen_pano_rays(jnp.eye(4), *render_hw)
    if args.tiny:
        from perf_tpu.render.snapshot import SnapshotConfig
        scene.bake_snapshot(SnapshotConfig(res=128))
        bake_s = 0.0
    else:
        t0 = time.perf_counter()
        scene.bake_snapshot()
        np.asarray(scene.snapshot[0, 0])
        bake_s = time.perf_counter() - t0
    out = scene.render_snapshot(rays, ("rgb", "distance"))  # warmup/compile
    float(out["rgb"][0, 0, 0])  # D2H readback, see time_phase
    t0 = time.perf_counter()
    for i in range(args.frames):
        out = scene.render_snapshot(rays, ("rgb", "distance"))
    float(out["rgb"][0, 0, 0])
    fps_chunked = args.frames / (time.perf_counter() - t0)

    # frame_dispatch A/B: same bake table, one-dispatch whole-frame path
    # (snapshot.py _snapshot_frame) vs the 16-dispatch chunked path; the
    # headline takes the better MEASURED number (both recorded in extras).
    import dataclasses as _dc
    frame_error = None
    try:
        scene._snap_cfg = _dc.replace(scene._snap_cfg, frame_dispatch=True)
        out = scene.render_snapshot(rays, ("rgb", "distance"))  # compile
        float(out["rgb"][0, 0, 0])
        t0 = time.perf_counter()
        for i in range(args.frames):
            out = scene.render_snapshot(rays, ("rgb", "distance"))
        float(out["rgb"][0, 0, 0])
        fps_frame = args.frames / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 — chip-unproven path, see above
        frame_error = f"{type(e).__name__}: {e}"[:200]
        fps_frame = 0.0
        scene._snap_cfg = _dc.replace(scene._snap_cfg, frame_dispatch=False)
    fps = max(fps_chunked, fps_frame)

    # coarse-march A/B (round-4): 2-voxel marching via march_coarse=16 +
    # sample_stride=16 — the one render lever left after frame_dispatch /
    # K-frame / int8 / grouped-encode all measured dead (BASELINE.md).
    # Quality is gated on the CONVERGED flagship scene by
    # tools/bench_snap_coarse.py; COARSE_SNAPSHOT_QUALITY_OK holds that
    # verdict. coarse_vs_s8_db records frame agreement on this scene.
    fps_coarse = 0.0
    coarse_vs_s8_db = None
    coarse_error = None
    if True:  # runs under --tiny too so the smoke validates the path
        try:
            from perf_tpu.render.snapshot import SnapshotConfig
            rgb_s8 = np.asarray(out["rgb"], np.float64)  # host-side ref
            snap_kw = {"res": 128} if args.tiny else {}
            # re-bake the SAME scene with the snapshot-path march override
            # (SnapshotConfig.march_coarse) — one scene, one resident table
            # (a second full-res bake alongside the first doubled snapshot
            # HBM on the 16 GB chip)
            scene.bake_snapshot(SnapshotConfig(**COARSE_VARIANT, **snap_kw))
            out16 = scene.render_snapshot(rays, ("rgb", "distance"))
            float(out16["rgb"][0, 0, 0])
            t0 = time.perf_counter()
            for i in range(args.frames):
                out16 = scene.render_snapshot(rays, ("rgb", "distance"))
            float(out16["rgb"][0, 0, 0])
            fps_coarse = args.frames / (time.perf_counter() - t0)
            mse = float(np.mean((np.asarray(out16["rgb"], np.float64)
                                 - rgb_s8) ** 2))
            coarse_vs_s8_db = round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 1)
            if COARSE_SNAPSHOT_QUALITY_OK:
                fps = max(fps, fps_coarse)
        except Exception as e:  # noqa: BLE001 — chip-unproven path, see above
            coarse_error = f"{type(e).__name__}: {e}"[:200]

    # field-path render (no bake), one frame for the record
    key = jax.random.PRNGKey(2)
    out_f = scene.render(rays, ("rgb", "distance"), key=key)
    float(out_f["rgb"][0, 0, 0])
    t0 = time.perf_counter()
    out_f = scene.render(rays, ("rgb", "distance"), key=jax.random.PRNGKey(3))
    float(out_f["rgb"][0, 0, 0])
    field_fps = 1.0 / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(train_rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(train_rays_per_sec / A100_TRAIN_RAYS_PER_SEC, 3),
        "extras": {
            "vs_baseline_derived": round(
                train_rays_per_sec / A100_TRAIN_RAYS_PER_SEC_DERIVED, 3),
            "render_fps_vs_baseline_derived": round(
                fps / A100_RENDER_FPS_DERIVED, 3),
            "geo_steps_per_sec": round(geo_sps, 2),
            "app_steps_per_sec": round(app_sps, 2),
            # single-pano raw-fit regime (BENCH_r01-r03 comparable series)
            "raw_geo_steps_per_sec": round(geo_sps_raw, 2),
            "raw_app_steps_per_sec": round(app_sps_raw, 2),
            "raw_train_rays_per_sec": round(
                episode_rays_per_sec(geo_sps_raw, app_sps_raw), 1),
            "raw_sample_budget": raw_budget,
            "raw_bucket_plan": list(raw_plan or ()),
            "n_panos": len(pool.sup_infos),
            "render_fps_1024x512": round(fps, 3),
            "render_fps_vs_baseline": round(fps / A100_RENDER_FPS, 3),
            "render_fps_chunked": round(fps_chunked, 3),
            "render_fps_frame_dispatch": round(fps_frame, 3),
            "render_fps_coarse": round(fps_coarse, 3),
            "coarse_variant": COARSE_VARIANT,
            "coarse_vs_s8_db": coarse_vs_s8_db,
            "coarse_quality_ok": COARSE_SNAPSHOT_QUALITY_OK,
            "coarse_error": coarse_error,
            "render_fps_field_path": round(field_fps, 3),
            "snapshot_bake_sec": round(bake_s, 1),
            "batch": batch, "max_samples": render_cfg.max_samples,
            "sample_budget": scene.sample_budget,
            "bucket_plan": list(scene.bucket_plan or ()),
            "frame_dispatch_error": frame_error,
            "geo_loss": geo_loss, "app_loss": app_loss,
            "setup_sec": round(setup_s, 1),
            "platform": jax.devices()[0].platform,
            "tiny": args.tiny,
            "field": "hash" if args.tiny else args.field,
        },
    }))


if __name__ == "__main__":
    main()
