"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY §2.4: no torch.distributed in
the executed path); distribution here is designed TPU-first instead of
ported:

- axis ``'data'``: shards the ray axis of train batches and render tiles —
  the primary (and, at reference model scale, sufficient) parallelism. Params
  replicated; XLA inserts the gradient psum over ICI.
- axis ``'model'``: optionally shards hash-table rows (the only >10 MB
  params) for table sizes beyond single-chip HBM — tensor parallelism for
  this architecture.

Everything is expressed as shardings + constraints inside one jitted step;
there is no explicit send/recv layer (XLA emits the collectives).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), \
        f"need {n_data}x{n_model} devices, have {len(devices)}"
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def make_multihost_mesh(n_scene: int, n_model: int = 1,
                        coordinator: str | None = None,
                        num_processes: int | None = None,
                        process_id: int | None = None,
                        devices=None) -> Mesh:
    """('scene', 'data', 'model') mesh spanning hosts for the multi-scene
    batch config (BASELINE.md cfg 5; SURVEY §2.4 plan).

    Axis layout follows the ICI/DCN split rule: the OUTER 'scene' axis maps
    across hosts (scenes are independent — the only cross-scene traffic is
    metric reduction, cheap enough for DCN), while 'data'/'model' stay inside
    a host so ray-gradient psums and table all-gathers ride ICI. With
    ``jax.distributed``, ``jax.devices()`` orders devices process-major, so
    reshaping (scene, data, model) with scene as the slowest axis puts whole
    hosts on single scene slices whenever n_scene divides the host count.

    When ``coordinator`` is given, initializes ``jax.distributed`` (each
    process contributes its local devices; jax.devices() then spans hosts).
    Single-process (tests, one host): pass ``devices`` explicitly or rely on
    the current backend — the topology logic is identical, with virtual CPU
    devices standing in for remote hosts.
    """
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    n_data = n_total // (n_scene * n_model)
    assert n_scene * n_data * n_model == n_total, (
        f"{n_total} devices don't factor into scene={n_scene} x "
        f"data={n_data} x model={n_model}")
    dev_array = np.asarray(devices).reshape(n_scene, n_data, n_model)
    return Mesh(dev_array, ("scene", "data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def scene_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a leading scene axis: over 'scene' on a multi-host mesh,
    else over 'data' (single-host multi-scene layout)."""
    axis = "scene" if "scene" in mesh.axis_names else "data"
    return NamedSharding(mesh, P(axis))


def scene_ray_sharding(mesh: Mesh) -> NamedSharding:
    """[n_scenes, rays, ...] arrays: scene axis across hosts (DCN), ray
    axis across each host's devices (ICI) on a multi-host mesh; plain
    scene-over-'data' otherwise."""
    if "scene" in mesh.axis_names:
        return NamedSharding(mesh, P("scene", "data"))
    return NamedSharding(mesh, P("data"))


def table_sharding(mesh: Mesh, shape=None) -> NamedSharding:
    """Shard table rows over 'model': hash tables are [L, F, T] (rows last,
    dim 1 is the tiny feature count), brick tables are [L, n_bricks, F*128]
    (rows middle)."""
    if shape is not None and shape[1] > 16:   # brick: dim 1 = row count
        return NamedSharding(mesh, P(None, "model", None))
    return NamedSharding(mesh, P(None, None, "model"))


def shard_params(params: dict, mesh: Mesh, shard_tables: bool = False):
    """Place field params: replicated, or tables row-sharded over 'model'."""
    def place(path, x):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if shard_tables and "table" in names:
            return jax.device_put(x, table_sharding(mesh, x.shape))
        return jax.device_put(x, replicated(mesh))
    return jax.tree_util.tree_map_with_path(place, params)


def shard_rays(tree, mesh: Mesh):
    """Constraint: leading axis sharded over 'data' (inside jit)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, ray_sharding(mesh)), tree)
