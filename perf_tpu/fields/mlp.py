"""MLP building blocks as explicit param pytrees.

Two flavours, mirroring the reference:

- ``ngp_mlp``: the bias-free 64-wide ReLU MLP that tcnn's FullyFusedMLP
  implements on GPU (``ngp_nerf.py:107-133``). On TPU a 64-wide matmul chain
  is MXU-friendly as-is; XLA fuses it with the surrounding ops, so no custom
  kernel is required for parity (Pallas fusion is a later perf option).
- ``vanilla_mlp``: the biased Softplus MLP with SAL sphere init and optional
  weight norm used by the sphere distance field
  (reference ``modules/fields/networks.py:16-66``), including the quirk that
  the forward pass returns the NEGATED output.

Params are plain dicts of arrays so that sub-tree re-init ("reset geometry")
is just swapping a leaf set.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# NGP-style MLP (bias-free ReLU; tcnn FullyFusedMLP counterpart)
# ---------------------------------------------------------------------------

def ngp_mlp_init(key: jax.Array, dim_in: int, dim_out: int,
                 n_neurons: int = 64, n_hidden: int = 1,
                 dtype=jnp.float32) -> dict:
    """He-init weight list: dim_in -> (n_neurons,)*n_hidden -> dim_out."""
    dims = [dim_in] + [n_neurons] * n_hidden + [dim_out]
    keys = jax.random.split(key, len(dims) - 1)
    ws = []
    for k, (a, b) in zip(keys, zip(dims[:-1], dims[1:])):
        std = math.sqrt(2.0 / a)
        ws.append(jax.random.normal(k, (a, b), dtype) * std)
    return {"w": ws}


def ngp_mlp_apply(params: dict, x: jnp.ndarray,
                  out_activation=None) -> jnp.ndarray:
    """ReLU between layers, optional output activation."""
    ws = params["w"]
    h = x
    for w in ws[:-1]:
        h = jax.nn.relu(h @ w)
    h = h @ ws[-1]
    if out_activation is not None:
        h = out_activation(h)
    return h


def ngp_mlp_apply_channels(params: dict, x: jnp.ndarray,
                           out_activation=None,
                           compute_dtype=jnp.bfloat16) -> tuple:
    """Like ``ngp_mlp_apply`` but returns per-output-channel [...] arrays.

    The final narrow matmul (64 -> 1 or 3) is expressed as per-channel
    reductions so no [..., 1] / [..., 3] tensor is ever materialized — on TPU
    those pad to 128 lanes (up to 128x memory blow-up at volume-sample
    counts).

    Matmuls run in ``compute_dtype`` (bf16 by default — the MXU's native
    precision, and what tcnn's fp16 FullyFusedMLP implies for parity) with
    f32 accumulation; params stay f32 for the optimizer.
    """
    ws = params["w"]
    h = x.astype(compute_dtype)
    for w in ws[:-1]:
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        h = jax.nn.relu(h).astype(compute_dtype)
    w_last = ws[-1]
    h = h.astype(jnp.float32)
    outs = []
    for c in range(w_last.shape[1]):
        o = jnp.sum(h * w_last[:, c], axis=-1)
        if out_activation is not None:
            o = out_activation(o)
        outs.append(o)
    return tuple(outs)


# ---------------------------------------------------------------------------
# VanillaMLP (sphere init / weight norm / Softplus(100); output negated)
# ---------------------------------------------------------------------------

def vanilla_mlp_init(key: jax.Array, dim_in: int, dim_out: int,
                     n_neurons: int, n_hidden_layers: int,
                     sphere_init: bool = False, weight_norm: bool = False,
                     sphere_init_radius: float = 0.5,
                     dtype=jnp.float32) -> dict:
    """Parity with reference ``networks.py:42-58``.

    Weights stored transposed vs torch (``[din, dout]``). With sphere init the
    first layer only connects the first 3 inputs (the raw direction), the last
    layer starts at bias -radius with near-constant positive weights, so that
    (negated) output ~ radius - |x| at init.
    """
    dims = [dim_in] + [n_neurons] * n_hidden_layers + [dim_out]
    n_layers = len(dims) - 1
    keys = jax.random.split(key, n_layers)
    ws, bs = [], []
    for i, (k, (a, b)) in enumerate(zip(keys, zip(dims[:-1], dims[1:]))):
        is_first, is_last = i == 0, i == n_layers - 1
        if sphere_init:
            if is_last:
                w = (jnp.full((a, b), math.sqrt(math.pi) / math.sqrt(a), dtype)
                     + jax.random.normal(k, (a, b), dtype) * 1e-4)
                bias = jnp.full((b,), -sphere_init_radius, dtype)
            elif is_first:
                w = jnp.zeros((a, b), dtype)
                w = w.at[:3].set(
                    jax.random.normal(k, (3, b), dtype) * (math.sqrt(2.0) / math.sqrt(b)))
                bias = jnp.zeros((b,), dtype)
            else:
                w = jax.random.normal(k, (a, b), dtype) * (math.sqrt(2.0) / math.sqrt(b))
                bias = jnp.zeros((b,), dtype)
        else:
            # torch kaiming_uniform_(relu): U(-bound, bound), bound = sqrt(6/a)
            bound = math.sqrt(6.0 / a)
            w = jax.random.uniform(k, (a, b), dtype, -bound, bound)
            bias = jnp.zeros((b,), dtype)
        ws.append(w)
        bs.append(bias)

    params = {"w": ws, "b": bs}
    if weight_norm:
        # reparametrize: w = g * v / ||v||_col ; init g = ||w||_col
        params = {
            "v": ws,
            "g": [jnp.linalg.norm(w, axis=0) for w in ws],
            "b": bs,
        }
    return params


def _materialize_weights(params: dict):
    if "v" in params:
        return [g * v / (jnp.linalg.norm(v, axis=0) + 1e-12)
                for v, g in zip(params["v"], params["g"])], params["b"]
    return params["w"], params["b"]


def vanilla_mlp_apply(params: dict, x: jnp.ndarray,
                      sphere_init: bool = True) -> jnp.ndarray:
    """Forward pass. NOTE: returns the NEGATED network output, matching the
    reference's ``VanillaMLP.forward`` (``networks.py:37-39``) which callers'
    init scheme depends on."""
    ws, bs = _materialize_weights(params)
    act = (lambda h: jax.nn.softplus(100.0 * h) / 100.0) if sphere_init else jax.nn.relu
    h = x
    for w, b in zip(ws[:-1], bs[:-1]):
        h = act(h @ w + b)
    h = h @ ws[-1] + bs[-1]
    return -h
