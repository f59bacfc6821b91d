"""Microbenchmarks for the Pallas fused brick-encode kernel design.

Questions this answers (run on the real TPU):
1. Does Mosaic support a dynamic row-gather (jnp.take axis=0) from a
   VMEM-resident brick table, and at what rows/s?
2. How does a one-hot MXU matmul gather compare?
3. What does the current XLA brick encode (4 stride-1 levels) cost at the
   same shape?

    python tools/bench_pallas_encode.py [--samples 524288]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4096    # brick rows per level
W = 128     # lanes per row


def _sync(out):
    np.asarray(jax.numpy.ravel(jax.tree_util.tree_leaves(out)[0])[0])


def timed(fn, *a, iters=10):
    out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


# -- 1. take-gather kernel ----------------------------------------------------

def take_kernel(table_ref, rows_ref, out_ref):
    rows = rows_ref[:]                                    # [B, 1]
    idx = jnp.broadcast_to(rows, (rows.shape[0], W))      # [B, W]
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx, axis=0)


def take_gather(table, rows, block):
    n = rows.shape[0]
    return pl.pallas_call(
        take_kernel,
        out_shape=jax.ShapeDtypeStruct((n, W), table.dtype),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(table, rows[:, None])


# -- 2. one-hot matmul gather -------------------------------------------------

def onehot_kernel(table_ref, rows_ref, out_ref):
    rows = rows_ref[:]                                    # [B, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (rows.shape[0], R), 1)
    oh = (cols == rows).astype(jnp.bfloat16)              # [B, R]
    out_ref[:] = jnp.dot(oh, table_ref[:],
                         preferred_element_type=jnp.float32
                         ).astype(table_ref.dtype)


def onehot_gather(table, rows, block):
    n = rows.shape[0]
    return pl.pallas_call(
        onehot_kernel,
        out_shape=jax.ShapeDtypeStruct((n, W), table.dtype),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(table, rows[:, None])


# -- 3. XLA wide gather baseline ---------------------------------------------

@jax.jit
def xla_gather(table, rows):
    return table[rows]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=524288)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    n = args.samples

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (R, W), jnp.float32).astype(jnp.bfloat16)
    rows = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, R, jnp.int32)

    ms = timed(xla_gather, table, rows, iters=args.iters)
    print(f"XLA gather           : {ms:7.2f} ms  "
          f"({n / ms * 1e3 / 1e6:6.0f}M rows/s)")

    for block in (512, 1024, 2048, 4096):
        try:
            fn = jax.jit(functools.partial(take_gather, block=block))
            out = fn(table, rows)
            ref = np.asarray(table)[np.asarray(rows[:128])]
            np.testing.assert_allclose(np.asarray(out[:128], np.float32),
                                       ref.astype(np.float32))
            ms = timed(fn, table, rows, iters=args.iters)
            print(f"pallas take b={block:5d} : {ms:7.2f} ms  "
                  f"({n / ms * 1e3 / 1e6:6.0f}M rows/s)")
        except Exception as e:
            print(f"pallas take b={block:5d} : FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")

    for block in (512, 1024, 2048):
        try:
            fn = jax.jit(functools.partial(onehot_gather, block=block))
            out = fn(table, rows)
            ref = np.asarray(table)[np.asarray(rows[:128])]
            np.testing.assert_allclose(np.asarray(out[:128], np.float32),
                                       ref.astype(np.float32))
            ms = timed(fn, table, rows, iters=args.iters)
            print(f"pallas 1hot b={block:5d} : {ms:7.2f} ms  "
                  f"({n / ms * 1e3 / 1e6:6.0f}M rows/s)")
        except Exception as e:
            print(f"pallas 1hot b={block:5d} : FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
