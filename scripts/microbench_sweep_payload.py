#!/usr/bin/env python
"""Demonstrate the tile-sweep matmul payload ceiling (VERDICT r3 item 2).

The PCG sweeps' one-hot matmuls carry an 18-wide payload on the 128-wide
MXU. This measures the exact binning shape — (Vl, block) x (block, 18)
contractions — both as the kernel issues them (W small matmuls per grid
step) and as ONE batched matmul with a W*block-deep contraction, in a
minimal Pallas kernel. Both land at the same few TF/s: the ceiling is the
18/128 payload (and operand streaming), NOT matmul-invocation overhead and
NOT HBM bandwidth (bf16-halving the plane traffic moves the real sweep
only ~5%, BENCH.md). This is the committed profile behind the decision to
stop tuning the one-hot sweeps and name the camera-major dual layout as
the next structural lever. Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Vl, BLOCK, W, P = 128, 1024, 8, 18
N_TILES = 977     # ~1M rows at block 1024


def _kern_many(oh_ref, u_ref, out_ref):
    acc = jnp.zeros((Vl, P), jnp.float32)
    for w in range(W):
        o = oh_ref[:, w * BLOCK:(w + 1) * BLOCK]
        u = u_ref[:, w * BLOCK:(w + 1) * BLOCK]
        acc += jax.lax.dot_general(o, u, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _kern_one(oh_ref, u_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        oh_ref[:], u_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _run(kern):
    f = jax.jit(lambda a, b: pl.pallas_call(
        kern,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec((Vl, W * BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((P, W * BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Vl, P), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vl, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b))
    a = jnp.full((Vl, N_TILES * W * BLOCK), 0.01, jnp.float32)
    b = jnp.full((P, N_TILES * W * BLOCK), 0.01, jnp.float32)
    x = f(a, b)
    _ = float(x[0, 0])
    t0 = time.time()
    for _i in range(5):
        x = f(a, b)
    _ = float(x[0, 0])
    dt = (time.time() - t0) / 5
    return 2 * Vl * P * W * BLOCK * N_TILES / dt / 1e12


def main():
    out = {
        "shape": f"({Vl},{BLOCK})x({BLOCK},{P}) xW={W}, {N_TILES} tiles",
        "tflops_many_small_matmuls": round(_run(_kern_many), 2),
        "tflops_one_batched_matmul": round(_run(_kern_one), 2),
        "platform": jax.devices()[0].platform,
        "note": "both ~equal and far below matmul peak: the 18-wide "
                "payload (18/128 of the MXU tile) is the ceiling; batching "
                "matmul invocations does not move it",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
