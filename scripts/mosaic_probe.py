"""Probe two Mosaic lowering capabilities on the real device that the
(C, H*d) fused-cache layout depends on:

  P1  HBM memref row-block slice: .at[pl.ds(base, 8), :] on a (C, E) bf16
      ref with E a multiple of 128 (append-row DMA target).
  P2  Static 64-lane-offset slices of a VMEM (C, E) ref (per-head reads
      for odd head indices).

Usage: python scripts/mosaic_probe.py
"""
from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, E = 64, 1024


def k_p1(qw_ref, kcache_in, newrow_ref, kcache_hbm, blk_s, sem):
    del kcache_in  # aliased to kcache_hbm
    base = pl.multiple_of((qw_ref[0] // 8) * 8, 8)
    off = qw_ref[0] - base
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, E), 0)
    # Read the pre-existing 8-row block from HBM so neighbours survive.
    pltpu.make_async_copy(kcache_hbm.at[pl.ds(base, 8), :], blk_s, sem).start()
    pltpu.make_async_copy(kcache_hbm.at[pl.ds(base, 8), :], blk_s, sem).wait()
    blk_s[:, :] = jnp.where(rows == off, newrow_ref[0, :][None, :], blk_s[:, :])
    pltpu.make_async_copy(blk_s, kcache_hbm.at[pl.ds(base, 8), :], sem).start()
    pltpu.make_async_copy(blk_s, kcache_hbm.at[pl.ds(base, 8), :], sem).wait()


def probe_p1():
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((1, E), lambda i, qw: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, E), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    cache = (jnp.arange(C * E, dtype=jnp.float32).reshape(C, E) % 13).astype(
        jnp.bfloat16
    )
    newrow = (jnp.arange(E, dtype=jnp.bfloat16)[None, :] % 31) + 100.0
    qw = jnp.array([13], jnp.int32)
    fn = pl.pallas_call(
        k_p1,
        grid_spec=grid,
        out_shape=[
            jax.ShapeDtypeStruct((C, E), jnp.bfloat16),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(),
    )
    (cache_out,) = jax.jit(fn)(qw, cache, newrow)
    jax.block_until_ready(cache_out)
    got = np.asarray(cache_out)
    want = np.asarray(cache).copy()
    want[13, :] = np.asarray(newrow)[0]
    return np.allclose(got, want)


def k_p2(x_ref, out_ref):
    acc = jnp.zeros((C, 64), jnp.float32)
    for h in range(16):
        sl = x_ref[:, 64 * h : 64 * (h + 1)].astype(jnp.float32)
        acc = acc + sl * (h + 1)
    out_ref[:, :] = acc


def probe_p2():
    x = jnp.arange(C * E, dtype=jnp.float32).reshape(C, E) % 97
    x = x.astype(jnp.bfloat16)
    fn = pl.pallas_call(
        k_p2,
        out_shape=jax.ShapeDtypeStruct((C, 64), jnp.float32),
    )
    got = np.asarray(jax.jit(fn)(x))
    want = sum(
        np.asarray(x[:, 64 * h : 64 * (h + 1)]).astype(np.float32) * (h + 1)
        for h in range(16)
    )
    ok = np.allclose(got, want, atol=1e-2)
    return ok


if __name__ == "__main__":
    for name, f in [("P2 lane-offset slices", probe_p2), ("P1 hbm row-block DMA", probe_p1)]:
        try:
            ok = f()
            print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")
            print(f"{name}: FAIL {msg[0][:200]}")
            for ln in msg[1:6]:
                print("   ", ln[:200])
