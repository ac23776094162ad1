"""HBM read-bandwidth probe: what does this chip actually sustain?

Everything in the r4/r5 roofline debate hinges on one number — the
achievable HBM streaming read bandwidth. The datasheet figure (819 GB/s for
v5e) is NOT what a single sequential reader measures here; this probe pins
the real ceiling as a function of block size and dtype using a trivial
Pallas reader (explicit grid, Pallas double-buffers the block DMA; the body
is one per-lane reduce, far off the critical path).

Usage: python benchmarks/bw_probe.py [--mb 256] [--iters 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("POCKET_TTS_OFFLINE", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANES = 1024  # row width (matches the KV cache's H*d)


def make_reader(rows_total: int, blk_rows: int, dtype):
    # `tok` is a tiny (8, 128) carry that serializes chained calls WITHOUT
    # touching the big array (a naive `x + 0*acc` dependency would copy the
    # whole array every iteration and triple the measured traffic).
    def kern(tok_ref, xref, oref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            oref[...] = tok_ref[...] * 1e-20

        # Touch only one native TILE of the block: BlockSpec still DMAs the
        # WHOLE block (automatic double-buffering), so this measures the pure
        # HBM->VMEM stream with a near-zero body. (Earlier bodies measured
        # their own compute instead: a VPU astype(f32)+sum read 365 GB/s on
        # bf16 but 78 GB/s on int8 — the int8 unpack, not the DMA; an
        # M=8 ones-matmul reduce was MXU-bound at ~85 GB/s for both.)
        tile = {1: 32, 2: 16, 4: 8}[xref.dtype.itemsize]
        touch = xref[0:tile, 0:128].astype(jnp.float32)
        oref[...] += touch[0:8, :]

    return pl.pallas_call(
        kern,
        grid=(rows_total // blk_rows,),
        in_specs=[
            pl.BlockSpec((8, LANES // 8), lambda i: (0, 0)),
            pl.BlockSpec((blk_rows, LANES), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, LANES // 8), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, LANES // 8), jnp.float32),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256, help="array size to stream")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    for dtype, itemsize in ((jnp.int8, 1), (jnp.bfloat16, 2), (jnp.float32, 4)):
        rows_total = args.mb * 2**20 // (LANES * itemsize)
        rows_total = (rows_total // 4096) * 4096
        nbytes = rows_total * LANES * itemsize
        x = jnp.ones((rows_total, LANES), dtype)
        for blk_kib in (256, 512, 1024, 2048, 4096):
            blk_rows = blk_kib * 1024 // (LANES * itemsize)
            if blk_rows < 8 or rows_total % blk_rows:
                continue
            reader = make_reader(rows_total, blk_rows, dtype)

            def chained(n):
                acc = jnp.zeros((8, LANES // 8), jnp.float32)
                for _ in range(n):
                    acc = reader(acc, x)
                return acc

            jfn = jax.jit(chained, static_argnums=0)
            try:
                jax.block_until_ready(jfn(2))
            except Exception as e:  # noqa: BLE001 — VMEM OOM at big blocks
                print(f"dtype={jnp.dtype(dtype).name:9s} blk={blk_kib:5d} KiB: "
                      f"rejected ({str(e).splitlines()[0][:60]})", flush=True)
                continue
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.monotonic()
                jax.block_until_ready(jfn(args.iters))
                best = min(best, time.monotonic() - t0)
            gbs = nbytes * args.iters / best / 1e9
            print(
                f"dtype={jnp.dtype(dtype).name:9s} blk={blk_kib:5d} KiB "
                f"({blk_rows:5d} rows): {gbs:6.0f} GB/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
