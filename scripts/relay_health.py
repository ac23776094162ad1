"""Relay health gauge: is the axon tunnel in a measurement-grade window?

The build environment reaches its TPU through a relay whose device stream
degrades by up to ~6x for stretches (BENCHMARKS.md relay notes): the same
chained readsum measured 366 us/step in a healthy window and 2130 us/step
in a degraded one on the same code. Absolute device timings taken in a
degraded window are garbage, so every long measurement run gates on this
probe first.

Prints one JSON line:
  {"rtt_ms": p50 host->device round-trip for a tiny op,
   "readsum_us": per-step time of a 64-iter chained streaming reduce over
                 a [64, 512, 1024] bf16 pair (134 MB/step),
   "read_gbps": effective bandwidth of that reduce,
   "healthy": read_gbps >= threshold (default 250 GB/s; healthy windows
              measure ~370)}

Exit code 0 iff healthy, so shell loops can gate on it:
  until python scripts/relay_health.py; do sleep 180; done && <measure>

Usage: python scripts/relay_health.py [--threshold-gbps 250]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("POCKET_TTS_OFFLINE", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold-gbps", type=float, default=250.0)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    # Tiny-op RTT (host dispatch + relay round-trip).
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    f(x).block_until_ready()
    rtts = []
    for _ in range(12):
        t0 = time.monotonic()
        f(x).block_until_ready()
        rtts.append(time.monotonic() - t0)
    rtts.sort()
    rtt_ms = rtts[len(rtts) // 2] * 1e3

    # Chained streaming reduce at the KV-read shape (134 MB/step): the
    # canonical pure-read floor (benchmarks/attn_micro.py readsum).
    B, C, J = 64, 512, 1024
    k = jnp.ones((B, C, J), jnp.bfloat16)
    v = jnp.ones((B, C, J), jnp.bfloat16)
    nbytes = k.nbytes + v.nbytes

    def readsum(q0, n):
        qi = q0
        for _ in range(n):
            s = jnp.sum(k, axis=1, dtype=jnp.float32) + jnp.sum(
                v, axis=1, dtype=jnp.float32
            )  # [B, J]
            qi = s * 1e-20 + qi
        return qi

    jfn = jax.jit(readsum, static_argnums=1)
    q0 = jnp.zeros((B, J), jnp.float32)
    jfn(q0, args.iters).block_until_ready()  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        jfn(q0, args.iters).block_until_ready()
        best = min(best, time.monotonic() - t0)
    step_us = best * 1e6 / args.iters
    gbps = nbytes / (best / args.iters) / 1e9

    healthy = gbps >= args.threshold_gbps
    print(
        json.dumps(
            {
                "rtt_ms": round(rtt_ms, 1),
                "readsum_us": round(step_us, 1),
                "read_gbps": round(gbps, 1),
                "healthy": healthy,
            }
        ),
        flush=True,
    )
    return 0 if healthy else 1


if __name__ == "__main__":
    raise SystemExit(main())
