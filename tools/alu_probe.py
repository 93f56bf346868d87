#!/usr/bin/env python
"""Measure VPU int32 multiply vs add throughput inside a Pallas kernel.

8 independent streams per iteration expose throughput (not latency); the
mask keeps values bounded and defeats constant folding. Decides whether
trading multiplies for adds (Karatsuba-style) can pay on this chip.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = 0x1FFF


def _kernel(op, iters, nstreams, x_ref, out_ref):
    x = x_ref[:]
    streams = tuple(x + i for i in range(nstreams))

    def step(i, ss):
        return tuple(op(s, x) & MASK for s in ss)

    ss = jax.lax.fori_loop(0, iters, step, streams)
    acc = ss[0]
    for s in ss[1:]:
        acc = acc + s
    out_ref[:] = acc


def run(name, op, iters, rows, bt, nstreams=8, reps=5):
    """Slope timing (t(3N) - t(N)) / 2N: the axon tunnel adds a ~27 ms
    constant per synced dispatch that would otherwise swamp the ALUs."""
    rng = np.random.default_rng(0)
    x = rng.integers(1, MASK, size=(rows, bt)).astype(np.int32)

    def make(n):
        return jax.jit(pl.pallas_call(
            functools.partial(_kernel, op, n, nstreams),
            out_shape=jax.ShapeDtypeStruct((rows, bt), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))

    def best_of(fn):
        np.asarray(fn(x))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(make(iters))
    t3 = best_of(make(3 * iters))
    per_iter = (t3 - t1) / (2 * iters)
    nops = nstreams * rows * bt
    print(f"{name:20s} {(t3-t1)*1e3:8.3f} ms slope  "
          f"{nops/per_iter/1e9:8.1f} Gop/s "
          f"({rows}x{bt}, {nstreams} streams, {iters} iters)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--bt", type=int, default=512)
    ap.add_argument("--iters", type=int, default=2048)
    args = ap.parse_args()
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    run("int32 mul", lambda a, b: a * b, args.iters, args.rows, args.bt)
    run("int32 add", lambda a, b: a + b, args.iters, args.rows, args.bt)
    run("int32 mul+add", lambda a, b: a * b + b, args.iters, args.rows,
        args.bt)
    run("int32 shift", lambda a, b: a >> 3, args.iters, args.rows, args.bt)
    run("f32 fma", lambda a, b: (a.astype(jnp.float32) * b.astype(jnp.float32)
                                 + b.astype(jnp.float32)).astype(jnp.int32),
        args.iters, args.rows, args.bt)


if __name__ == "__main__":
    main()
