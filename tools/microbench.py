#!/usr/bin/env python
"""Microbenchmark of the field/EC primitives inside a Pallas kernel.

Measures ns per op per 256-lane tile for: field mul, sqr, EC double,
mixed add, Fermat inversion, SHA round block. Used to locate the VPU
bottleneck and validate the cost model (ops/row -> rows/s ceiling).
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

from cudasp_tpu.ops import field as F
from cudasp_tpu.ops import kernels as K


def _bench_kernel(body, iters, x_ref, y_ref, out_ref):
    x = x_ref[:]
    y = y_ref[:]

    def step(i, carry):
        a, b = carry
        return body(a, b)

    a, b = jax.lax.fori_loop(0, iters, step, (x, y))
    out_ref[:] = a + b


def run_case(name, body, iters, bt, ops_per_iter, reps=5):
    """Slope timing: the axon tunnel adds a large constant per dispatch
    (~27 ms) and block_until_ready() does not actually block, so each
    measurement forces a D2H copy (np.asarray) and the reported time is
    the per-iteration SLOPE between iters and 3*iters runs, which cancels
    the constant."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, F.MASK, size=(F.NLIMBS, bt)).astype(np.int32)
    y = rng.integers(0, F.MASK, size=(F.NLIMBS, bt)).astype(np.int32)

    def make(n):
        fn = pl.pallas_call(
            functools.partial(_bench_kernel, body, n),
            out_shape=jax.ShapeDtypeStruct((F.NLIMBS, bt), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(fn)

    def best_of(fn):
        np.asarray(fn(x, y))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(x, y))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_of(make(iters))
    t3 = best_of(make(3 * iters))
    ns_per_op = (t3 - t1) / (2 * iters * ops_per_iter) * 1e9
    print(f"{name:24s} {t1*1e3:8.3f}/{t3*1e3:8.3f} ms  {ns_per_op:9.1f} ns/op"
          f"  ({bt} lanes, {iters} iters)")
    return ns_per_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bt", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    bt, iters = args.bt, args.iters

    print(f"# devices: {jax.devices()}")

    # raw int32 vector ops baseline: multiply-add on same shaped arrays
    def raw_madd(a, b):
        return (a * b + b) & F.MASK, b

    # f32 fma baseline
    def f32_fma(a, b):
        af = a.astype(jnp.float32)
        bf = b.astype(jnp.float32)
        return (af * bf + bf).astype(jnp.int32) & F.MASK, b

    def field_mul(a, b):
        return F.mul(a, b), b

    def field_sqr(a, b):
        return F.sqr(a), b

    def field_add(a, b):
        return F.add(a, b), b

    def ec_dbl(a, b):
        x, y, z = K._dbl(a, b, F.one_like(a))
        return x, F.add(y, z)

    def ec_madd(a, b):
        x, y, z = K._madd_core(a, b, F.one_like(a), b, a)
        return x, F.add(y, z)

    def field_inv(a, b):
        return F.inv(a), b

    # ILP variants: 4 independent chains to expose throughput (not latency)
    def ilp4(op):
        def body(a, b):
            a1 = op(a, b)
            a2 = op(a + 1, b)
            a3 = op(a + 2, b)
            a4 = op(a + 3, b)
            return (a1 + a2 + a3 + a4) & F.MASK, b
        return body

    run_case("int32 mul x4ilp", ilp4(lambda a, b: (a * b) & F.MASK),
             iters * 5, bt, 4)
    run_case("int32 add x4ilp", ilp4(lambda a, b: (a + b) & F.MASK),
             iters * 5, bt, 4)
    run_case("int32 shr x4ilp", ilp4(lambda a, b: (a >> 3) + b),
             iters * 5, bt, 4)
    run_case("f32 fma x4ilp",
             ilp4(lambda a, b: (a.astype(jnp.float32)
                                * b.astype(jnp.float32)).astype(jnp.int32)
                  & F.MASK),
             iters * 5, bt, 4)
    run_case("raw int32 madd (20,B)", raw_madd, iters * 20, bt, 1)
    run_case("f32 fma (20,B)", f32_fma, iters * 20, bt, 1)
    run_case("field add", field_add, iters, bt, 1)
    run_case("field mul", field_mul, iters, bt, 1)
    run_case("field sqr", field_sqr, iters, bt, 1)
    run_case("ec dbl (2M+5S)", ec_dbl, max(iters // 4, 8), bt, 1)
    run_case("ec madd (8M+3S)", ec_madd, max(iters // 8, 8), bt, 1)
    run_case("field inv (Fermat)", field_inv, max(iters // 100, 2), bt, 1)


if __name__ == "__main__":
    main()
