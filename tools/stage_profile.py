#!/usr/bin/env python
"""Per-stage timing of the fused scan kernel's components on real TPU.

Each stage runs as its own Pallas kernel over one (NLIMBS, BT) tile with a
repeat knob, timed by slope (two repeat counts) to cancel the axon tunnel's
~27 ms dispatch constant. Stages mirror ops/kernels._scan_kernel:

  decompress   x -> y = sqrt(x^3+7) + parity select
  table        odd-multiple chain + cross-lane inversion + beta images
  ladder       32 windows x (4 dbl + 2 madd)  [the dominant stage]
  serialize    cross-lane inv + canon + big-endian words + tagged SHA-256
  comb         32 x (one-hot f32 MXU select + mixed add)
  match        2 candidate adds + shared inversion + upper-64 compare
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
from cudasp_tpu.ops import scalar as S


def _time(fn, args, reps=3):
    np.asarray(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def run_stage(name, body, bt, n1, n2, extra_in=(), scratch=()):
    """body(x, y, aux...) -> (NLIMBS, bt) array; repeated n times by
    chaining through x."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, F.MASK, size=(F.NLIMBS, bt)).astype(np.int32)
    y = rng.integers(0, F.MASK, size=(F.NLIMBS, bt)).astype(np.int32)

    def make(n):
        def kern(x_ref, y_ref, *rest):
            out_ref = rest[len(extra_in)]
            scr = rest[len(extra_in) + 1:]
            a = x_ref[:]
            b = y_ref[:]

            def step(i, a):
                # extra inputs are passed as REFS (dynamic indexing inside
                # the body only lowers on refs)
                return body(a, b, *rest[: len(extra_in)], *scr)

            out_ref[:] = jax.lax.fori_loop(0, n, step, a)

        return jax.jit(pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((F.NLIMBS, bt), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(extra_in)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=list(scratch),
        ))

    args = (x, y) + tuple(extra_in)
    t1 = _time(make(n1), args)
    t2 = _time(make(n2), args)
    per = (t2 - t1) / (n2 - n1)
    print(f"{name:14s} {per*1e6:9.1f} us/iter   ({bt} lanes; "
          f"{per*1e9/bt:7.2f} ns/row)")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bt", type=int, default=512)
    args = ap.parse_args()
    bt = args.bt
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    one_ = lambda a: F.one_like(a)

    # --- decompress: sqrt ladder + parity select
    def decompress(a, b):
        seven = F.literal_planes(F.int_to_limbs(7), a.shape[1])
        y0 = K._canon2d(F.sqrt_candidate(F.add(F.mul(F.sqr(a), a), seven)))
        return K._sel((y0[0:1] & 1) == 1, y0, F.neg(y0))

    run_stage("decompress", decompress, bt, 40, 120)

    # --- ladder window: 4 dbl + 2 madd
    def window(a, b):
        px, py, pz = a, b, one_(a)
        for _ in range(4):
            px, py, pz = K._dbl(px, py, pz)
        px, py, pz = K._madd_core(px, py, pz, a, b)
        px, py, pz = K._madd_core(px, py, pz, b, a)
        return F.add(px, F.add(py, pz))

    per_window = run_stage("ladder window", window, bt, 200, 600)
    print(f"  -> full 32-window ladder: {per_window*32*1e6:.0f} us")

    # --- table build: chain + cross-lane inversion + beta
    def table(a, b):
        one = one_(a)
        beta = F.literal_planes(F.int_to_limbs(S.GLV_BETA), a.shape[1])
        d2x, d2y, d2z = K._dbl(a, b, one)
        qzz = F.sqr(d2z)
        qzc = F.mul(d2z, qzz)
        chain = [K._madd_core(d2x, d2y, d2z, a, b)]
        for _ in range(6):
            c = chain[-1]
            chain.append(K._jadd_shared_core(c[0], c[1], c[2],
                                             d2x, d2y, d2z, qzz, qzc))
        zinvs = K._inv_chain_raw([c[2] for c in chain])
        acc = F.mul(beta, a)
        for m in range(1, 8):
            zi = zinvs[m - 1]
            zi2 = F.sqr(zi)
            acc = F.add(acc, F.mul(chain[m - 1][0], zi2))
        return acc

    run_stage("table+inv", table, bt, 40, 120)

    # --- serialize + tagged hash
    def serialize(a, b):
        zi = K._inv_chain_raw([b])[0]
        zi2 = F.sqr(zi)
        x_aff = K._canon2d(F.mul(a, zi2))
        y_aff = K._canon2d(F.mul(b, F.mul(zi, zi2)))
        parity = (y_aff[0:1] & 1).astype(jnp.uint32)
        hw = K._tagged_hash_2d(K._words_be_2d(x_aff), parity)
        return K._bytes_from_words_2d(hw)[: F.NLIMBS]

    run_stage("serial+hash", serialize, bt, 100, 300)

    # --- comb: 32 one-hot selects + madds
    comb = np.asarray(S.comb_table(), np.float32)

    def comb_stage(a, b, comb_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, a.shape[1]), 0)
        px, py, pz = a, b, one_(a)

        def win(i, carry):
            px, py, pz = carry
            tab = comb_ref[i]
            byte = px[0:1] & 255
            onehot = (iota == byte).astype(jnp.float32)
            sel = jax.lax.dot_general(
                tab, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
            return K._madd_core(px, py, pz, sel[: F.NLIMBS], sel[F.NLIMBS:])

        px, py, pz = jax.lax.fori_loop(0, 32, win, (px, py, pz))
        return F.add(px, F.add(py, pz))

    run_stage("comb32", comb_stage, bt, 30, 90, extra_in=(comb,))

    # --- comb, kernel-faithful: bytes staged through VMEM scratch and read
    # back with a dynamic row slice per window (what _scan_kernel does)
    def comb_scratch(a, b, comb_ref, sbytes):
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, a.shape[1]), 0)
        sbytes[:] = jnp.concatenate([a, a[:12]], axis=0) & 255
        px, py, pz = a, b, one_(a)

        def win(i, carry):
            px, py, pz = carry
            tab = comb_ref[i]
            byte = sbytes[pl.ds(i, 1), :]
            onehot = (iota == byte).astype(jnp.float32)
            sel = jax.lax.dot_general(
                tab, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
            return K._madd_core(px, py, pz, sel[: F.NLIMBS], sel[F.NLIMBS:])

        px, py, pz = jax.lax.fori_loop(0, 32, win, (px, py, pz))
        return F.add(px, F.add(py, pz))

    run_stage("comb32 scratch", comb_scratch, bt, 30, 90, extra_in=(comb,),
              scratch=(pltpu.VMEM((32, bt), jnp.int32),))

    # --- full fused kernel reference point (per tile)
    from cudasp_tpu.io import ingest
    from cudasp_tpu.oracle import vectors as V

    B = 262144
    rows = V.CASES[0].rows
    blobs = np.tile(np.frombuffer(rows[0].tweak_blob, np.uint8), (B, 1))
    rng = np.random.default_rng(0)
    M = 3
    oh = rng.integers(0, 2**31, (B, M)).astype(np.int32)
    ol = rng.integers(0, 2**31, (B, M)).astype(np.int32)
    planes = K.pack_batch_arrays(blobs, np.ones(B, bool), oh, ol,
                                 np.ones((B, M), bool), bt)
    dev = tuple(jax.device_put(a) for a in planes)
    w, sx, sy, lx, ly, nl = ingest.pack_query_keys(
        V.CASES[0].scan_key_blob, V.CASES[0].spend_blob, [])
    digits = jnp.asarray(np.asarray(w.odd, np.int32))
    sxd, syd, lxd, lyd = (jnp.asarray(x) for x in K.pack_query_arrays(
        sx, sy, lx, ly, bt))
    combj = K.comb_table_kernel()

    def full():
        return K._scan_pallas_call(*dev, digits, sxd, syd, lxd, lyd, combj,
                                   nlabels=nl, block_rows=bt)

    t = _time(full, ())
    per_tile = t / (B // bt)
    print(f"{'FULL kernel':14s} {per_tile*1e6:9.1f} us/tile  "
          f"({B/t/1e6:.3f} M rows/s)")

    # --- match: 2 adds + shared inv + canon/words/compare
    def match(a, b):
        one = one_(a)
        fx, fy, fz = K._madd_core(a, b, one, b, a)
        cx, cy, cz = K._madd_core(fx, fy, fz, a, b)
        zinvs = K._inv_chain_raw([fz, cz])
        hit = jnp.zeros((1, a.shape[1]), jnp.bool_)
        for (x, z), zi in zip(((fx, fz), (cx, cz)), zinvs):
            xc = K._canon2d(F.mul(x, F.sqr(zi)))
            w = K._words_be_2d(xc)
            hit = hit | ((w[0:1] == w[1:2]) & (w[2:3] == w[3:4]))
        return K._sel(hit, a, b)

    run_stage("match2", match, bt, 100, 300)


if __name__ == "__main__":
    main()
