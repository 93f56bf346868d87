#!/usr/bin/env python
"""Scaling-efficiency probe over a virtual (or real) device mesh.

BASELINE.md's second target is >=85% scaling efficiency at 2 hosts (the
reference manages 58% at 2 GPUs because one host thread feeds both,
/root/reference/README.md:139-140). Real multi-chip hardware is not
reachable from this environment, so this probe quantifies what CAN be
measured without it:

  1. WEAK SCALING of the sharded scan step (XLA pipeline backend) over
     1/2/4/8 virtual devices: per-device rows held constant, so perfect
     scaling = flat step time. This exercises GSPMD partitioning + the
     cross-shard match-count collective — the framework overhead that
     would gate real scaling (the per-host ingest path is independent by
     construction; see runtime.executor's per-host feeder).
  2. The all_to_all EXCHANGE cost (parallel.exchange.rebalance) per batch
     at each mesh size — the only collective on the rebalanced path.

Run on CPU:
  JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8 \
    --xla_cpu_use_fusion_emitters=false" python tools/scaling_probe.py

  3. SERIAL-FRACTION attribution per mesh size (VERDICT r3 item 7): the
     sharded step is re-timed WITHOUT its cross-shard reduction (flags
     stay sharded; no collective) and a collective-only step (psum of a
     tiny array) isolates dispatch+collective cost. serial_fraction =
     (t_step - t_noreduce + t_tiny) / t_step is the share of the step the
     framework adds on top of per-shard compute — the quantity that
     bounds real multi-host efficiency (projected_eff ~ 1 -
     serial_fraction) and that a shared-CPU virtual mesh CAN measure.

Prints one JSON line per configuration plus a summary efficiency table,
and writes the whole set to --out (default SCALING.json, committed as a
round artifact).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-device", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--mesh-sizes", type=int, nargs="*", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json"))
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import __graft_entry__ as G
    from cudasp_tpu.ops.pipeline import scan_batch_fused
    from cudasp_tpu.parallel import exchange
    from cudasp_tpu.parallel.mesh import BatchShardings, make_mesh

    navail = len(jax.devices())
    sizes = args.mesh_sizes or [n for n in (1, 2, 4, 8) if n <= navail]
    print(f"# devices: {navail} x {jax.devices()[0].platform}",
          file=sys.stderr)

    artifact = {"device": jax.devices()[0].platform,
                "n_devices_available": navail, "probes": []}

    def emit(rec):
        artifact["probes"].append(rec)
        print(json.dumps(rec))

    results = []
    serial = {}
    for ndev in sizes:
        mesh = make_mesh(ndev)
        sh = BatchShardings(mesh)
        B = args.rows_per_device * ndev
        a, nlabels = G._example_args(B=B)
        (tx, ty, rv, oh, ol, ov, w, sx, sy, lx, ly) = a
        tx = jax.device_put(tx, sh.limbs)
        ty = jax.device_put(ty, sh.limbs)
        rv = jax.device_put(rv, sh.rows)
        oh = jax.device_put(oh, sh.row_major)
        ol = jax.device_put(ol, sh.row_major)
        ov = jax.device_put(ov, sh.row_major)
        w, sx, sy, lx, ly = (jax.device_put(x, sh.replicated)
                             for x in (w, sx, sy, lx, ly))
        aa = (tx, ty, rv, oh, ol, ov, w, sx, sy, lx, ly)

        @jax.jit
        def step(tx, ty, rv, oh, ol, ov, w, sx, sy, lx, ly):
            flags = scan_batch_fused(tx, ty, rv, oh, ol, ov,
                                     w, sx, sy, lx, ly, nlabels=nlabels)
            return jnp.sum(flags)

        @jax.jit
        def step_noreduce(tx, ty, rv, oh, ol, ov, w, sx, sy, lx, ly):
            # flags stay lane-sharded: per-shard compute + dispatch, NO
            # cross-shard collective
            return scan_batch_fused(tx, ty, rv, oh, ol, ov,
                                    w, sx, sy, lx, ly, nlabels=nlabels)

        def timed(fn, sync):
            sync(fn(*aa))                                  # warm
            best = 1e9
            for _ in range(args.reps):
                t0 = time.perf_counter()
                sync(fn(*aa))
                best = min(best, time.perf_counter() - t0)
            return best

        best = timed(step, np.asarray)
        t_nored = timed(step_noreduce, jax.block_until_ready)
        # collective-only floor: a psum of a tiny replicated array over
        # the same mesh (pure dispatch + collective constant)
        from jax.sharding import NamedSharding, PartitionSpec

        tiny = jax.device_put(np.ones((8,), np.float32),
                              NamedSharding(mesh, PartitionSpec()))

        @jax.jit
        def tiny_step(v):
            return jnp.sum(v) * 1.0

        t_tiny = timed(lambda *_: tiny_step(tiny), np.asarray)
        sfrac = max(0.0, (best - t_nored + t_tiny) / best)
        serial[ndev] = sfrac
        results.append((ndev, B, best))
        emit({
            "probe": "weak_scaling_scan", "n_devices": ndev, "rows": B,
            "seconds": round(best, 4),
            "rows_per_s": round(B / best, 1),
            "seconds_no_reduce": round(t_nored, 4),
            "seconds_dispatch_floor": round(t_tiny, 4),
            "serial_fraction": round(sfrac, 4),
            "projected_efficiency_bound": round(1.0 - sfrac, 4),
        })

    # exchange (all_to_all + compaction) cost per batch at each mesh size
    for ndev in sizes:
        if ndev == 1:
            continue
        mesh = make_mesh(ndev)
        br = 128
        B = args.rows_per_device * ndev
        rng = np.random.default_rng(0)
        tw = jnp.asarray(rng.integers(0, 2**32, (8, B), dtype=np.uint64)
                         .astype(np.uint32))
        oh_p = jnp.asarray(rng.integers(0, 2**32, (3, B), dtype=np.uint64)
                           .astype(np.uint32))
        ovm = jnp.asarray(
            ((np.arange(B) < B // 2).astype(np.uint32) << 31)[None, :])

        def ex():
            planes, counts, bmask = exchange.rebalance(
                mesh, tw, oh_p, ovm, block_rows=br)
            return np.asarray(bmask)

        ex()                                           # warm
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            ex()
            best = min(best, time.perf_counter() - t0)
        emit({
            "probe": "exchange_rebalance", "n_devices": ndev, "rows": B,
            "seconds": round(best, 4),
            "rows_per_s": round(B / best, 1),
        })

    print("\n# weak-scaling efficiency (t1 / tN, per-device rows constant):",
          file=sys.stderr)
    for ndev, B, t in results:
        eff = results[0][2] / t
        print(f"#   {ndev} dev: {t*1e3:8.1f} ms  {B/t:12,.0f} rows/s  "
              f"eff={eff:.2f}  serial_frac={serial[ndev]:.3f}",
              file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
