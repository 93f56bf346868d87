#!/usr/bin/env python
"""Build the shipped compile stores (VERDICT r3 items 2/4).

The reference AOT-compiles its kernels into the extension binary
(/root/reference/CMakeLists.txt:26-96); this writes the TPU-native
equivalents for every kernel variant the headline bench dispatches:

  1. cudasp_tpu/_cache/aot/  — whole serialized executables
     (jax.experimental.serialize_executable). Loading one skips BOTH the
     ~30 s/variant Python trace+Mosaic lowering and the XLA compile; the
     executor consults this store on every dispatch (runtime/aot.py).
  2. cudasp_tpu/_cache/xla_seed/ — persistent-compile-cache entries
     (fallback for call shapes the AOT store misses; cross-script key
     stability requires the location-stripping flags compile_cache.ensure
     now sets).

Run on the target device kind and commit the _cache additions:

    python tools/seed_cache.py              # ~10 min of compiles, once

Variants covered (width 524800 = 524288-row batch at the device-default
block_rows, M=3 outputs, 0 labels): full skip-free, full+skip (tail),
hi16, hi8, full64 — the set a headline bench.py run dispatches.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=524288,
                    help="batch size whose padded lane width to seed "
                         "(bench default 524288; the API/CLI default is "
                         "300000 — seed that too for user-facing hosts)")
    ap.add_argument("--core-only", action="store_true",
                    help="seed only the fixed-ladder production set "
                         "(full, skip, hi8, skip+hi8) — for extra widths "
                         "where the full 11-variant set is overkill")
    args_cli = ap.parse_args()

    fresh = tempfile.mkdtemp(prefix="cudasp_seed_")
    os.environ["CUDASP_COMPILE_CACHE"] = fresh
    import numpy as np

    from cudasp_tpu.runtime import aot, tuning
    from cudasp_tpu.runtime.compile_cache import SEED_DIR, ensure

    ensure()
    import jax
    import jax.numpy as jnp

    from cudasp_tpu.io import ingest
    from cudasp_tpu.ops import kernels as K
    from cudasp_tpu.ops import scalar as S
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.oracle.encoding import blob32_to_scalar

    br = tuning.block_rows_default()
    w = ((args_cli.batch_size + br - 1) // br) * br
    M = 3
    print(f"# device: {jax.devices()[0].device_kind}  width={w} br={br}",
          file=sys.stderr)

    windows, sx, sy, lx, ly, nl = ingest.pack_query_keys(
        V.SCAN_KEY_BIP352, V.SPEND_BIP352, [])
    digits = jnp.asarray(np.asarray(
        S.glv_odd_sched(blob32_to_scalar(V.SCAN_KEY_BIP352)), np.int32))
    dq = tuple(jnp.asarray(a) for a in
               K.pack_query_arrays(sx, sy, lx, ly, br))
    comb = K.comb_table_kernel()

    def z(shape):
        return jnp.zeros(shape, jnp.uint32)

    # the static (per-key compiled) ladder variants are seeded for the
    # bench scan key — a production deployment re-runs this seeder for its
    # own key (the whole point of static_key: one compile per key, then
    # the AOT store makes every process start warm)
    ssched = S.glv_wnaf_static(blob32_to_scalar(V.SCAN_KEY_BIP352))

    skipmask = np.ones(w // br, np.int32)
    skipmask[-1] = 0
    variants = [
        ("full",   (z((8, w)), z((M, w)), z((M, w)), z((1, w))),
         None, False, None, "x", "fixed"),
        ("skip",   (z((8, w)), z((M, w)), z((M, w)), z((1, w))),
         jnp.asarray(skipmask), False, None, "x", "fixed"),
        ("hi16",   (z((8, w)), z(((M + 2) // 2, w)), z((1, 1)), z((1, 1))),
         None, "hi16", M, "x", "fixed"),
        ("hi8",    (z((8, w)), z(((M + 4) // 4, w)), z((1, 1)), z((1, 1))),
         None, "hi8", M, "x", "fixed"),
        ("full64", (z((16, w)), z((M, w)), z((M, w)), z((1, w))),
         None, False, None, "xy", "fixed"),
        # tail (skip) programs for the thin wires: the executor ships the
        # tail batch cut/uncompressed-64 once these are warm
        ("hi8+sk", (z((8, w)), z(((M + 4) // 4, w)), z((1, 1)), z((1, 1))),
         jnp.asarray(skipmask), "hi8", M, "x", "fixed"),
        ("f64+sk", (z((16, w)), z((M, w)), z((M, w)), z((1, w))),
         jnp.asarray(skipmask), False, None, "xy", "fixed"),
        # per-key compiled ladder (bench key): full64 + hi8 wires, both
        # skip forms — what a static_key production scan dispatches
        ("st64",   (z((16, w)), z((M, w)), z((M, w)), z((1, w))),
         None, False, None, "xy", "static"),
        ("st64+s", (z((16, w)), z((M, w)), z((M, w)), z((1, w))),
         jnp.asarray(skipmask), False, None, "xy", "static"),
        ("st-h8",  (z((8, w)), z(((M + 4) // 4, w)), z((1, 1)), z((1, 1))),
         None, "hi8", M, "x", "static"),
        ("st-h8s", (z((8, w)), z(((M + 4) // 4, w)), z((1, 1)), z((1, 1))),
         jnp.asarray(skipmask), "hi8", M, "x", "static"),
    ]
    if args_cli.core_only:
        variants = [v for v in variants
                    if v[0] in ("full", "skip", "hi8", "hi8+sk")]
    skipped = 0
    for name, dev, bmask, hi, nout, wire, lad in variants:
        ss = ssched if lad == "static" else None
        args = (*dev, digits, *dq, comb, bmask)
        dig = aot.signature(nlabels=0, block_rows=br, ladder=lad,
                            hi_only=hi, nout=nout, wire=wire,
                            skip=bmask is not None,
                            shapes=aot.arg_shapes(args), pack_flags=True,
                            static_sched=ss)
        # an up-to-date entry (same signature, same device/jaxlib/source
        # tag) is left untouched: re-serializing is not byte-stable and
        # would churn the committed store for identical programs
        if (aot._manifest().get(dig) == aot._env_tag()
                and os.path.exists(
                    os.path.join(aot.AOT_DIR, f"{dig}.jaxexe"))):
            print(f"# {name:7s} up to date -> {dig}.jaxexe",
                  file=sys.stderr)
            skipped += 1
            continue
        t0 = time.time()
        lowered = K._scan_pallas_call.lower(
            *args, nlabels=0, block_rows=br, ladder=lad,
            hi_only=hi, nout=nout, wire=wire, pack_flags=True,
            static_sched=ss)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        path = aot.save(dig, compiled)
        print(f"# {name:7s} lower {t1-t0:5.1f}s  compile {t2-t1:6.1f}s  "
              f"-> {os.path.basename(path)} "
              f"({os.path.getsize(path)/1e6:.1f} MB)", file=sys.stderr)

    # prune AOT entries THIS host can vouch are stale: same device kind +
    # jaxlib but an outdated source digest. Entries for OTHER device kinds
    # or jaxlib versions are kept — this seeder cannot know whether they
    # are current there, and deleting them would wipe another device's
    # committed seeds (ADVICE r4)
    man = aot._manifest()
    tag = aot._env_tag()
    stale = [d for d, ent in man.items()
             if ent != tag
             and ent.get("device_kind") == tag["device_kind"]
             and ent.get("jaxlib") == tag["jaxlib"]]
    for dig in stale:
        man.pop(dig)
        try:
            os.remove(os.path.join(aot.AOT_DIR, f"{dig}.jaxexe"))
        except OSError:
            pass
    import json as _json

    with open(os.path.join(aot.AOT_DIR, "manifest.json"), "w") as f:
        _json.dump(man, f, indent=1, sort_keys=True)

    # xla_seed entries are opaque XLA cache keys with no readable device
    # tag, so a sidecar manifest records which env each shipped file came
    # from; on a full recompile only files recorded for THIS device kind +
    # jaxlib with a stale src are pruned (never rmtree — other devices'
    # seeds live here too, ADVICE r4). Untracked legacy files are left
    # alone: manual cleanup only.
    os.makedirs(SEED_DIR, exist_ok=True)
    seed_man_path = os.path.join(SEED_DIR, "seed_manifest.json")
    try:
        with open(seed_man_path) as f:
            seed_man = _json.load(f)
    except (OSError, ValueError):
        seed_man = {}
    if not skipped:
        for name, ent in list(seed_man.items()):
            if (ent != tag and ent.get("device_kind") == tag["device_kind"]
                    and ent.get("jaxlib") == tag["jaxlib"]):
                seed_man.pop(name)
                try:
                    os.remove(os.path.join(SEED_DIR, name))
                except OSError:
                    pass
    copied = 0
    for name in os.listdir(fresh):
        dst = os.path.join(SEED_DIR, name)
        if not os.path.exists(dst):
            shutil.copy2(os.path.join(fresh, name), dst)
            copied += 1
        seed_man[name] = tag
    with open(seed_man_path, "w") as f:
        _json.dump(seed_man, f, indent=1, sort_keys=True)
    aot_total = sum(os.path.getsize(os.path.join(aot.AOT_DIR, f))
                    for f in os.listdir(aot.AOT_DIR))
    seed_total = sum(os.path.getsize(os.path.join(SEED_DIR, f))
                     for f in os.listdir(SEED_DIR))
    print(f"aot store: {aot.available()} usable entries "
          f"({aot_total/1e6:.1f} MB); xla seed: +{copied} entries "
          f"({seed_total/1e6:.1f} MB total)")
    print("commit cudasp_tpu/_cache/aot/ and cudasp_tpu/_cache/xla_seed/")


if __name__ == "__main__":
    main()
