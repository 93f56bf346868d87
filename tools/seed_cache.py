#!/usr/bin/env python
"""Build the shipped compile-cache seed (VERDICT r3 item 2/4).

The reference AOT-compiles its kernels into the extension binary
(/root/reference/CMakeLists.txt:26-96); the TPU-native equivalent is a
seed directory of XLA-serialized executables that installs with the
package: runtime/compile_cache.ensure() links these into the live cache,
so a cold process on a matching device+jaxlib reaches its first timed
batch in seconds instead of the r3 bench's 294 s warmup.

This tool compiles every kernel variant the headline bench dispatches —
into a FRESH cache dir so the seed contains exactly those entries — then
copies them to cudasp_tpu/_cache/xla_seed/ (commit the result):

    python tools/seed_cache.py            # ~10-20 min of compiles, once

Variants covered (width 524800 = 524288-row batch at block_rows 640,
M=3 outputs, 0 labels): full skip-free, full+skip (tail), hi16, full64,
for both the executor scan and the kernel-only measurement (same jit
signature).
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    fresh = tempfile.mkdtemp(prefix="cudasp_seed_")
    os.environ["CUDASP_COMPILE_CACHE"] = fresh
    import numpy as np

    from cudasp_tpu import scan
    from cudasp_tpu.api import ScanConfig
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.runtime.compile_cache import SEED_DIR, ensure

    ensure()

    n = 524_289                   # forces the 524800-lane uniform width
    rng = np.random.default_rng(1)
    tweaks = rng.integers(0, 256, size=(n, 64), dtype=np.uint8)
    flat = rng.integers(-2**62, 2**62, size=n * 3, dtype=np.int64)
    offsets = np.arange(n + 1, dtype=np.int64) * 3
    table = {"tweak_key": tweaks, "outputs": (flat, offsets)}

    for upload in ("full", "hi16", "full64", "auto"):
        t0 = time.time()
        try:
            res = scan(table, V.SCAN_KEY_BIP352, V.SPEND_BIP352, (),
                       config=ScanConfig(batch_size=524_288,
                                         upload=upload))
        except Exception as e:                         # noqa: BLE001
            print(f"# upload={upload}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        print(f"# upload={upload}: {time.time()-t0:.1f}s "
              f"({len(res)} matches)", file=sys.stderr)

    # background prewarm threads compile the remaining variants — wait
    from cudasp_tpu.runtime.executor import BatchExecutor

    BatchExecutor.join_prewarm()
    os.makedirs(SEED_DIR, exist_ok=True)
    copied = 0
    for name in os.listdir(fresh):
        dst = os.path.join(SEED_DIR, name)
        if not os.path.exists(dst):
            shutil.copy2(os.path.join(fresh, name), dst)
            copied += 1
    total = sum(os.path.getsize(os.path.join(SEED_DIR, f))
                for f in os.listdir(SEED_DIR))
    print(f"seeded {copied} new entries -> {SEED_DIR} "
          f"({total/1e6:.1f} MB total)")
    print("commit cudasp_tpu/_cache/xla_seed/ to ship them")


if __name__ == "__main__":
    main()
