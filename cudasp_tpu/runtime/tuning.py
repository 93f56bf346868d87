"""Measured per-device-kind performance defaults (VERDICT r3 item 6).

Every tunable the engine hard-coded in r3 (block_rows, dispatch tile,
scoped-VMEM budget) is keyed here off jax.devices()[0].device_kind, so
first contact with a new device kind (v5p, v6e, ...) runs the nearest
measured configuration instead of a v5e constant, and a one-command sweep
(tools/autotune.py) writes a better row for it.

Resolution order per knob:
  1. explicit ScanConfig value                (caller wins)
  2. CUDASP_* env var                         (operator override)
  3. autotuned row (cudasp_tpu/_cache/tuning_<kind>.json, written by
     tools/autotune.py)
  4. built-in measured table below            (nearest-kind fallback)

The built-in numbers are v5e-measured (ROADMAP r3: block_rows sweep
512/640/768/1024; tile sweep 262144/524288/1M; 100 MB scoped VMEM is the
largest the v5e compiles). The v5p/v6e rows start as v5e values with a
larger VMEM budget where the hardware is known to have it — they are
PLACEHOLDERS to be replaced by an autotune run on first contact.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "_cache")


@dataclass(frozen=True)
class DeviceDefaults:
    block_rows: int = 640          # Pallas lane-tile rows per grid step
    tile: int = 524288             # executor dispatch width (rows)
    vmem_limit_mb: int = 100       # scoped-VMEM budget for the fused kernel
    measured: bool = False         # True = from a real sweep on this kind


# substring match against device_kind (jax reports e.g. "TPU v5 lite",
# "TPU v5p", "TPU v4"); first hit wins, order most-specific first
_TABLE = (
    ("v5 lite", DeviceDefaults(640, 524288, 100, measured=True)),
    ("v5e",     DeviceDefaults(640, 524288, 100, measured=True)),
    ("v5p",     DeviceDefaults(640, 524288, 128)),
    ("v6",      DeviceDefaults(640, 524288, 128)),
    ("v4",      DeviceDefaults(512, 262144, 100)),
)

_FALLBACK = DeviceDefaults()


def device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:                              # pragma: no cover
        return "unknown"


def _autotuned(kind: str):
    path = os.path.join(_CACHE_DIR,
                        f"tuning_{kind.lower().replace(' ', '_')}.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            d = json.load(f)
        return DeviceDefaults(int(d["block_rows"]), int(d["tile"]),
                              int(d.get("vmem_limit_mb", 100)),
                              measured=True)
    except (OSError, KeyError, ValueError):        # pragma: no cover
        return None


def save_autotuned(kind: str, block_rows: int, tile: int,
                   vmem_limit_mb: int = 100) -> str:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    path = os.path.join(_CACHE_DIR,
                        f"tuning_{kind.lower().replace(' ', '_')}.json")
    with open(path, "w") as f:
        json.dump({"device_kind": kind, "block_rows": block_rows,
                   "tile": tile, "vmem_limit_mb": vmem_limit_mb}, f)
    return path


def defaults(kind: str | None = None) -> DeviceDefaults:
    kind = kind if kind is not None else device_kind()
    lk = kind.lower()
    tuned = _autotuned(kind)
    if tuned is not None:
        return tuned
    for sub, row in _TABLE:
        if sub in lk:
            return row
    return _FALLBACK


def block_rows_default() -> int:
    env = os.environ.get("CUDASP_BLOCK_ROWS")
    return int(env) if env else defaults().block_rows


def tile_default() -> int:
    env = os.environ.get("CUDASP_TILE")
    return int(env) if env else defaults().tile


def vmem_limit_bytes() -> int:
    env = os.environ.get("CUDASP_VMEM_MB")
    mb = int(env) if env else defaults().vmem_limit_mb
    return mb * 1024 * 1024
