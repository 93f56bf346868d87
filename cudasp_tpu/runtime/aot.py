"""AOT-compiled kernel store: serialize/restore whole TPU executables.

The reference AOT-compiles its kernels into the extension binary, so a
cold process pays milliseconds before its first batch
(/root/reference/CMakeLists.txt:26-96). The JAX equivalent shipped here:
`jax.experimental.serialize_executable` pickles a compiled executable
(PjRt serialization), and loading one skips BOTH the ~30 s/variant
Python trace+Mosaic lowering AND the ~50-150 s XLA compile — the two
costs that made r3's cold bench spend 294 s before its first row.

Layout: cudasp_tpu/_cache/aot/<digest>.jaxexe (pickle of payload +
arg trees), plus manifest entries keyed by a variant signature that
mirrors the executor's dispatch arguments. Entries are gated on
(device_kind, jaxlib version): a mismatched entry is skipped, never an
error. tools/seed_cache.py writes the store; runtime.executor consults
it on every dispatch before falling back to the jit path.

Verified on the axon remote backend (serialize -> new process ->
deserialize_and_load -> correct result).
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import threading
from typing import Optional

AOT_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "_cache", "aot")

_lock = threading.Lock()
_loaded: dict = {}            # digest -> callable (or None = load failed)
_manifest_cache = None


_src_digest_cache = None


def _src_digest() -> str:
    """Digest of the compute-path sources an executable was traced from.
    A stored executable is a compiled artifact of ops/*.py at seed time;
    without this tag, editing a kernel would let the store silently serve
    the OLD code for unchanged call signatures (the reference's analog:
    the extension binary is rebuilt whenever its .cu sources change)."""
    global _src_digest_cache
    if _src_digest_cache is None:
        import glob

        ops = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "ops")
        h = hashlib.sha256()
        # every ops/*.py, discovered — a NEW compute-path module must
        # invalidate the store too (ADVICE r4), not just the original five
        for path in sorted(glob.glob(os.path.join(ops, "*.py"))):
            h.update(os.path.basename(path).encode() + b"\0")
            try:
                with open(path, "rb") as f:
                    h.update(f.read())
            except OSError:                        # pragma: no cover
                h.update(b"?")
        _src_digest_cache = h.hexdigest()[:16]
    return _src_digest_cache


def _env_tag():
    import jax

    try:
        kind = jax.devices()[0].device_kind
    except Exception:                              # pragma: no cover
        kind = "unknown"
    return {"device_kind": kind, "jaxlib": jax.__version__,
            "src": _src_digest()}


def signature(*, nlabels: int, block_rows: int, ladder: str, hi_only,
              nout, wire: str, skip: bool, shapes,
              pack_flags: bool = False, static_sched=None) -> str:
    """Stable digest of one kernel variant: the jit static args plus the
    (shape, dtype) list of its array arguments. static_sched (the per-key
    compiled ladder's literal schedule) is part of the program identity —
    two scan keys never share an executable in static mode."""
    payload = json.dumps({
        "nlabels": nlabels, "block_rows": block_rows, "ladder": ladder,
        "hi_only": str(hi_only), "nout": nout, "wire": wire, "skip": skip,
        "pack_flags": bool(pack_flags),
        "static_sched": (None if static_sched is None
                         else [list(s) for s in static_sched]),
        "shapes": [[list(s), str(d)] for s, d in shapes],
    }, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:24]


def arg_shapes(args) -> list:
    """(shape, dtype) per array arg; None placeholders (absent blockmask)
    are skipped — the `skip` flag in the signature carries that bit."""
    return [(tuple(a.shape), a.dtype.name) for a in args if a is not None]


def _manifest_path():
    return os.path.join(AOT_DIR, "manifest.json")


def _manifest() -> dict:
    global _manifest_cache
    if _manifest_cache is None:
        try:
            with open(_manifest_path()) as f:
                _manifest_cache = json.load(f)
        except (OSError, ValueError):
            _manifest_cache = {}
    return _manifest_cache


def save(digest: str, compiled) -> Optional[str]:
    """Serialize a jax Compiled into the store; returns the path."""
    from jax.experimental import serialize_executable

    payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    os.makedirs(AOT_DIR, exist_ok=True)
    path = os.path.join(AOT_DIR, f"{digest}.jaxexe")
    with open(path, "wb") as f:
        pickle.dump({"payload": payload, "in_tree": in_tree,
                     "out_tree": out_tree}, f)
    man = _manifest()
    man[digest] = _env_tag()
    with open(_manifest_path(), "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    return path


def lookup(digest: str):
    """Deserialized executable for this variant, or None. Results are
    memoized (including failures); entries for another device kind or
    jaxlib version are skipped without touching the file."""
    with _lock:
        if digest in _loaded:
            return _loaded[digest]
        ent = _manifest().get(digest)
        if ent is None or ent != _env_tag():
            _loaded[digest] = None
            return None
        try:
            from jax.experimental import serialize_executable

            with open(os.path.join(AOT_DIR, f"{digest}.jaxexe"),
                      "rb") as f:
                d = pickle.load(f)
            fn = serialize_executable.deserialize_and_load(
                d["payload"], d["in_tree"], d["out_tree"])
            _loaded[digest] = fn
        except Exception:                          # pragma: no cover
            _loaded[digest] = None                 # corrupt/incompatible
        return _loaded[digest]


def maybe_call(args, *, nlabels, block_rows, ladder="fixed",
               hi_only=False, nout=None, wire="x", pack_flags=False,
               static_sched=None):
    """Run the scan kernel from the AOT store if a matching executable
    exists; returns the flags array or None (caller falls back to jit).
    `args` is the full positional tuple (tweaks..comb, blockmask-or-None)
    in _scan_pallas_call order."""
    fn = lookup(signature(nlabels=nlabels, block_rows=block_rows,
                          ladder=ladder, hi_only=hi_only, nout=nout,
                          wire=wire, skip=args[-1] is not None,
                          shapes=arg_shapes(args),
                          pack_flags=pack_flags,
                          static_sched=static_sched))
    return None if fn is None else fn(*args)


def available() -> int:
    """Number of store entries usable in this environment."""
    tag = _env_tag()
    return sum(1 for v in _manifest().values() if v == tag)
