"""AOT executable store (runtime/aot.py): signature stability, manifest
environment gating, and graceful fallback. The real serialize/deserialize
round-trip needs TPU hardware and is exercised by bench.py and the
executor dispatch (tools/seed_cache.py writes the store)."""

import json
import os

import numpy as np

from cudasp_tpu.runtime import aot


def test_signature_is_stable_and_shape_sensitive():
    shapes = [((8, 512), "uint32"), ((3, 512), "uint32")]
    a = aot.signature(nlabels=0, block_rows=640, ladder="fixed",
                      hi_only=False, nout=None, wire="x", skip=False,
                      shapes=shapes)
    b = aot.signature(nlabels=0, block_rows=640, ladder="fixed",
                      hi_only=False, nout=None, wire="x", skip=False,
                      shapes=list(shapes))
    assert a == b
    c = aot.signature(nlabels=0, block_rows=640, ladder="fixed",
                      hi_only=False, nout=None, wire="xy", skip=False,
                      shapes=shapes)
    assert c != a
    d = aot.signature(nlabels=0, block_rows=640, ladder="fixed",
                      hi_only=False, nout=None, wire="x", skip=False,
                      shapes=[((16, 512), "uint32")])
    assert d != a


def test_arg_shapes_skips_none_blockmask():
    x = np.zeros((8, 4), np.uint32)
    assert aot.arg_shapes((x, None)) == [((8, 4), "uint32")]


def test_lookup_unknown_and_wrong_env(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "AOT_DIR", str(tmp_path))
    monkeypatch.setattr(aot, "_manifest_cache", None)
    monkeypatch.setattr(aot, "_loaded", {})
    assert aot.lookup("nope") is None
    # a manifest entry recorded for another device kind must be skipped
    with open(os.path.join(str(tmp_path), "manifest.json"), "w") as f:
        json.dump({"abc": {"device_kind": "TPU v9", "jaxlib": "0.0.0"}}, f)
    monkeypatch.setattr(aot, "_manifest_cache", None)
    assert aot.lookup("abc") is None
    assert aot.available() == 0


def test_lookup_rejects_stale_source_digest(tmp_path, monkeypatch):
    """An entry seeded from OLD kernel sources must never load: editing
    ops/*.py would otherwise let the store silently serve stale code for
    unchanged call signatures."""
    monkeypatch.setattr(aot, "AOT_DIR", str(tmp_path))
    monkeypatch.setattr(aot, "_manifest_cache", None)
    monkeypatch.setattr(aot, "_loaded", {})
    ent = dict(aot._env_tag())
    assert len(ent.get("src", "")) == 16      # digest present + stable
    ent["src"] = "0" * 16                     # seeded from other sources
    with open(os.path.join(str(tmp_path), "manifest.json"), "w") as f:
        json.dump({"abc": ent}, f)
    monkeypatch.setattr(aot, "_manifest_cache", None)
    assert aot.lookup("abc") is None
    assert aot.available() == 0


def test_variant_signature_matches_dispatch():
    """executor._variant_signature (shapes-only, used by the feeder's
    warm-from-AOT gate) must produce EXACTLY the digest aot.maybe_call
    computes from the real dispatch arg arrays, for every wire/cut x skip
    combination — otherwise a seeded variant would never be considered
    warm (or worse, a wrong one would)."""
    import jax.numpy as jnp

    from cudasp_tpu.ops import field as F
    from cudasp_tpu.runtime.executor import _variant_signature

    width, M, br, L = 1280, 3, 128, 1
    N = F.NLIMBS
    digits = jnp.zeros((2, 34), jnp.int32)
    sx = sy = jnp.zeros((N, 1), jnp.int32)
    lx = ly = jnp.zeros((L, N, 1), jnp.int32)
    comb = jnp.zeros((32, 4 * N, 256), jnp.bfloat16)
    sched = ((0, 33), (4, 40))

    def z(shape):
        return jnp.zeros(shape, jnp.uint32)

    for tag, ladder, ss in [(None, "fixed", None), ("hi32", "fixed", None),
                            ("hi16", "fixed", None), ("hi8", "fixed", None),
                            ("full64", "fixed", None),
                            ("hi8", "static", sched),
                            ("full64", "static", sched)]:
        if tag in ("hi16", "hi8"):
            u = 2 if tag == "hi16" else 4
            dev = (z((8, width)), z(((M + u) // u, width)),
                   z((1, 1)), z((1, 1)))
            hi_only, nout, wire = tag, M, "x"
        elif tag == "hi32":
            dev = (z((8, width)), z((M, width)), z((M, 1)), z((1, width)))
            hi_only, nout, wire = True, None, "x"
        else:
            tw = 16 if tag == "full64" else 8
            dev = (z((tw, width)), z((M, width)), z((M, width)),
                   z((1, width)))
            hi_only, nout, wire = False, None, (
                "xy" if tag == "full64" else "x")
        for skip in (False, True):
            bmask = (jnp.zeros((width // br,), jnp.int32) if skip
                     else None)
            args = (*dev, digits, sx, sy, lx, ly, comb, bmask)
            want = aot.signature(
                nlabels=0, block_rows=br, ladder=ladder, hi_only=hi_only,
                nout=nout, wire=wire, skip=skip,
                shapes=aot.arg_shapes(args), pack_flags=True,
                static_sched=ss)
            got = _variant_signature(
                width, M, tag, skip, nlabels=0, block_rows=br,
                ladder=ladder, digits_shape=digits.shape, nlimbs=N, L=L,
                pack_flags=True, static_sched=ss)
            assert got == want, (tag, skip, ladder)


def test_maybe_call_falls_back(monkeypatch):
    monkeypatch.setattr(aot, "_loaded", {})
    monkeypatch.setattr(aot, "_manifest_cache", {})
    x = np.zeros((8, 4), np.uint32)
    assert aot.maybe_call((x, None), nlabels=0, block_rows=640) is None
