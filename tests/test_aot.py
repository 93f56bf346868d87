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


def test_maybe_call_falls_back(monkeypatch):
    monkeypatch.setattr(aot, "_loaded", {})
    monkeypatch.setattr(aot, "_manifest_cache", {})
    x = np.zeros((8, 4), np.uint32)
    assert aot.maybe_call((x, None), nlabels=0, block_rows=640) is None
