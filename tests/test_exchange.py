"""all_to_all row rebalancing (parallel.exchange) on the virtual 8-device
CPU mesh: skewed shards equalize, rows survive the exchange bit-exactly,
and the valid-prefix invariant holds for downstream block-skipping."""

import numpy as np
import jax
import pytest

from cudasp_tpu.parallel import exchange as X
from cudasp_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _skewed_planes(ndev=8, per=64, live=(60, 40, 20, 10, 5, 2, 0, 0),
                   seed=0):
    """Lane-sharded planes with heavily skewed per-shard live prefixes."""
    B = ndev * per
    rng = np.random.default_rng(seed)
    tw = rng.integers(0, 2**32, (8, B), dtype=np.uint32)
    oh = rng.integers(0, 2**32, (3, B), dtype=np.uint32)
    ovm = np.zeros((1, B), np.uint32)
    for d in range(ndev):
        n = live[d]
        assert n <= per
        ovm[0, d * per : d * per + n] = np.uint32(1 << X.ROW_VALID_BIT)
        # dead lanes carry garbage that must NOT survive as valid
        tw[:, d * per + n : (d + 1) * per] = 0xDEAD
    return tw, oh, ovm, np.asarray(live)


def test_rebalance_counts_and_rows():
    mesh = make_mesh(8)
    tw, oh, ovm, live = _skewed_planes()
    per = tw.shape[1] // 8

    from jax.sharding import NamedSharding, PartitionSpec as P

    lane = NamedSharding(mesh, P(None, "data"))
    planes, counts, bmask = X.rebalance(
        mesh, *(jax.device_put(a, lane) for a in (tw, oh, ovm)),
        block_rows=32)
    counts = np.asarray(counts)
    total = int(live.sum())
    # balance: every shard within ±ndev of the mean
    assert counts.sum() == total
    assert counts.max() - counts.min() <= 8
    # device-computed block mask matches the host-side rule
    assert np.array_equal(np.asarray(bmask),
                          X.blockmask_from_counts(counts, 2, 32))

    rtw, roh, rovm = (np.asarray(a) for a in planes)
    # valid-prefix invariant per shard
    v = (rovm[0] >> X.ROW_VALID_BIT) & 1
    for d in range(8):
        s = v[d * per : (d + 1) * per]
        assert (np.diff(s.astype(int)) <= 0).all(), "valid rows not a prefix"
        assert s.sum() == counts[d]

    # live rows survive bit-exactly: compare multisets of (tw col, oh col)
    def live_cols(t, o, mask):
        cols = np.concatenate([t, o], axis=0)[:, mask.astype(bool)]
        return sorted(map(tuple, cols.T.tolist()))

    before = live_cols(tw, oh, (ovm[0] >> X.ROW_VALID_BIT) & 1)
    after = live_cols(rtw, roh, v)
    assert before == after


def test_blockmask_from_counts():
    bm = X.blockmask_from_counts(np.asarray([300, 0, 512, 1]), 2, 256)
    assert bm.tolist() == [1, 1, 0, 0, 1, 1, 1, 0]


import os

_SLOW = pytest.mark.skipif(
    not os.environ.get("CUDASP_SLOW_TESTS"),
    reason="interpret-mode sharded kernel run is slow; CUDASP_SLOW_TESTS=1")


def test_executor_rebalanced_path_glue(monkeypatch):
    """scan(config=ScanConfig(mesh=..., rebalance=True)) routes batches
    through the exchange: the REAL all_to_all + compaction runs on the
    8-device mesh with a stub in place of the Pallas kernel (every live
    row 'matches'), proving source-row indices survive the exchange and
    map back correctly through the executor and the api."""
    import jax.numpy as jnp

    from cudasp_tpu import scan
    from cudasp_tpu.api import ScanConfig
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.ops import kernels as K

    def stub(tw, oh, ol, ovm, digits, sx, sy, lx, ly, comb, blockmask=None,
             **kw):
        return ((ovm >> 31) & 1).astype(jnp.int8)     # live rows match

    monkeypatch.setattr(K, "_scan_pallas_call", stub)
    K._sharded_scan_fn.cache_clear()
    try:
        mesh = make_mesh(8)
        case = V.CASES[0]
        n = 300                      # ragged: forces padding + rebalance
        rows = case.rows
        table = {
            "tweak_key": np.stack(
                [np.frombuffer(rows[j % len(rows)].tweak_blob, np.uint8)
                 for j in range(n)]),
            "outputs": [list(rows[j % len(rows)].outputs)
                        for j in range(n)],
        }
        cfg = ScanConfig(mesh=mesh, backend="pallas", rebalance=True,
                         block_rows=64, tile=1024)
        res = scan(table, case.scan_key_blob, case.spend_blob, config=cfg)
        assert res.indices.tolist() == list(range(n))
    finally:
        K._sharded_scan_fn.cache_clear()


@_SLOW
def test_rebalanced_scan_interpret():
    """End-to-end: skewed shards -> all_to_all rebalance -> block-skipped
    sharded scan (interpret mode) == golden expectations, with matches
    mapped back through the source-row planes."""
    import jax.numpy as jnp

    from cudasp_tpu.io import ingest
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.ops import kernels as K
    from cudasp_tpu.ops import scalar as S
    from cudasp_tpu.oracle.encoding import blob32_to_scalar
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8)
    case = V.CASES[0]
    rows = case.rows
    B = 8 * 128
    # all live rows crammed into the FIRST shard's lanes (worst-case skew)
    n_live = 128
    tweaks = np.zeros((B, 64), np.uint8)
    oh = np.zeros((B, 3), np.int32)
    ol = np.zeros((B, 3), np.int32)
    ov = np.zeros((B, 3), bool)
    rv = np.zeros(B, bool)
    expect_by_src = {}
    for j in range(n_live):
        r = rows[j % len(rows)]
        tweaks[j] = np.frombuffer(r.tweak_blob, np.uint8)
        o = np.asarray(r.outputs, np.int64)
        h, l = ingest.split_outputs_i64(o)
        oh[j, : len(o)] = h
        ol[j, : len(o)] = l
        ov[j, : len(o)] = True
        rv[j] = True
        expect_by_src[j] = r.height in case.expected_heights
    _, sx, sy, lx, ly, nl = ingest.pack_query_keys(
        case.scan_key_blob, case.spend_blob, case.label_blobs or [])
    digits = S.glv_odd_sched(blob32_to_scalar(case.scan_key_blob))
    planes = K.pack_batch_arrays(tweaks, rv, oh, ol, ov, B)
    src = np.arange(B, dtype=np.int64)
    shi, slo = ingest.split_outputs_i64(src)

    lane = NamedSharding(mesh, P(None, "data"))
    args = tuple(jax.device_put(jnp.asarray(a), lane)
                 for a in (*planes[:3], shi[None], slo[None], planes[3]))
    tw, poh, pol, shi_d, slo_d, ovm = args
    flags, rhi, rlo = X.rebalanced_scan(
        mesh, tw, poh, pol, ovm, shi_d, slo_d, jnp.asarray(digits),
        jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(lx), jnp.asarray(ly),
        K.comb_table_kernel(), nlabels=nl, block_rows=128,
        interpret=True)
    flags = np.asarray(flags)[0] != 0
    src_back = (np.asarray(rhi)[0].astype(np.int64) << 32) | (
        np.asarray(rlo)[0].astype(np.int64) & 0xFFFFFFFF)
    got = {int(s): bool(f) for s, f in zip(src_back, flags)
           if int(s) in expect_by_src}
    assert got == expect_by_src
