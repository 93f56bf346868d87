"""Fused Pallas TPU kernel: the entire scan pipeline, VMEM-resident.

The XLA-graph pipeline (ops/pipeline.py) is correct but HBM-bound on real
hardware: at production batch widths every field temporary is a multi-MB
HBM array and the 132-step EC ladder round-trips each of its ~2000 field
multiplies through HBM. This kernel is the TPU-native answer (the role the
hand-scheduled CUDA kernels play in the reference, but tiled for VMEM
instead of SMs): the grid walks row tiles of `block_rows` lanes, and one
kernel invocation takes a tile from tweak-point limbs all the way to match
flags without touching HBM in between:

    decompress (x -> y)      - sqrt(x^3+7) ladder + wire parity bit (tweaks
                               upload as 32-B x only; see pack_batch_arrays.
                               wire="xy" ships the full 64-B point instead
                               and skips this stage entirely — the fast-
                               link mode, VERDICT r3 item 2)
    table build (7 pts)      - Jacobian chain + one cross-lane inversion,
                               GLV half-2 derived via the lambda
                               endomorphism (x -> beta*x) instead of a
                               second chain
    GLV ladder (32 windows)  - 4 doublings + 2 mixed adds per window;
                               odd signed digits (never zero) arrive via
                               scalar prefetch (SMEM), so table selects are
                               shared-index dynamic slices with no skip
                               selects and no infinity tracking
    to-affine + tagged hash  - cross-lane batched inversion (_inv_lanes:
                               prefix/suffix scans + one narrow ladder),
                               canonicalize, 1 SHA-256 compression
                               (midstate folded into literals)
    fixed-base comb (32 win) - one-hot bf16 matmuls on the MXU against the
                               resident split G-multiple table + mixed add
    spend/label adds + match - shared-chain + cross-lane inversion,
                               upper-64 extract, semi-join against the
                               padded outputs plane

Reference parity: semantics match src/cudasp_gpu.cu:74-178 + :236-354
(serialize, tagged hash, fixed-point mult, match w/ labels); degenerate
rows (point at infinity, zero digits) are handled by lane selects instead
of UB. p == +-q collisions inside adds are not special-cased: for honest
inputs they require ~2^-124 scalar coincidences (the reference's gECC adds
have the same exposure).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle.sha256 import K as _SHA_K
from ..oracle.sha256 import tagged_midstate
from . import curve as C
from . import field as F
from . import scalar as S

TAG_MIDSTATE = tagged_midstate(b"BIP0352/SharedSecret")
BITLEN = (64 + 37) * 8          # tag block + 37-byte message

# Profiling-only stage ablation (tools/ablate_probe.py): comma-separated
# stage names whose work is replaced by cheap shape-preserving stand-ins,
# so (base - ablated) attributes kernel time per stage WITHOUT letting the
# compiler dead-code the rest of the pipeline. NEVER set in production —
# ablated kernels return garbage flags. Read at import; each probe runs in
# a fresh process.
_ABLATE = frozenset(
    s for s in os.environ.get("CUDASP_ABLATE", "").split(",") if s)


# ---------------------------------------------------------------------------
# 2D-safe helpers (kernel values keep a (rows, lanes) layout; masks are
# (1, BT) so broadcasts never create 1-D or 3-D intermediates)
# ---------------------------------------------------------------------------


def _sel(mask, a, b):
    """mask: (1, BT) bool; a/b: (K, BT) or broadcastable."""
    return jnp.where(mask, a, b)


def _is_zero2d(a):
    """Field-element zero test -> (1, BT) bool."""
    v = F._carry(F._finalize(a), F.NLIMBS)
    zero = jnp.all(v == 0, axis=0, keepdims=True)
    isp = jnp.all(v == F._p_col(), axis=0, keepdims=True)
    return zero | isp


def _shift_up(x, s):
    """Rows shifted toward higher limb index by s (zeros filled below)."""
    z = jnp.zeros((s,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([z, x[: x.shape[0] - s]], axis=0)


def _borrow_scan(diff):
    """Kogge-Stone borrow propagation for a limbwise difference v - p with
    per-limb values in (-2^13, 2^13]. Returns (bout, bin_, ge):
    bout[i] = borrow OUT of limb i (int32 0/1, bin into limb 0 is 0),
    bin_[i] = borrow INTO limb i, ge = (1, BT) bool, true iff the
    difference is >= 0 (no final borrow) — i.e. v >= p.

    log2(NLIMBS) = 5 passes of shifted and/or, replacing the serial
    20-where lexicographic compare + 20-pass signed ripple the r3 kernel
    paid at every canonicalization (VERDICT r3 next-round item 1)."""
    g = (diff < 0).astype(jnp.int32)
    pr = (diff == 0).astype(jnp.int32)
    s = 1
    while s < F.NLIMBS:
        g = g | (pr & _shift_up(g, s))
        pr = pr & _shift_up(pr, s)
        s *= 2
    bout = g
    ge = bout[F.NLIMBS - 1 : F.NLIMBS] == 0
    return bout, _shift_up(bout, 1), ge


def _canon2d(a):
    """Canonical (< p) limbs; the (1, BT)-shaped port of F.canonical.
    The conditional subtract resolves its borrows with one parallel-prefix
    scan (value-exact: sum_i r_i 2^13i telescopes to v - p when ge)."""
    v = F._carry(F._finalize(a), F.NLIMBS)
    diff = v - F._p_col()
    bout, bin_, ge = _borrow_scan(diff)
    r = diff - bin_ + (bout << F.LB)
    return jnp.where(ge, r, v)


def _parity2d(a):
    """Low bit of the canonical value of `a` as (1, BT) int32, without
    materializing canonical limbs: parity(v mod p) = parity(v) ^ (v >= p)
    since p is odd and v < 2p after _finalize."""
    v = F._carry(F._finalize(a), F.NLIMBS)
    _, _, ge = _borrow_scan(v - F._p_col())
    return (v[0:1] ^ ge.astype(jnp.int32)) & 1


def _mulsafe_with_parity(a):
    """(mulsafe representative, canonical parity) of `a` — for values used
    as field operands where only the PARITY needs to be canonical (the
    decompressed y: its sign select reads the parity, the chain only needs
    a mulsafe value)."""
    v = F._carry(F._finalize(a), F.NLIMBS)
    _, _, ge = _borrow_scan(v - F._p_col())
    return v, (v[0:1] ^ ge.astype(jnp.int32)) & 1


def _words_be_2d(xc):
    """Canonical limbs (NLIMBS, BT) -> (8, BT) uint32 big-endian words."""
    xu = xc.astype(jnp.uint32)
    rows = []
    for j in range(8):
        lo_bit = 32 * (7 - j)
        acc = None
        for i in range(F.NLIMBS):
            limb_lo = F.LB * i
            if limb_lo + F.LB <= lo_bit or limb_lo >= lo_bit + 32:
                continue
            s = limb_lo - lo_bit
            part = (xu[i : i + 1] << np.uint32(s)) if s >= 0 else (
                xu[i : i + 1] >> np.uint32(-s))
            acc = part if acc is None else (acc | part)
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _tagged_hash_2d(xw, parity):
    """BIP-352 tagged hash of 02/03 || x || 0^4. xw: (8, BT) u32 big-endian
    words of canonical affine x; parity: (1, BT) u32. -> (8, BT) u32."""
    prefix = np.uint32(0x02) + parity
    w = [(prefix << np.uint32(24)) | (xw[0:1] >> np.uint32(8))]
    for i in range(1, 8):
        w.append((xw[i - 1 : i] << np.uint32(24)) | (xw[i : i + 1] >> np.uint32(8)))
    w.append((xw[7:8] & np.uint32(0xFF)) << np.uint32(24))
    w.append(jnp.full_like(parity, np.uint32(0x00800000)))
    for _ in range(5):
        w.append(jnp.zeros_like(parity))
    w.append(jnp.full_like(parity, np.uint32(BITLEN)))

    for t in range(16, 64):
        s0 = _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18) ^ (w[t - 15] >> np.uint32(3))
        s1 = _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19) ^ (w[t - 2] >> np.uint32(10))
        w.append(w[t - 16] + s0 + w[t - 7] + s1)
    state = [jnp.full_like(parity, np.uint32(s)) for s in TAG_MIDSTATE]
    a, b, c, d, e, f, g, h = state
    for t in range(64):
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + np.uint32(_SHA_K[t]) + w[t]
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + s0 + maj
    return jnp.concatenate(
        [s + v for s, v in zip(state, (a, b, c, d, e, f, g, h))], axis=0)


def _bytes_from_words_2d(words):
    """(8, BT) u32 big-endian words -> (32, BT) int32 bytes, MSB first."""
    rows = []
    for i in range(32):
        w = words[i // 4 : i // 4 + 1]
        rows.append(((w >> np.uint32(8 * (3 - i % 4))) & np.uint32(0xFF)))
    return jnp.concatenate(rows, axis=0).astype(jnp.int32)


def _jadd_shared_core(px, py, pz, qx, qy, qz, qzz, qzc):
    """Incomplete Jacobian + Jacobian add where q's z^2 (qzz) and z^3 (qzc)
    are precomputed and shared across calls (10M+3S per call). Used by the
    odd-multiple table chain, whose adds are all +2P. The +- epilogues ride
    the producers' reduce tails (F.mul_sub & co)."""
    z1z1 = F.sqr(pz)
    u1 = F.mul(px, qzz)
    s1 = F.mul(py, qzc)
    h = F.mul_sub(qx, z1z1, u1)
    r = F.mul_sub(qy, F.mul(pz, z1z1), s1)
    hh = F.sqr(h)
    h3 = F.mul(h, hh)
    v = F.mul(u1, hh)
    x3 = F.sqr_sub2_dbl(r, h3, v)
    y3 = F.mul_sub(r, F.sub(v, x3), F.mul(s1, h3))
    z3 = F.mul(F.mul(pz, qz), h)
    return x3, y3, z3


def _zaddu(x1, y1, x2, y2, z):
    """Co-Z add-and-update (Goundar/Joye ZADDU, 5M+2S + 4 lazy subs):
    P1=(x1,y1) and P2=(x2,y2) share the implicit Z; returns
    (x3, y3, x1', y1', z3) with P1+P2 == (x3,y3,z3) and P1 == (x1',y1',z3)
    — both outputs co-Z at z3 = z*(x1-x2), so a chain of these needs no
    re-alignment. Replaces the 11M+3S shared-z adds of the odd-multiple
    table chain (VERDICT r4 item 3; ~6 products saved per chain add).
    Incomplete: x1 == x2 (P1 == +-P2) degenerates — excluded for the
    chain's 2P vs (2m+1)P arguments when P has prime order; adversarial
    off-curve rows get deterministic garbage (same GIGO contract as the
    rest of the kernel)."""
    e = F.sub(x1, x2)
    c = F.sqr(e)
    w1 = F.mul(x1, c)
    w2 = F.mul(x2, c)
    dy = F.sub(y1, y2)
    a1 = F.mul(y1, F.sub(w1, w2))
    x3 = F.sqr_sub2(dy, w1, w2)
    y3 = F.mul_sub(dy, F.sub(w1, x3), a1)
    z3 = F.mul(z, e)
    return x3, y3, w1, a1, z3


def _madd_core(px, py, pz, qx, qy):
    """Incomplete mixed add (8M+3S); caller owns degenerate-case selects."""
    z1z1 = F.sqr(pz)
    h = F.mul_sub(qx, z1z1, px)
    r = F.mul_sub(qy, F.mul(pz, z1z1), py)
    hh = F.sqr(h)
    h3 = F.mul(h, hh)
    v = F.mul(px, hh)
    x3 = F.sqr_sub2_dbl(r, h3, v)
    y3 = F.mul_sub(r, F.sub(v, x3), F.mul(py, h3))
    z3 = F.mul(pz, h)
    return x3, y3, z3


def _dbl(px, py, pz):
    """a=0 Jacobian doubling (3M+4S), raw coordinates. The D line uses
    D = 2*((X+B)^2 - A - C) == 4*X*B (A = X^2, C = B^2), trading the
    (X+B) add's lazy pass pair for a same-cost fused product."""
    a = F.sqr(px)
    b = F.sqr(py)
    c = F.sqr(b)
    d = F.mul_x4(px, b)
    e = F.mul_small(a, 3)
    x3 = F.sqr_sub_dbl(e, d)
    y3 = F.mul_sub_scaled8(e, F.sub(d, x3), c)
    z3 = F.mul_x2(py, pz)
    return x3, y3, z3


def _madd_complete_lite(px, py, pz, pinf, qx, qy, qinf):
    """Mixed add with infinity lanes handled by selects (p == +-q is the
    caller-documented negligible case). qx/qy may be (NLIMBS, 1) shared;
    they are materialized to full lane width first (Mosaic supports
    single-axis broadcasts only)."""
    qx = qx + jnp.zeros_like(px)
    qy = qy + jnp.zeros_like(py)
    ax, ay, az = _madd_core(px, py, pz, qx, qy)
    one = F.one_like(px)
    ax = _sel(qinf, px, _sel(pinf, qx, ax))
    ay = _sel(qinf, py, _sel(pinf, qy, ay))
    az = _sel(qinf, pz, _sel(pinf, one, az))
    return ax, ay, az, pinf & qinf


def _inv_lanes(e):
    """Inverse of every lane of one (NLIMBS, BT) element via a cross-lane
    Montgomery trick: prefix/suffix lane product scans (log2(BT) muls each)
    collapse the whole tile into ONE product, a single Fermat ladder runs at
    width 1 (3 vregs/op instead of BT/128 * 3), and per-lane inverses are
    recovered as prefix[j-1] * suffix[j+1] * total^-1. Inputs must be
    nonzero (callers pre-select). ~20 full-width muls + a narrow ladder,
    vs a full-width 254-mul ladder for plain F.inv — the TPU answer to the
    reference's per-thread inversions (src/cudasp_gpu.cu:62,147,343)."""
    bt = e.shape[1]
    one = F.one_like(e)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)

    def scan_products(x, backward):
        # pltpu.roll only takes non-negative shifts; a left-roll by s is a
        # circular right-roll by bt - s.
        s = 1
        while s < bt:
            r = pltpu.roll(x, (bt - s) if backward else s, axis=1)
            keep = (lane < bt - s) if backward else (lane >= s)
            x = F.mul(x, _sel(keep, r, one))
            s *= 2
        return x

    pf = scan_products(e, False)          # lane j: e_0 * ... * e_j
    sf = scan_products(e, True)           # lane j: e_j * ... * e_{BT-1}
    # Narrow ladder: invert the last 128 prefix lanes (one vreg column —
    # Mosaic rejects sub-128 widths with a concat-layout bug, so this is
    # the narrowest legal ladder; only lane BT-1, the total product T,
    # is consumed).
    w = min(128, bt)
    tinv = F.inv(pf[:, bt - w :])[:, w - 1 : w]
    # T/e_j = prefix[j-1] * suffix[j+1] (boundary lanes -> 1)
    pf1 = _sel(lane >= 1, pltpu.roll(pf, 1, axis=1), one)
    sf1 = _sel(lane < bt - 1, pltpu.roll(sf, bt - 1, axis=1), one)
    return F.mul(F.mul(pf1, sf1), jnp.broadcast_to(tinv, e.shape))


def _inv_chain_raw(zs):
    """Montgomery-trick shared inversion of several (NLIMBS, BT) elements;
    zero inputs -> zero inverses. One narrow ladder total: the element
    chain collapses into a single plane which _inv_lanes inverts."""
    nz = [_is_zero2d(z) for z in zs]
    one = F.one_like(zs[0])
    safe = [_sel(m, one, z) for m, z in zip(nz, zs)]
    prefix = [safe[0]]
    for z in safe[1:]:
        prefix.append(F.mul(prefix[-1], z))
    run = _inv_lanes(prefix[-1])
    out = [None] * len(zs)
    for i in range(len(zs) - 1, 0, -1):
        out[i] = F.mul(run, prefix[i - 1])
        run = F.mul(run, safe[i])
    out[0] = run
    return [_sel(m, jnp.zeros_like(o), o) for m, o in zip(nz, out)]


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _limbs_from_words(w):
    """(8, BT) uint32 little-endian words -> (NLIMBS, BT) int32 13-bit
    limbs, on-device (the reference does the equivalent on the host,
    src/cudasp_extension.cu:56-85; keeping blobs raw until VMEM halves the
    HBM upload per row)."""
    rows = []
    for i in range(F.NLIMBS):
        bit = F.LB * i
        k, s = bit // 32, bit % 32
        window = w[k : k + 1] >> np.uint32(s)
        if s + F.LB > 32 and k + 1 < 8:
            window = window | (w[k + 1 : k + 2] << np.uint32(32 - s))
        rows.append(window & np.uint32(F.MASK))
    return jnp.concatenate(rows, axis=0).astype(jnp.int32)


def _scan_kernel(nlabels, nout, ladder, hi_only, wire, static_sched,
                 digits_ref,
                 bmask_ref, tw_ref, oh_ref, ol_ref, ovm_ref,
                 sx_ref, sy_ref, lx_ref, ly_ref, comb_ref,
                 out_ref, tabx, taby, sbytes_ref):
    """Grid-step dispatcher: blocks whose validity mask says "no live rows"
    (bmask_ref, scalar-prefetched) skip the entire EC pipeline — padding
    tiles of a ragged batch and post-exchange empty shards cost one flag
    write instead of ~750 us (the reference scans its padding rows at full
    price)."""
    i = pl.program_id(0)

    @pl.when(bmask_ref[i] == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(bmask_ref[i] != 0)
    def _():
        _scan_block(nlabels, nout, ladder, hi_only, wire, static_sched,
                    digits_ref,
                    tw_ref, oh_ref, ol_ref, ovm_ref,
                    sx_ref, sy_ref, lx_ref, ly_ref, comb_ref,
                    out_ref, tabx, taby, sbytes_ref)


def _scan_block(nlabels, nout, ladder, hi_only, wire, static_sched,
                digits_ref,
                tw_ref, oh_ref, ol_ref, ovm_ref,
                sx_ref, sy_ref, lx_ref, ly_ref, comb_ref,
                out_ref, tabx, taby, sbytes_ref):
    """One row tile, tweak words -> match flags, fully VMEM-resident.
    (A split ladder/finish two-kernel variant was measured ~7% slower at
    786K rows — the HBM round-trip of the Jacobian plane plus the second
    dispatch cost more than wide-block inversion amortization bought.)

    Tweak points arrive COMPRESSED: x words only + a y-parity bit (ovm bit
    30); y is recovered on device as sqrt(x^3 + 7) (~5% of tile compute).
    The host->device link is this scan's bottleneck (the axon tunnel moves
    ~50 MB/s), so the 64-B reference point blob becomes 32 B on the wire —
    off-curve x rows produce garbage, same contract as the reference's
    uncompressed ingest (src/cudasp_extension.cu:159-163).

    GIGO contract for INVALID y (backend divergence, pinned by
    tests/test_kernels.py::test_pallas_invalid_y_divergence_tpu): a blob
    whose y is not +-sqrt(x^3+7) scans here as the on-curve point with
    that x and y's parity — only the parity bit of the uploaded y is ever
    read — while the xla backend (and the reference, which also ships the
    full y) computes on the literal off-curve (x, y). Both are garbage-in
    garbage-out; neither can produce a golden match, but the garbage
    differs across backends."""
    tw = tw_ref[:]                     # (8, BT) uint32: LE x words
    if hi_only == "hi16":
        # hi16 ships NO separate validity plane: the 16-bit unit after the
        # M match units carries ovm16 = valid bits 0..M-1 | parity << 14 |
        # row_valid << 15 (pack_batch_arrays). Rebuild the uint32-bitmask
        # form so the rest of the kernel is mode-agnostic.
        u = nout
        ovm16 = ((oh_ref[u // 2 : u // 2 + 1] >> np.uint32(16 * (u % 2)))
                 & np.uint32(0xFFFF))
        ovm = ((ovm16 & np.uint32((1 << nout) - 1))
               | (((ovm16 >> np.uint32(14)) & np.uint32(1))
                  << np.uint32(30))
               | ((ovm16 >> np.uint32(15)) << np.uint32(31)))
    elif hi_only == "hi8":
        # hi8: same folding one notch tighter — 8-bit units, validity unit
        # = valid bits 0..M-1 | parity << 6 | row_valid << 7 (M <= 6).
        u = nout
        ovm8 = ((oh_ref[u // 4 : u // 4 + 1] >> np.uint32(8 * (u % 4)))
                & np.uint32(0xFF))
        ovm = ((ovm8 & np.uint32((1 << nout) - 1))
               | (((ovm8 >> np.uint32(6)) & np.uint32(1))
                  << np.uint32(30))
               | ((ovm8 >> np.uint32(7)) << np.uint32(31)))
    else:
        ovm = ovm_ref[:]               # (1, BT) uint32 bitmask (see below)
    bx = _limbs_from_words(tw[:8])
    if wire == "xy":
        # full64 wire: the uncompressed 64-B reference point blob
        # (src/cudasp_extension.cu:159-163) — y arrives as words 8..15
        # and the entire sqrt decompress ladder (measured 52 ms of a
        # 736 ms tile, tools/ablate_probe.py) is skipped. For INVALID y
        # this computes on the literal (x, y), exactly like the xla
        # backend and the reference (no backend divergence in this mode).
        by = _limbs_from_words(tw[8:16])
    elif "sqrt" in _ABLATE:                # timing probe: garbage y
        want_odd = ((ovm >> np.uint32(30)) & np.uint32(1)).astype(jnp.int32)
        by = _sel(want_odd != 0, bx, F.neg(bx))
    else:
        want_odd = ((ovm >> np.uint32(30)) & np.uint32(1)).astype(jnp.int32)
        seven = F.literal_planes(F.int_to_limbs(7), bx.shape[1])
        y0, y0_par = _mulsafe_with_parity(
            F.sqrt_candidate(F.add(F.mul(F.sqr(bx), bx), seven)))
        by = _sel(y0_par == want_odd, y0, F.neg(y0))
    one = F.one_like(bx)
    beta = F.literal_planes(F.int_to_limbs(S.GLV_BETA), bx.shape[1])

    # ---- per-row odd-multiple table: (2m+1)*P for m = 0..7 built as a
    # Jacobian chain of +2P adds (2P's z^2/z^3 hoisted), then one batched
    # inversion to affine; GLV half-2 is the beta-endomorphism image
    # (shares y), signs are a second y plane (SURVEY.md §7 step 4a).
    if "table" in _ABLATE:                 # timing probe: garbage table
        for m in range(8):
            tabx[0, m] = bx
            tabx[1, m] = by
            taby[0, m] = bx
            taby[1, m] = by
    else:
        # Co-Z chain (VERDICT r4 item 3): 2P and P are aligned to a common
        # Z once (3M+1S), then each ZADDU(2P, (2m-1)P) emits (2m+1)P AND
        # re-expresses 2P at the new Z — 5M+2S per entry vs the previous
        # shared-z Jacobian adds' 11M+3S (r4 ablation: this stage was 9.9%
        # of the kernel; ~36 products/row removed).
        d2x, d2y, d2z = _dbl(bx, by, one)
        t = F.sqr(d2z)
        px_c = F.mul(bx, t)                  # P rescaled to 2P's Z
        py_c = F.mul(by, F.mul(t, d2z))
        chain = []
        dxc, dyc, oxc, oyc, zc = d2x, d2y, px_c, py_c, d2z
        for _ in range(7):                                   # 3P .. 15P
            nx, ny, dxc, dyc, zc = _zaddu(dxc, dyc, oxc, oyc, zc)
            chain.append((nx, ny, zc))
            oxc, oyc = nx, ny
        zinvs = _inv_chain_raw([c[2] for c in chain])
        tabx[0, 0] = bx
        tabx[1, 0] = F.mul(beta, bx)
        taby[0, 0] = by
        taby[1, 0] = F.neg(by)
        for m in range(1, 8):
            zi = zinvs[m - 1]
            zi2 = F.sqr(zi)
            ax = F.mul(chain[m - 1][0], zi2)
            ay = F.mul(chain[m - 1][1], F.mul(zi, zi2))
            tabx[0, m] = ax
            tabx[1, m] = F.mul(beta, ax)
            taby[0, m] = ay
            taby[1, m] = F.neg(ay)

    if ladder == "wnaf":
        # ---- interleaved width-5 wNAF ladder (scalar.glv_wnaf_steps):
        # the schedule arrives as DATA — (ndbl, add-code) pairs in SMEM —
        # so one compiled program serves every scan key while executing
        # only ~43 adds (vs the fixed-window schedule's 64) over the same
        # shared 127-doubling chain. Step 0 is always a live add with 0
        # doublings: it initializes the accumulator (no infinity tracking).
        # Dead padding steps cost one scalar branch each (lax.cond).
        def pickw(code):
            return (tabx[(code >> 4) & 1, code & 7],
                    taby[(code >> 3) & 1, code & 7])

        px, py = pickw(digits_ref[1, 0])
        pz = one

        def wstep(i, carry):
            px, py, pz = carry
            nd = digits_ref[0, i]
            code = digits_ref[1, i]
            px, py, pz = jax.lax.fori_loop(
                0, nd, lambda _, c: _dbl(*c), (px, py, pz))

            def do_add(c):
                return _madd_core(c[0], c[1], c[2], *pickw(code))

            return jax.lax.cond((code >> 5) != 0, do_add, lambda c: c,
                                (px, py, pz))

        ex, ey, ez = jax.lax.fori_loop(1, S.WNAF_STEPS, wstep, (px, py, pz))
    elif ladder == "static":
        # ---- PER-KEY COMPILED ladder (ScanConfig(static_key=True)): the
        # scan key's merged-GLV width-5 wNAF schedule arrives as PROGRAM
        # LITERALS (static_sched, a static jit arg), so doubling runs are
        # straight-line code and every table pick is a static scratch
        # index — none of the lax.cond / dynamic-fori_loop overhead that
        # makes the data-driven "wnaf" mode lose to "fixed", and ~21
        # fewer adds than the fixed schedule (43 vs 64) over the same
        # 8-entry odd-multiple table. One compile per key; use for
        # long-lived keys (the reference's per-row generic pmul has no
        # such mode, src/cudasp_gpu.cu:719-784). Code layout per step:
        # bits 0-2 odd-multiple idx, 3 negate-y, 4 GLV half, 5 live add.
        steps = static_sched
        if "ladder" in _ABLATE:               # timing probe
            steps = steps[:4]
        nd0, code0 = steps[0]                 # always a live add, 0 dbls
        px = tabx[(code0 >> 4) & 1, code0 & 7]
        py = taby[(code0 >> 3) & 1, code0 & 7]
        pz = one
        for nd, code in steps[1:]:
            for _ in range(nd):
                px, py, pz = _dbl(px, py, pz)
            if code >> 5:
                px, py, pz = _madd_core(
                    px, py, pz,
                    tabx[(code >> 4) & 1, code & 7],
                    taby[(code >> 3) & 1, code & 7])
        ex, ey, ez = px, py, pz
    else:
        # ---- GLV ladder over the odd-digit schedule (glv_odd_sched):
        # 32 windows x (4 dbl + 2 table adds). Digits are shared across
        # lanes (table selects are scalar-indexed dynamic slices) and NEVER
        # ZERO, so the loop needs no zero-skip selects and no infinity
        # tracking — the accumulator starts at the first window's entry.
        def pick(h, i):
            code = digits_ref[h, i]
            return tabx[h, code & 7], taby[code >> 3, code & 7]

        px, py = pick(0, 0)
        qx, qy = pick(1, 0)
        px, py, pz = _madd_core(px, py, one, qx, qy)

        def window(i, carry):
            px, py, pz = carry
            for _ in range(4):
                px, py, pz = _dbl(px, py, pz)
            for h in range(2):
                qx, qy = pick(h, i)
                px, py, pz = _madd_core(px, py, pz, qx, qy)
            return px, py, pz

        nwin = 2 if "ladder" in _ABLATE else S.ODD_WINDOWS  # timing probe
        ex, ey, ez = jax.lax.fori_loop(1, nwin, window,
                                       (px, py, pz))

        # parity corrections: halves recoded as K+e need a final -sign*e*P_h
        for h in range(2):
            corr = digits_ref[h, S.ODD_WINDOWS] != 0
            cy = taby[digits_ref[h, S.ODD_WINDOWS + 1], 0]
            ax, ay, az = _madd_core(ex, ey, ez, tabx[h, 0], cy)
            m = jnp.full((1, bx.shape[1]), corr)
            ex = _sel(m, ax, ex)
            ey = _sel(m, ay, ey)
            ez = _sel(m, az, ez)

    zeros = jnp.zeros_like(ex)
    inf0 = jnp.ones((1, ex.shape[1]), jnp.int32)   # int32 mask: Mosaic
    # cannot legalize scf.for loops with i1-vector carries

    # ---- serialize + tagged hash (src/cudasp_gpu.cu:236-314 equivalent)
    if "serialize" in _ABLATE:             # timing probe: skip inv+hash
        # keep the ladder output live (ex) so the compiler can't DCE it
        sbytes_ref[:] = _bytes_from_words_2d(tw[:8]) + ex[:1]
    elif "hash" in _ABLATE:                # timing probe: inv+canon, no SHA
        zi = _inv_chain_raw([ez])[0]
        zi2 = F.sqr(zi)
        x_aff = _canon2d(F.mul(ex, zi2))
        parity = _parity2d(F.mul(ey, F.mul(zi, zi2))).astype(jnp.uint32)
        sbytes_ref[:] = (_bytes_from_words_2d(_words_be_2d(x_aff))
                         + parity.astype(jnp.int32))
    else:
        zi = _inv_chain_raw([ez])[0]
        zi2 = F.sqr(zi)
        x_aff = _canon2d(F.mul(ex, zi2))
        # only the affine y's PARITY is consumed (the 02/03 prefix byte),
        # so skip the full canonicalization the r3 kernel paid here
        parity = _parity2d(F.mul(ey, F.mul(zi, zi2))).astype(jnp.uint32)
        hw = _tagged_hash_2d(_words_be_2d(x_aff), parity)
        # staged through scratch: Mosaic only supports dynamic indexing on
        # refs. (An unrolled-window variant with static value slices
        # measured perf-neutral on chip but ~2x the compile time —
        # reverted.)
        sbytes_ref[:] = _bytes_from_words_2d(hw)   # (32, BT) int32

    # ---- fixed-base comb: t x G via one-hot MXU selects (replaces
    # ECDSACONST.d_mul_table walks, src/cudasp_gpu.cu:317-354)
    bt = ex.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (256, bt), 0)

    def comb_window(i, carry):
        px, py, pz, pinf_i = carry
        pinf = pinf_i != 0
        tab = comb_ref[i]                          # (4*NLIMBS, 256) bf16
        byte = sbytes_ref[pl.ds(i, 1), :]                   # (1, BT)
        onehot = (iota == byte).astype(jnp.bfloat16)
        # split-table select: rows [0:2N] hold entry>>7, [2N:4N] entry&127
        # — both exact in bf16, so ONE default-precision MXU pass replaces
        # the f32 HIGHEST 6-pass decomposition (comb_table_kernel)
        mm = jax.lax.dot_general(
            tab, onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        sel = (mm[: 2 * F.NLIMBS] << 7) + mm[2 * F.NLIMBS :]
        qx, qy = sel[: F.NLIMBS], sel[F.NLIMBS:]
        ax, ay, az = _madd_core(px, py, pz, qx, qy)
        qinf = byte == 0
        px = _sel(qinf, px, _sel(pinf, qx, ax))
        py = _sel(qinf, py, _sel(pinf, qy, ay))
        pz = _sel(qinf, pz, _sel(pinf, one, az))
        return px, py, pz, (pinf & qinf).astype(jnp.int32)

    ncomb = 2 if "comb" in _ABLATE else 32          # timing probe
    ox, oy, oz, oinf_i = jax.lax.fori_loop(
        0, ncomb, comb_window, (zeros, zeros, zeros, inf0))
    oinf = oinf_i != 0

    # ---- + spend, + labels, upper-64 semi-join (src/cudasp_gpu.cu:74-178)
    sx = sx_ref[:]
    sy = sy_ref[:]
    fx, fy, fz, finf = _madd_complete_lite(
        ox, oy, oz, oinf, sx, sy, jnp.zeros_like(inf0))
    cands = [(fx, fy, fz, finf)]
    for j in range(nlabels):
        lx = lx_ref[j]
        ly = ly_ref[j]
        cands.append(_madd_complete_lite(fx, fy, fz, finf, lx, ly,
                                         jnp.zeros_like(inf0)))

    zinvs = _inv_chain_raw([c[2] for c in cands])
    oh = oh_ref[:]
    # hi_only=True: the lo-32 match words were not uploaded (the 60 B/row
    # batch shrinks to 48 B/row when the H2D link is the bottleneck);
    # flags are a SUPERSET of the exact flags (hi32 equality is necessary
    # for a full match) and the executor re-verifies flagged rows in an
    # exact second pass (runtime.executor._run_pallas). ~2^-32 false-flag
    # rate per compared output entry.
    # hi_only="hi16": the upload shrinks further to the TOP 16 bits of
    # each match value, two per uint32 word (40 B/row at 3 outputs);
    # ~2^-16 false-flag rate, same exact-reverify contract.
    # hi_only="hi8": TOP 8 bits, four per uint32 word (36 B/row at 3
    # outputs); ~M*2^-8 false-flag rate per row, same contract.
    if hi_only == "hi16":
        # oh rows are packed pairs: word w = top16(out[2w]) |
        # top16(out[2w+1]) << 16 (kernels.pack_batch_arrays)
        oh = jnp.concatenate(
            [(oh[j // 2 : j // 2 + 1] >> np.uint32(16 * (j % 2)))
             & np.uint32(0xFFFF) for j in range(nout)], axis=0)
    elif hi_only == "hi8":
        oh = jnp.concatenate(
            [(oh[j // 4 : j // 4 + 1] >> np.uint32(8 * (j % 4)))
             & np.uint32(0xFF) for j in range(nout)], axis=0)
    ol = None if hi_only else ol_ref[:]
    # ovm bits: 0..M-1 = outputs_valid, 30 = y parity, 31 = row_valid
    ov = jnp.concatenate(
        [(ovm >> np.uint32(j)) & np.uint32(1) for j in range(nout)],
        axis=0) != 0                   # (M, BT) bool
    rv = ((ovm >> np.uint32(31)) & np.uint32(1)) != 0
    hit = jnp.zeros((1, ex.shape[1]), jnp.bool_)
    if "match" in _ABLATE:                 # timing probe: keep candidate
        # adds live, skip the shared inversion + canon + compare
        for cx, _, cz, cinf in cands:
            hit = hit | (((cx[0:1] + cz[0:1]) & 1) != 0)
    else:
        for (cx, _, cz, cinf), czi in zip(cands, zinvs):
            x_can = _canon2d(F.mul(cx, F.sqr(czi)))
            words = _words_be_2d(x_can)
            dead = cinf | _is_zero2d(cz)
            w0 = (words[0:1] >> np.uint32(16) if hi_only == "hi16"
                  else words[0:1] >> np.uint32(24) if hi_only == "hi8"
                  else words[0:1])
            eq = (w0 == oh) & ov
            if not hi_only:
                eq = eq & (words[1:2] == ol)
            hit = hit | (jnp.any(eq, axis=0, keepdims=True) & ~dead)

    out_ref[:] = (hit & rv).astype(jnp.int8)   # int8: flags D2H rides the
    # same ~50 MB/s tunnel as uploads; 4x smaller readback than int32


@functools.partial(jax.jit,
                   static_argnames=("nlabels", "block_rows", "interpret",
                                    "ladder", "hi_only", "nout", "wire",
                                    "pack_flags", "static_sched"))
def _scan_pallas_call(tweak_words, outputs_hi, outputs_lo, outputs_mask,
                      digits, spend_x, spend_y,
                      label_x, label_y, comb, blockmask=None, *, nlabels,
                      block_rows, interpret=False, ladder="fixed",
                      hi_only=False, nout=None, wire="x",
                      pack_flags=False, static_sched=None):
    # ladder="static" bakes static_sched (scalar.glv_wnaf_static(key), a
    # hashable (nd, code) tuple) into the program — per-key compile.
    if ladder == "static" and static_sched is None:
        raise ValueError("ladder='static' needs static_sched "
                         "(scalar.glv_wnaf_static of the scan key)")
    B = tweak_words.shape[1]
    TW = 16 if wire == "xy" else 8       # uploaded tweak word rows
    Mp = outputs_hi.shape[0]          # uploaded oh rows (packed for hi16)
    M = Mp if nout is None else int(nout)   # real outputs per row
    L = label_x.shape[0]
    N = F.NLIMBS
    # blockmask=None compiles WITHOUT the per-block skip branch (the
    # conditional body degrades Mosaic's input pipelining a few percent, so
    # fully-live batches shouldn't pay for it); callers pass a mask only
    # when the batch really has dead tiles.
    skip = blockmask is not None

    def col_block(rows):
        return pl.BlockSpec((rows, block_rows), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # Shared query operands are tiled to the block width here (width-1
    # VMEM blocks make Mosaic synthesize dual-axis broadcasts it cannot
    # lower); XLA materializes these ~0.1 MB constants once per query.
    sxw = jnp.broadcast_to(spend_x, (N, block_rows))
    syw = jnp.broadcast_to(spend_y, (N, block_rows))
    lxw = jnp.broadcast_to(label_x, (L, N, block_rows))
    lyw = jnp.broadcast_to(label_y, (L, N, block_rows))
    # hi_only drops the lo-32 match plane from the upload (outputs_lo is a
    # dummy); the executor re-verifies flagged rows exactly. hi16 also
    # folds the validity bitmask into the packed plane (ovm is a dummy).
    lo_spec = fixed(tuple(outputs_lo.shape)) if hi_only else col_block(M)
    ovm_spec = (fixed(tuple(outputs_mask.shape))
                if outputs_mask.shape[1] == 1 else col_block(1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if skip else 1,
        grid=(B // block_rows,),
        in_specs=[
            col_block(TW),                       # raw LE words (x | x,y)
            col_block(Mp), lo_spec,              # outputs hi/lo
            ovm_spec,                            # validity bitmask
            fixed((N, block_rows)), fixed((N, block_rows)),        # spend
            fixed((L, N, block_rows)), fixed((L, N, block_rows)),  # labels
            fixed((32, 4 * N, 256)),             # comb table (bf16 split)
        ],
        out_specs=col_block(1),
        scratch_shapes=[
            pltpu.VMEM((2, 8, N, block_rows), jnp.int32),   # table x
            pltpu.VMEM((2, 8, N, block_rows), jnp.int32),   # table +-y
            pltpu.VMEM((32, block_rows), jnp.int32),        # hash bytes
        ],
    )
    kern = (functools.partial(_scan_kernel, nlabels, M, ladder, hi_only,
                              wire, static_sched)
            if skip
            else functools.partial(_scan_block, nlabels, M, ladder,
                                   hi_only, wire, static_sched))
    args = ((digits, blockmask) if skip else (digits,)) + (
        tweak_words, outputs_hi, outputs_lo, outputs_mask,
        sxw, syw, lxw, lyw, comb)
    flags = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.int8),
        interpret=interpret,
        # wide tiles exceed the 16 MB default scoped-vmem budget (the table
        # scratch scales with block_rows); v5e has more physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    if pack_flags:
        # bit-pack the per-row flags into uint32 words (XLA epilogue,
        # fused after the kernel): the flags readback otherwise ships
        # 1 B/row D2H CONCURRENTLY with the next batch's upload, and the
        # tunnel degrades under concurrent transfers — 0.5 MB/batch drops
        # to 16 KB. Requires B % 32 == 0 (callers guarantee: lane widths
        # are block_rows multiples). Hosts detect packing by dtype.
        bits = flags[0].astype(jnp.uint32).reshape(-1, 32)
        return jnp.sum(
            bits << jnp.arange(32, dtype=jnp.uint32)[None, :],
            axis=1, dtype=jnp.uint32)[None, :]
    return flags


@functools.lru_cache(maxsize=32)
def _sharded_scan_fn(mesh, nlabels, block_rows, interpret, skip=False,
                     ladder="fixed", hi_only=False, nout=None, wire="x",
                     pack_flags=False, static_sched=None):
    """shard_map-wrapped scan over the mesh's 'data' axis: each chip runs
    the Pallas grid over its local row shard; no collectives are needed
    inside the kernel (rows are independent — SURVEY.md §2.4). This is the
    multi-chip production path, replacing the reference's thread->GPU
    round-robin (src/cudasp_extension.cu:149-151,523-529) with one GSPMD
    program."""
    from jax.sharding import PartitionSpec as P

    lane = P(None, "data")
    rep2 = P(None, None)
    rep3 = P(None, None, None)
    lo = rep2 if hi_only else lane      # hi_only ships a dummy lo
    ovm = (rep2 if hi_only in ("hi16", "hi8")   # folded ovm: dummy too
           else lane)
    specs = (lane, lane, lo, ovm, rep2, rep2, rep2, rep3, rep3, rep3)
    if skip:
        specs = specs + (P("data"),)
    fn = jax.shard_map(
        functools.partial(_scan_pallas_call, nlabels=nlabels,
                          block_rows=block_rows, interpret=interpret,
                          ladder=ladder, hi_only=hi_only, nout=nout,
                          wire=wire, pack_flags=pack_flags,
                          static_sched=static_sched),
        mesh=mesh,
        in_specs=specs,
        out_specs=lane,
        check_vma=False,
    )
    return jax.jit(fn)


def scan_pallas_sharded(mesh, tweak_words, outputs_hi, outputs_lo,
                        outputs_mask, digits, spend_x, spend_y,
                        label_x, label_y, comb, blockmask=None, *, nlabels,
                        block_rows=256, interpret=False, ladder="fixed",
                        hi_only=False, nout=None, wire="x",
                        pack_flags=False, static_sched=None):
    """Multi-chip fused scan: batch lanes sharded over mesh axis 'data'.
    B must be a multiple of n_devices * block_rows. blockmask: (B //
    block_rows,) int32, nonzero where the block has live rows (lanes are
    sharded contiguously, so global block order == (device, local block))."""
    B = tweak_words.shape[1]
    ndev = mesh.devices.size
    if B % (ndev * block_rows):
        raise ValueError(
            f"batch width {B} not a multiple of {ndev} devices x "
            f"{block_rows} block rows")
    fn = _sharded_scan_fn(mesh, int(nlabels), int(block_rows),
                          bool(interpret), blockmask is not None,
                          str(ladder),
                          hi_only if isinstance(hi_only, str)
                          else bool(hi_only),
                          None if nout is None else int(nout), str(wire),
                          bool(pack_flags), static_sched)
    args = (tweak_words, outputs_hi, outputs_lo, outputs_mask, digits,
            spend_x, spend_y, label_x, label_y, comb)
    if blockmask is not None:
        args = args + (blockmask,)
    return fn(*args)


def live_blockmask(n_live: int, n_blocks: int, block_rows: int):
    """Block-skip mask for a valid-prefix batch: block i is live iff it
    starts before the live-row count. Returns None when every block is
    live (the skip-free kernel variant pipelines better). The single
    source of the mask rule — the executor, scan_batch_pallas, and (in
    per-shard device form) parallel.exchange all follow it."""
    mask = (np.arange(n_blocks, dtype=np.int32) * block_rows
            < n_live).astype(np.int32)
    return None if mask.all() else mask


def pack_batch_arrays(tweak_blobs, row_valid, outputs_hi, outputs_lo,
                      outputs_valid, block_rows: int = 256,
                      hi_only: bool = False, wire: str = "x"):
    """Host-side layout conversion of one packed batch into the kernel's
    compact planes (~60 B/row at 3 outputs/row; the H2D link — ~50 MB/s
    through the axon tunnel — is the scan's bandwidth bottleneck):

      tweak_words (8, Bp)  uint32 — LE x words only; y is recovered on
                                    device from the parity bit (the 64-B
                                    reference blob compressed to 32 B+1 bit)
      oh/ol       (M, Bp)  uint32 — match words
      ovm         (1, Bp)  uint32 — bit j = outputs_valid[:, j];
                                    bit 30 = y parity; bit 31 = row_valid

    wire="xy" ships the FULL 64-B point (x words then y words, 16 uint32
    rows — the reference's own wire format, src/cudasp_extension.cu:
    159-163; 92 B/row at 3 outputs): the kernel skips the sqrt decompress
    entirely. The fastest mode when the H2D link outruns the kernel
    (real PCIe hosts); mutually exclusive with the hi_only cuts.

    hi_only=True replaces ol with a (M, 1) dummy (48 B/row at 3 outputs):
    the kernel then matches on hi32 words only and the executor re-checks
    flagged rows exactly (VERDICT r1 lever 1, the upload cut).

    hi_only="hi16" additionally packs the oh plane down to the TOP 16
    bits of each match value, two per uint32 row, and appends a 16-bit
    validity unit (valid bits 0..M-1 | parity << 14 | row_valid << 15) in
    the next slot — the separate ovm plane then never crosses the wire
    (40 B/row at 3 outputs; unit u lives at row u//2, shift 16*(u%2)).
    The kernel needs the real output count via its `nout` static arg in
    this mode; requires M <= 14.

    hi_only="hi8" is the same folding one notch tighter: TOP 8 bits of
    each match value, four units per uint32 row, validity unit = valid
    bits 0..M-1 | parity << 6 | row_valid << 7 (36 B/row at 3 outputs;
    unit u at row u//4, shift 8*(u%4)). ~M*2^-8 false-flag rate per row
    feeds the same exact-reverify pass; requires M <= 6.
    """
    B = int(tweak_blobs.shape[0])
    M = int(outputs_hi.shape[1])
    if M > 30:
        raise ValueError("outputs plane width > 30 collides with the "
                         "parity/row_valid bits of the validity bitmask")
    Bp = max(block_rows, ((B + block_rows - 1) // block_rows) * block_rows)
    pad = Bp - B

    def padB(a):
        if pad == 0:
            return a
        widths = [(0, 0)] * a.ndim
        widths[-1] = (0, pad)
        return np.pad(a, widths)

    if wire == "xy" and hi_only:
        raise ValueError("wire='xy' (full64) is a full-upload mode; "
                         "combine it with hi_only cuts makes no sense")
    blobs = np.ascontiguousarray(tweak_blobs, np.uint8)
    nw = 64 if wire == "xy" else 32
    words = np.ascontiguousarray(blobs[:, :nw]).view(np.uint32).T
    words = np.ascontiguousarray(words)
    ovm = np.zeros(B, np.uint32)
    ov = np.asarray(outputs_valid)
    for j in range(M):
        ovm |= ov[:, j].astype(np.uint32) << np.uint32(j)
    ovm |= (blobs[:, 32] & np.uint8(1)).astype(np.uint32) << np.uint32(30)
    ovm |= np.asarray(row_valid).astype(np.uint32) << np.uint32(31)
    oh = np.ascontiguousarray(np.asarray(outputs_hi).T).view(np.uint32)
    if hi_only == "hi16":
        if M > 14:
            raise ValueError("hi16 packing supports at most 14 outputs "
                             "(the validity unit needs bits 14/15)")
        units = list(oh >> np.uint32(16))                # M top-16 rows
        units.append((ovm & np.uint32((1 << M) - 1))     # ovm16 unit
                     | (((ovm >> np.uint32(30)) & np.uint32(1))
                        << np.uint32(14))
                     | ((ovm >> np.uint32(31)) << np.uint32(15)))
        Mp = (len(units) + 1) // 2
        packed = np.zeros((Mp, B), np.uint32)
        for j, u in enumerate(units):
            packed[j // 2] |= u << np.uint32(16 * (j % 2))
        return (padB(words), padB(packed),
                np.zeros((1, 1), np.uint32), np.zeros((1, 1), np.uint32))
    if hi_only == "hi8":
        if M > 6:
            raise ValueError("hi8 packing supports at most 6 outputs "
                             "(the validity unit needs bits 6/7)")
        units = list(oh >> np.uint32(24))                # M top-8 rows
        units.append((ovm & np.uint32((1 << M) - 1))     # ovm8 unit
                     | (((ovm >> np.uint32(30)) & np.uint32(1))
                        << np.uint32(6))
                     | ((ovm >> np.uint32(31)) << np.uint32(7)))
        Mp = (len(units) + 3) // 4
        packed = np.zeros((Mp, B), np.uint32)
        for j, u in enumerate(units):
            packed[j // 4] |= u << np.uint32(8 * (j % 4))
        return (padB(words), padB(packed),
                np.zeros((1, 1), np.uint32), np.zeros((1, 1), np.uint32))
    lo = (np.zeros((M, 1), np.uint32) if hi_only else
          padB(np.ascontiguousarray(np.asarray(outputs_lo).T).view(np.uint32)))
    return (
        padB(words),
        padB(oh),
        lo,
        padB(ovm[None, :]),
    )


def pack_query_arrays(spend_x, spend_y, label_x, label_y,
                      block_rows: int = 256):
    """Shared per-query operands, device-ready. Width-1 lane broadcasting
    is done in-kernel now (single-axis broadcasts are Mosaic-legal), so
    this is a plain contiguous passthrough."""
    def c(a):
        return np.ascontiguousarray(np.asarray(a))

    return c(spend_x), c(spend_y), c(label_x), c(label_y)


def scan_batch_pallas(tweak_blobs, row_valid, outputs_hi, outputs_lo,
                      outputs_valid, digits, spend_x, spend_y,
                      label_x, label_y, *, nlabels: int,
                      block_rows: int = 256, ladder: str = "fixed",
                      static_sched=None):
    """Pallas-fused scan over one packed batch. Same contract as
    pipeline.scan_batch_fused but takes raw (B, 64) tweak blobs and a
    scalar schedule instead of limb planes + the unsigned window pytree:
    the (2, 34) odd-digit schedule (scalar.glv_odd_sched, ladder="fixed")
    or the (2, 54) wNAF step schedule (scalar.glv_wnaf_steps,
    ladder="wnaf").

    Accepts host arrays; pads B to a block_rows multiple."""
    B = int(tweak_blobs.shape[0])
    planes = pack_batch_arrays(tweak_blobs, row_valid, outputs_hi,
                               outputs_lo, outputs_valid, block_rows)
    bmask = live_blockmask(B, planes[0].shape[1] // block_rows, block_rows)
    flags = _scan_pallas_call(
        *(jnp.asarray(a) for a in planes), jnp.asarray(digits),
        jnp.asarray(spend_x), jnp.asarray(spend_y),
        jnp.asarray(label_x), jnp.asarray(label_y),
        comb_table_kernel(), jnp.asarray(bmask) if bmask is not None else None,
        nlabels=nlabels, block_rows=block_rows, ladder=ladder,
        static_sched=static_sched)
    return flags[0, :B] != 0


def comb_table_kernel():
    """Comb table in the fused kernel's operand format: (32, 4N, 256)
    bfloat16, rows [0:2N] = entry >> 7, rows [2N:4N] = entry & 127. Both
    halves are < 2^7 so they are EXACT in bf16, and the one-hot select
    becomes a single default-precision bf16 MXU matmul (f32 HIGHEST costs
    a 6-pass decomposition for the same exactness — ROADMAP r3 lever 4;
    the two halves ride one matmul: M=80 still fits the 128-row MXU)."""
    t = S.comb_table_np()
    return jnp.asarray(np.concatenate([t >> 7, t & 127],
                                      axis=1).astype(jnp.bfloat16))
