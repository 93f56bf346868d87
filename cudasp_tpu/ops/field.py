"""secp256k1 prime-field arithmetic, vectorized for TPU VPU lanes.

Representation: a batch of field elements is an int32 array of shape
``(NLIMBS, B)`` — 20 limbs of 13 bits each (256 bits -> 260), limb axis
leading so the batch axis lands on TPU lanes. This is the TPU-native
equivalent of gECC's 8xu32 column-major Montgomery field
(/root/reference/src/cudasp_gpu.cu:16-26 and SURVEY.md §2.2), redesigned
from scratch:

  * 13-bit limbs keep every partial product and 20-term column sum exact in
    int32 (no 64-bit integer support needed, unlike gECC's u32/u64 mix).
  * No Montgomery form at all: secp256k1's p = 2^256 - 2^32 - 977 is
    pseudo-Mersenne, so reduction is a cheap fold 2^256 == 2^32 + 977
    (mod p). This removes the reference's to/from-Montgomery conversions
    (src/cudasp_gpu.cu:110-116,257-258) entirely.

Normal form invariant ("mulsafe"): limbs 0..18 in [0, ~8300], limb 19
(top) < 2^13, which keeps every 20-term product column < 2^31
(20 * 9500^2 < 2^31 with margin). Values are only brought to canonical
(< p, unique) form at serialization/comparison points.

Reduction is LAZY: add/sub/neg cost exactly two carry-style passes
(_fold256 + one carry) instead of a full normalization, and the fused
product+epilogue family (mul_sub, sqr_sub2_dbl, ...) folds the EC
formulas' +- lines into the producer's reduce tail for free. The serial
pass count — not the element count — is what the VPU latency chain is
made of, so passes are the budget.

Broadcasting: shapes (NLIMBS, 1) and (NLIMBS, B) mix freely, so shared
per-query constants (spend key, labels) stay unexpanded.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants (computed, not hand-typed — the role of gECC's constants
# generator, CMakeLists.txt:34-62).
# ---------------------------------------------------------------------------

LB = 13                      # bits per limb
NLIMBS = 20                  # 20 * 13 = 260 >= 256
MASK = (1 << LB) - 1         # 0x1FFF
BASE = 1 << LB

P_INT = 2**256 - 2**32 - 977
# 2^260 == 2^4 * (2^32 + 977) == 2^36 + 15632 (mod p).
#   2^36 = limb offset 2, shift 10 -> multiplier 1024 at limb k+2
#   15632 at limb k
FOLD20_LO = 15632
FOLD20_HI = 1 << (36 - 2 * LB)   # 1024
# 2^256 == 2^32 + 977 (mod p); 2^32 = limb 2 (bits 26..38) shift 6.
FOLD256_LO = 977
FOLD256_HI = 1 << (32 - 2 * LB)  # 64
TOP_BITS = 256 - (NLIMBS - 1) * LB   # bits of limb 19 below 2^256: 9
# Audited operand bound for mul/sqr inputs ("mulsafe", see module
# docstring): every 20-term product column must stay < 2^31 in int32, and
# 20 * MULSAFE_MAX^2 = 1.805e9 < 2^31 = 2.147e9 with ~16% headroom. The
# lazy-reduction ops (_reduce_cols / _lazy) emit limbs <= ~8300 < this;
# tests/test_field.py::test_mulsafe_bound_holds fuzzes the invariant.
MULSAFE_MAX = 9500


def int_to_limbs(v: int) -> np.ndarray:
    """256-bit-ish integer -> (NLIMBS,) int32 canonical limbs."""
    out = np.zeros(NLIMBS, dtype=np.int32)
    for i in range(NLIMBS):
        out[i] = v & MASK
        v >>= LB
    if v:
        raise ValueError("value does not fit in NLIMBS limbs")
    return out


def limbs_to_int(limbs) -> int:
    arr = np.asarray(limbs, dtype=np.int64).reshape(-1)
    return sum(int(d) << (LB * i) for i, d in enumerate(arr))


def _subtrahend_limbs(mult: int, slack: int = 2) -> np.ndarray:
    """Borrow-proof limb representation D of mult*p with every non-top limb
    >= slack*BASE, so per-limb a + D - b never goes negative for any operand
    with limbs <= slack*BASE. Used by sub/neg and the fused-line helpers."""
    v = mult * P_INT
    out = []
    for _ in range(NLIMBS - 1):
        out.append((v & MASK) + slack * BASE)
        v >>= LB
        v -= slack
    if v < 0 or v >= BASE:
        raise ValueError("mult/slack out of range for borrow-proof form")
    out.append(v)
    d = np.array(out, dtype=np.int32)
    assert limbs_to_int(d) == mult * P_INT
    return d


P_LIMBS = int_to_limbs(P_INT)                     # canonical p
D8_LIMBS = _subtrahend_limbs(8)                   # 8p, covers limbs <= 2*BASE
D16_3_LIMBS = _subtrahend_limbs(16, 3)            # 16p, covers <= 3*BASE
D16_9_LIMBS = _subtrahend_limbs(16, 9)            # 16p, covers <= 9*BASE


def _literal_col(limbs) -> jnp.ndarray:
    """(NLIMBS, 1) int32 column built from python-int literals at trace
    time. Pallas kernels reject captured array constants, so constants are
    (re)constructed per trace from scalar literals; XLA folds them."""
    return jnp.concatenate(
        [jnp.full((1, 1), int(v), jnp.int32) for v in limbs], axis=0)


def literal_planes(limbs, width: int) -> jnp.ndarray:
    """(NLIMBS, width) int32 constant built from lane-wide literal splats.
    Use this (not a (NLIMBS, 1) column) for constants that feed mul/sqr
    inside Pallas kernels: row-slicing a width-1 constant makes Mosaic
    synthesize dual-axis broadcasts, which it cannot lower."""
    return jnp.concatenate(
        [jnp.full((1, width), int(v), jnp.int32) for v in limbs], axis=0)


def _p_col() -> jnp.ndarray:
    return _literal_col(P_LIMBS)


def _d8_col() -> jnp.ndarray:
    return _literal_col(D8_LIMBS)

# ---------------------------------------------------------------------------
# Reduction primitives
# ---------------------------------------------------------------------------


def _carry(v: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """One carry-propagation pass (non-negative limbs). (K,B) -> (out_len,B).

    Caller must ensure the dropped/kept length is sound: if out_len == K the
    top limb must not produce a carry."""
    lo = v & MASK
    hi = v >> LB
    k = v.shape[0]
    z = jnp.zeros((1,) + v.shape[1:], dtype=v.dtype)
    shifted = jnp.concatenate([z, hi], axis=0)      # (K+1, B)
    lo = jnp.concatenate([lo, z], axis=0)
    out = lo + shifted
    if out_len == k + 1:
        return out
    if out_len > k + 1:
        pad = jnp.zeros((out_len - k - 1,) + v.shape[1:], dtype=v.dtype)
        return jnp.concatenate([out, pad], axis=0)
    return out[:out_len]


def _rows_at(x: jnp.ndarray, start: int, out_len: int) -> jnp.ndarray:
    """Place the rows of x at row offset `start` inside an out_len-row array
    (zero padding elsewhere). Pure pad — no scatter, Pallas/Mosaic friendly."""
    n = x.shape[0]
    parts = []
    if start > 0:
        parts.append(jnp.zeros((start,) + x.shape[1:], dtype=x.dtype))
    parts.append(x[: out_len - start])
    tail = out_len - start - min(n, out_len - start)
    if tail > 0:
        parts.append(jnp.zeros((tail,) + x.shape[1:], dtype=x.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _fold20(v: jnp.ndarray) -> jnp.ndarray:
    """Fold limbs >= NLIMBS back using 2^260 == 2^36 + 15632 (mod p).
    (K,B) with limbs <= ~2^13.1 -> (max(NLIMBS, K-NLIMBS+2), B)."""
    k = v.shape[0]
    if k <= NLIMBS:
        return v
    lo = v[:NLIMBS]
    hi = v[NLIMBS:]                                  # (k-20, B)
    nh = hi.shape[0]
    out_len = max(NLIMBS, nh + 2)
    return (_rows_at(lo, 0, out_len)
            + _rows_at(hi * FOLD20_LO, 0, out_len)
            + _rows_at(hi * FOLD20_HI, 2, out_len))


def _fold256(v: jnp.ndarray) -> jnp.ndarray:
    """Fold everything at/above bit 256 using 2^256 == 2^32 + 977 (mod p).
    Input: (NLIMBS or NLIMBS+1+, B) with limbs small enough that the
    folded quantity fits int32. Output: (NLIMBS, B) with top limb < 2^9."""
    e = v[NLIMBS - 1] >> TOP_BITS
    shift = LB - TOP_BITS  # contribution scale per extra limb: 2^(13-9)=16
    for j in range(NLIMBS, v.shape[0]):
        e = e + (v[j] << (shift + LB * (j - NLIMBS)))
    top = v[NLIMBS - 1] & ((1 << TOP_BITS) - 1)
    return jnp.concatenate([
        (v[0] + e * FOLD256_LO)[None],
        v[1:2],
        (v[2] + e * FOLD256_HI)[None],
        v[3:NLIMBS - 1],
        top[None],
    ], axis=0)


def _finalize(v: jnp.ndarray) -> jnp.ndarray:
    """(K,B) limbs <= ~2^13.1 -> normal form (NLIMBS,B), limbs <= ~2^13,
    top limb < 2^9 + 1, value < 2^256 + small."""
    v = _fold256(v)
    v = _carry(v, NLIMBS)     # top limb < 2^9, cannot carry out
    v = _carry(v, NLIMBS)
    return v


def _fold20_split(v: jnp.ndarray) -> jnp.ndarray:
    """fold20 for limbs up to ~2^18 (one carry pass after raw product
    columns): each hi limb splits 13+5 bits inline, so the fold multiplies
    stay < 2^31 without a second full-width carry pass first. Hi limb h =
    h_lo + 2^13 h_hi contributes h_lo*F + h_hi*F one row up (and the same
    for the 2^36 term two/three rows up)."""
    k = v.shape[0]
    if k <= NLIMBS:
        return v
    lo = v[:NLIMBS]
    hi = v[NLIMBS:]
    h_lo = hi & MASK
    h_hi = hi >> LB
    out_len = max(NLIMBS, hi.shape[0] + 3)
    return (_rows_at(lo, 0, out_len)
            + _rows_at(h_lo * FOLD20_LO, 0, out_len)
            + _rows_at(h_hi * FOLD20_LO, 1, out_len)
            + _rows_at(h_lo * FOLD20_HI, 2, out_len)
            + _rows_at(h_hi * FOLD20_HI, 3, out_len))


def _reduce_cols(cols: jnp.ndarray, post=None) -> jnp.ndarray:
    """Reduction of raw product columns (39,B) (each <= 20*9500^2 < 2^31)
    to mulsafe form — the minimal serial pass chain (bounds audited per
    step; every intermediate < 2^31):

      carry        limbs <= 8191 + 220k = 228k
      fold20_split (23,B)  limbs <= 1.37e8 (split keeps folds exact)
      carry        limbs <= 24.9k
      fold20       (20,B)  limbs <= 4.2e8 (rows 0..5), rest <= 24.9k
      [post]       optional fused epilogue, see below
      fold256      strips top-limb bits >= 2^9
      carry        limbs <= 112k (post cap 8.5e8 -> 8191 + 8.5e8/2^13)
      fold256      e <= 1
      carry        limbs <= 8205, top < 2^10     -> mulsafe

    `post` fuses the ± epilogues of the EC formula lines into this tail
    (the mul_sub/sqr_*_dbl family below): it runs on the (20,B) state
    (rows 0..5 <= 4.2e8, rest <= 24.9k, top row <= 24.9k, all >= 0) and
    must return non-negative rows <= ~1.7e9 with the same value mod p —
    which every borrow-proof (D - x) line, a doubling, and a quadrupling
    (mul_x4) satisfy. Audit for the 1.7e9 cap: the next fold256's
    e*FOLD256_LO term adds < 2e5 (< 2^31 total), and the following carry
    caps limbs at 8191 + 1.7e9/2^13 ~= 216k, whose own fold256+carry
    lands mulsafe. One fused line replaces a full _lazy pass pair."""
    v = _carry(cols, cols.shape[0] + 1)
    v = _fold20_split(v)
    v = _carry(v, v.shape[0] + 1)
    v = _fold20(v)
    if post is not None:
        v = post(v)
    v = _carry(_fold256(v), NLIMBS)
    return _carry(_fold256(v), NLIMBS)


# ---------------------------------------------------------------------------
# Arithmetic
# ---------------------------------------------------------------------------


def _lazy(s: jnp.ndarray) -> jnp.ndarray:
    """Two-pass finisher for add-like combinations: fold top-limb bits
    >= 2^9 back (cheap — touches 3 rows), then one carry pass. Valid for
    non-negative (NLIMBS, B) inputs with limbs < ~2^22 (then e <= 2^13 and
    every intermediate stays < 2^31). Output is mulsafe."""
    return _carry(_fold256(s), NLIMBS)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b (mod p), mulsafe output. Inputs mulsafe."""
    return _lazy(a + b)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a - b (mod p). b limbs must be <= 2*BASE (any mulsafe value)."""
    return _lazy(a + (_d8_col() - b))


def neg(b: jnp.ndarray) -> jnp.ndarray:
    return _lazy(_d8_col() - b)


def mul_small(a: jnp.ndarray, c: int) -> jnp.ndarray:
    """a * c for small positive c (<= ~64)."""
    return _lazy(a * c)


# Fused +- lines for the EC formulas: each costs ONE _lazy pass pair
# instead of chaining 2-3 two-pass ops. Borrow-proofness per line is
# guaranteed by the slack of the matching D constant (limbs audited:
# every per-limb sum stays < 2^31 and every D - x term >= 0).
# (The standalone dbl_sub2/sub_dbl/sub2_dbl/sub_scaled8 helpers were
# superseded by the fused product+epilogue family below, which folds the
# same lines into the producer's reduce tail, and were removed.)


_GROUP = 4                       # limbs per accumulation group in mul/sqr
_NGROUPS = NLIMBS // _GROUP      # 5
_CANVAS = NLIMBS + _GROUP - 1    # 23: rows of one group canvas
_NCOLS = 2 * NLIMBS - 1          # 39 product columns


def _product_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Raw schoolbook product columns (2N-1, B), scatter-free and
    shift-lean: limb i = 4q + r contributes a_i * shift(b, r) into group
    canvas C_q (rows 4q..4q+22), so only 4 pre-shifts of b plus 5 shifted
    canvas merges are sublane-shift passes (the naive per-limb placement
    pays 2 shifts per limb, ~40 passes). Bounds: canvas columns sum <= 4
    products < 2^28.1, final columns <= 20 products < 2^31 (int32-exact
    for mulsafe inputs, limbs <= ~8300)."""
    bshape = np.broadcast_shapes(a.shape[1:], b.shape[1:])
    b = jnp.broadcast_to(b, (NLIMBS,) + bshape)
    shifted = [_rows_at(b, r, _CANVAS) for r in range(_GROUP)]   # (23, B)
    out = jnp.zeros((_NCOLS,) + bshape, dtype=jnp.int32)
    for q in range(_NGROUPS):
        c = shifted[0] * a[_GROUP * q][None]
        for r in range(1, _GROUP):
            c = c + shifted[r] * a[_GROUP * q + r][None]
        out = out + _rows_at(c, _GROUP * q, _NCOLS)
    return out


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full field multiply. Inputs must be mulsafe: limbs <= MULSAFE_MAX
    (9500, the audited int32-overflow bound — see module constants). All
    in-module producers emit <= ~8300; new fused ops must re-audit."""
    return _reduce_cols(_product_cols(a, b))


def sqr(a: jnp.ndarray) -> jnp.ndarray:
    """Squaring. The symmetric half-product schoolbook (one shifted
    placement per limb) measures ~40% SLOWER than the grouped full product
    on TPU: its per-limb sublane shifts dominate, while _product_cols pays
    only 9 shift passes total. Shared-operand shifts also dedupe."""
    return _reduce_cols(_product_cols(a, a))


# Fused product+epilogue ops: the EC formulas' ± lines ride the reduce
# tail (see _reduce_cols `post`) instead of paying their own _lazy pass
# pair. All subtrahends are borrow-proof for mulsafe operands (same D
# constants as the standalone sub/sub_dbl/... helpers).


def mul_sub(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """a*b - c (mod p), one fused reduction."""
    d8 = _d8_col()
    return _reduce_cols(_product_cols(a, b), post=lambda s: s + (d8 - c))


def mul_sub_scaled8(a, b, c) -> jnp.ndarray:
    """a*b - 8c (mod p)."""
    d = _literal_col(D16_9_LIMBS)
    return _reduce_cols(_product_cols(a, b), post=lambda s: s + (d - c * 8))


def mul_x2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """2*a*b (mod p): the doubling rides the tail (state <= 4.2e8 doubles
    to <= 8.5e8 < 2^31)."""
    return _reduce_cols(_product_cols(a, b), post=lambda s: s + s)


def mul_x4(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """4*a*b (mod p): state <= 4.2e8 quadruples to <= 1.7e9 < 2^31. Used
    for the doubling's D line — 2*((X+B)^2 - A - C) == 4*X*B exactly when
    A = X^2, C = (Y^2)^2 — which drops the (X+B) add's lazy pass pair."""
    return _reduce_cols(_product_cols(a, b), post=lambda s: (s + s) + (s + s))


def sqr_sub2_dbl(r, h3, v) -> jnp.ndarray:
    """r^2 - h3 - 2v (mod p): the madd x3 line."""
    d8 = _d8_col()
    d16 = _literal_col(D16_3_LIMBS)
    return _reduce_cols(
        _product_cols(r, r),
        post=lambda s: s + (d8 - h3) + (d16 - (v + v)))


def sqr_sub2(r, a, b) -> jnp.ndarray:
    """r^2 - a - b (mod p): the ZADDU x3 line (Co-Z odd-multiple chain).
    Bounds: same post shape as sqr_sub2_dbl with the milder (d8 - b) in
    place of (d16 - 2v) — state <= 4.2e8 + 2*d8 < the audited 1.7e9 cap."""
    d8 = _d8_col()
    return _reduce_cols(_product_cols(r, r),
                        post=lambda s: s + (d8 - a) + (d8 - b))


def sqr_dbl_sub2(t, a, c) -> jnp.ndarray:
    """2*(t^2 - a - c) (mod p): the dbl d line."""
    d8 = _d8_col()

    def post(s):
        s = s + (d8 - a) + (d8 - c)
        return s + s

    return _reduce_cols(_product_cols(t, t), post=post)


def sqr_sub_dbl(e, d) -> jnp.ndarray:
    """e^2 - 2d (mod p): the dbl x3 line."""
    d16 = _literal_col(D16_3_LIMBS)
    return _reduce_cols(_product_cols(e, e),
                        post=lambda s: s + (d16 - (d + d)))


def zero_like(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.zeros_like(a)


def one_like(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([
        jnp.ones((1,) + a.shape[1:], dtype=a.dtype),
        jnp.zeros((NLIMBS - 1,) + a.shape[1:], dtype=a.dtype),
    ], axis=0)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field select; mask shape (B,) or broadcastable."""
    return jnp.where(mask[None, :], a, b)


# ---------------------------------------------------------------------------
# Canonicalization / comparison
# ---------------------------------------------------------------------------


def _ripple_signed(v: jnp.ndarray, passes: int = NLIMBS) -> jnp.ndarray:
    """Borrow/carry ripple valid for (possibly negative) limbs whose value is
    known non-negative; arithmetic right shift implements floor division."""
    def body(_, x):
        lo = x & MASK
        hi = x >> LB          # arithmetic shift: floor for negatives
        z = jnp.zeros((1,) + x.shape[1:], dtype=x.dtype)
        return lo + jnp.concatenate([z, hi[:-1]], axis=0)
    return jax.lax.fori_loop(0, passes, body, v)


def canonical(a: jnp.ndarray) -> jnp.ndarray:
    """Unique representative < p, canonical 13-bit limbs. Input normal form."""
    v = _finalize(a)                      # value < 2^256 + small, < 2p
    v = _carry(v, NLIMBS)                 # positional limbs, no top carry
    # compare v >= p (lexicographic from the top limb down)
    diff = v - _p_col()
    res = jnp.zeros(v.shape[1:], dtype=jnp.int32)
    for i in range(NLIMBS - 1, -1, -1):
        res = jnp.where(res == 0, jnp.sign(diff[i]), res)
    ge = res >= 0
    v = jnp.where(ge[None], diff, v)
    return _ripple_signed(v)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """a == 0 (mod p) -> bool (B,). Input normal form."""
    v = _finalize(a)
    v = _carry(v, NLIMBS)
    zero = jnp.all(v == 0, axis=0)
    isp = jnp.all(v == _p_col(), axis=0)
    return zero | isp


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return is_zero(sub(a, b))


def is_odd(a: jnp.ndarray) -> jnp.ndarray:
    """Parity of the canonical value."""
    return (canonical(a)[0] & 1).astype(jnp.bool_)


# ---------------------------------------------------------------------------
# Inversion (Fermat: x^(p-2); batched across lanes, no divergence)
# ---------------------------------------------------------------------------


def _sqr_n(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if n <= 3:
        for _ in range(n):
            x = sqr(x)
        return x
    return jax.lax.fori_loop(0, n, lambda _, v: sqr(v), x)


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """a^(p-2) via the standard secp256k1 addition chain (255S + 15M).
    inv(0) == 0 (Fermat), which downstream code uses for infinity handling.
    Replaces the reference's per-thread to_affine inversions
    (/root/reference/src/cudasp_gpu.cu:62,147,343) with a batched,
    divergence-free ladder."""
    x = a
    x2 = mul(sqr(x), x)                     # 2^2 - 1 ones
    x3 = mul(sqr(x2), x)                    # 3 ones
    x6 = mul(_sqr_n(x3, 3), x3)
    x9 = mul(_sqr_n(x6, 3), x3)
    x11 = mul(_sqr_n(x9, 2), x2)
    x22 = mul(_sqr_n(x11, 11), x11)
    x44 = mul(_sqr_n(x22, 22), x22)
    x88 = mul(_sqr_n(x44, 44), x44)
    x176 = mul(_sqr_n(x88, 88), x88)
    x220 = mul(_sqr_n(x176, 44), x44)
    x223 = mul(_sqr_n(x220, 3), x3)
    t = mul(_sqr_n(x223, 23), x22)
    t = mul(_sqr_n(t, 5), x)
    t = mul(_sqr_n(t, 3), x2)
    t = mul(_sqr_n(t, 2), x)
    return t


def sqrt_candidate(a: jnp.ndarray) -> jnp.ndarray:
    """a^((p+1)/4): THE square root of a when a is a quadratic residue
    (p === 3 mod 4), garbage otherwise (callers relying on valid curve
    points inherit the reference's garbage-in/garbage-out contract for
    off-curve inputs). Addition chain shares the x223 backbone with inv():
    (p+1)/4 = 0x3FFF...FFFFBFFFFF0C (222 ones, 0, 22 ones, 0000, 11, 00).
    Used to decompress x-only tweak uploads on device (halves the scan's
    host->device bytes; the reference ships full 64-B points,
    src/cudasp_extension.cu:159-163)."""
    x = a
    x2 = mul(sqr(x), x)
    x3 = mul(sqr(x2), x)
    x6 = mul(_sqr_n(x3, 3), x3)
    x9 = mul(_sqr_n(x6, 3), x3)
    x11 = mul(_sqr_n(x9, 2), x2)
    x22 = mul(_sqr_n(x11, 11), x11)
    x44 = mul(_sqr_n(x22, 22), x22)
    x88 = mul(_sqr_n(x44, 44), x44)
    x176 = mul(_sqr_n(x88, 88), x88)
    x220 = mul(_sqr_n(x176, 44), x44)
    x223 = mul(_sqr_n(x220, 3), x3)
    t = mul(_sqr_n(x223, 23), x22)
    t = _sqr_n(t, 6)
    t = mul(t, x2)
    return _sqr_n(t, 2)


def inv_chain(zs):
    """Montgomery-trick shared inversion of a short list of (NLIMBS,B)
    elements: one Fermat ladder total + 3 muls per extra element.
    Zero inputs are mapped to zero inverses (infinity-safe)."""
    nz = [is_zero(z) for z in zs]
    safe = [select(m, one_like(z), z) for m, z in zip(nz, zs)]
    prefix = [safe[0]]
    for z in safe[1:]:
        prefix.append(mul(prefix[-1], z))
    run = inv(prefix[-1])
    out = [None] * len(zs)
    for i in range(len(zs) - 1, 0, -1):
        out[i] = mul(run, prefix[i - 1])
        run = mul(run, safe[i])
    out[0] = run
    return [select(m, zero_like(o), o) for m, o in zip(nz, out)]


# ---------------------------------------------------------------------------
# On-device bit repacking (pure reinterpretation; the reference does the
# equivalent on the host with a D2H/H2D round trip, src/cudasp_gpu.cu:836-911)
# ---------------------------------------------------------------------------


def limbs_to_words_be(x: jnp.ndarray) -> jnp.ndarray:
    """Canonical limbs (NLIMBS,B) -> (8,B) uint32 big-endian words
    (word 0 = bits 224..255). Input MUST be canonical (13-bit limbs)."""
    xu = x.astype(jnp.uint32)
    words = []
    for j in range(8):
        lo_bit = 32 * (7 - j)
        acc = None
        for i in range(NLIMBS):
            limb_lo = LB * i
            if limb_lo + LB <= lo_bit or limb_lo >= lo_bit + 32:
                continue
            s = limb_lo - lo_bit
            part = (xu[i] << np.uint32(s)) if s >= 0 else (xu[i] >> np.uint32(-s))
            acc = part if acc is None else (acc | part)
        words.append(acc)
    return jnp.stack(words, axis=0)


def words_be_to_bytes(words) -> jnp.ndarray:
    """8 big-endian uint32 words ((8,B) array or length-8 sequence) ->
    (32,B) int32 bytes, MSB first."""
    rows = []
    for i in range(32):
        w = words[i // 4]
        rows.append(((w >> np.uint32(8 * (3 - i % 4))) & np.uint32(0xFF)))
    return jnp.stack(rows, axis=0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Host <-> device packing
# ---------------------------------------------------------------------------


def pack_ints(vals, batch_last: bool = True) -> np.ndarray:
    """List/array of python ints -> (NLIMBS, B) int32 numpy array."""
    out = np.zeros((NLIMBS, len(vals)), dtype=np.int32)
    for j, v in enumerate(vals):
        out[:, j] = int_to_limbs(v)
    return out


def unpack_ints(arr) -> list:
    a = np.asarray(arr)
    return [limbs_to_int(a[:, j]) for j in range(a.shape[1])]
