"""The fused scan pipeline: pure jitted functions per batch.

This is the TPU equivalent of the reference's entire L3+L2 stack
(LaunchBatchScan + RunBatchScanKernels + the four kernels,
/root/reference/src/cudasp_gpu.cu:445-966) collapsed into pure traced
programs with zero host round-trips and zero per-batch state objects:

    ecdh = scan_key x tweak          (shared-scalar batched pmul)
    ser  = 02/03 || x || 0^4         (on-device bit repack)
    t    = tagged_sha256(ser)        (1 compression, midstate precomputed)
    out  = t x G                     (fixed-base comb, MXU selects)
    final = out + spend              (complete mixed add)
    cand_j = final + label_j         (per label)
    match = any candidate's upper-64 x-bits in the row's outputs list

Per-row semantics match src/cudasp_gpu.cu:74-178 bit-for-bit; degenerate
rows (point at infinity anywhere) are defined to not match instead of
being undefined behavior.

The pipeline is exposed two ways:
  * scan_batch(...)       — three separately-jitted stages composed in
    Python. Identical math; intermediate arrays stay on device. Compiles
    in seconds per stage (XLA's whole-graph optimization is superlinear in
    program size, and the stage cut also means the heavy ECDH/hash/comb
    stages recompile independently of the outputs-width/label-count
    shapes).
  * scan_batch_fused(...) — single jitted program (one XLA dispatch per
    batch; used where per-dispatch latency matters and the compile cost
    is paid once).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import curve as C
from . import field as F
from . import scalar as S
from . import sha256 as H


def _upper64_words(x_canonical):
    """hi/lo int32 words of bits 192..255 of a canonical field element
    (the reference's ExtractUpper64, src/cudasp_gpu.cu:67-71, kept as two
    32-bit words because TPU int64 support is weak)."""
    words = F.limbs_to_words_be(x_canonical)           # (8,B) uint32
    as_i32 = jax.lax.bitcast_convert_type(words, jnp.int32)
    return as_i32[0], as_i32[1]                        # bits 224..255, 192..223


def _candidate_match(point, zinv, outputs_hi, outputs_lo, outputs_valid):
    """Match flags for one candidate point (given its shared-inverted Z)."""
    aff = C.to_affine(point, zinv=zinv, want_y=False)
    hi, lo = _upper64_words(F.canonical(aff.x))
    eq = (hi[:, None] == outputs_hi) & (lo[:, None] == outputs_lo)
    hit = jnp.any(eq & outputs_valid, axis=1)
    return hit & ~point.inf


# --------------------------------------------------------------------------
# Stages
# --------------------------------------------------------------------------


def _ecdh(tweak_x, tweak_y, scan_windows):
    """rows -> ecdh point (flat arrays). The scalar arrives as a
    host-computed GLV window schedule pytree (w1, sign1, w2, sign2)."""
    w1, n1, w2, n2 = scan_windows[:4]   # tail fields = Pallas schedules
    tweaks = C.affine(tweak_x, tweak_y)
    p = S.ecdh_shared_scalar_glv(w1, n1, w2, n2, tweaks)
    return p.x, p.y, p.z, p.inf


def _serialize_hash(ex, ey, ez, einf):
    """ecdh point -> (8 hash words as separate (B,) uint32 arrays, ecdh_inf).

    The hash words cross the stage boundary unstacked — see the note in
    sha256.tagged_hash_serialized (XLA:CPU deadlock when stacking the deep
    chains in-program)."""
    ecdh_aff = C.to_affine(C.JacPoint(ex, ey, ez, einf))
    x_can = F.canonical(ecdh_aff.x)
    parity = (F.canonical(ecdh_aff.y)[0] & 1).astype(jnp.uint32)
    hw = H.tagged_hash_serialized(F.limbs_to_words_be(x_can), parity)
    return hw + (einf,)


def _ecdh_hash(tweak_x, tweak_y, scan_windows,
               ecdh=None, serialize_hash=None):
    e = (ecdh or _ecdh)(tweak_x, tweak_y, scan_windows)
    out = (serialize_hash or _serialize_hash)(*e)
    return out[:8], out[8]


def _output_final(w0, w1, w2, w3, w4, w5, w6, w7, spend_x, spend_y):
    """hash words -> t x G + spend -> final point (as flat arrays)."""
    scalar_bytes = F.words_be_to_bytes((w0, w1, w2, w3, w4, w5, w6, w7))
    out_point = S.fixed_base_mul(scalar_bytes)
    spend = C.AffinePoint(spend_x, spend_y, jnp.zeros((1,), jnp.bool_))
    final = C.madd(out_point, spend)
    return final.x, final.y, final.z, final.inf


def _match(final_x, final_y, final_z, final_inf, ecdh_inf, row_valid,
           outputs_hi, outputs_lo, outputs_valid, label_x, label_y,
           nlabels: int):
    final = C.JacPoint(final_x, final_y, final_z, final_inf)
    one_inf = jnp.zeros((1,), jnp.bool_)
    candidates = [final]
    for j in range(nlabels):
        label = C.AffinePoint(label_x[j], label_y[j], one_inf)
        candidates.append(C.madd(final, label))

    zs = [F.select(c.inf, F.one_like(c.z), c.z) for c in candidates]
    zinvs = F.inv_chain(zs)

    hit = jnp.zeros(final_inf.shape, jnp.bool_)
    for c, zi in zip(candidates, zinvs):
        hit = hit | _candidate_match(c, zi, outputs_hi, outputs_lo,
                                     outputs_valid)
    return hit & row_valid & ~ecdh_inf


stage_ecdh = jax.jit(_ecdh)
stage_serialize_hash = jax.jit(_serialize_hash)
stage_output_final = jax.jit(_output_final)
stage_match = jax.jit(_match, static_argnames=("nlabels",))


def stage_ecdh_hash(tweak_x, tweak_y, scan_windows):
    return _ecdh_hash(tweak_x, tweak_y, scan_windows,
                      ecdh=stage_ecdh, serialize_hash=stage_serialize_hash)


# --------------------------------------------------------------------------
# Composition
# --------------------------------------------------------------------------


def _scan_impl(tweak_x, tweak_y, row_valid, outputs_hi, outputs_lo,
               outputs_valid, scan_windows, spend_x, spend_y,
               label_x, label_y, nlabels,
               ecdh_hash=_ecdh_hash, output_final=_output_final,
               match=_match):
    hw, ecdh_inf = ecdh_hash(tweak_x, tweak_y, scan_windows)
    fx, fy, fz, finf = output_final(*hw, spend_x, spend_y)
    return match(fx, fy, fz, finf, ecdh_inf, row_valid,
                 outputs_hi, outputs_lo, outputs_valid,
                 label_x, label_y, nlabels)


def scan_batch(tweak_x, tweak_y, row_valid, outputs_hi, outputs_lo,
               outputs_valid, scan_windows, spend_x, spend_y,
               label_x, label_y, *, nlabels: int):
    """Staged pipeline (device-resident intermediates). Returns (B,) bool."""
    return _scan_impl(
        tweak_x, tweak_y, row_valid, outputs_hi, outputs_lo, outputs_valid,
        scan_windows, spend_x, spend_y, label_x, label_y, nlabels,
        ecdh_hash=stage_ecdh_hash, output_final=stage_output_final,
        match=lambda *a: stage_match(*a[:-1], nlabels=a[-1]),
    )


@partial(jax.jit, static_argnames=("nlabels",))
def scan_batch_fused(tweak_x, tweak_y, row_valid, outputs_hi, outputs_lo,
                     outputs_valid, scan_windows, spend_x, spend_y,
                     label_x, label_y, *, nlabels: int):
    """Single-program variant (one dispatch per batch)."""
    return _scan_impl(
        tweak_x, tweak_y, row_valid, outputs_hi, outputs_lo, outputs_valid,
        scan_windows, spend_x, spend_y, label_x, label_y, nlabels,
    )
