"""Field-arithmetic unit tests: device limb ops vs Python bignum oracle.

(The unit-test tier the reference lacks — SURVEY.md §4 'implication'.)
"""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cudasp_tpu.ops import field as F

P = F.P_INT
B = 32
random.seed(20260817)
VALS_A = [random.randrange(P) for _ in range(B - 4)] + [0, 1, P - 1, P - 2]
VALS_B = [random.randrange(P) for _ in range(B - 4)] + [P - 1, 0, 1, 2]


@pytest.fixture(scope="module")
def results():
    a = jnp.asarray(F.pack_ints(VALS_A))
    b = jnp.asarray(F.pack_ints(VALS_B))

    @jax.jit
    def run(a, b):
        return dict(
            add=F.canonical(F.add(a, b)),
            sub=F.canonical(F.sub(a, b)),
            neg=F.canonical(F.neg(b)),
            mul=F.canonical(F.mul(a, b)),
            sqr=F.canonical(F.sqr(a)),
            mul8=F.canonical(F.mul_small(a, 8)),
            inv=F.canonical(F.inv(a)),
            chain_limb_max=jnp.max(F.mul(F.add(a, b), F.sub(a, b))),
            iszero_aa=F.is_zero(F.sub(a, a)),
            iszero_ab=F.is_zero(F.sub(a, b)),
            odd=F.is_odd(a),
            invc=[F.canonical(x) for x in F.inv_chain([a, b])],
            bcast=F.canonical(F.mul(a, b[:, :1])),
        )

    out = run(a, b)
    return jax.tree_util.tree_map(np.asarray, out)


def _check(got_arr, expect_fn):
    got = F.unpack_ints(got_arr)
    exp = [expect_fn(x, y) % P for x, y in zip(VALS_A, VALS_B)]
    assert got == exp


def test_add(results):
    _check(results["add"], lambda x, y: x + y)


def test_sub(results):
    _check(results["sub"], lambda x, y: x - y)


def test_neg(results):
    _check(results["neg"], lambda x, y: -y)


def test_mul(results):
    _check(results["mul"], lambda x, y: x * y)


def test_sqr(results):
    _check(results["sqr"], lambda x, y: x * x)


def test_mul_small(results):
    _check(results["mul8"], lambda x, y: 8 * x)


def test_fused_lines():
    """Fused product+epilogue ops == plain modular arithmetic, incl. the
    mulsafe-limit operand (limbs 9500 / top 8191)."""
    import jax

    import cudasp_tpu.ops.field as F

    rng = np.random.default_rng(5)
    B = 64

    def rnd():
        a = rng.integers(0, F.MASK, (F.NLIMBS, B)).astype(np.int32)
        return a

    a, b, c = rnd(), rnd(), rnd()
    a[:, 0] = 9500
    a[-1, 0] = 8191
    va, vb, vc = ([F.limbs_to_int(x[:, j]) for j in range(B)]
                  for x in (a, b, c))
    can = jax.jit(F.canonical)
    cases = [
        (F.mul_sub(a, b, c), [(x * y - z) % P for x, y, z in zip(va, vb, vc)]),
        (F.mul_sub_scaled8(a, b, c),
         [(x * y - 8 * z) % P for x, y, z in zip(va, vb, vc)]),
        (F.mul_x2(a, b), [(2 * x * y) % P for x, y in zip(va, vb)]),
        (F.sqr_sub2_dbl(a, b, c),
         [(x * x - y - 2 * z) % P for x, y, z in zip(va, vb, vc)]),
        (F.sqr_dbl_sub2(a, b, c),
         [2 * (x * x - y - z) % P for x, y, z in zip(va, vb, vc)]),
        (F.sqr_sub_dbl(a, b), [(x * x - 2 * y) % P for x, y in zip(va, vb)]),
    ]
    for got, exp in cases:
        lim = np.asarray(got)
        assert (lim[:-1] <= 9500).all() and (lim[-1] < 2**13).all()
        assert F.unpack_ints(np.asarray(can(got))) == exp


def test_inv(results):
    _check(results["inv"], lambda x, y: pow(x, P - 2, P) if x else 0)


def test_inv_chain(results):
    _check(results["invc"][0], lambda x, y: pow(x, P - 2, P) if x else 0)
    _check(results["invc"][1], lambda x, y: pow(y, P - 2, P) if y else 0)


def test_limb_bounds_mul_safe(results):
    assert int(results["chain_limb_max"]) <= F.MULSAFE_MAX


def test_mulsafe_bound_holds():
    """Fuzz the mulsafe invariant (field.MULSAFE_MAX): every producer op's
    output limbs must stay within the audited mul/sqr input bound, across
    chained random inputs — the overflow-protection check ADVICE.md asked
    for (int32 column sums reach 20*limb^2, so limbs > MULSAFE_MAX would
    silently wrap)."""
    rng = random.Random(99)
    vals = [rng.randrange(P) for _ in range(64)]
    a = jnp.asarray(F.pack_ints(vals))

    @jax.jit
    def chain_max(a):
        outs = []
        x = a
        for _ in range(4):           # deep chain: bounds must not grow
            y = F.add(x, a)
            z = F.sub(x, y)
            w = F.mul(y, z)
            v = F.sqr(w)
            u = F.mul_sub(v, w, z)
            t = F.sqr_sub2_dbl(u, v, w)
            s = F.neg(F.mul_small(t, 8))
            outs += [y, z, w, v, u, t, s]
            x = s
        return jnp.max(jnp.stack([jnp.max(o[:-1]) for o in outs])), \
            jnp.max(jnp.stack([jnp.max(o[-1]) for o in outs]))

    body_max, top_max = chain_max(a)
    assert int(body_max) <= F.MULSAFE_MAX
    assert int(top_max) < 2**13


def test_is_zero(results):
    assert results["iszero_aa"].all()
    assert not results["iszero_ab"].any()


def test_is_odd(results):
    assert all((v & 1) == bool(o) for v, o in zip(VALS_A, results["odd"]))


def test_broadcast_shared_operand(results):
    got = F.unpack_ints(results["bcast"])
    exp = [(x * VALS_B[0]) % P for x in VALS_A]
    assert got == exp


def test_pack_unpack_roundtrip():
    vals = [0, 1, P - 1, 2**255, 12345678901234567890]
    assert F.unpack_ints(F.pack_ints(vals)) == vals
