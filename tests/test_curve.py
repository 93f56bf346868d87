"""EC group-op unit tests: Jacobian device ops vs the affine Python oracle.

Exercises the completeness cases (double, cancel, infinity) that the
reference kernels never handle (src/cudasp_gpu.cu:44-64).
"""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cudasp_tpu.oracle import ec as O
from cudasp_tpu.ops import curve as C
from cudasp_tpu.ops import field as F

G = (O.GX, O.GY)
random.seed(42)
SCALARS_A = [random.randrange(1, O.N) for _ in range(6)] + [1, 2, 3, O.N - 1]
SCALARS_B = [random.randrange(1, O.N) for _ in range(6)] + [
    1,            # a=1,b=1 -> same point (doubling case)
    O.N - 2,      # a=2,b=n-2 -> cancel to infinity
    3,            # same point again
    1,            # a=n-1, b=1 -> cancel
]
PTS_A = [O.ec_mul(G, k) for k in SCALARS_A]
PTS_B = [O.ec_mul(G, k) for k in SCALARS_B]


def _pack_points(pts):
    xs = F.pack_ints([p[0] for p in pts])
    ys = F.pack_ints([p[1] for p in pts])
    return C.affine(jnp.asarray(xs), jnp.asarray(ys))


def _unpack_affine(aff):
    xs = F.unpack_ints(np.asarray(aff[0]))
    ys = F.unpack_ints(np.asarray(aff[1]))
    infs = np.asarray(aff[2])
    return [
        None if i else (x, y) for x, y, i in zip(xs, ys, infs)
    ]


@pytest.fixture(scope="module")
def results():
    pa = _pack_points(PTS_A)
    pb = _pack_points(PTS_B)

    @jax.jit
    def run(pa, pb):
        ja = C.to_jacobian(pa)
        jb = C.to_jacobian(pb)
        twice = C.dbl(ja)
        msum = C.madd(ja, pb)            # mixed complete add
        jsum = C.jadd(C.dbl(ja), jb)     # jacobian add with non-1 Z
        inf = C.infinity_like(pa.x)
        inf_plus = C.madd(inf, pb)       # inf + q = q
        plus_inf = C.jadd(ja, inf)       # p + inf = p
        def aff(p):
            a = C.to_affine(p)
            return (F.canonical(a.x), F.canonical(a.y), a.inf)
        return dict(
            twice=aff(twice), msum=aff(msum), jsum=aff(jsum),
            inf_plus=aff(inf_plus), plus_inf=aff(plus_inf),
        )

    return jax.tree_util.tree_map(np.asarray, run(pa, pb))


def test_double(results):
    got = _unpack_affine(results["twice"])
    exp = [O.ec_double(p) for p in PTS_A]
    assert got == exp


def test_mixed_add_complete(results):
    got = _unpack_affine(results["msum"])
    exp = [O.ec_add(p, q) for p, q in zip(PTS_A, PTS_B)]
    assert got == exp


def test_jacobian_add(results):
    got = _unpack_affine(results["jsum"])
    exp = [O.ec_add(O.ec_double(p), q) for p, q in zip(PTS_A, PTS_B)]
    assert got == exp


def test_infinity_identities(results):
    assert _unpack_affine(results["inf_plus"]) == PTS_B
    assert _unpack_affine(results["plus_inf"]) == PTS_A
