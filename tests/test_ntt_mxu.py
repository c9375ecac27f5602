"""MXU int8-matmul NTT vs the host/radix-2 ground truth (CPU suite)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from cap_tpu.fields.host import FR, NLIMBS
from cap_tpu.ops import ntt_mxu as nm
from cap_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
from cap_tpu.ops.ntt import get_domain, intt, ntt

rng = random.Random(41)


def rand_vals(n):
    return [rng.randrange(FR.p) for _ in range(n)]


def test_planes7_roundtrip():
    vals = rand_vals(64)
    x = jnp.asarray(ints_to_limbs(vals, FR))
    planes = np.asarray(nm.to_planes7(x))  # [37, 64]
    for i, v in enumerate(vals):
        mont = limbs_to_ints(np.asarray(x[i : i + 1]))[0]
        got = sum(int(planes[k, i]) << (7 * k) for k in range(nm.NPLANES))
        assert got == mont


def test_cols7_to_modp_random():
    # random positive int32 columns; compare against bigint arithmetic
    m = 257
    cols = np.asarray(
        [[rng.randrange(1 << 30) for _ in range(m)] for _ in range(nm.NCOLS)],
        dtype=np.int32,
    )
    out = np.asarray(nm.cols7_to_modp(jnp.asarray(cols), FR))
    for i in range(m):
        want = sum(int(cols[u, i]) << (7 * u) for u in range(nm.NCOLS)) % FR.p
        got = sum(int(out[i, j]) << (16 * j) for j in range(NLIMBS))
        assert got == want, i


def test_matmul_zp_matches_host():
    r, c, m = 8, 8, 5
    W = np.array([[rng.randrange(FR.p) for _ in range(c)] for _ in range(r)],
                 dtype=object)
    xs = rand_vals(c * m)
    X = jnp.asarray(ints_to_limbs(xs, FR)).reshape(c, m, NLIMBS)
    w7 = nm._plain_planes(W, FR.p)
    out = np.asarray(nm.matmul_zp(w7, X, FR))
    # X is Montgomery (ints_to_limbs with a field converts), and the plain
    # W passes Montgomery form through: decode with FR to get W @ x
    got_plain = limbs_to_ints(out.reshape(r * m, NLIMBS), FR)
    xmat = np.array(xs, dtype=object).reshape(c, m)
    for i in range(r):
        for j in range(m):
            want = sum(int(W[i, k]) * int(xmat[k, j]) for k in range(c)) % FR.p
            assert got_plain[i * m + j] == want, (i, j)


@pytest.mark.parametrize("n", [256, 1024])
def test_ntt_mxu_matches_radix2(n):
    dom = get_domain(n)
    vals = rand_vals(n)
    x = jnp.asarray(ints_to_limbs(vals, FR))  # Montgomery limbs
    want = np.asarray(ntt(x, dom))
    tabs = nm.mxu_tables(n, FR)
    got = np.asarray(nm.ntt_mxu(x, tabs, FR))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("inverse", [False, True])
def test_ntt_mxu_coset_roundtrip(inverse):
    n = 256
    from cap_tpu.ops.ntt import coset_intt, coset_ntt

    g = FR.multiplicative_generator()
    dom = get_domain(n)
    vals = rand_vals(n)
    x = jnp.asarray(ints_to_limbs(vals, FR))
    if inverse:
        evals = coset_ntt(x, dom, g)
        want = np.asarray(coset_intt(evals, dom, g))
        tabs = nm.mxu_tables(n, FR, inverse=True, shift=g)
        got = np.asarray(nm.ntt_mxu(evals, tabs, FR))
    else:
        want = np.asarray(coset_ntt(x, dom, g))
        tabs = nm.mxu_tables(n, FR, shift=g)
        got = np.asarray(nm.ntt_mxu(x, tabs, FR))
    assert np.array_equal(got, want)


def test_ntt_mxu_intt():
    n = 256
    dom = get_domain(n)
    vals = rand_vals(n)
    x = jnp.asarray(ints_to_limbs(vals, FR))
    evals = ntt(x, dom)
    want = np.asarray(intt(evals, dom))
    tabs = nm.mxu_tables(n, FR, inverse=True)
    got = np.asarray(nm.ntt_mxu(evals, tabs, FR))
    assert np.array_equal(got, want)
