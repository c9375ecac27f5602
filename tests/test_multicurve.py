"""Multi-curve seam (reference src/config.rs:63-84, VERDICT round-1 item 9).

The field/NTT/MXU stack is generic over PrimeField constants; these tests
prove the seam with the BLS12-377 scalar field: modulus sanity (primality,
2-adicity 47), a radix-2 NTT domain round-trip, the MXU int8-matmul path,
and device Montgomery arithmetic — all driven purely by the constants.
"""

import random

import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import FR_BLS12_377 as F377, NLIMBS
from cap_tpu.ops import field_jax as fj
from cap_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
from cap_tpu.ops.ntt import get_domain, intt, ntt, ntt_host

rng = random.Random(77)


def _is_probable_prime(n: int, rounds: int = 40) -> bool:
    if n < 2:
        return False
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def test_modulus_sanity():
    assert _is_probable_prime(F377.p)
    assert F377.two_adicity == 47  # published BLS12-377 Fr 2-adicity
    assert F377.bit_len == 253     # fits the 16x16-bit limb layout
    w = F377.root_of_unity(1 << 10)
    assert pow(w, 1 << 10, F377.p) == 1
    assert pow(w, 1 << 9, F377.p) != 1


def test_ntt_domain_roundtrip():
    n = 512
    dom = get_domain(n, F377)
    vals = [rng.randrange(F377.p) for _ in range(n)]
    x = jnp.asarray(ints_to_limbs(vals, F377))
    evals = ntt(x, dom)
    assert limbs_to_ints(np.asarray(evals), F377) == ntt_host(vals, dom)
    back = intt(evals, dom)
    assert limbs_to_ints(np.asarray(back), F377) == vals


def test_mxu_ntt_generic_over_field():
    from cap_tpu.ops import ntt_mxu as nm

    n = 256
    dom = get_domain(n, F377)
    vals = [rng.randrange(F377.p) for _ in range(n)]
    x = jnp.asarray(ints_to_limbs(vals, F377))
    want = np.asarray(ntt(x, dom))
    tabs = nm.mxu_tables(n, F377)
    got = np.asarray(nm.ntt_mxu(x, tabs, F377))
    assert np.array_equal(got, want)


def test_device_field_arithmetic():
    ctx = fj.ctx_for(F377)
    xs = [rng.randrange(F377.p) for _ in range(64)]
    ys = [rng.randrange(F377.p) for _ in range(64)]
    xd = jnp.asarray(ints_to_limbs(xs, F377))
    yd = jnp.asarray(ints_to_limbs(ys, F377))
    got = limbs_to_ints(np.asarray(fj.mont_mul(xd, yd, ctx)), F377)
    assert got == [a * b % F377.p for a, b in zip(xs, ys)]
    got = limbs_to_ints(np.asarray(fj.add(xd, yd, ctx)), F377)
    assert got == [(a + b) % F377.p for a, b in zip(xs, ys)]
