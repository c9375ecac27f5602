"""BN254 group-law and pairing tests (ground truth for device MSM/KZG)."""

from cap_tpu.crypto.bn254 import (
    G1_GEN,
    G2_GEN,
    Fq12,
    g1_add,
    g1_is_on_curve,
    g1_msm_host,
    g1_mul,
    g1_neg,
    g2_is_on_curve,
    g2_mul,
    pairing,
    pairing_check,
)
from cap_tpu.fields.host import FR
from cap_tpu.utils.rng import test_rng


def test_g1_group_law():
    rng = test_rng()
    a, b = FR.rand(rng), FR.rand(rng)
    pa, pb = g1_mul(G1_GEN, a), g1_mul(G1_GEN, b)
    assert g1_is_on_curve(pa)
    assert g1_add(pa, pb) == g1_mul(G1_GEN, (a + b) % FR.p)
    assert g1_add(pa, g1_neg(pa)) is None
    assert g1_mul(G1_GEN, FR.p) is None  # group order


def test_g2_group_law():
    assert g2_is_on_curve(G2_GEN)
    assert g2_mul(G2_GEN, FR.p) is None


def test_msm_host():
    rng = test_rng()
    pts = [g1_mul(G1_GEN, FR.rand(rng)) for _ in range(5)]
    scalars = [FR.rand(rng) for _ in range(5)]
    expected = None
    for s, p in zip(scalars, pts):
        expected = g1_add(expected, g1_mul(p, s))
    assert g1_msm_host(scalars, pts) == expected


def test_pairing_bilinearity():
    e = pairing(G2_GEN, G1_GEN)
    assert not e.is_one()
    assert pairing(g2_mul(G2_GEN, 5), g1_mul(G1_GEN, 7)) == e.pow(35)
    # e^r == 1 (target group has order r)
    assert e.pow(FR.p).is_one()


def test_pairing_check_kzg_shape():
    # e(aG1, bG2) * e(-(ab)G1, G2) == 1 — the shape of a KZG verification
    a, b = 1234567, 7654321
    ok = pairing_check(
        [
            (g1_mul(G1_GEN, a), g2_mul(G2_GEN, b)),
            (g1_neg(g1_mul(G1_GEN, a * b)), G2_GEN),
        ]
    )
    assert ok
    bad = pairing_check(
        [
            (g1_mul(G1_GEN, a), g2_mul(G2_GEN, b)),
            (g1_neg(g1_mul(G1_GEN, a * b + 1)), G2_GEN),
        ]
    )
    assert not bad


def test_fast_final_exponentiation_matches_naive():
    from cap_tpu.crypto.bn254 import final_exponentiate, final_exponentiate_naive

    rng = test_rng()
    for _ in range(2):
        f = Fq12([FR.rand(rng) for _ in range(12)])
        assert final_exponentiate(f) == final_exponentiate_naive(f)


def test_fq12_field_ops():
    rng = test_rng()
    x = Fq12([FR.rand(rng) % 1000 for _ in range(12)])
    assert (x * x.inv()).is_one()
    assert x * Fq12.one() == x


def test_native_pairing_matches_python():
    """C++ tower pairing (native/cap_native.cpp) vs the Python ground truth."""
    from cap_tpu.utils import native

    if not native.HAVE_NATIVE:
        import pytest

        pytest.skip("native library unavailable")
    import random

    from cap_tpu.crypto.bn254 import g2_mul, multi_pairing

    rng = random.Random(9)
    a, b = rng.randrange(1, FR.p), rng.randrange(1, FR.p)
    good = [
        (g1_mul(G1_GEN, a), g2_mul(G2_GEN, b)),
        (g1_neg(g1_mul(G1_GEN, a * b % FR.p)), G2_GEN),
    ]
    assert native.pairing_check(good) is True
    assert multi_pairing(good).is_one()
    bad = [(g1_mul(G1_GEN, a + 1), good[0][1]), good[1]]
    assert native.pairing_check(bad) is False
    # identity pairs contribute 1
    mixed = [(None, G2_GEN)] + good
    assert native.pairing_check(mixed) is True
