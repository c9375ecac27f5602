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


# -- full-curve algebra + end-to-end proof (round 3: VERDICT r2 item 6) -------


def test_bls12_377_pairing_bilinear():
    from cap_tpu.crypto import bls12_377 as B

    assert B.g1_is_on_curve(B.G1_GEN) and B.g2_is_on_curve(B.G2_GEN)
    e = B.pairing(B.G1_GEN, B.G2_GEN)
    assert e != B.F12_ONE
    a, b = 1234, 987
    lhs = B.pairing(B.g1_mul(B.G1_GEN, a), B.g2_mul(B.G2_GEN, b))
    assert lhs == B.f12_pow(e, a * b % B.R)
    assert B.pairing_check(
        [(B.G1_GEN, B.G2_GEN), (B.g1_neg(B.G1_GEN), B.G2_GEN)]
    )


def test_bls12_377_embedded_curve():
    from cap_tpu.crypto import bls12_377 as B

    g = B.EMB_GEN
    assert B.emb_mul(g, 5) == B.emb_add(B.emb_mul(g, 2), B.emb_mul(g, 3))
    # generator survives into the full CapConfig binding
    from cap_tpu.config import bls12_377_config

    cfg = bls12_377_config()
    assert cfg.base_field.p == B.Q
    assert cfg.embedded_scalar_field.p == B.EMB_R
    assert cfg.embedded_generator == g


def test_bls12_377_plonk_prove_verify():
    """One real TurboPlonk proof over BLS12-377, proven and verified through
    the curve-generic host pipeline (reference config.rs:25-84: the same
    circuits must run under any CapConfig curve binding)."""
    from cap_tpu.plonk.circuit import PlonkCircuit
    from cap_tpu.plonk.prover_host import (
        bls12_377_host_curve, preprocess_host, prove_host, setup_host,
        verify_host,
    )
    from cap_tpu.utils.rng import test_rng

    curve = bls12_377_host_curve()
    rng2 = test_rng()
    c = PlonkCircuit(curve.fr)
    x = c.load(12345)
    for i in range(20):
        x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
        x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
    c.set_variable_public(x)
    n = c.finalize_for_arithmetization().n
    srs = setup_host(n + 2, rng2, curve)
    pk, vk = preprocess_host(srs, c)
    pubs = c.public_input()
    proof = prove_host(rng2, pk, c.witness_values, pubs)
    assert verify_host(vk, pubs, proof)
    # negatives: wrong public input, wrong ext binding
    assert not verify_host(vk, [(pubs[0] + 1) % curve.fr.p], proof)
    assert not verify_host(vk, pubs, proof, ext_msg=b"ctx")


# -- BLS12-381: the third CapConfig curve (reference config.rs bls12_381) -----


def test_bls12_381_constants_match_published():
    """The generic BLS12 factory's derived q/r must equal the published
    BLS12-381 moduli (reference binds ark-bls12-381)."""
    from cap_tpu.crypto import bls12_381 as B
    from cap_tpu.fields.host import BLS12_381_FQ, BLS12_381_FR

    assert B.Q == BLS12_381_FQ
    assert B.R == BLS12_381_FR
    assert _is_probable_prime(B.Q) and _is_probable_prime(B.R)
    from cap_tpu.fields.host import FR_BLS12_381

    assert FR_BLS12_381.two_adicity == 32  # published BLS12-381 Fr 2-adicity


def test_bls12_381_pairing_bilinear():
    from cap_tpu.crypto import bls12_381 as B

    assert B.g1_is_on_curve(B.G1_GEN) and B.g2_is_on_curve(B.G2_GEN)
    e = B.pairing(B.G1_GEN, B.G2_GEN)
    assert e != B.F12_ONE
    a, b = 4321, 789
    lhs = B.pairing(B.g1_mul(B.G1_GEN, a), B.g2_mul(B.G2_GEN, b))
    assert lhs == B.f12_pow(e, a * b % B.R)
    assert B.pairing_check(
        [(B.G1_GEN, B.G2_GEN), (B.g1_neg(B.G1_GEN), B.G2_GEN)]
    )


def test_bls12_381_embedded_curve_and_config():
    from cap_tpu.crypto import bls12_381 as B

    g = B.EMB_GEN
    assert B.emb_mul(g, 7) == B.emb_add(B.emb_mul(g, 3), B.emb_mul(g, 4))
    from cap_tpu.config import bls12_381_config

    cfg = bls12_381_config()
    assert cfg.base_field.p == B.Q
    assert cfg.scalar_field.p == B.R
    assert cfg.embedded_scalar_field.p == B.EMB_R
    assert cfg.embedded_generator == g


def test_bls12_381_plonk_prove_verify():
    """One real TurboPlonk proof over BLS12-381 through the curve-generic
    host pipeline (reference config.rs:25-84)."""
    from cap_tpu.plonk.circuit import PlonkCircuit
    from cap_tpu.plonk.prover_host import (
        bls12_381_host_curve, preprocess_host, prove_host, setup_host,
        verify_host,
    )
    from cap_tpu.utils.rng import test_rng

    curve = bls12_381_host_curve()
    rng2 = test_rng()
    c = PlonkCircuit(curve.fr)
    x = c.load(54321)
    for i in range(12):
        x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
        x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
    c.set_variable_public(x)
    n = c.finalize_for_arithmetization().n
    srs = setup_host(n + 2, rng2, curve)
    pk, vk = preprocess_host(srs, c)
    pubs = c.public_input()
    proof = prove_host(rng2, pk, c.witness_values, pubs)
    assert verify_host(vk, pubs, proof)
    assert not verify_host(vk, [(pubs[0] + 1) % curve.fr.p], proof)
    assert not verify_host(vk, pubs, proof, ext_msg=b"ctx")


def test_host_prover_cross_checks_device_path_bn254():
    """The curve-generic host prover doubles as an independent differential
    check of the bn254 device pipeline: both provers' proofs verify under
    their own verifiers for the same circuit."""
    import os

    from cap_tpu.plonk import prover, verifier
    from cap_tpu.plonk.circuit import PlonkCircuit
    from cap_tpu.plonk.prover_host import (
        bn254_host_curve, preprocess_host, prove_host, setup_host, verify_host,
    )
    from cap_tpu.plonk.srs import universal_setup
    from cap_tpu.utils.rng import test_rng

    def build(field):
        c = PlonkCircuit(field)
        x = c.load(777)
        for i in range(15):
            x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
            x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
        c.set_variable_public(x)
        return c

    curve = bn254_host_curve()
    rng2 = test_rng()
    c1 = build(curve.fr)
    n = c1.finalize_for_arithmetization().n
    hsrs = setup_host(n + 2, rng2, curve)
    hpk, hvk = preprocess_host(hsrs, c1)
    hproof = prove_host(rng2, hpk, c1.witness_values, c1.public_input())
    assert verify_host(hvk, c1.public_input(), hproof)

    old = os.environ.get("CAP_MSM")
    os.environ["CAP_MSM"] = "host"
    try:
        c2 = build(curve.fr)
        c2.finalize_for_arithmetization()
        srs = universal_setup(n + 2, test_rng())
        pk, vk = prover.preprocess(srs, c2)
        proof = prover.prove(test_rng(), pk, c2.witness_values, c2.public_input())
        assert verifier.verify(vk, c2.public_input(), proof)
    finally:
        if old is None:
            os.environ.pop("CAP_MSM", None)
        else:
            os.environ["CAP_MSM"] = old
    # same circuit, same public outputs from two independent pipelines
    assert c1.public_input() == c2.public_input()
