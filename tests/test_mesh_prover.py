"""Mesh-parallel prover kernels on the virtual 8-device CPU mesh.

Covers SURVEY.md §2.3 row 1 (intra-proof sharding wired into the prove
path): the signed-window commit MSM with the SRS point axis sharded over
the mesh, the quotient evaluation sharded over the 8n coset axis, and a
full TurboPlonk prove running with a prover mesh installed, verifying
against the single-device verifier.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cap_tpu.fields.host import FR
from cap_tpu.ops import ec, field_jax as fj, msm_signed as ms
from cap_tpu.ops.limbs import ints_to_limbs
from cap_tpu.ops.msm import scalars_to_device
from cap_tpu.parallel import mesh as pm
from cap_tpu.plonk import prover, verifier
from cap_tpu.plonk.circuit import PlonkCircuit


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return pm.make_mesh(8)


def _rand_pts(n, seed=3):
    from cap_tpu.crypto.bn254 import G1_GEN, g1_mul

    rng = random.Random(seed)
    base = [g1_mul(G1_GEN, rng.randrange(1, FR.p)) for _ in range(8)]
    return [base[i % 8] for i in range(n)]


def test_sharded_commit_matches_host(mesh8, monkeypatch):
    from cap_tpu.crypto.bn254 import g1_msm_host

    monkeypatch.setattr(ms, "WCHUNK", 128)
    d = 8
    m = d * 128  # one chunk per device
    pts = _rand_pts(m)
    px, py, _ = ec.points_to_device(pts)
    tab = ms.build_signed_table(px, py, m, mp=m)
    rng = random.Random(5)
    k = 2
    scal = [[rng.randrange(FR.p) for _ in range(m)] for _ in range(k)]
    sb = jnp.stack([scalars_to_device(s) for s in scal])
    res = jax.jit(lambda t, s: pm.sharded_commit_device(mesh8, t, s))(tab, sb)
    got = ms.points_from_batch_result(res)
    for i in range(k):
        assert got[i] == g1_msm_host(scal[i], pts)


def test_sharded_quotient_matches_unsharded(mesh8):
    rng = random.Random(9)
    m8 = 1024

    def arr(*lead):
        vals = [rng.randrange(FR.p) for _ in range(int(np.prod(lead)) * m8)]
        return jnp.asarray(ints_to_limbs(vals, FR)).reshape(*lead, m8, 16)

    w8 = arr(5)
    z8 = arr()
    zw8 = jnp.roll(z8, -8, axis=0)
    pi8 = arr()
    sel = arr(13)
    sig = arr(5)
    ksx = arr(5)
    l1 = arr()
    izh = arr()
    sc = [rng.randrange(FR.p) for _ in range(3)]
    al, be, ga = (jnp.asarray(ints_to_limbs([v], FR)[0]) for v in sc)

    want = pm._quotient_eval_xla(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, al, be, ga)
    got = jax.jit(
        lambda *a: pm.sharded_quotient_eval(mesh8, *a)
    )(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, al, be, ga)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def _pow5_chain_circuit(x0: int, rounds: int = 48):
    c = PlonkCircuit()
    x = c.load(x0)
    for i in range(rounds):
        x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
        x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
    c.set_variable_public(x)
    return c


def test_full_prove_on_mesh_verifies(mesh8, monkeypatch):
    from cap_tpu.plonk import srs as srs_mod
    from cap_tpu.utils.rng import test_rng

    monkeypatch.setattr(ms, "WCHUNK", 128)
    c = _pow5_chain_circuit(77)
    rng = test_rng()
    fin = c.finalize_for_arithmetization()
    srs = srs_mod.universal_setup(fin.n + 2, test_rng())
    pk, vk = prover.preprocess(srs, c)
    pm.set_prover_mesh(mesh8)
    try:
        proof = prover.prove(rng, pk, c.witness_values, c.public_input())
    finally:
        pm.set_prover_mesh(None)
    assert verifier.verify(vk, c.public_input(), proof)
    # (a single-device prove under the same vk is covered by test_plonk_e2e;
    # re-proving here doubled the slowest test in the suite for no new
    # assertion)
