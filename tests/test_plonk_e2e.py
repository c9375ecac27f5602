"""Real TurboPlonk prove -> verify -> batch-verify in the default CPU suite.

Round 1's default suite never ran the SNARK end to end (the integration
scenarios check satisfiability only; real-proof CAP notes need a TPU).
This closes that gap at the plonk layer: a small circuit over a tiny fresh
SRS proves in seconds on CPU, and the proof actually verifies — including
a negative case and the folded batch verifier.

Reference twin: jf-plonk's own prove/verify unit tests (SURVEY.md §2.2
PlonkKzgSnark surface; src/proof/transfer.rs:159-212 call shape).
"""

import os

import pytest

from cap_tpu.fields.host import FR
from cap_tpu.plonk import prover, verifier
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.srs import universal_setup
from cap_tpu.utils.rng import test_rng


@pytest.fixture(scope="module", autouse=True)
def host_msm():
    """Host bucket-Pippenger commits: device-MSM compile/table overhead
    dwarfs the actual work at these sizes on the CPU backend."""
    old = os.environ.get("CAP_MSM")
    os.environ["CAP_MSM"] = "host"
    yield
    if old is None:
        os.environ.pop("CAP_MSM", None)
    else:
        os.environ["CAP_MSM"] = old


def _pow5_chain_circuit(x0: int, rounds: int = 40):
    """y = iterate (x -> x^5 + x + i) `rounds` times; x0 secret, y public."""
    c = PlonkCircuit()
    x = c.load(x0)
    for i in range(rounds):
        x5 = c.pow5(x) if hasattr(c, "pow5") else c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
        x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
    c.set_variable_public(x)
    return c


@pytest.fixture(scope="module")
def setup():
    rng = test_rng()
    c = _pow5_chain_circuit(12345)
    fin = c.finalize_for_arithmetization()
    srs = universal_setup(fin.n + 2, rng)
    pk, vk = prover.preprocess(srs, c)
    return rng, c, srs, pk, vk


def test_small_circuit_real_prove_verify(setup):
    rng, c, srs, pk, vk = setup
    pubs = c.public_input()
    proof = prover.prove(rng, pk, c.witness_values, pubs)
    assert verifier.verify(vk, pubs, proof)
    # wrong public input must fail
    bad = [(pubs[0] + 1) % FR.p] + pubs[1:]
    assert not verifier.verify(vk, bad, proof)
    # ext_msg binding: proof made without ext_msg fails under one
    assert not verifier.verify(vk, pubs, proof, ext_msg=b"ctx")


def test_small_circuit_batch_verify(setup):
    rng, _, srs, pk, vk = setup
    c2 = _pow5_chain_circuit(999)
    pubs2 = c2.public_input()
    proof2 = prover.prove(rng, pk, c2.witness_values, pubs2)

    c1 = _pow5_chain_circuit(12345)
    pubs1 = c1.public_input()
    proof1 = prover.prove(rng, pk, c1.witness_values, pubs1)

    assert verifier.batch_verify([vk, vk], [pubs1, pubs2], [proof1, proof2])
    # one bad proof poisons the batch
    assert not verifier.batch_verify([vk, vk], [pubs2, pubs2], [proof1, proof2])


def test_solidity_transcript_seam(setup, monkeypatch):
    """CAP_TRANSCRIPT=solidity routes prove AND verify through the
    SolidityTranscript layout twin; proofs are transcript-class-bound
    (a v2w verify of a solidity proof must fail)."""
    rng, c, srs, pk, vk = setup
    pubs = c.public_input()
    monkeypatch.setenv("CAP_TRANSCRIPT", "solidity")
    proof = prover.prove(rng, pk, c.witness_values, pubs, ext_msg=b"sol")
    assert verifier.verify(vk, pubs, proof, ext_msg=b"sol")
    monkeypatch.setenv("CAP_TRANSCRIPT", "v2w")
    assert not verifier.verify(vk, pubs, proof, ext_msg=b"sol")


def test_unsatisfiable_witness_rejected_by_prover(setup):
    rng, c, srs, pk, vk = setup
    w = list(c.witness_values)
    w[3] = (w[3] + 1) % FR.p  # mutate one internal wire
    from cap_tpu.errors import FailedConstraintSystemError

    with pytest.raises(FailedConstraintSystemError):
        prover.prove(rng, pk, w, c.public_input())


def test_cross_wiring_negatives(setup):
    """Cross-wiring grid at the plonk layer (reference proof/transfer.rs
    599-760: every wrong vk/proof/pub-input/ext-msg combination fails).
    Two distinct circuit SHAPES give genuinely different keys."""
    rng, c, srs, pk, vk = setup
    pubs = c.public_input()
    proof = prover.prove(rng, pk, c.witness_values, pubs, ext_msg=b"m1")

    # an independent circuit (different round count -> different selectors
    # and vk) against the SAME srs, so batch_verify's shared-SRS rule holds
    c2 = _pow5_chain_circuit(4242, rounds=35)
    n2 = c2.finalize_for_arithmetization().n
    assert n2 + 2 <= srs.max_degree
    pk2, vk2 = prover.preprocess(srs, c2)
    pubs2 = c2.public_input()
    proof2 = prover.prove(rng, pk2, c2.witness_values, pubs2, ext_msg=b"m2")

    # the right pairs pass
    assert verifier.verify(vk, pubs, proof, ext_msg=b"m1")
    assert verifier.verify(vk2, pubs2, proof2, ext_msg=b"m2")
    # every cross-wired combination fails
    assert not verifier.verify(vk2, pubs, proof, ext_msg=b"m1")      # wrong vk
    assert not verifier.verify(vk, pubs2, proof, ext_msg=b"m1")     # wrong pubs
    assert not verifier.verify(vk, pubs, proof2, ext_msg=b"m1")     # wrong proof
    assert not verifier.verify(vk, pubs, proof, ext_msg=b"m2")      # wrong ext
    assert not verifier.verify(vk, pubs, proof)                      # missing ext
    # batch with one cross-wired entry fails too
    assert not verifier.batch_verify(
        [vk, vk2], [pubs, pubs2], [proof, proof], ext_msgs=[b"m1", b"m2"]
    )
    assert verifier.batch_verify(
        [vk, vk2], [pubs, pubs2], [proof, proof2], ext_msgs=[b"m1", b"m2"]
    )
