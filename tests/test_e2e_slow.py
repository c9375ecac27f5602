"""Real-proof end-to-end tests — TPU + warm compile cache required.

Run with:  CAP_TPU_RUN_SLOW=1 python -m pytest tests/test_e2e_slow.py -q
(These are the pytest twin of scripts/run_e2e_tpu.py; skipped by default so
the CPU suite stays fast.)
"""

import os

import pytest

slow = pytest.mark.skipif(
    os.environ.get("CAP_TPU_RUN_SLOW") != "1",
    reason="set CAP_TPU_RUN_SLOW=1 (needs TPU + warm compile cache)",
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    return jax


@slow
def test_all_note_types_prove_verify_and_batch(tpu):
    from cap_tpu.lib import TransactionNote, txn_batch_verify
    from cap_tpu.proof import (
        freeze as fproof,
        mint as mproof,
        transfer as tproof,
        universal_setup_for_staging,
    )
    from cap_tpu.utils.params_builder import (
        FreezeParamsBuilder,
        MintParamsBuilder,
        TransferParamsBuilder,
    )
    from cap_tpu.utils.rng import test_rng

    rng = test_rng()
    depth = 6
    srs = universal_setup_for_staging(2**15 + 2, "data")

    mpk, mvk = mproof.preprocess(srs, depth)
    mb = MintParamsBuilder(rng, depth, with_viewer=True)
    mnote, _, _, _ = mb.build_mint_note(mpk)
    mnote.verify(mvk, mb.tree.root)

    tpk, tvk = tproof.preprocess(srs, 2, 2, depth)
    tb = TransferParamsBuilder(rng, 2, 2, depth, non_native=True, with_viewer=True)
    tnote, _, _ = tb.build_transfer_note(tpk)
    tnote.verify(tvk, tb.tree.root, timestamp=5)

    fpk, fvk = fproof.preprocess(srs, 2, depth)
    fb = FreezeParamsBuilder(rng, 2, depth)
    fnote, _, fouts, _ = fb.build_freeze_note(fpk)
    fnote.verify(fvk, fb.tree.root)
    assert fouts[0].freeze_flag == 1

    txn_batch_verify(
        [TransactionNote.mint(mnote), TransactionNote.transfer(tnote),
         TransactionNote.freeze(fnote)],
        [mb.tree.root, tb.tree.root, fb.tree.root],
        5,
        [mvk, tvk, fvk],
    )


@slow
def test_plonk_cross_wiring_negatives(tpu):
    """Reference proof-level negative grid (proof/transfer.rs:599-760 twin):
    wrong vk / wrong public input / swapped proofs / wrong ext_msg all fail."""
    from cap_tpu.fields.host import FR
    from cap_tpu.plonk import prover, srs as srs_mod, verifier
    from cap_tpu.plonk.circuit import PlonkCircuit
    from cap_tpu.utils.rng import test_rng

    rng = test_rng()

    def build(x, pub):
        c = PlonkCircuit()
        vx = c.create_variable(x)
        vp = c.create_public_variable(pub)
        c.enforce_equal(c.add_constant(c.mul(vx, vx), 7), vp)
        return c

    x1, x2 = 5, 11
    p1, p2 = (x1 * x1 + 7) % FR.p, (x2 * x2 + 7) % FR.p
    c1, c2 = build(x1, p1), build(x2, p2)
    srs = srs_mod.universal_setup(c1.eval_domain_size() + 2, rng)
    pk1, vk1 = prover.preprocess(srs, c1)
    proof1 = prover.prove(rng, pk1, c1.witness_values, [p1])
    proof2 = prover.prove(rng, pk1, c2.witness_values, [p2])
    assert verifier.verify(vk1, [p1], proof1)
    assert verifier.verify(vk1, [p2], proof2)
    # cross-wiring
    assert not verifier.verify(vk1, [p2], proof1)
    assert not verifier.verify(vk1, [p1], proof2)
    assert not verifier.verify(vk1, [p1], proof1, ext_msg=b"unexpected")
    # batch: good pair passes, any bad member fails
    assert verifier.batch_verify([vk1, vk1], [[p1], [p2]], [proof1, proof2])
    assert not verifier.batch_verify([vk1, vk1], [[p1], [p1]], [proof1, proof2])


@slow
def test_tampered_proof_rejected(tpu):
    import dataclasses

    from cap_tpu.errors import TxnApiError
    from cap_tpu.proof import mint as mproof, universal_setup_for_staging
    from cap_tpu.utils.params_builder import MintParamsBuilder
    from cap_tpu.utils.rng import test_rng

    rng = test_rng()
    srs = universal_setup_for_staging(2**15 + 2, "data")
    pk, vk = mproof.preprocess(srs, 6)
    b = MintParamsBuilder(rng, 6)
    note, _, _, _ = b.build_mint_note(pk)
    bad = dataclasses.replace(
        note, mint_amount=note.mint_amount + 1
    )
    with pytest.raises(TxnApiError):
        bad.verify(vk, b.tree.root)
