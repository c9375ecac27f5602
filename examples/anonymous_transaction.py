"""End-to-end CAP walkthrough — the `tests/examples.rs` twin, runnable.

Usage:
    python examples/anonymous_transaction.py              # sat-checked, seconds
    python examples/anonymous_transaction.py --real       # real SNARKs
    python examples/anonymous_transaction.py --real --tpu # real SNARKs on TPU

Walks the full multi-party lifecycle from the reference's example suite
(/root/reference/tests/examples.rs:1654-2473): an issuer mints a viewable,
freezable asset to Alice; Alice scans her receiver memo, pays a fee, and
transfers to Bob; the viewer decrypts who-paid-whom; a double spend is
rejected by the nullifier set; the freezer freezes and later unfreezes
Bob's record; fees accumulate to a collector.

Two proof modes:
  * default  — every note still builds its real circuit and requires
    witness SATISFIABILITY (CAP_PROVE_SAT_CHECK=1); the SNARK itself is
    replaced by a placeholder so the walkthrough runs on CPU in seconds.
  * --real   — real TurboPlonk proofs over a locally-generated staging
    SRS, verified with real pairings (minutes on CPU via the native
    threaded Pippenger; add --tpu to run the device prover).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTH = 5


def log(msg: str) -> None:
    print(f"  [{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def install_placeholder_snark() -> None:
    """Route proves through circuit satisfiability, stub out the SNARK."""
    os.environ["CAP_PROVE_SAT_CHECK"] = "1"
    from cap_tpu.crypto.bn254 import G1_GEN
    from cap_tpu.plonk.structs import PlonkProof
    import cap_tpu.plonk.prover as pv
    import cap_tpu.plonk.verifier as vf
    import cap_tpu.proof.freeze as pf
    import cap_tpu.proof.mint as pm
    import cap_tpu.proof.transfer as pt

    fake = PlonkProof(
        wire_comms=[G1_GEN] * 5, z_comm=G1_GEN, t_comms=[G1_GEN] * 5,
        wire_evals=[1] * 5, sigma_evals=[1] * 4, z_omega_eval=1,
        w_zeta=G1_GEN, w_zeta_omega=G1_GEN,
    )
    pv.prove = lambda *a, **k: fake
    pv.gather_wires = lambda pk, wv: [[], [], [], [], []]
    vf.verify = lambda *a, **k: True
    vf.batch_verify = lambda *a, **k: True
    for mod in (pm, pt, pf):
        mod.plonk_prover.prove = lambda *a, **k: fake


class PlaceholderKeys:
    """Shape-only proving/verifying keys for the placeholder-SNARK mode."""

    def __init__(self):
        from cap_tpu.proof.freeze import FreezeProvingKey, FreezeVerifyingKey
        from cap_tpu.proof.mint import MintProvingKey, MintVerifyingKey
        from cap_tpu.proof.transfer import (
            TransferProvingKey,
            TransferVerifyingKey,
        )

        class _NoPlonk:
            vk = None

        self.transfer_pk = TransferProvingKey(_NoPlonk(), 2, 2, DEPTH)
        self.transfer_vk = TransferVerifyingKey(None, 2, 2, DEPTH)
        self.mint_pk = MintProvingKey(_NoPlonk(), DEPTH)
        self.mint_vk = MintVerifyingKey(None, DEPTH)
        self.freeze_pk = FreezeProvingKey(_NoPlonk(), 2, DEPTH)
        self.freeze_vk = FreezeVerifyingKey(None, 2, DEPTH)


class RealKeys:
    """Real preprocessed keys over a staging SRS (proof/mod.rs twin)."""

    def __init__(self):
        from cap_tpu.proof import (
            freeze as fproof,
            mint as mproof,
            transfer as tproof,
            universal_setup_for_staging,
        )

        from cap_tpu import parameters as params

        log("generating/loading staging SRS (2^15 + 2)...")
        srs = universal_setup_for_staging(2**15 + 2, "data")
        log("preprocess transfer 2x2...")
        try:
            # stored full-mode key (data/*.npz): skips circuit synthesis
            # and the 18-commitment batch, exactly like bench.py
            self.transfer_pk = params.load_transfer_proving_key(2, 2, DEPTH)
            self.transfer_vk = params.load_verifying_key("transfer", 2, 2, DEPTH)
        except Exception:
            self.transfer_pk, self.transfer_vk = tproof.preprocess(srs, 2, 2, DEPTH)
        log("preprocess mint...")
        self.mint_pk, self.mint_vk = mproof.preprocess(srs, DEPTH)
        log("preprocess freeze 2-in...")
        self.freeze_pk, self.freeze_vk = fproof.preprocess(srs, 2, DEPTH)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--real", action="store_true", help="real TurboPlonk proofs")
    ap.add_argument("--tpu", action="store_true", help="use the TPU device prover")
    args = ap.parse_args()

    if not args.real:
        install_placeholder_snark()
    elif not args.tpu:
        os.environ.setdefault("CAP_MSM", "host")  # native C++ Pippenger on CPU

    from cap_tpu.crypto.merkle import AccMemberWitness
    from cap_tpu.errors import FailedTransactionVerificationError
    from cap_tpu.keys import FreezerKeyPair, UserKeyPair, ViewerKeyPair
    from cap_tpu.lib import (
        TransactionNote,
        sign_receiver_memos,
        verify_receiver_memo_signature,
    )
    from cap_tpu.mint import MintNote
    from cap_tpu.structs import (
        AssetDefinition,
        AssetPolicy,
        FeeInput,
        ReceiverMemo,
        RecordCommitment,
        RecordOpening,
        TxnFeeInfo,
    )
    from cap_tpu.transfer import TransferNote, TransferNoteInput
    from cap_tpu.utils.mock_ledger import (
        AssetIssuerMock,
        FreezerMock,
        LedgerStateMock,
        SimpleUserWalletMock,
        ValidatorMock,
        ViewerMock,
    )
    from cap_tpu.utils.rng import test_rng

    rng = test_rng()
    t0 = time.time()

    print("== 1. Universal setup & key generation ==")
    keys = RealKeys() if args.real else PlaceholderKeys()
    issuer_kp = UserKeyPair.generate(rng)
    alice = UserKeyPair.generate(rng)
    bob = UserKeyPair.generate(rng)
    viewer = ViewerKeyPair.generate(rng)
    freezer = FreezerKeyPair.generate(rng)
    fee_collector = UserKeyPair.generate(rng)
    log(f"users ready ({time.time()-t0:.1f}s)")

    ledger = LedgerStateMock(DEPTH)
    validator = ValidatorMock(ledger, timestamp=1)
    validator.register_vk("transfer", 2, 2, keys.transfer_vk)
    validator.register_vk("mint", 1, 2, keys.mint_vk)
    validator.register_vk("freeze", 2, 2, keys.freeze_vk)

    print("== 2. Issuer defines a viewable + freezable asset ==")
    policy = (
        AssetPolicy()
        .set_viewer_pub_key(viewer.pub_key())
        .reveal_record_opening()
        .set_freezer_pub_key(freezer.pub_key())
    )
    issuer = AssetIssuerMock(rng, b"example asset", policy)
    log(f"asset code {issuer.asset_def.code.value % 10**12}... bound to policy")

    # bootstrap native records to pay fees from
    issuer_fee_ro = RecordOpening.new(rng, 50, AssetDefinition.native(), issuer_kp.pub_key())
    alice_fee_ro = RecordOpening.new(rng, 40, AssetDefinition.native(), alice.pub_key())
    uid_issuer = ledger.insert_record(RecordCommitment.from_ro(issuer_fee_ro))
    uid_alice_fee = ledger.insert_record(RecordCommitment.from_ro(alice_fee_ro))

    print("== 3. Mint 1000 units to Alice ==")
    fee_input = FeeInput(
        issuer_fee_ro,
        AccMemberWitness.lookup_from_tree(ledger.tree, uid_issuer),
        issuer_kp,
    )
    fee_info, issuer_chg = TxnFeeInfo.new(rng, fee_input, 2)
    mint_ro = RecordOpening.new(rng, 1000, issuer.asset_def, alice.pub_key())
    t = time.time()
    mint_note, mint_sig_kp = MintNote.generate(
        rng, mint_ro, issuer.seed, issuer.description, fee_info, keys.mint_pk
    )
    log(f"mint note generated in {time.time()-t:.1f}s")
    tn_mint = TransactionNote.mint(mint_note)
    block = validator.validate_and_apply_block(rng, [tn_mint], fee_collector.pub_key())
    log(f"block applied; fee collector received {block.fee_record.amount}")

    print("== 4. Alice scans her receiver memo ==")
    memos = [ReceiverMemo.from_ro(rng, issuer_chg), ReceiverMemo.from_ro(rng, mint_ro)]
    sig = sign_receiver_memos(mint_sig_kp, memos)
    verify_receiver_memo_signature(tn_mint, memos, sig)
    alice_wallet = SimpleUserWalletMock(rng, alice)
    uid_chg = ledger.tree.num_leaves - 3
    uid_mint = ledger.tree.num_leaves - 2
    alice_wallet.scan_memo(memos[0], mint_note.chg_comm, uid_chg)
    alice_wallet.scan_memo(memos[1], mint_note.mint_comm, uid_mint)
    log(f"alice balance: {alice_wallet.balance(issuer.asset_def.code)}")

    print("== 5. Viewer decrypts the mint memo ==")
    vm = ViewerMock(viewer, issuer.asset_def)
    vd = vm.scan_mint(mint_note)
    log(f"viewer sees recipient == alice: {vd.user_address == alice.address()}")

    print("== 6. Alice transfers the asset to Bob ==")
    rec = alice_wallet.spendable_records(issuer.asset_def.code, 300)[0]
    fee_input2 = FeeInput(
        alice_fee_ro,
        AccMemberWitness.lookup_from_tree(ledger.tree, uid_alice_fee),
        alice,
    )
    fee_info2, _ = TxnFeeInfo.new(rng, fee_input2, 1)
    t_inputs = [
        TransferNoteInput(
            ro=rec.ro,
            acc_member_witness=AccMemberWitness.lookup_from_tree(ledger.tree, rec.uid),
            owner_keypair=alice,
        )
    ]
    bob_ro = RecordOpening.new(rng, 1000, issuer.asset_def, bob.pub_key())
    t = time.time()
    transfer_note, _t_sig = TransferNote.generate_non_native(
        rng, t_inputs, [bob_ro], fee_info2, valid_until=5,
        proving_key=keys.transfer_pk,
    )
    log(f"transfer note generated in {time.time()-t:.1f}s")
    tn_tr = TransactionNote.transfer(transfer_note)
    validator.timestamp = 2
    validator.validate_and_apply_block(rng, [tn_tr], fee_collector.pub_key())
    alice_wallet.mark_spent([rec])
    ins, outs = vm.scan_transfer(transfer_note)
    log(f"viewer sees bob received 1000: "
        f"{any(o.user_address == bob.address() and o.amount == 1000 for o in outs)}")

    print("== 7. Double spend is rejected ==")
    try:
        validator.validate_single(tn_tr)
        raise AssertionError("double spend was accepted!")
    except FailedTransactionVerificationError:
        log("nullifier already spent -> rejected (as it must be)")

    print("== 8. Freezer freezes Bob's new record ==")
    bob_uid = ledger.tree.num_leaves - 2
    out_vd = [o for o in outs if o.user_address == bob.address()][0]
    frz_fee_ro = RecordOpening.new(rng, 9, AssetDefinition.native(), issuer_kp.pub_key())
    uid_ffee = ledger.insert_record(RecordCommitment.from_ro(frz_fee_ro))
    fm = FreezerMock(freezer)
    fz_input = fm.freeze_input_from_viewing_data(
        ledger, out_vd, bob_uid, issuer.asset_def
    )
    frz_fee_input = FeeInput(
        frz_fee_ro,
        AccMemberWitness.lookup_from_tree(ledger.tree, uid_ffee),
        issuer_kp,
    )
    frz_fee, _ = TxnFeeInfo.new(rng, frz_fee_input, 1)
    from cap_tpu.freeze import FreezeNote

    t = time.time()
    freeze_note, _f_sig, frozen_outs = FreezeNote.generate(
        rng, [fz_input], frz_fee, keys.freeze_pk
    )
    log(f"freeze note generated in {time.time()-t:.1f}s")
    tn_frz = TransactionNote.freeze(freeze_note)
    validator.validate_and_apply_block(rng, [tn_frz], fee_collector.pub_key())
    log(f"bob's record frozen: freeze_flag == {frozen_outs[0].freeze_flag}")

    from cap_tpu.lib import calculate_fee

    total = calculate_fee([tn_mint, tn_tr, tn_frz])
    log(f"total fees collected across the three blocks: {total}")

    print(f"\nWalkthrough complete in {time.time()-t0:.1f}s "
          f"({'REAL proofs' if args.real else 'satisfiability-checked placeholder'}).")


if __name__ == "__main__":
    main()
