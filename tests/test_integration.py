"""Multi-party integration scenarios on the mock ledger (examples.rs twin).

The KZG/polynomial SNARK back-end is mocked (prove returns a placeholder
proof, verify accepts) so the scenarios run on CPU in seconds — but every
prove still builds the real circuit and REQUIRES witness satisfiability
(CAP_PROVE_SAT_CHECK=1 is forced in the fixture): an invalid witness fails
these tests.  Everything above the SNARK runs for real: witness and
public-input assembly, host validation pipelines, circuit synthesis +
satisfiability, memos, wallets, viewers, freezers, validators, blocks,
nullifier sets and fee collection.  Real-proof e2e runs on TPU via
scripts/run_e2e_tpu.py, tests/test_e2e_slow.py and the bench harness.
"""

import pytest

from cap_tpu.crypto.merkle import AccMemberWitness
from cap_tpu.errors import FailedTransactionVerificationError, TxnApiError
from cap_tpu.fields.host import FR
from cap_tpu.keys import FreezerKeyPair, UserKeyPair, ViewerKeyPair
from cap_tpu.lib import (
    TransactionNote,
    calculate_fee,
    sign_receiver_memos,
    verify_receiver_memo_signature,
)
from cap_tpu.structs import (
    AssetCode,
    AssetDefinition,
    AssetPolicy,
    FeeInput,
    ReceiverMemo,
    RecordCommitment,
    RecordOpening,
    TxnFeeInfo,
)
from cap_tpu.transfer import TransferNote, TransferNoteInput
from cap_tpu.mint import MintNote
from cap_tpu.freeze import FreezeNote, FreezeNoteInput
from cap_tpu.utils.mock_ledger import (
    AssetIssuerMock,
    LedgerStateMock,
    SimpleUserWalletMock,
    ValidatorMock,
    ViewerMock,
    FreezerMock,
    MockBlock,
)
from cap_tpu.utils.rng import test_rng

DEPTH = 5


@pytest.fixture(autouse=True)
def mock_snark(monkeypatch):
    """Replace the SNARK with satisfiability-only checking.

    CAP_PROVE_SAT_CHECK=1 routes each proof/*.prove call through the full
    circuit build + check_circuit_satisfiability (the SNARK itself is then
    replaced by a placeholder).  A wrong witness or public input makes the
    underlying prove raise FailedConstraintSystemError."""
    monkeypatch.setenv("CAP_PROVE_SAT_CHECK", "1")
    from cap_tpu.crypto.bn254 import G1_GEN
    from cap_tpu.plonk.structs import PlonkProof

    fake = PlonkProof(
        wire_comms=[G1_GEN] * 5, z_comm=G1_GEN, t_comms=[G1_GEN] * 5,
        wire_evals=[1] * 5, sigma_evals=[1] * 4, z_omega_eval=1,
        w_zeta=G1_GEN, w_zeta_omega=G1_GEN,
    )
    import cap_tpu.plonk.prover as pv
    import cap_tpu.plonk.verifier as vf

    monkeypatch.setattr(pv, "prove", lambda *a, **k: fake)
    monkeypatch.setattr(pv, "gather_wires", lambda pk, wv: [[], [], [], [], []])
    monkeypatch.setattr(vf, "verify", lambda *a, **k: True)
    monkeypatch.setattr(vf, "batch_verify", lambda *a, **k: True)
    # proof modules imported `plonk_prover`/`plonk_verifier` by module ref
    import cap_tpu.proof.mint as pm
    import cap_tpu.proof.transfer as pt
    import cap_tpu.proof.freeze as pf

    for mod in (pm, pt, pf):
        monkeypatch.setattr(mod.plonk_prover, "prove", lambda *a, **k: fake, raising=True)
    yield


class _Keys:
    """Lazy preprocess-free key stand-ins (shape metadata only)."""

    def __init__(self):
        from cap_tpu.proof.freeze import FreezeProvingKey, FreezeVerifyingKey
        from cap_tpu.proof.mint import MintProvingKey, MintVerifyingKey
        from cap_tpu.proof.transfer import TransferProvingKey, TransferVerifyingKey

        class _FakePlonk:
            vk = None

        self.transfer_pk = TransferProvingKey(_FakePlonk(), 2, 2, DEPTH)
        self.transfer_vk = TransferVerifyingKey(None, 2, 2, DEPTH)
        self.mint_pk = MintProvingKey(_FakePlonk(), DEPTH)
        self.mint_vk = MintVerifyingKey(None, DEPTH)
        self.freeze_pk = FreezeProvingKey(_FakePlonk(), 2, DEPTH)
        self.freeze_vk = FreezeVerifyingKey(None, 2, DEPTH)


def _setup_world():
    rng = test_rng()
    keys = _Keys()
    ledger = LedgerStateMock(DEPTH)
    validator = ValidatorMock(ledger, timestamp=1)
    validator.register_vk("transfer", 2, 2, keys.transfer_vk)
    validator.register_vk("mint", 1, 2, keys.mint_vk)
    validator.register_vk("freeze", 2, 2, keys.freeze_vk)
    return rng, keys, ledger, validator


def test_full_lifecycle_mint_transfer_freeze():
    rng, keys, ledger, validator = _setup_world()
    issuer_kp = UserKeyPair.generate(rng)
    alice = UserKeyPair.generate(rng)
    bob = UserKeyPair.generate(rng)
    viewer = ViewerKeyPair.generate(rng)
    freezer = FreezerKeyPair.generate(rng)
    fee_collector = UserKeyPair.generate(rng)

    policy = (
        AssetPolicy()
        .set_viewer_pub_key(viewer.pub_key())
        .reveal_record_opening()
        .set_freezer_pub_key(freezer.pub_key())
    )
    issuer = AssetIssuerMock(rng, b"integration asset", policy)

    # -- bootstrap: native records for fees -----------------------------------
    issuer_fee_ro = RecordOpening.new(rng, 50, AssetDefinition.native(), issuer_kp.pub_key())
    alice_fee_ro = RecordOpening.new(rng, 40, AssetDefinition.native(), alice.pub_key())
    uid_issuer = ledger.insert_record(RecordCommitment.from_ro(issuer_fee_ro))
    uid_alice_fee = ledger.insert_record(RecordCommitment.from_ro(alice_fee_ro))

    # -- mint to alice ---------------------------------------------------------
    fee_input = FeeInput(
        issuer_fee_ro,
        AccMemberWitness.lookup_from_tree(ledger.tree, uid_issuer),
        issuer_kp,
    )
    fee_info, issuer_chg = TxnFeeInfo.new(rng, fee_input, 2)
    mint_ro = RecordOpening.new(rng, 1000, issuer.asset_def, alice.pub_key())
    mint_note, mint_sig_kp = MintNote.generate(
        rng, mint_ro, issuer.seed, issuer.description, fee_info, keys.mint_pk
    )
    tn_mint = TransactionNote.mint(mint_note)
    block = validator.validate_and_apply_block(rng, [tn_mint], fee_collector.pub_key())
    assert block.fee_record.amount == 2
    assert not ledger.check_nullifier_unspent(mint_note.input_nullifier)

    # receiver memos: alice scans her minted record
    memos = [
        ReceiverMemo.from_ro(rng, issuer_chg),
        ReceiverMemo.from_ro(rng, mint_ro),
    ]
    sig = sign_receiver_memos(mint_sig_kp, memos)
    verify_receiver_memo_signature(tn_mint, memos, sig)
    alice_wallet = SimpleUserWalletMock(rng, alice)
    # mint outputs: [chg (uid X), mint (uid X+1)] -> find uids from block order
    uid_chg = ledger.tree.num_leaves - 3  # chg, mint, fee_record appended
    uid_mint = ledger.tree.num_leaves - 2
    assert not alice_wallet.scan_memo(memos[0], mint_note.chg_comm, uid_chg)
    assert alice_wallet.scan_memo(memos[1], mint_note.mint_comm, uid_mint)
    assert alice_wallet.balance(issuer.asset_def.code) == 1000

    # viewer decodes the mint memo
    vm = ViewerMock(viewer, issuer.asset_def)
    vd = vm.scan_mint(mint_note)
    assert vd.user_address == alice.address()

    # -- alice transfers 300 to bob -------------------------------------------
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
    bob_ro = RecordOpening.new(rng, 300, issuer.asset_def, bob.pub_key())
    # change back to alice
    alice_chg = RecordOpening.new(rng, 700, issuer.asset_def, alice.pub_key())
    # 2-in/2-out: [fee, rec] -> [fee_chg, bob] — need 700 change... use
    # outputs [bob_ro] only fits 2-out with fee change; so transfer full 1000
    bob_ro = RecordOpening.new(rng, 1000, issuer.asset_def, bob.pub_key())
    transfer_note, t_sig_kp = TransferNote.generate_non_native(
        rng, t_inputs, [bob_ro], fee_info2, valid_until=5, proving_key=keys.transfer_pk
    )
    tn_tr = TransactionNote.transfer(transfer_note)
    validator.timestamp = 2
    validator.validate_and_apply_block(rng, [tn_tr], fee_collector.pub_key())
    alice_wallet.mark_spent([rec])
    assert alice_wallet.balance(issuer.asset_def.code) == 0

    # viewer decodes the transfer memo
    ins, outs = vm.scan_transfer(transfer_note)
    assert any(o.user_address == bob.address() and o.amount == 1000 for o in outs)

    # double spend is rejected
    with pytest.raises(FailedTransactionVerificationError):
        validator.validate_single(tn_tr)

    # -- freezer freezes bob's record -----------------------------------------
    bob_uid = ledger.tree.num_leaves - 2  # [fee_chg, bob, fee_record]
    fm = FreezerMock(freezer)
    out_vd = [o for o in outs if o.user_address == bob.address()][0]
    # insert the freeze fee record FIRST so both witnesses share one root
    frz_fee_ro = RecordOpening.new(rng, 9, AssetDefinition.native(), issuer_kp.pub_key())
    uid_ffee = ledger.insert_record(RecordCommitment.from_ro(frz_fee_ro))
    fz_input = fm.freeze_input_from_viewing_data(ledger, out_vd, bob_uid, issuer.asset_def)
    fee_input3 = FeeInput(
        frz_fee_ro, AccMemberWitness.lookup_from_tree(ledger.tree, uid_ffee), issuer_kp
    )
    fee_info3, _ = TxnFeeInfo.new(rng, fee_input3, 1)
    freeze_note, f_sig_kp, frozen_outs = FreezeNote.generate(
        rng, [fz_input], fee_info3, keys.freeze_pk
    )
    tn_fz = TransactionNote.freeze(freeze_note)
    validator.validate_and_apply_block(rng, [tn_fz], fee_collector.pub_key())
    assert frozen_outs[0].freeze_flag == 1

    # total collected fees
    assert calculate_fee([tn_mint, tn_tr, tn_fz]) == 4


def test_freeze_unfreeze_roundtrip():
    """examples.rs:1654+ freeze->unfreeze: a frozen record is unfrozen by the
    freezer and then spent by its owner (spendability proven by the real
    satisfiability check in the fixture)."""
    rng, keys, ledger, validator = _setup_world()
    owner = UserKeyPair.generate(rng)
    recipient = UserKeyPair.generate(rng)
    freezer = FreezerKeyPair.generate(rng)
    viewer = ViewerKeyPair.generate(rng)
    fee_payer = UserKeyPair.generate(rng)
    fee_collector = UserKeyPair.generate(rng)

    policy = (
        AssetPolicy()
        .set_viewer_pub_key(viewer.pub_key())
        .reveal_record_opening()
        .set_freezer_pub_key(freezer.pub_key())
    )
    issuer = AssetIssuerMock(rng, b"freezable asset", policy)

    target_ro = RecordOpening.new(rng, 77, issuer.asset_def, owner.pub_key())
    uid_target = ledger.insert_record(RecordCommitment.from_ro(target_ro))
    fee_ros = [
        RecordOpening.new(rng, 10, AssetDefinition.native(), fee_payer.pub_key())
        for _ in range(2)
    ]
    fee_uids = [ledger.insert_record(RecordCommitment.from_ro(r)) for r in fee_ros]
    owner_fee_ro = RecordOpening.new(rng, 10, AssetDefinition.native(), owner.pub_key())
    uid_owner_fee = ledger.insert_record(RecordCommitment.from_ro(owner_fee_ro))

    def fee_info_for(i):
        fi = FeeInput(
            fee_ros[i],
            AccMemberWitness.lookup_from_tree(ledger.tree, fee_uids[i]),
            fee_payer,
        )
        info, _ = TxnFeeInfo.new(rng, fi, 1)
        return info

    # -- freeze ---------------------------------------------------------------
    fz_in = FreezeNoteInput(
        ro=target_ro,
        acc_member_witness=AccMemberWitness.lookup_from_tree(ledger.tree, uid_target),
        keypair=freezer,
    )
    fz_note, _, fz_outs = FreezeNote.generate(rng, [fz_in], fee_info_for(0), keys.freeze_pk)
    validator.validate_and_apply_block(
        rng, [TransactionNote.freeze(fz_note)], fee_collector.pub_key()
    )
    assert fz_outs[0].freeze_flag == 1
    frozen_ro = fz_outs[0]
    # block appended [fee_chg, frozen, fee_record]
    uid_frozen = ledger.tree.num_leaves - 2

    # -- unfreeze: same flow with the frozen record as input ------------------
    unfz_in = FreezeNoteInput(
        ro=frozen_ro,
        acc_member_witness=AccMemberWitness.lookup_from_tree(ledger.tree, uid_frozen),
        keypair=freezer,
    )
    unfz_note, _, unfz_outs = FreezeNote.generate(
        rng, [unfz_in], fee_info_for(1), keys.freeze_pk
    )
    validator.validate_and_apply_block(
        rng, [TransactionNote.freeze(unfz_note)], fee_collector.pub_key()
    )
    assert unfz_outs[0].freeze_flag == 0
    unfrozen_ro = unfz_outs[0]
    uid_unfrozen = ledger.tree.num_leaves - 2

    # -- the owner can now spend the unfrozen record --------------------------
    fi = FeeInput(
        owner_fee_ro,
        AccMemberWitness.lookup_from_tree(ledger.tree, uid_owner_fee),
        owner,
    )
    spend_fee_info, _ = TxnFeeInfo.new(rng, fi, 1)
    t_inputs = [
        TransferNoteInput(
            ro=unfrozen_ro,
            acc_member_witness=AccMemberWitness.lookup_from_tree(ledger.tree, uid_unfrozen),
            owner_keypair=owner,
        )
    ]
    out_ro = RecordOpening.new(rng, 77, issuer.asset_def, recipient.pub_key())
    t_note, _ = TransferNote.generate_non_native(
        rng, t_inputs, [out_ro], spend_fee_info, valid_until=5,
        proving_key=keys.transfer_pk,
    )
    validator.validate_and_apply_block(
        rng, [TransactionNote.transfer(t_note)], fee_collector.pub_key()
    )
    assert not ledger.check_nullifier_unspent(t_note.inputs_nullifiers[1])


def test_viewed_credential_transfer():
    """examples.rs viewed+credential scenario: a policy demanding identity
    credentials and full disclosure; the viewer recovers the sender's
    attributes, addresses and amounts from the viewing memo."""
    from cap_tpu.keys import CredIssuerKeyPair
    from cap_tpu.structs import ExpirableCredential, IdentityAttribute
    from cap_tpu.constants import ATTRS_LEN

    rng, keys, ledger, validator = _setup_world()
    cred_issuer = CredIssuerKeyPair.generate(rng)
    viewer = ViewerKeyPair.generate(rng)
    sender = UserKeyPair.generate(rng)
    recv = UserKeyPair.generate(rng)
    fee_collector = UserKeyPair.generate(rng)

    policy = (
        AssetPolicy()
        .set_viewer_pub_key(viewer.pub_key())
        .set_cred_creator_pub_key(cred_issuer.pub_key())
        .reveal_record_opening()
        .reveal_all_attributes()
        .set_reveal_threshold(10)
    )
    issuer = AssetIssuerMock(rng, b"kyc asset", policy)

    attrs = [
        IdentityAttribute.new(f"attr-{i}".encode()) for i in range(ATTRS_LEN)
    ]
    cred = ExpirableCredential.create(
        sender.address(), attrs, expiry=500, issuer_keypair=cred_issuer, rng=rng
    )

    sender_ro = RecordOpening.new(rng, 200, issuer.asset_def, sender.pub_key())
    uid_rec = ledger.insert_record(RecordCommitment.from_ro(sender_ro))
    fee_ro = RecordOpening.new(rng, 5, AssetDefinition.native(), sender.pub_key())
    uid_fee = ledger.insert_record(RecordCommitment.from_ro(fee_ro))

    fi = FeeInput(
        fee_ro, AccMemberWitness.lookup_from_tree(ledger.tree, uid_fee), sender
    )
    fee_info, _ = TxnFeeInfo.new(rng, fi, 1)
    t_inputs = [
        TransferNoteInput(
            ro=sender_ro,
            acc_member_witness=AccMemberWitness.lookup_from_tree(ledger.tree, uid_rec),
            owner_keypair=sender,
            cred=cred,
        )
    ]
    out_ro = RecordOpening.new(rng, 200, issuer.asset_def, recv.pub_key())
    # amount (200) above the reveal threshold (10) => memo must be real
    note, _ = TransferNote.generate_non_native(
        rng, t_inputs, [out_ro], fee_info, valid_until=400,
        proving_key=keys.transfer_pk,
    )
    validator.timestamp = 3
    validator.validate_and_apply_block(
        rng, [TransactionNote.transfer(note)], fee_collector.pub_key()
    )

    vm = ViewerMock(viewer, issuer.asset_def)
    ins, outs = vm.scan_transfer(note)
    vin = [d for d in ins if d.user_address is not None][0]
    assert vin.user_address == sender.address()
    assert vin.amount == 200
    assert tuple(a.value for a in attrs) == tuple(
        a.value for a in vin.attributes if a is not None
    )
    vout = [d for d in outs if d.user_address == recv.address()][0]
    assert vout.amount == 200

    # an expired credential is rejected host-side
    validator.timestamp = 600
    with pytest.raises(TxnApiError):
        TransferNote.generate_non_native(
            rng, t_inputs, [out_ro], fee_info, valid_until=600,
            proving_key=keys.transfer_pk,
        )


def test_multi_user_fee_collection_block():
    """examples.rs:989+ block flow: several users' transfers land in ONE
    block, the validator collects their fees into a single native record
    for the fee collector, and the collector can then SPEND the collected
    record (spendability proven by the fixture's real satisfiability
    check)."""
    rng, keys, ledger, validator = _setup_world()
    alice = UserKeyPair.generate(rng)
    bob = UserKeyPair.generate(rng)
    carol = UserKeyPair.generate(rng)
    dave = UserKeyPair.generate(rng)
    collector = UserKeyPair.generate(rng)

    ros = {
        "alice": RecordOpening.new(rng, 20, AssetDefinition.native(), alice.pub_key()),
        "bob": RecordOpening.new(rng, 20, AssetDefinition.native(), bob.pub_key()),
    }
    uids = {k: ledger.insert_record(RecordCommitment.from_ro(r))
            for k, r in ros.items()}

    def native_transfer(user, ro, uid, amount, fee):
        dummy_ro, dummy_kp = RecordOpening.dummy(rng)
        inputs = [
            TransferNoteInput(
                ro=ro,
                acc_member_witness=AccMemberWitness.lookup_from_tree(ledger.tree, uid),
                owner_keypair=user,
            ),
            TransferNoteInput(
                ro=dummy_ro,
                acc_member_witness=AccMemberWitness.dummy(DEPTH),
                owner_keypair=dummy_kp,
            ),
        ]
        out_ro = RecordOpening.new(rng, amount, AssetDefinition.native(),
                                   carol.pub_key())
        note, _, chg = TransferNote.generate_native(
            rng, inputs, [out_ro], fee, valid_until=5, proving_key=keys.transfer_pk
        )
        return note, chg

    note_a, _ = native_transfer(alice, ros["alice"], uids["alice"], 5, 2)
    note_b, _ = native_transfer(bob, ros["bob"], uids["bob"], 7, 2)

    block = validator.validate_and_apply_block(
        rng, [TransactionNote.transfer(note_a), TransactionNote.transfer(note_b)],
        collector.pub_key(),
    )
    assert block.fee_record is not None
    assert block.fee_record.amount == 4                     # 2 + 2 collected
    assert block.fee_record.pub_key == collector.pub_key()
    assert block.fee_record.asset_def.is_native()
    for n in note_a.inputs_nullifiers + note_b.inputs_nullifiers:
        assert not ledger.check_nullifier_unspent(n)

    # -- the collector spends the collected fee record ------------------------
    uid_fee = ledger.tree.num_leaves - 1                    # fee record is last
    dummy_ro, dummy_kp = RecordOpening.dummy(rng)
    spend_inputs = [
        TransferNoteInput(
            ro=block.fee_record,
            acc_member_witness=AccMemberWitness.lookup_from_tree(ledger.tree, uid_fee),
            owner_keypair=collector,
        ),
        TransferNoteInput(
            ro=dummy_ro,
            acc_member_witness=AccMemberWitness.dummy(DEPTH),
            owner_keypair=dummy_kp,
        ),
    ]
    out_ro = RecordOpening.new(rng, 3, AssetDefinition.native(), dave.pub_key())
    spend_note, _, _ = TransferNote.generate_native(
        rng, spend_inputs, [out_ro], 1, valid_until=5, proving_key=keys.transfer_pk
    )
    block2 = validator.validate_and_apply_block(
        rng, [TransactionNote.transfer(spend_note)], collector.pub_key()
    )
    assert block2.fee_record.amount == 1
    assert not ledger.check_nullifier_unspent(spend_note.inputs_nullifiers[0])


def test_block_intra_double_spend_rejected():
    rng, keys, ledger, validator = _setup_world()
    user = UserKeyPair.generate(rng)
    fee_ro = RecordOpening.new(rng, 30, AssetDefinition.native(), user.pub_key())
    uid = ledger.insert_record(RecordCommitment.from_ro(fee_ro))

    def make_note():
        fi = FeeInput(fee_ro, AccMemberWitness.lookup_from_tree(ledger.tree, uid), user)
        info, _ = TxnFeeInfo.new(rng, fi, 1)
        issuer = AssetIssuerMock(rng, b"x", AssetPolicy())
        ro = RecordOpening.new(rng, 10, issuer.asset_def, user.pub_key())
        note, _ = MintNote.generate(rng, ro, issuer.seed, issuer.description, info, keys.mint_pk)
        return TransactionNote.mint(note)

    n1, n2 = make_note(), make_note()
    with pytest.raises(FailedTransactionVerificationError):
        validator.validate_and_apply_block(rng, [n1, n2], user.pub_key())


def test_batch_verify_arg_mismatch_rejected():
    """Reference lib.rs:732-819 twin: mismatched arg lengths raise."""
    from cap_tpu.errors import InvalidParameterError
    from cap_tpu.lib import txn_batch_verify

    rng, keys, ledger, validator = _setup_world()
    user = UserKeyPair.generate(rng)
    fee_ro = RecordOpening.new(rng, 30, AssetDefinition.native(), user.pub_key())
    uid = ledger.insert_record(RecordCommitment.from_ro(fee_ro))
    fi = FeeInput(fee_ro, AccMemberWitness.lookup_from_tree(ledger.tree, uid), user)
    info, _ = TxnFeeInfo.new(rng, fi, 1)
    issuer = AssetIssuerMock(rng, b"z", AssetPolicy())
    ro = RecordOpening.new(rng, 5, issuer.asset_def, user.pub_key())
    note, _ = MintNote.generate(rng, ro, issuer.seed, issuer.description, info, keys.mint_pk)
    tn = TransactionNote.mint(note)
    with pytest.raises(InvalidParameterError):
        txn_batch_verify([tn], [note.merkle_root(), 0], 5, [keys.mint_vk])
    with pytest.raises(InvalidParameterError):
        txn_batch_verify([tn], [note.merkle_root()], 5, [])
    # empty batch is trivially fine
    txn_batch_verify([], [], 5, [])


def test_unknown_root_rejected():
    rng, keys, ledger, validator = _setup_world()
    user = UserKeyPair.generate(rng)
    # a note whose tree isn't the ledger's
    from cap_tpu.crypto.merkle import MerkleTree

    other = MerkleTree(DEPTH)
    fee_ro = RecordOpening.new(rng, 30, AssetDefinition.native(), user.pub_key())
    uid = other.push(fee_ro.derive_record_commitment())
    fi = FeeInput(fee_ro, AccMemberWitness.lookup_from_tree(other, uid), user)
    info, _ = TxnFeeInfo.new(rng, fi, 1)
    issuer = AssetIssuerMock(rng, b"y", AssetPolicy())
    ro = RecordOpening.new(rng, 5, issuer.asset_def, user.pub_key())
    note, _ = MintNote.generate(rng, ro, issuer.seed, issuer.description, info, keys.mint_pk)
    with pytest.raises(FailedTransactionVerificationError):
        validator.validate_single(TransactionNote.mint(note))
