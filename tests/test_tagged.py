"""TaggedBase64 roundtrips for the public key/record types."""

from cap_tpu.keys import (
    CredIssuerKeyPair,
    FreezerKeyPair,
    UserKeyPair,
    ViewerKeyPair,
)
from cap_tpu.structs import AssetCode, Nullifier, RecordCommitment
from cap_tpu.utils import tagged
from cap_tpu.utils.rng import test_rng


def test_field_backed_roundtrips():
    rng = test_rng()
    code, _ = AssetCode.random(rng)
    s = tagged.asset_code_to_string(code)
    assert s.startswith("ASSET_CODE~")
    assert tagged.asset_code_from_string(s) == code

    n = Nullifier(12345)
    assert tagged.nullifier_from_string(tagged.nullifier_to_string(n)) == n
    rc = RecordCommitment(98765)
    assert tagged.record_commitment_from_string(
        tagged.record_commitment_to_string(rc)
    ) == rc


def test_key_roundtrips():
    rng = test_rng()
    user = UserKeyPair.generate(rng)
    s = tagged.user_pub_key_to_string(user.pub_key())
    assert s.startswith("USERPUBKEY~")
    assert tagged.user_pub_key_from_string(s) == user.pub_key()

    assert tagged.user_address_from_string(
        tagged.user_address_to_string(user.address())
    ) == user.address()

    viewer = ViewerKeyPair.generate(rng)
    assert tagged.viewer_pub_key_from_string(
        tagged.viewer_pub_key_to_string(viewer.pub_key())
    ) == viewer.pub_key()

    issuer = CredIssuerKeyPair.generate(rng)
    assert tagged.cred_issuer_pub_key_from_string(
        tagged.cred_issuer_pub_key_to_string(issuer.pub_key())
    ) == issuer.pub_key()

    freezer = FreezerKeyPair.generate(rng)
    assert tagged.freezer_pub_key_from_string(
        tagged.freezer_pub_key_to_string(freezer.pub_key())
    ) == freezer.pub_key()


def test_signature_and_memo_roundtrips():
    rng = test_rng()
    user = UserKeyPair.generate(rng)
    sig = user.sign(b"message", rng)
    s = tagged.signature_to_string(sig)
    assert tagged.signature_from_string(s) == sig

    from cap_tpu.structs import AssetDefinition, ReceiverMemo, RecordOpening

    ro = RecordOpening.new(rng, 10, AssetDefinition.native(), user.pub_key())
    memo = ReceiverMemo.from_ro(rng, ro)
    back = tagged.receiver_memo_from_string(tagged.receiver_memo_to_string(memo))
    assert back == memo
