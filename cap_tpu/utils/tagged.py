"""TaggedBase64 string encodings for public-facing types.

`jf_utils::tagged_blob` twin (SURVEY.md §2.2): ~20 types serialize to
`TAG~base64url(bytes || checksum)` strings for ledgers/wallets/APIs.  Tags
follow the reference's naming where known (viewer keys keep the historical
AUD prefix used by the reference's auditor-era tags).
"""

from __future__ import annotations

from cap_tpu.crypto.jubjub import TEPoint
from cap_tpu.fields.host import FR
from cap_tpu.utils.serde import (
    tagged_blob,
    te_point_from_bytes,
    te_point_to_bytes,
    untag_blob,
)

TAGS = {
    "user_pub_key": "USERPUBKEY",
    "user_address": "ADDR",
    "viewer_pub_key": "AUDPUBKEY",
    "cred_issuer_pub_key": "CREDPUBKEY",
    "freezer_pub_key": "FREEZEPUBKEY",
    "asset_code": "ASSET_CODE",
    "asset_seed": "ASSET_SEED",
    "internal_asset_code": "INTERNAL_ASSET_CODE",
    "record_commitment": "REC",
    "nullifier": "NUL",
    "signature": "SIG",
    "transaction_note": "TXN",
    "receiver_memo": "MEMO",
}


def _fr_tag(name: str, value: int) -> str:
    return tagged_blob(TAGS[name], FR.to_bytes_le(value))


def _fr_untag(name: str, s: str) -> int:
    return FR.from_bytes_le(untag_blob(TAGS[name], s))


# -- field-element-backed types --------------------------------------------


def asset_code_to_string(code) -> str:
    return _fr_tag("asset_code", code.value)


def asset_code_from_string(s: str):
    from cap_tpu.structs import AssetCode

    return AssetCode(_fr_untag("asset_code", s))


def nullifier_to_string(n) -> str:
    return _fr_tag("nullifier", n.value)


def nullifier_from_string(s: str):
    from cap_tpu.structs import Nullifier

    return Nullifier(_fr_untag("nullifier", s))


def record_commitment_to_string(rc) -> str:
    return _fr_tag("record_commitment", rc.value)


def record_commitment_from_string(s: str):
    from cap_tpu.structs import RecordCommitment

    return RecordCommitment(_fr_untag("record_commitment", s))


# -- point-backed keys ------------------------------------------------------


def user_address_to_string(addr: TEPoint) -> str:
    return tagged_blob(TAGS["user_address"], te_point_to_bytes(addr))


def user_address_from_string(s: str) -> TEPoint:
    return te_point_from_bytes(untag_blob(TAGS["user_address"], s))


def viewer_pub_key_to_string(pk) -> str:
    pt = pk.pk if hasattr(pk, "pk") else pk
    return tagged_blob(TAGS["viewer_pub_key"], te_point_to_bytes(pt))


def viewer_pub_key_from_string(s: str):
    from cap_tpu.keys import ViewerPubKey

    return ViewerPubKey(te_point_from_bytes(untag_blob(TAGS["viewer_pub_key"], s)))


def cred_issuer_pub_key_to_string(pk) -> str:
    pt = pk.vk if hasattr(pk, "vk") else pk
    return tagged_blob(TAGS["cred_issuer_pub_key"], te_point_to_bytes(pt))


def cred_issuer_pub_key_from_string(s: str):
    from cap_tpu.keys import CredIssuerPubKey

    return CredIssuerPubKey(te_point_from_bytes(untag_blob(TAGS["cred_issuer_pub_key"], s)))


def freezer_pub_key_to_string(pk) -> str:
    pt = pk.pk if hasattr(pk, "pk") else pk
    return tagged_blob(TAGS["freezer_pub_key"], te_point_to_bytes(pt))


def freezer_pub_key_from_string(s: str):
    from cap_tpu.keys import FreezerPubKey

    return FreezerPubKey(te_point_from_bytes(untag_blob(TAGS["freezer_pub_key"], s)))


# -- composite types ---------------------------------------------------------


def user_pub_key_to_string(upk) -> str:
    data = te_point_to_bytes(upk.address) + upk.enc_key.pub
    return tagged_blob(TAGS["user_pub_key"], data)


def user_pub_key_from_string(s: str):
    from cap_tpu.crypto.aead import AeadEncKey
    from cap_tpu.keys import UserPubKey

    data = untag_blob(TAGS["user_pub_key"], s)
    return UserPubKey(te_point_from_bytes(data[:32]), AeadEncKey(data[32:64]))


def signature_to_string(sig) -> str:
    data = te_point_to_bytes(sig.sig_r) + sig.s.to_bytes(32, "little")
    return tagged_blob(TAGS["signature"], data)


def signature_from_string(s: str):
    from cap_tpu.crypto.schnorr import SchnorrSignature

    data = untag_blob(TAGS["signature"], s)
    return SchnorrSignature(
        te_point_from_bytes(data[:32]), int.from_bytes(data[32:64], "little")
    )


def transaction_note_to_string(tn) -> str:
    from cap_tpu.utils.note_serde import transaction_note_to_bytes

    return tagged_blob(TAGS["transaction_note"], transaction_note_to_bytes(tn))


def transaction_note_from_string(s: str):
    from cap_tpu.utils.note_serde import transaction_note_from_bytes

    return transaction_note_from_bytes(untag_blob(TAGS["transaction_note"], s))


def receiver_memo_to_string(memo) -> str:
    return tagged_blob(TAGS["receiver_memo"], memo.to_bytes())


def receiver_memo_from_string(s: str):
    from cap_tpu.crypto.aead import AeadCiphertext
    from cap_tpu.structs import ReceiverMemo

    return ReceiverMemo(AeadCiphertext.from_bytes(untag_blob(TAGS["receiver_memo"], s)))
