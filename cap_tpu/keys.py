"""CAP key hierarchy: user, credential issuer, viewer, freezer, nullifier
keys (reference src/keys.rs twin, SURVEY.md §2.1 "Keys (5 roles)").

Nullifier-key derivation (keys.rs:558-597, circuit twin in
cap_tpu.circuits.gadgets_helper):

    nk = fr_to_fq(user_sk)                      if freezer_pk is neutral
       = Rescue.hash_3_to_1(DH.x, DH.y, 0)      otherwise,
         DH = user_sk * freezer_pk  ( == freezer_sk * user_address — the
         symmetry that lets either party nullify )
    nullifier = PRF(nk; [uid, commitment])
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto import jubjub, schnorr
from cap_tpu.crypto.aead import AeadCiphertext, AeadEncKey, AeadKeyPair
from cap_tpu.crypto.elgamal import ElGamalCiphertext, ElGamalEncKey, ElGamalKeyPair
from cap_tpu.crypto.jubjub import NEUTRAL, TEPoint
from cap_tpu.crypto.rescue import RescuePermutation, RescuePRF
from cap_tpu.constants import ATTRS_LEN, VIEWABLE_DATA_LEN
from cap_tpu.errors import (
    FailedPrimitivesError,
    FailedViewableMemoDecryptionError,
    InvalidParameterError,
)
from cap_tpu.fields.host import FR, hash_to_field

_perm = RescuePermutation(FR)
_nullifier_prf = RescuePRF(2, 1, FR)

UserAddress = TEPoint  # Schnorr verification-key point (keys.rs:67)


# ---------------------------------------------------------------------------
# nullifier keys
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NullifierKey:
    value: int  # Fr

    @staticmethod
    def from_dh(point: TEPoint, scalar: int) -> "NullifierKey":
        """compute_nullifier_key: Rescue.hash_3_to_1(DH.x, DH.y, 0)."""
        dh = point.mul_scalar(scalar)
        return NullifierKey(_perm.hash_3_to_1(dh.x, dh.y, 0))

    def nullify(self, uid: int, com) -> "Nullifier":
        from cap_tpu.structs import Nullifier, RecordCommitment

        cval = com.value if isinstance(com, RecordCommitment) else int(com)
        return Nullifier(_nullifier_prf.eval(self.value, [uid, cval])[0])


# ---------------------------------------------------------------------------
# user keys
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UserPubKey:
    address: UserAddress
    enc_key: AeadEncKey

    def encrypt(self, rng, msg: bytes, label: bytes = b"") -> AeadCiphertext:
        """(reference keys.rs:100-113: AEAD failure -> FailedPrimitives)"""
        try:
            return self.enc_key.encrypt(rng, msg, label)
        except Exception as e:
            raise FailedPrimitivesError(f"AEAD encryption failed: {e}") from e

    def verify_sig(self, msg: bytes, sig: schnorr.SchnorrSignature) -> bool:
        return schnorr.verify(self.address, [hash_to_field(FR, b"cap-tpu:user-sig", msg)], sig)

    @staticmethod
    def default() -> "UserPubKey":
        return UserPubKey(NEUTRAL, AeadEncKey(b"\x00" * 32))


@dataclass(frozen=True)
class UserKeyPair:
    addr_keypair: schnorr.SchnorrKeyPair
    enc_keypair: AeadKeyPair

    @staticmethod
    def generate(rng) -> "UserKeyPair":
        return UserKeyPair(
            schnorr.SchnorrKeyPair.generate(rng), AeadKeyPair.generate(rng)
        )

    def address(self) -> UserAddress:
        return self.addr_keypair.vk

    def pub_key(self) -> UserPubKey:
        return UserPubKey(self.address(), self.enc_keypair.enc_key())

    def sign(self, msg: bytes, rng) -> schnorr.SchnorrSignature:
        return self.addr_keypair.sign([hash_to_field(FR, b"cap-tpu:user-sig", msg)], rng)

    def derive_nullifier_key(self, freezer_pk: TEPoint) -> NullifierKey:
        """User-side nk (keys.rs:171-241): sk embeds directly if no freezer."""
        if freezer_pk.is_neutral():
            return NullifierKey(self.addr_keypair.sk % FR.p)
        return NullifierKey.from_dh(freezer_pk, self.addr_keypair.sk)

    def nullify(self, freezer_pk: TEPoint, uid: int, com) -> "Nullifier":
        return self.derive_nullifier_key(freezer_pk).nullify(uid, com)


# ---------------------------------------------------------------------------
# credential issuer keys
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CredIssuerPubKey:
    vk: TEPoint

    def verify(self, msg_scalars, sig) -> bool:
        return schnorr.verify(self.vk, msg_scalars, sig)


@dataclass(frozen=True)
class CredIssuerKeyPair:
    keypair: schnorr.SchnorrKeyPair

    @staticmethod
    def generate(rng) -> "CredIssuerKeyPair":
        return CredIssuerKeyPair(schnorr.SchnorrKeyPair.generate(rng))

    @property
    def vk(self) -> TEPoint:
        return self.keypair.vk

    def pub_key(self) -> CredIssuerPubKey:
        return CredIssuerPubKey(self.keypair.vk)

    def sign(self, msg_scalars, rng) -> schnorr.SchnorrSignature:
        return self.keypair.sign(msg_scalars, rng)


# ---------------------------------------------------------------------------
# viewer keys
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViewerPubKey:
    pk: TEPoint

    def encrypt(self, rng, msg_scalars) -> ElGamalCiphertext:
        return ElGamalEncKey(self.pk).encrypt(rng, msg_scalars)


@dataclass(frozen=True)
class ViewerKeyPair:
    keypair: ElGamalKeyPair

    @staticmethod
    def generate(rng) -> "ViewerKeyPair":
        return ViewerKeyPair(ElGamalKeyPair.generate(rng))

    @property
    def pk(self) -> TEPoint:
        return self.keypair.pk

    def pub_key(self) -> ViewerPubKey:
        return ViewerPubKey(self.keypair.pk)

    def decrypt(self, ct: ElGamalCiphertext):
        return self.keypair.decrypt(ct)

    def open_transfer_viewing_memo(self, asset_def, transfer_note):
        """Decrypt and decode a transfer's viewing memo
        (reference keys.rs:379-434).  Returns (input_data, output_data)
        lists of ViewableData; dummy-address records are filtered."""
        from cap_tpu.structs import AssetCode, ViewableData

        if not asset_def.policy.is_viewer_set():
            raise InvalidParameterError("asset has no viewer policy")
        if asset_def.policy.viewer_pk != self.pk:
            raise InvalidParameterError("memo was not encrypted for this viewer")
        n_in = len(transfer_note.inputs_nullifiers)
        n_out = len(transfer_note.output_commitments)
        expected = 1 + (n_in - 1) * VIEWABLE_DATA_LEN + (n_out - 1) * 4
        scalars = self.decrypt(transfer_note.viewing_memo.memo)
        if len(scalars) != expected:
            raise FailedViewableMemoDecryptionError(
                f"memo length {len(scalars)} != expected {expected}"
            )
        if scalars[0] != asset_def.code.value:
            raise FailedViewableMemoDecryptionError("asset code mismatch")
        rm = asset_def.policy.reveal_map
        inputs, outputs = [], []
        off = 1
        for _ in range(n_in - 1):
            chunk = scalars[off : off + VIEWABLE_DATA_LEN]
            off += VIEWABLE_DATA_LEN
            vd = ViewableData.from_scalars(asset_def.code, chunk, rm, is_input=True)
            if vd.user_address is not None or not rm.bits[0]:
                inputs.append(vd)
        for _ in range(n_out - 1):
            chunk = scalars[off : off + 4] + [0] * ATTRS_LEN
            off += 4
            vd = ViewableData.from_scalars(asset_def.code, chunk, rm, is_input=False)
            if vd.user_address is not None or not rm.bits[0]:
                outputs.append(vd)
        return inputs, outputs

    def open_mint_viewing_memo(self, mint_note):
        """(reference keys.rs:437-451) — returns ViewableData for the mint RO."""
        from cap_tpu.structs import ViewableData, RevealMap

        pol = mint_note.mint_asset_def.policy
        if not pol.is_viewer_set():
            raise InvalidParameterError("asset has no viewer policy")
        if pol.viewer_pk != self.pk:
            raise InvalidParameterError("memo was not encrypted for this viewer")
        scalars = self.decrypt(mint_note.viewing_memo.memo)
        if len(scalars) != 3:
            raise FailedViewableMemoDecryptionError("bad mint memo length")
        vals = [scalars[0], scalars[1], 0, scalars[2]] + [0] * ATTRS_LEN
        rm = RevealMap((True, True, False, True) + (False,) * ATTRS_LEN)
        return ViewableData.from_scalars(mint_note.mint_asset_def.code, vals, rm, False)


# ---------------------------------------------------------------------------
# freezer keys
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FreezerPubKey:
    pk: TEPoint


@dataclass(frozen=True)
class FreezerKeyPair:
    """Raw Jubjub keypair (reference keys.rs:463-542)."""

    sk: int
    pk: TEPoint

    @staticmethod
    def generate(rng) -> "FreezerKeyPair":
        sk = jubjub.rand_scalar(rng)
        return FreezerKeyPair(sk, jubjub.GENERATOR.mul_scalar(sk))

    def pub_key(self) -> FreezerPubKey:
        return FreezerPubKey(self.pk)

    def derive_nullifier_key(self, user_address: UserAddress) -> NullifierKey:
        """Freezer-side nk — equals the user-side derivation by DH symmetry."""
        return NullifierKey.from_dh(user_address, self.sk)

    def nullify(self, user_address: UserAddress, uid: int, com) -> "Nullifier":
        return self.derive_nullifier_key(user_address).nullify(uid, com)
