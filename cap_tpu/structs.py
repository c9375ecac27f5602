"""CAP domain data structures: records, assets, policies, credentials, memos.

Reference twin of src/structs.rs (SURVEY.md §2.1 "Records & assets",
"Credentials", "Memos", "Fees").  All field elements are plain ints in Fr;
curve points are cap_tpu.crypto.jubjub.TEPoint.

The record-commitment recipe (the heart of the system, reference
src/structs.rs:1035-1053):

    comm = RescueCommitment(12).commit(
        [amount, asset_code, upk_x, upk_y, viewer_x, viewer_y,
         cred_x, cred_y, freezer_x, freezer_y,
         2*reveal_map_scalar + freeze_flag, reveal_threshold], blind)

and the in-circuit twin lives in cap_tpu.circuits.structs — any change here
must be mirrored there.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field, replace

from cap_tpu.constants import (
    AMOUNT_MAX,
    ATTRS_LEN,
    DOM_SEP_DOMESTIC_ASSET,
    DOM_SEP_FOREIGN_ASSET,
    DUMMY_ASSET_CODE,
    MAX_TIMESTAMP_LEN,
    NATIVE_ASSET_CODE,
    PER_ATTR_BYTE_CAPACITY,
    VIEWABLE_DATA_LEN,
)
from cap_tpu.crypto import jubjub
from cap_tpu.crypto.aead import AeadCiphertext
from cap_tpu.crypto.elgamal import ElGamalCiphertext, ElGamalEncKey
from cap_tpu.crypto.jubjub import NEUTRAL, TEPoint
from cap_tpu.crypto.keccak import keccak256
from cap_tpu.crypto.rescue import RescueCommitment, RescuePermutation, RescuePRF
from cap_tpu.crypto.schnorr import SchnorrKeyPair, SchnorrSignature
from cap_tpu.crypto.schnorr import verify as schnorr_verify
from cap_tpu.errors import (
    FailedAssetCodeVerificationError,
    FailedCredentialVerificationError,
    FailedPrimitivesError,
    FailedViewableMemoDecryptionError,
    InvalidAttributeError,
    InvalidParameterError,
    TxnApiError,
)
from cap_tpu.fields.host import FR, hash_to_field

_perm = RescuePermutation(FR)
_record_comm = RescueCommitment(12, FR)
_code_prf = RescuePRF(1, 1, FR)

# ---------------------------------------------------------------------------
# Amounts
# ---------------------------------------------------------------------------


def check_amount(v: int) -> int:
    """Amounts are u128-like ints < 2^127 (reference structs.rs:134-219)."""
    if not (0 <= v <= AMOUNT_MAX):
        raise InvalidParameterError(f"amount out of range: {v}")
    return int(v)


def safe_sum_amount(amounts) -> int:
    """Checked sum (reference utils/mod.rs:73-78)."""
    total = 0
    for a in amounts:
        total += check_amount(a)
    if total > AMOUNT_MAX:
        raise InvalidParameterError("amount sum overflow")
    return total


# ---------------------------------------------------------------------------
# Asset codes
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AssetCodeSeed:
    value: int  # Fr

    @staticmethod
    def generate(rng) -> "AssetCodeSeed":
        return AssetCodeSeed(FR.rand(rng))


def asset_code_digest(description: bytes) -> int:
    """Rescue-sponge(hash_to_field(desc)) (reference structs.rs:86-94)."""
    d = hash_to_field(FR, b"cap-tpu:asset-description", description)
    return _perm.sponge_with_padding([d], 1)[0]


@dataclass(frozen=True)
class InternalAssetCode:
    """PRF(seed; digest) (reference structs.rs:108-125)."""

    value: int

    @staticmethod
    def new(seed: AssetCodeSeed, description: bytes) -> "InternalAssetCode":
        return InternalAssetCode(
            _code_prf.eval(seed.value, [asset_code_digest(description)])[0]
        )


@dataclass(frozen=True)
class AssetCode:
    value: int  # Fr

    @staticmethod
    def native() -> "AssetCode":
        return AssetCode(NATIVE_ASSET_CODE)

    @staticmethod
    def dummy() -> "AssetCode":
        return AssetCode(DUMMY_ASSET_CODE)

    @staticmethod
    def new_domestic(seed: AssetCodeSeed, description: bytes) -> tuple:
        """Returns (AssetCode, AssetCodeSeed).  Keccak-bound to the internal
        PRF-derived code (reference structs.rs:279-286)."""
        internal = InternalAssetCode.new(seed, description)
        return AssetCode.new_domestic_from_internal(internal), seed

    @staticmethod
    def new_domestic_from_internal(internal: InternalAssetCode) -> "AssetCode":
        digest = keccak256(DOM_SEP_DOMESTIC_ASSET + FR.to_bytes_le(internal.value))
        return AssetCode(FR.from_le_bytes_mod_order(digest))

    @staticmethod
    def new_foreign(description: bytes) -> "AssetCode":
        digest = keccak256(DOM_SEP_FOREIGN_ASSET + description)
        return AssetCode(FR.from_le_bytes_mod_order(digest))

    @staticmethod
    def random(rng) -> tuple:
        seed = AssetCodeSeed.generate(rng)
        code, _ = AssetCode.new_domestic(seed, b"")
        return code, seed

    def verify_domestic(self, internal: InternalAssetCode) -> None:
        if AssetCode.new_domestic_from_internal(internal) != self:
            raise FailedAssetCodeVerificationError("domestic asset code mismatch")

    def verify_foreign(self, description: bytes) -> None:
        if AssetCode.new_foreign(description) != self:
            raise FailedAssetCodeVerificationError("foreign asset code mismatch")

    def is_native(self) -> bool:
        return self.value == NATIVE_ASSET_CODE

    def is_dummy(self) -> bool:
        return self.value == DUMMY_ASSET_CODE


# ---------------------------------------------------------------------------
# Reveal map & policies
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RevealMap:
    """Internal 12-bit bitmap [upk_x, upk_y, amount, blind, attr_1..attr_8]
    (reference structs.rs:453-483)."""

    bits: tuple = (False,) * VIEWABLE_DATA_LEN

    def to_scalar(self) -> int:
        """Big-endian fold (bit 0 is the most significant)."""
        acc = 0
        for b in self.bits:
            acc = 2 * acc + (1 if b else 0)
        return acc

    def reveal_record_opening(self) -> "RevealMap":
        bits = list(self.bits)
        bits[0] = bits[1] = bits[2] = bits[3] = True
        return RevealMap(tuple(bits))

    def reveal_amount(self) -> "RevealMap":
        bits = list(self.bits)
        bits[2] = True
        return RevealMap(tuple(bits))

    def reveal_blinding_factor(self) -> "RevealMap":
        bits = list(self.bits)
        bits[3] = True
        return RevealMap(tuple(bits))

    def reveal_user_address(self) -> "RevealMap":
        bits = list(self.bits)
        bits[0] = bits[1] = True
        return RevealMap(tuple(bits))

    def reveal_ith_attribute(self, i: int) -> "RevealMap":
        if not 0 <= i < ATTRS_LEN:
            raise InvalidParameterError(f"attribute index {i} out of range")
        bits = list(self.bits)
        bits[4 + i] = True
        return RevealMap(tuple(bits))

    def reveal_all_attributes(self) -> "RevealMap":
        bits = list(self.bits)
        for i in range(ATTRS_LEN):
            bits[4 + i] = True
        return RevealMap(tuple(bits))

    @staticmethod
    def reveal_all() -> "RevealMap":
        return RevealMap((True,) * VIEWABLE_DATA_LEN)

    def is_reveal_none(self) -> bool:
        return not any(self.bits)

    def hadamard_product(self, vals) -> list:
        assert len(vals) == VIEWABLE_DATA_LEN
        return [v if b else 0 for b, v in zip(self.bits, vals)]

    @staticmethod
    def rand_for_test(rng) -> "RevealMap":
        bits = [bool(rng.randrange(2)) for _ in range(VIEWABLE_DATA_LEN)]
        bits[1] = bits[0]  # upk bits always paired
        return RevealMap(tuple(bits))


@dataclass(frozen=True)
class AssetPolicy:
    """Viewing / credential / freezing policy (reference structs.rs:500-717)."""

    viewer_pk: TEPoint = NEUTRAL     # ElGamal encryption key point
    cred_pk: TEPoint = NEUTRAL       # credential issuer Schnorr verification key
    freezer_pk: TEPoint = NEUTRAL
    reveal_map: RevealMap = dc_field(default_factory=RevealMap)
    reveal_threshold: int = 0        # amounts <= threshold skip the memo

    # builder API
    def set_viewer_pub_key(self, pk) -> "AssetPolicy":
        pt = pk.pk if hasattr(pk, "pk") else pk
        return replace(self, viewer_pk=pt)

    def set_cred_creator_pub_key(self, pk) -> "AssetPolicy":
        pt = pk.vk if hasattr(pk, "vk") else pk
        return replace(self, cred_pk=pt)

    def set_freezer_pub_key(self, pk) -> "AssetPolicy":
        pt = pk.pk if hasattr(pk, "pk") else pk
        return replace(self, freezer_pk=pt)

    def set_reveal_threshold(self, t: int) -> "AssetPolicy":
        return replace(self, reveal_threshold=check_amount(t))

    def reveal_record_opening(self) -> "AssetPolicy":
        self._require_viewer()
        return replace(self, reveal_map=self.reveal_map.reveal_record_opening())

    def reveal_amount(self) -> "AssetPolicy":
        self._require_viewer()
        return replace(self, reveal_map=self.reveal_map.reveal_amount())

    def reveal_user_address(self) -> "AssetPolicy":
        self._require_viewer()
        return replace(self, reveal_map=self.reveal_map.reveal_user_address())

    def reveal_blinding_factor(self) -> "AssetPolicy":
        self._require_viewer()
        return replace(self, reveal_map=self.reveal_map.reveal_blinding_factor())

    def reveal_ith_attribute(self, i: int) -> "AssetPolicy":
        self._require_cred()
        return replace(self, reveal_map=self.reveal_map.reveal_ith_attribute(i))

    def reveal_all_attributes(self) -> "AssetPolicy":
        self._require_cred()
        return replace(self, reveal_map=self.reveal_map.reveal_all_attributes())

    def reveal_all(self) -> "AssetPolicy":
        self._require_viewer()
        self._require_cred()
        return replace(self, reveal_map=RevealMap.reveal_all())

    def _require_viewer(self):
        if not self.is_viewer_set():
            raise InvalidParameterError("revealing requires a viewer key")

    def _require_cred(self):
        if not self.is_cred_creator_set():
            raise InvalidParameterError("attribute reveal requires a credential issuer key")

    # predicates
    def is_viewer_set(self) -> bool:
        return not self.viewer_pk.is_neutral()

    def is_cred_creator_set(self) -> bool:
        return not self.cred_pk.is_neutral()

    def is_freezer_set(self) -> bool:
        return not self.freezer_pk.is_neutral()

    def is_dummy(self) -> bool:
        return (
            not self.is_viewer_set()
            and not self.is_cred_creator_set()
            and not self.is_freezer_set()
            and self.reveal_map.is_reveal_none()
            and self.reveal_threshold == 0
        )

    def to_scalars(self) -> list:
        """Policy fields in record-commitment order (8 scalars)."""
        return [
            self.viewer_pk.x, self.viewer_pk.y,
            self.cred_pk.x, self.cred_pk.y,
            self.freezer_pk.x, self.freezer_pk.y,
            self.reveal_map.to_scalar(), self.reveal_threshold,
        ]

    @staticmethod
    def rand_for_test(rng) -> "AssetPolicy":
        return AssetPolicy(
            viewer_pk=jubjub.rand_point(rng),
            cred_pk=jubjub.rand_point(rng),
            freezer_pk=jubjub.rand_point(rng),
            reveal_map=RevealMap.rand_for_test(rng),
            reveal_threshold=rng.randrange(AMOUNT_MAX),
        )


@dataclass(frozen=True)
class AssetDefinition:
    code: AssetCode
    policy: AssetPolicy = dc_field(default_factory=AssetPolicy)

    @staticmethod
    def new(code: AssetCode, policy: AssetPolicy) -> "AssetDefinition":
        if code.is_native() or code.is_dummy():
            raise InvalidParameterError("reserved asset code")
        return AssetDefinition(code, policy)

    @staticmethod
    def native() -> "AssetDefinition":
        return AssetDefinition(AssetCode.native(), AssetPolicy())

    @staticmethod
    def dummy() -> "AssetDefinition":
        return AssetDefinition(AssetCode.dummy(), AssetPolicy())

    def is_native(self) -> bool:
        return self.code.is_native()

    def is_dummy(self) -> bool:
        return self.code.is_dummy()

    @staticmethod
    def rand_for_test(rng) -> "AssetDefinition":
        code, _ = AssetCode.random(rng)
        return AssetDefinition(code, AssetPolicy.rand_for_test(rng))


# ---------------------------------------------------------------------------
# Records
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BlindFactor:
    value: int

    @staticmethod
    def rand(rng) -> "BlindFactor":
        return BlindFactor(FR.rand(rng))


@dataclass(frozen=True)
class Nullifier:
    value: int


@dataclass(frozen=True)
class RecordCommitment:
    value: int

    @staticmethod
    def from_ro(ro: "RecordOpening") -> "RecordCommitment":
        return RecordCommitment(ro.derive_record_commitment())

    def to_field_element(self) -> int:
        return self.value


FROZEN = 1
UNFROZEN = 0


def flip_flag(flag: int) -> int:
    return 1 - flag


@dataclass(frozen=True)
class RecordOpening:
    """Opening of an asset-record commitment (reference structs.rs:955-1056)."""

    amount: int
    asset_def: AssetDefinition
    pub_key: "UserPubKey"           # forward ref to keys.UserPubKey
    freeze_flag: int = UNFROZEN
    blind: BlindFactor = dc_field(default_factory=lambda: BlindFactor(0))

    @staticmethod
    def new(rng, amount, asset_def, pub_key, freeze_flag=UNFROZEN) -> "RecordOpening":
        return RecordOpening(
            check_amount(amount), asset_def, pub_key, freeze_flag, BlindFactor.rand(rng)
        )

    @staticmethod
    def dummy(rng) -> tuple:
        """Dummy record (+ its owner keypair) — amount 0, dummy asset."""
        from cap_tpu.keys import UserKeyPair

        kp = UserKeyPair.generate(rng)
        ro = RecordOpening(
            0, AssetDefinition.dummy(), kp.pub_key(), UNFROZEN, BlindFactor.rand(rng)
        )
        return ro, kp

    def is_dummy(self) -> bool:
        return self.asset_def.is_dummy()

    def commitment_inputs(self) -> list:
        pol = self.asset_def.policy
        addr = self.pub_key.address
        return [
            self.amount,
            self.asset_def.code.value,
            addr.x, addr.y,
            pol.viewer_pk.x, pol.viewer_pk.y,
            pol.cred_pk.x, pol.cred_pk.y,
            pol.freezer_pk.x, pol.freezer_pk.y,
            (2 * pol.reveal_map.to_scalar() + self.freeze_flag) % FR.p,
            pol.reveal_threshold,
        ]

    def derive_record_commitment(self) -> int:
        """The 12-element Rescue commitment (structs.rs:1035-1053).

        Cached per instance (frozen dataclass, so via object.__setattr__):
        the builder computes it for the Merkle push and the proving path
        recomputes it in from_witness — 5 Rescue permutations each."""
        cached = getattr(self, "_rc_cache", None)
        if cached is None:
            cached = _record_comm.commit(self.commitment_inputs(), self.blind.value)
            object.__setattr__(self, "_rc_cache", cached)
        return cached

    def to_bytes(self) -> bytes:
        """Fixed binary layout (no pickling — memo payloads are untrusted)."""
        from cap_tpu.utils.serde import te_point_to_bytes

        pol = self.asset_def.policy
        out = self.amount.to_bytes(16, "little")
        out += FR.to_bytes_le(self.asset_def.code.value)
        out += te_point_to_bytes(pol.viewer_pk)
        out += te_point_to_bytes(pol.cred_pk)
        out += te_point_to_bytes(pol.freezer_pk)
        out += pol.reveal_map.to_scalar().to_bytes(2, "little")
        out += pol.reveal_threshold.to_bytes(16, "little")
        out += te_point_to_bytes(self.pub_key.address)
        out += self.pub_key.enc_key.pub
        out += bytes([self.freeze_flag])
        out += FR.to_bytes_le(self.blind.value)
        return out

    @staticmethod
    def from_bytes(data: bytes) -> "RecordOpening":
        from cap_tpu.crypto.aead import AeadEncKey
        from cap_tpu.keys import UserPubKey
        from cap_tpu.utils.serde import te_point_from_bytes

        try:
            off = 0
            amount = int.from_bytes(data[off : off + 16], "little"); off += 16
            code = AssetCode(FR.from_bytes_le(data[off : off + 32])); off += 32
            viewer = te_point_from_bytes(data[off : off + 32]); off += 32
            cred = te_point_from_bytes(data[off : off + 32]); off += 32
            freezer = te_point_from_bytes(data[off : off + 32]); off += 32
            rm_scalar = int.from_bytes(data[off : off + 2], "little"); off += 2
            bits = tuple(
                bool((rm_scalar >> (VIEWABLE_DATA_LEN - 1 - i)) & 1)
                for i in range(VIEWABLE_DATA_LEN)
            )
            threshold = int.from_bytes(data[off : off + 16], "little"); off += 16
            addr = te_point_from_bytes(data[off : off + 32]); off += 32
            enc_key = AeadEncKey(data[off : off + 32]); off += 32
            flag = data[off]; off += 1
            blind = FR.from_bytes_le(data[off : off + 32]); off += 32
            if flag not in (0, 1) or off != len(data):
                raise InvalidParameterError("bad record opening encoding")
            check_amount(amount)
            check_amount(threshold)
        except (IndexError, ValueError) as e:
            raise InvalidParameterError(f"bad record opening encoding: {e}") from e
        policy = AssetPolicy(viewer, cred, freezer, RevealMap(bits), threshold)
        return RecordOpening(
            amount, AssetDefinition(code, policy), UserPubKey(addr, enc_key),
            flag, BlindFactor(blind),
        )

    @staticmethod
    def rand_for_test(rng) -> "RecordOpening":
        from cap_tpu.keys import UserKeyPair

        kp = UserKeyPair.generate(rng)
        return RecordOpening(
            rng.randrange(AMOUNT_MAX),
            AssetDefinition.rand_for_test(rng),
            kp.pub_key(),
            UNFROZEN,
            BlindFactor.rand(rng),
        )


# ---------------------------------------------------------------------------
# Credentials
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class IdentityAttribute:
    """<=30-byte attribute value, padded PKCS#5-style into one Fr scalar
    (reference structs.rs:1082-1147)."""

    value: bytes

    def __post_init__(self):
        if len(self.value) > PER_ATTR_BYTE_CAPACITY:
            raise InvalidAttributeError("attribute too long")

    @staticmethod
    def new(value: bytes) -> "IdentityAttribute":
        return IdentityAttribute(bytes(value))

    @staticmethod
    def default() -> "IdentityAttribute":
        return IdentityAttribute(b"")

    @staticmethod
    def random(rng) -> "IdentityAttribute":
        n = 1 + rng.randrange(PER_ATTR_BYTE_CAPACITY)
        return IdentityAttribute(rng.randbytes(n))

    def to_scalar(self) -> int:
        pad = PER_ATTR_BYTE_CAPACITY + 1 - len(self.value)
        padded = self.value + bytes([pad]) * pad
        return int.from_bytes(padded, "little")

    @staticmethod
    def from_scalar(v: int) -> "IdentityAttribute":
        raw = int(v).to_bytes(32, "little")[: PER_ATTR_BYTE_CAPACITY + 1]
        pad = raw[-1]
        if pad == 0 or pad > PER_ATTR_BYTE_CAPACITY + 1:
            raise InvalidAttributeError("bad attribute padding")
        body, tail = raw[: len(raw) - pad], raw[len(raw) - pad :]
        if any(b != pad for b in tail):
            raise InvalidAttributeError("bad attribute padding")
        return IdentityAttribute(body)


@dataclass(frozen=True)
class ExpirableCredential:
    """Credential over (user_addr, attrs, expiry) signed by an issuer
    (reference structs.rs:1160-1254)."""

    user_addr: TEPoint
    attrs: tuple                      # ATTRS_LEN IdentityAttributes
    expiry: int
    cred: SchnorrSignature
    creator_pk: TEPoint               # issuer Schnorr verification key

    @staticmethod
    def create(user_addr, attrs, expiry, issuer_keypair, rng) -> "ExpirableCredential":
        if len(attrs) != ATTRS_LEN:
            raise InvalidParameterError(f"need exactly {ATTRS_LEN} attributes")
        msg = ExpirableCredential._msg(user_addr, attrs, expiry)
        sig = issuer_keypair.sign(msg, rng)
        return ExpirableCredential(user_addr, tuple(attrs), expiry, sig, issuer_keypair.vk)

    @staticmethod
    def _msg(user_addr, attrs, expiry) -> list:
        return [expiry, user_addr.x, user_addr.y] + [a.to_scalar() for a in attrs]

    def verify(self, now: int) -> None:
        if self.is_expired(now):
            raise FailedCredentialVerificationError("credential expired")
        msg = ExpirableCredential._msg(self.user_addr, self.attrs, self.expiry)
        if not schnorr_verify(self.creator_pk, msg, self.cred):
            raise FailedCredentialVerificationError("bad credential signature")

    def is_expired(self, now: int) -> bool:
        return self.expiry < now

    @staticmethod
    def dummy_unexpired() -> "ExpirableCredential":
        """Placeholder credential with max expiry (structs.rs:1236-1248)."""
        from cap_tpu.utils.rng import CapRng

        rng = CapRng(b"cap-tpu dummy credential")
        kp = SchnorrKeyPair.generate(rng)
        attrs = tuple(IdentityAttribute.default() for _ in range(ATTRS_LEN))
        expiry = (1 << MAX_TIMESTAMP_LEN) - 1
        return ExpirableCredential.create(NEUTRAL, attrs, expiry, kp, rng)


# ---------------------------------------------------------------------------
# Viewing memos
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViewableMemo:
    """ElGamal ciphertext revealing policy-selected record data
    (reference structs.rs:1268-1415)."""

    memo: ElGamalCiphertext

    @staticmethod
    def new_for_transfer_note(
        input_ros, output_ros, asset_def: "AssetDefinition", randomizer: int
    ) -> "ViewableMemo":
        """Layout (skipping the fee input [0] and fee-change output [0]):
        [asset_code,
         per non-fee input:  (upk_x, upk_y, amount, blind, attrs*8) ⊙ map,
         per non-fee output: (upk_x, upk_y, amount, blind) ⊙ map[0..4]]
        input_ros: list of (RecordOpening, ExpirableCredential-or-None);
        a missing credential uses the deterministic dummy credential, so the
        in-circuit re-encryption (which always has credential variables)
        computes the identical plaintext.  Dummy inputs force their (random)
        address into the reveal slots so viewers can filter them."""
        policy = asset_def.policy
        rm = policy.reveal_map
        msg = [asset_def.code.value]
        for ro, cred in input_ros[1:]:
            if cred is None:
                cred = ExpirableCredential.dummy_unexpired()
            attrs = [a.to_scalar() for a in cred.attrs]
            vals = [
                ro.pub_key.address.x, ro.pub_key.address.y,
                ro.amount, ro.blind.value,
            ] + attrs
            masked = rm.hadamard_product(vals)
            if ro.is_dummy():
                # force address reveal for dummies so viewers can drop them
                masked[0] = ro.pub_key.address.x
                masked[1] = ro.pub_key.address.y
            msg.extend(masked)
        for ro in output_ros[1:]:
            vals = [
                ro.pub_key.address.x, ro.pub_key.address.y,
                ro.amount, ro.blind.value,
            ]
            masked = [v if rm.bits[i] else 0 for i, v in enumerate(vals)]
            msg.extend(masked)
        ct = ElGamalEncKey(policy.viewer_pk).deterministic_encrypt(randomizer, msg)
        return ViewableMemo(ct)

    @staticmethod
    def new_for_mint_note(ro_mint: RecordOpening, randomizer: int) -> "ViewableMemo":
        """enc(upk_x, upk_y, blind) (reference structs.rs:1285-1297)."""
        pol = ro_mint.asset_def.policy
        msg = [ro_mint.pub_key.address.x, ro_mint.pub_key.address.y, ro_mint.blind.value]
        ct = ElGamalEncKey(pol.viewer_pk).deterministic_encrypt(randomizer, msg)
        return ViewableMemo(ct)

    @staticmethod
    def dummy_for_transfer_note(n_inputs, n_outputs, rng) -> "ViewableMemo":
        """Random-key encryption of zeros with the correct length
        (reference structs.rs:1397-1415)."""
        ln = 1 + (n_inputs - 1) * VIEWABLE_DATA_LEN + (n_outputs - 1) * 4
        pk = jubjub.rand_point(rng)
        r = jubjub.rand_scalar(rng)
        ct = ElGamalEncKey(pk).deterministic_encrypt(r, [0] * ln)
        return ViewableMemo(ct)

    def to_scalars(self) -> list:
        return self.memo.to_scalars()


@dataclass(frozen=True)
class ViewableData:
    """One record's decrypted viewing data (reference structs.rs:1425-1591)."""

    asset_code: AssetCode
    user_address: TEPoint | None
    amount: int | None
    blinding_factor: int | None
    attributes: tuple  # optional IdentityAttribute or None per slot

    @staticmethod
    def from_scalars(asset_code, vals, rm: RevealMap, is_input: bool) -> "ViewableData":
        addr = None
        if rm.bits[0]:
            x, y = vals[0], vals[1]
            if x == 0 and y == 0:
                addr = None  # empty slot
            else:
                pt = TEPoint(x, y)
                if not pt.on_curve():
                    raise FailedViewableMemoDecryptionError("address not on curve")
                if not pt.in_subgroup():
                    # cofactor-8 check (reference structs.rs:1425-1591)
                    raise FailedViewableMemoDecryptionError(
                        "address not in the prime subgroup"
                    )
                addr = pt
        amount = None
        if rm.bits[2]:
            if vals[2] > AMOUNT_MAX:
                raise FailedViewableMemoDecryptionError("amount out of range")
            amount = vals[2]
        blind = vals[3] if rm.bits[3] else None
        attrs = []
        if is_input:
            for i in range(ATTRS_LEN):
                if rm.bits[4 + i] and vals[4 + i] != 0:
                    attrs.append(IdentityAttribute.from_scalar(vals[4 + i]))
                else:
                    attrs.append(None)
        return ViewableData(asset_code, addr, amount, blind, tuple(attrs))


# ---------------------------------------------------------------------------
# Receiver memos
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ReceiverMemo:
    """AEAD ciphertext of a RecordOpening for its receiver
    (reference structs.rs:1597-1653)."""

    ct: AeadCiphertext

    @staticmethod
    def from_ro(rng, ro: RecordOpening, label: bytes = b"") -> "ReceiverMemo":
        ct = ro.pub_key.enc_key.encrypt(rng, ro.to_bytes(), label)
        return ReceiverMemo(ct)

    def decrypt(self, keypair, comm: RecordCommitment, label: bytes = b"") -> RecordOpening:
        """keypair: UserKeyPair; re-derives and checks the commitment
        (reference structs.rs:1619-1653: AEAD failure -> FailedPrimitives)."""
        try:
            data = keypair.enc_keypair.decrypt(self.ct, label)
        except Exception as e:
            raise FailedPrimitivesError(
                "failed decryption, probably wrong keypair for the receiver memo"
            ) from e
        ro = RecordOpening.from_bytes(data)
        if ro.derive_record_commitment() != comm.value:
            raise TxnApiError("receiver memo commitment mismatch")
        return ro

    def to_bytes(self) -> bytes:
        return self.ct.to_bytes()


def get_receiver_memos_digest(memos) -> int:
    """hash_to_field over concatenated serialized memos
    (reference utils/mod.rs:778-793)."""
    data = b"".join(m.to_bytes() for m in memos)
    return hash_to_field(FR, b"cap-tpu:receiver-memos", data)


# ---------------------------------------------------------------------------
# Fees
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FeeInput:
    """Native-asset input funding a fee (reference structs.rs:1660-1668)."""

    ro: RecordOpening
    acc_member_witness: object       # crypto.merkle.AccMemberWitness
    owner_keypair: object            # keys.UserKeyPair


@dataclass(frozen=True)
class TxnFeeInfo:
    fee_input: FeeInput
    fee_amount: int
    fee_chg_ro: RecordOpening

    @staticmethod
    def new(rng, fee_input: FeeInput, fee_amount: int) -> tuple:
        """Split the input into fee + change RO (structs.rs:1690-1718);
        returns (TxnFeeInfo, fee_chg_ro)."""
        check_amount(fee_amount)
        if fee_input.ro.amount < fee_amount:
            raise InvalidParameterError("insufficient fee input balance")
        if not fee_input.ro.asset_def.is_native():
            raise InvalidParameterError("fee must be paid in the native asset")
        change = RecordOpening.new(
            rng,
            fee_input.ro.amount - fee_amount,
            AssetDefinition.native(),
            fee_input.ro.pub_key,
        )
        return TxnFeeInfo(fee_input, fee_amount, change), change
