"""Known-answer byte vectors for the arkworks-0.3 wire layouts.

VERDICT r2 flagged the serde layer as round-trip-tested only ("byte-
exactness against arkworks never validated").  Full jellyfish vectors are
unreachable (zero-egress env), but several encodings are pinned by public
constants alone — the BN254 G1 generator is (1, 2), the Fr modulus is a
published hex constant, the BN254 G2 generator is the EIP-197 constant,
the Baby Jubjub generator is the EIP-2494 constant — so their exact byte
strings under arkworks CanonicalSerialize (compressed, little-endian,
flags in the top bits of the final byte) are derivable by hand and
hard-coded here.  Any layout drift (endianness, flag polarity, flag
position) breaks these without needing arkworks itself.

Reference wire format: arkworks 0.3 per /root/reference/Cargo.toml:15-25;
jf tagged blobs per jf_utils::tagged_blob.
"""

from cap_tpu.fields.host import FQ, FR
from cap_tpu.utils import serde

# Published BN254 constants (EIP-196/197 and arkworks bn254 sources):
FQ_MODULUS = 21888242871839275222246405745257275088696311157297823662689037894645226208583
FR_MODULUS = 21888242871839275222246405745257275088548364400416034343698204186575808495617
# Fr modulus big-endian hex (public constant), used to pin the LE layout.
FR_MODULUS_HEX_BE = (
    "30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001"
)

G2_GEN_X_C0 = 10857046999023057135944570762232829481370756359578518086990519993285655852781
G2_GEN_X_C1 = 11559732032986387107991004021392285783925812861821192530917403151452391805634
G2_GEN_Y_C0 = 8495653923123431417604973247489272438418190587263600148770280649306958101930
G2_GEN_Y_C1 = 4082367875863433681332203403145435568316851327593401208105741076214120093531

# EIP-2494 Baby Jubjub generator and base point (order-8 cofactor curve).
BJJ_GEN = (
    995203441582195749578291179787384436505546430278305826713579947235728471134,
    5472060717959818805561601436314318772137091100104008585924551046643952123905,
)
BJJ_BASE8 = (
    5299619240641551281634865583518297030282874472190772894086521144482721001553,
    16950150798460657717958625567821834550301663161624707787222815936182638968203,
)


def test_moduli_match_published_constants():
    assert FQ.p == FQ_MODULUS
    assert FR.p == FR_MODULUS


def test_fr_le_byte_layout():
    # to_bytes_le(x) must be the little-endian of the canonical integer:
    # pinned by the published modulus hex, not by our own from_bytes.
    be = bytes.fromhex(FR_MODULUS_HEX_BE)
    assert int.from_bytes(be, "big") == FR_MODULUS  # hex constant sanity
    # r - 1 little-endian is the reversed hex with its low byte decremented
    want = bytearray(reversed(be))
    want[0] -= 1
    assert FR.to_bytes_le(FR_MODULUS - 1) == bytes(want)
    assert FR.to_bytes_le(1) == b"\x01" + b"\x00" * 31
    assert FR.from_bytes_le(bytes(want)) == FR_MODULUS - 1


def test_g1_generator_vector():
    # G1 generator (1, 2): x = 1 LE; y = 2 < p - 2 so SWFlags carries no
    # PositiveY bit -> the full 32-byte string is 0x01 then 31 zeros.
    assert serde.g1_to_bytes((1, 2)) == b"\x01" + b"\x00" * 31
    assert serde.g1_from_bytes(b"\x01" + b"\x00" * 31) == (1, 2)


def test_g1_negated_generator_vector():
    # -G = (1, p - 2): y > p - y -> PositiveY flag = bit 7 of byte 31.
    neg = serde.g1_to_bytes((1, FQ_MODULUS - 2))
    assert neg == b"\x01" + b"\x00" * 30 + b"\x80"
    assert serde.g1_from_bytes(neg) == (1, FQ_MODULUS - 2)


def test_g1_infinity_vector():
    # arkworks SWFlags::Infinity = bit 6 of the final byte, zero body.
    inf = serde.g1_to_bytes(None)
    assert inf == b"\x00" * 31 + b"\x40"
    assert serde.g1_from_bytes(inf) is None


def test_g2_generator_vector():
    from cap_tpu.crypto.bn254 import G2_GEN, g2_is_on_curve

    # our bound generator IS the EIP-197 constant
    gx, gy = G2_GEN
    assert (gx.c0, gx.c1) == (G2_GEN_X_C0, G2_GEN_X_C1)
    assert (gy.c0, gy.c1) == (G2_GEN_Y_C0, G2_GEN_Y_C1)
    assert g2_is_on_curve(G2_GEN)
    # uncompressed layout: x.c0 || x.c1 || y.c0 || y.c1, each 32-byte LE
    blob = serde.g2_to_bytes(G2_GEN)
    assert blob == b"".join(
        v.to_bytes(32, "little")
        for v in (G2_GEN_X_C0, G2_GEN_X_C1, G2_GEN_Y_C0, G2_GEN_Y_C1)
    )
    rx, ry = serde.g2_from_bytes(blob)
    assert (rx.c0, rx.c1, ry.c0, ry.c1) == (
        G2_GEN_X_C0,
        G2_GEN_X_C1,
        G2_GEN_Y_C0,
        G2_GEN_Y_C1,
    )


def test_jubjub_generator_vector():
    from cap_tpu.crypto.jubjub import TEPoint

    import pytest

    for x, y in (BJJ_GEN, BJJ_BASE8):
        pt = TEPoint(x, y)
        assert pt.on_curve()
        blob = serde.te_point_to_bytes(pt)
        # EdwardsFlags: single PositiveY bit (bit 7 of byte 31) on LE x.
        want = bytearray(x.to_bytes(32, "little"))
        if y > FR_MODULUS - y:
            want[31] |= 0x80
        assert blob == bytes(want)
    # B8 (= 8*G) generates the prime-order subgroup and round-trips;
    # the full-order generator G must be REJECTED by the deserializer's
    # cofactor-8 subgroup check (structs.rs:1425-1591 behavior twin).
    rt = serde.te_point_from_bytes(serde.te_point_to_bytes(TEPoint(*BJJ_BASE8)))
    assert (rt.x, rt.y) == BJJ_BASE8
    with pytest.raises(ValueError):
        serde.te_point_from_bytes(serde.te_point_to_bytes(TEPoint(*BJJ_GEN)))


def test_jubjub_identity_vector():
    from cap_tpu.crypto.jubjub import TEPoint

    # (0, 1): x = 0, y = 1 not positive -> all-zero 32 bytes.
    blob = serde.te_point_to_bytes(TEPoint(0, 1))
    assert blob == b"\x00" * 32
    rt = serde.te_point_from_bytes(blob)
    assert rt.is_neutral()


def test_tagged_blob_shape():
    # TAG~base64url(data || keccak256(tag||data)[:4]) — jf_utils twin.
    s = serde.tagged_blob("USERPUBKEY", b"\x01\x02")
    tag, _, b64 = s.partition("~")
    assert tag == "USERPUBKEY"
    import base64 as b64mod

    raw = b64mod.urlsafe_b64decode(b64)
    assert raw[:2] == b"\x01\x02" and len(raw) == 6
    assert serde.untag_blob("USERPUBKEY", s) == b"\x01\x02"
