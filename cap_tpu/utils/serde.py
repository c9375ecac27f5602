"""Serialization: points, field elements, tagged-base64 strings.

Centralizes every byte layout in one place (SURVEY.md §7 "hard parts" (6)).
Point and field layouts follow **arkworks 0.3 CanonicalSerialize** (the
reference's wire format, `Cargo.toml:15-25`):

  * field elements: canonical (non-Montgomery) little-endian, 32 bytes;
  * G1 (short Weierstrass) compressed: 32-byte LE x with 2 flag bits in
    the top of the last byte — bit 6 = infinity, bit 7 = "positive y"
    (y > p - y, arkworks' `from_y_sign(self.y > -self.y)`);
  * Baby Jubjub (twisted Edwards) compressed: 32-byte LE x with bit 7 =
    positive y (EdwardsFlags, BIT_SIZE 1); identity = all-zero bytes;
  * G2: x = (c0 || c1) 64 bytes LE with SW flags on the last byte; the
    y sign compares (c1, c0) lexicographically (ark QuadExtField Ord).

The flag-bit polarity (Positive vs Negative setting bit 7) is pinned by
the `_SW_POSITIVE_BIT` / `_TE_POSITIVE_BIT` constants below — if real
arkworks vectors ever disagree, the fix is those two constants.
Tagged blobs: `TAG~base64url` with a 4-byte Keccak checksum suffix,
mirroring jf_utils::tagged_blob.
"""

from __future__ import annotations

import base64

from cap_tpu.crypto.keccak import keccak256
from cap_tpu.fields.host import FQ, FR

_SW_INFINITY_BIT = 1 << 6
_SW_POSITIVE_BIT = 1 << 7   # SWFlags::PositiveY (ark-serialize 0.3)
_TE_POSITIVE_BIT = 1 << 7   # EdwardsFlags::PositiveY


def _is_positive(y: int, p: int) -> bool:
    """arkworks y-sign: positive iff y > -y (i.e. y > p - y)."""
    return y > p - y


def g1_to_bytes(pt) -> bytes:
    """arkworks-compressed G1: x LE with flags in the last byte."""
    if pt is None:
        out = bytearray(32)
        out[31] |= _SW_INFINITY_BIT
        return bytes(out)
    x, y = pt
    out = bytearray(FQ.to_bytes_le(x))
    if _is_positive(y, FQ.p):
        out[31] |= _SW_POSITIVE_BIT
    return bytes(out)


def g1_from_bytes(data: bytes):
    assert len(data) == 32
    flags = data[31] & 0xC0
    body = bytes(data[:31]) + bytes([data[31] & 0x3F])
    if flags & _SW_INFINITY_BIT:
        if any(body):
            raise ValueError("G1 infinity with nonzero coordinate")
        return None
    x = FQ.from_bytes_le(body)
    # y^2 = x^3 + 3
    y2 = (x * x % FQ.p * x + 3) % FQ.p
    y = FQ.sqrt(y2)
    if y is None:
        raise ValueError("invalid G1 x-coordinate")
    if _is_positive(y, FQ.p) != bool(flags & _SW_POSITIVE_BIT):
        y = FQ.p - y
    return (x, y)


def te_point_to_bytes(pt) -> bytes:
    """Baby Jubjub, arkworks-compressed: x LE with the y-sign flag bit."""
    out = bytearray(FR.to_bytes_le(pt.x))
    if _is_positive(pt.y, FR.p):
        out[31] |= _TE_POSITIVE_BIT
    return bytes(out)


def te_point_from_bytes(data: bytes):
    from cap_tpu.crypto.jubjub import te_points_from_x

    assert len(data) == 32
    positive = bool(data[31] & _TE_POSITIVE_BIT)
    body = bytes(data[:31]) + bytes([data[31] & 0x7F])
    x = FR.from_bytes_le(body)
    cands = te_points_from_x(x)
    if not cands:
        raise ValueError("invalid jubjub x-coordinate")
    pt = next(
        (c for c in cands if _is_positive(c.y, FR.p) == positive), cands[0]
    )
    if not (pt.is_neutral() or pt.in_subgroup()):
        # cofactor-8 subgroup check on every deserialized point
        # (reference structs.rs:1425-1591 / ark CanonicalDeserialize)
        raise ValueError("jubjub point not in the prime subgroup")
    return pt


def tagged_blob(tag: str, data: bytes) -> str:
    """`TAG~base64` string with checksum (jf_utils::tagged_blob twin)."""
    chk = keccak256(tag.encode() + data)[:4]
    return tag + "~" + base64.urlsafe_b64encode(data + chk).decode()


def untag_blob(tag: str, s: str) -> bytes:
    got_tag, _, b64 = s.partition("~")
    if got_tag != tag:
        raise ValueError(f"expected tag {tag}, got {got_tag}")
    raw = base64.urlsafe_b64decode(b64)
    data, chk = raw[:-4], raw[-4:]
    if keccak256(tag.encode() + data)[:4] != chk:
        raise ValueError("checksum mismatch")
    return data


def g2_to_bytes(pt) -> bytes:
    """G2 affine point: 128 bytes = x.c0 || x.c1 || y.c0 || y.c1 (32-byte LE
    each).  Uncompressed — the verifier holds only two G2 points, so the
    space for a square-root-based compression is not worth the Fq2 sqrt."""
    x, y = pt
    return (
        FQ.to_bytes_le(x.c0) + FQ.to_bytes_le(x.c1)
        + FQ.to_bytes_le(y.c0) + FQ.to_bytes_le(y.c1)
    )


def g2_from_bytes(data: bytes):
    from cap_tpu.crypto.bn254 import Fq2, g2_is_on_curve

    assert len(data) == 128
    vals = [FQ.from_bytes_le(data[32 * i : 32 * (i + 1)]) for i in range(4)]
    pt = (Fq2(vals[0], vals[1]), Fq2(vals[2], vals[3]))
    if not g2_is_on_curve(pt):
        raise ValueError("G2 point not on the curve")
    return pt
