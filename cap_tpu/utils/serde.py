"""Serialization: points, field elements, tagged-base64 strings.

Centralizes every byte layout in one place (SURVEY.md §7 "hard parts" (6)).
Formats are self-consistent and versioned; arkworks byte-parity is a
data-only change localized here.

G1 points: 33 bytes = 32-byte LE x || flag byte (0 = even y, 1 = odd y,
2 = infinity).  Field elements: 32-byte LE.  Tagged blobs: `TAG~base64url`
with a 4-byte Keccak checksum suffix, mirroring jf_utils::tagged_blob.
"""

from __future__ import annotations

import base64

from cap_tpu.crypto.keccak import keccak256
from cap_tpu.fields.host import FQ, FR


def g1_to_bytes(pt) -> bytes:
    if pt is None:
        return b"\x00" * 32 + b"\x02"
    x, y = pt
    return FQ.to_bytes_le(x) + bytes([y & 1])


def g1_from_bytes(data: bytes):
    assert len(data) == 33
    flag = data[32]
    if flag == 2:
        return None
    x = FQ.from_bytes_le(data[:32])
    # y^2 = x^3 + 3
    y2 = (x * x % FQ.p * x + 3) % FQ.p
    y = FQ.sqrt(y2)
    if y is None:
        raise ValueError("invalid G1 x-coordinate")
    if y & 1 != flag:
        y = FQ.p - y
    return (x, y)


def te_point_to_bytes(pt) -> bytes:
    """Baby Jubjub point: 32-byte LE x || y-parity byte."""
    return FR.to_bytes_le(pt.x) + bytes([pt.y & 1])


def te_point_from_bytes(data: bytes):
    from cap_tpu.crypto.jubjub import point_from_x

    assert len(data) == 33
    x = FR.from_bytes_le(data[:32])
    pt = point_from_x(x, data[32])
    if pt is None:
        raise ValueError("invalid jubjub x-coordinate")
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
