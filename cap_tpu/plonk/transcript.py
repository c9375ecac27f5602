"""Keccak-256 Fiat–Shamir transcript.

Mirrors jf-plonk's `SolidityTranscript` role (SURVEY.md §2.2): a
Keccak-based transcript so an EVM verifier can replay challenge derivation,
including the `ext_msg` hook that binds the receiver-memo verification key
and extra data into transfer proofs (reference src/proof/transfer.rs:181-207).

State model: `state = keccak256(state || len(label) || label || len(data)
|| data)` on every append; challenges are drawn as `keccak256(state ||
tag || len(label) || label)` with tags 1/2 expanded to 48 bytes (reduced
mod r with negligible bias) and tag 3 evolving the state.

Every field is **word-aligned** (u32 lengths; label/data zero-padded to
4-byte multiples): the device transcript twin (plonk/transcript_device.py +
crypto/keccak_jax.py) hashes u32 word streams inside the jitted prove
program, and byte-for-byte equality between the two is what lets a fused
device prove verify against this host transcript
(tests/test_keccak_device.py).
"""

from __future__ import annotations

from cap_tpu.crypto.keccak import keccak256
from cap_tpu.fields.host import FQ, FR


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((-len(b)) % 4)


def _encode_g1(pt) -> bytes:
    """Affine host G1 point -> 64 bytes (LE x || LE y); infinity -> zeros."""
    if pt is None:
        return b"\x00" * 64
    return FQ.to_bytes_le(pt[0]) + FQ.to_bytes_le(pt[1])


class Transcript:
    def __init__(self, label: bytes = b"cap-tpu plonk transcript v2w"):
        self.state = keccak256(_pad4(label))

    def append_bytes(self, label: bytes, data: bytes) -> None:
        self.state = keccak256(
            self.state
            + len(label).to_bytes(4, "little")
            + _pad4(label)
            + len(data).to_bytes(4, "little")
            + _pad4(data)
        )

    def append_scalar(self, label: bytes, v: int) -> None:
        self.append_bytes(label, FR.to_bytes_le(v))

    def append_scalars(self, label: bytes, vs) -> None:
        self.append_bytes(label, b"".join(FR.to_bytes_le(v) for v in vs))

    def append_point(self, label: bytes, pt) -> None:
        self.append_bytes(label, _encode_g1(pt))

    def append_points(self, label: bytes, pts) -> None:
        self.append_bytes(label, b"".join(_encode_g1(p) for p in pts))

    def _tagged(self, tag: int, label: bytes) -> bytes:
        return (
            self.state
            + tag.to_bytes(4, "little")
            + len(label).to_bytes(4, "little")
            + _pad4(label)
        )

    def challenge(self, label: bytes) -> int:
        """Draw a challenge in Fr and absorb it into the state."""
        h1 = keccak256(self._tagged(1, label))
        h2 = keccak256(self._tagged(2, label))
        v = int.from_bytes(h1 + h2[:16], "little") % FR.p
        self.state = keccak256(self._tagged(3, label))
        return v

    def begin_proof(self, vk, pub_inputs, ext_msg: bytes | None) -> None:
        """Proof-transcript prologue, v2w layout: vk digest, public inputs,
        then the optional extra binding message (kept byte-identical to the
        round-1/2 stream — the fused device prover replays this layout)."""
        self.append_bytes(b"vk", vk.digest())
        self.append_scalars(b"pub", pub_inputs)
        if ext_msg is not None:
            self.append_bytes(b"ext", ext_msg)


class SolidityTranscript:
    """jf-plonk `SolidityTranscript` layout twin (reference type parameter
    of every prove/verify — src/proof/transfer.rs:181-207).

    Layout, per the publicly documented jellyfish scheme: appends
    concatenate raw bytes into a running `transcript` buffer (labels are
    IGNORED, as in the Rust type); a challenge evolves a 64-byte `state`
    with two domain-separated Keccaks over `state || transcript` and reads
    the value little-endian mod r:

        h0 = keccak256(state || transcript || 0x00)
        h1 = keccak256(state || transcript || 0x01)
        state = h0 || h1;  challenge = LE(state[:48]) mod r

    Field/point encodings follow arkworks CanonicalSerialize (LE scalars,
    32-byte compressed points — utils/serde.py).

    This layout is the DEFAULT since round 3 (VERDICT r2 item 4): every
    prove/verify flows through it unless CAP_TRANSCRIPT=v2w opts into the
    word-aligned device-twin layout.  Byte-level parity with jellyfish rev
    bcd92b2 is best-effort (no egress to fetch the pinned sources or
    generate vectors — docs/STATUS.md "known deviations"); the class keeps
    the transcript a data-swappable seam so a vector-driven byte fix is
    local to this one class.  Proofs made with one transcript class verify
    only with the same class.
    """

    def __init__(self, label: bytes = b""):
        self.buf = b""
        self.state = b"\x00" * 64

    def append_bytes(self, label: bytes, data: bytes) -> None:
        self.buf += data

    def append_scalar(self, label: bytes, v: int) -> None:
        self.append_bytes(label, FR.to_bytes_le(v))

    def append_scalars(self, label: bytes, vs) -> None:
        self.append_bytes(label, b"".join(FR.to_bytes_le(v) for v in vs))

    def append_point(self, label: bytes, pt) -> None:
        from cap_tpu.utils.serde import g1_to_bytes

        self.append_bytes(label, g1_to_bytes(pt))

    def append_points(self, label: bytes, pts) -> None:
        for p in pts:
            self.append_point(label, p)

    def challenge(self, label: bytes) -> int:
        h0 = keccak256(self.state + self.buf + b"\x00")
        h1 = keccak256(self.state + self.buf + b"\x01")
        self.state = h0 + h1
        return int.from_bytes(self.state[:48], "little") % FR.p

    def begin_proof(self, vk, pub_inputs, ext_msg: bytes | None) -> None:
        """Proof-transcript prologue in jf's order (`batch_prove_internal`):
        the extra *init* message comes FIRST (right after `new`), then
        `append_vk_and_pub_input` writes, labels ignored:

            field size in bits   (usize LE, 8 bytes — 254 for BN254 Fr)
            domain size          (usize LE, 8 bytes)
            input size           (usize LE, 8 bytes)
            wire subset separators k_i        (LE Fr, 32 bytes each)
            selector commitments (compressed points, 32 bytes each)
            sigma commitments    (compressed points, 32 bytes each)
            public inputs        (LE Fr, 32 bytes each)
        """
        from cap_tpu.plonk.circuit import SELECTORS

        if ext_msg is not None:
            self.append_bytes(b"", ext_msg)
        self.append_bytes(b"", (FR.p.bit_length()).to_bytes(8, "little"))
        self.append_bytes(b"", vk.n.to_bytes(8, "little"))
        self.append_bytes(b"", vk.num_pub.to_bytes(8, "little"))
        self.append_scalars(b"", list(vk.wire_ks))
        self.append_points(b"", [vk.selector_comms[name] for name in SELECTORS])
        self.append_points(b"", list(vk.sigma_comms))
        self.append_scalars(b"", pub_inputs)


def new_transcript():
    """Transcript factory for prover/verifier: CAP_TRANSCRIPT=solidity
    (default — jf `SolidityTranscript` layout twin) or v2w (the word-aligned
    layout the fused device prover replays)."""
    import os

    kind = os.environ.get("CAP_TRANSCRIPT", "solidity")
    if kind == "solidity":
        return SolidityTranscript()
    if kind == "v2w":
        return Transcript()
    raise ValueError(f"unknown CAP_TRANSCRIPT={kind!r}")
