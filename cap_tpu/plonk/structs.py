"""PLONK proof / key objects (the `jf-plonk` structs twin, SURVEY.md §2.2).

ProvingKey carries both the host arithmetization and the device-resident
tables the TPU prover consumes (coset selector/sigma evaluations, coset
point tables, vanishing-poly inverses).  VerifyingKey is small and purely
host-side.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.keccak import keccak256
from cap_tpu.fields.host import FR


@dataclass
class PlonkProof:
    """All host-side: 13 G1 points + 10 field evaluations."""

    wire_comms: list          # 5 G1 affine
    z_comm: tuple             # G1 affine
    t_comms: list             # 5 G1 affine
    wire_evals: list          # 5 Fr (a_j(zeta))
    sigma_evals: list         # 4 Fr (sigma_j(zeta), j<4)
    z_omega_eval: int         # z(zeta*omega)
    w_zeta: tuple             # opening proof at zeta
    w_zeta_omega: tuple       # opening proof at zeta*omega

    def to_bytes(self) -> bytes:
        from cap_tpu.utils.serde import g1_to_bytes

        out = b""
        for pt in [*self.wire_comms, self.z_comm, *self.t_comms,
                   self.w_zeta, self.w_zeta_omega]:
            out += g1_to_bytes(pt)
        for v in [*self.wire_evals, *self.sigma_evals, self.z_omega_eval]:
            out += FR.to_bytes_le(v)
        return out

    @staticmethod
    def from_bytes(data: bytes) -> "PlonkProof":
        from cap_tpu.utils.serde import g1_from_bytes

        pts = []
        off = 0
        for _ in range(13):
            pts.append(g1_from_bytes(data[off : off + 32]))
            off += 32
        vals = []
        for _ in range(10):
            vals.append(FR.from_bytes_le(data[off : off + 32]))
            off += 32
        return PlonkProof(
            wire_comms=pts[0:5],
            z_comm=pts[5],
            t_comms=pts[6:11],
            w_zeta=pts[11],
            w_zeta_omega=pts[12],
            wire_evals=vals[0:5],
            sigma_evals=vals[5:9],
            z_omega_eval=vals[9],
        )


@dataclass
class VerifyingKey:
    n: int
    num_pub: int
    wire_ks: list                  # 5 coset representatives
    selector_comms: dict           # selector name -> G1 affine
    sigma_comms: list              # 5 G1 affine
    g2_gen: tuple
    g2_tau: tuple

    def digest(self) -> bytes:
        """Transcript-binding digest of the whole key."""
        from cap_tpu.utils.serde import g1_to_bytes
        from cap_tpu.plonk.circuit import SELECTORS

        h = self.n.to_bytes(8, "little") + self.num_pub.to_bytes(8, "little")
        h += b"".join(FR.to_bytes_le(k) for k in self.wire_ks)
        for name in SELECTORS:
            h += g1_to_bytes(self.selector_comms[name])
        for c in self.sigma_comms:
            h += g1_to_bytes(c)
        return keccak256(h)

    def to_bytes(self) -> bytes:
        """Fixed-layout serialization (reference parameters.rs:485-557 role;
        no pickle — a verifying key must load from untrusted bytes safely).

        Layout: n (8 LE) || num_pub (8 LE) || 5 x wire_k (32 LE) ||
        13 selector comms (32 B each, ark-compressed) || 5 sigma comms ||
        g2_gen (128 B) || g2_tau (128 B)."""
        from cap_tpu.plonk.circuit import SELECTORS
        from cap_tpu.utils.serde import g1_to_bytes, g2_to_bytes

        out = self.n.to_bytes(8, "little") + self.num_pub.to_bytes(8, "little")
        out += b"".join(FR.to_bytes_le(k) for k in self.wire_ks)
        for name in SELECTORS:
            out += g1_to_bytes(self.selector_comms[name])
        for c in self.sigma_comms:
            out += g1_to_bytes(c)
        out += g2_to_bytes(self.g2_gen) + g2_to_bytes(self.g2_tau)
        return out

    @classmethod
    def from_bytes(cls, data: bytes) -> "VerifyingKey":
        """Parse + validate a serialized key (points curve-checked)."""
        from cap_tpu.plonk.circuit import SELECTORS
        from cap_tpu.utils.serde import g1_from_bytes, g2_from_bytes

        exp = 16 + 5 * 32 + 18 * 32 + 2 * 128
        if len(data) != exp:
            raise ValueError(f"verifying key must be {exp} bytes, got {len(data)}")
        off = 0
        n = int.from_bytes(data[off : off + 8], "little"); off += 8
        num_pub = int.from_bytes(data[off : off + 8], "little"); off += 8
        wire_ks = []
        for _ in range(5):
            wire_ks.append(FR.from_bytes_le(data[off : off + 32])); off += 32
        comms = []
        for _ in range(18):
            comms.append(g1_from_bytes(data[off : off + 32])); off += 32
        g2_gen = g2_from_bytes(data[off : off + 128]); off += 128
        g2_tau = g2_from_bytes(data[off : off + 128]); off += 128
        return cls(
            n=n, num_pub=num_pub, wire_ks=wire_ks,
            selector_comms={name: comms[i] for i, name in enumerate(SELECTORS)},
            sigma_comms=comms[13:18], g2_gen=g2_gen, g2_tau=g2_tau,
        )


@dataclass
class ProvingKey:
    vk: VerifyingKey
    n: int
    num_pub: int
    domain: object                 # NttDomain(n)
    domain8: object                # NttDomain(8n) for the quotient coset
    coset_shift: int               # multiplicative coset generator g
    # host arithmetization (needed to re-gather witnesses)
    wire_index: list
    sigma_values_host: list        # 5 x [n] ints
    wire_ks: list
    # device tables (jnp arrays)
    sel_coeffs: object             # [13, n, 16] Montgomery coefficient form
    sigma_coeffs: object           # [5, n, 16]
    sel_coset: object              # [13, 8n, 16] evals on g*H_8n
    sigma_coset: object            # [5, 8n, 16]
    sigma_evals_dev: object        # [5, n, 16] evals on H (for grand product)
    ks_x_coset: object             # [5, 8n, 16]: k_j * x over coset points
    coset_x: object                # [8n, 16] coset point values (Montgomery)
    l1_coset: object               # [8n, 16] L_1 on coset
    inv_zh_coset: object           # [8n, 16] 1/Z_H on coset
    num_gates: int = 0             # pre-padding constraint count (reports)
