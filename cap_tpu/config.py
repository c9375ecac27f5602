"""Configuration system (reference src/config.rs twin).

The reference binds curves via the compile-time `CapConfig` trait with
cargo features (bn254 / bls12_377 / bls12_381).  cap-tpu expresses the same
binding as a config object; BN254 is the implemented instance (the limb
kernels, NTT domains and pairing are generic over the modulus constants in
cap_tpu.fields.host / cap_tpu.ops, so another pairing curve is an
additional-constants project, not a redesign — see fields.host.PrimeField).
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.constants import DUMMY_ASSET_CODE, NATIVE_ASSET_CODE
from cap_tpu.crypto import jubjub
from cap_tpu.fields.host import FQ, FR, FR_EMB, PrimeField


@dataclass(frozen=True)
class CapConfig:
    """Curve/field binding for the CAP system (reference config.rs:25-69)."""

    name: str
    base_field: PrimeField            # pairing-curve base field (Fq)
    scalar_field: PrimeField          # circuit field (Fr)
    embedded_scalar_field: PrimeField # embedded (jubjub) curve scalar field
    embedded_generator: object        # TE base point

    @property
    def scalar_repr_byte_len(self) -> int:
        return self.scalar_field.byte_len

    @property
    def per_attr_byte_capacity(self) -> int:
        return (self.scalar_field.bit_len - 1) // 8 - 1

    def native_asset_code(self) -> int:
        return NATIVE_ASSET_CODE

    def dummy_asset_code(self) -> int:
        return DUMMY_ASSET_CODE


#: The default instance — BN254 with Baby Jubjub.
Config = CapConfig(
    name="bn254",
    base_field=FQ,
    scalar_field=FR,
    embedded_scalar_field=FR_EMB,
    embedded_generator=jubjub.GENERATOR,
)


def bls12_377_config() -> CapConfig:
    """BLS12-377 instance (reference config.rs:63-84 bls12_377 feature).

    All four bindings are live: the 253-bit scalar field runs on the generic
    limb/NTT/MXU stack (tests/test_multicurve.py); the 377-bit base field,
    G1/G2, and the full ate pairing live in crypto/bls12_377.py; the
    embedded curve is ed_on_bls12_377 (TE a=-1, d=3021, cofactor 4 — the
    parameters are order-verified at import).  TurboPlonk proofs over this
    curve run through the curve-generic host pipeline
    (plonk/prover_host.py, exercised by tests/test_multicurve.py); the
    device kernels stay specialized to the production bn254 limb layout.
    """
    from cap_tpu.crypto import bls12_377 as B
    from cap_tpu.fields.host import FQ_BLS12_377, FR_BLS12_377, FR_EMB_BLS12_377

    return CapConfig(
        name="bls12_377",
        base_field=FQ_BLS12_377,
        scalar_field=FR_BLS12_377,
        embedded_scalar_field=FR_EMB_BLS12_377,
        embedded_generator=B.EMB_GEN,
    )


def bls12_377_scalar_config() -> CapConfig:
    """Backward-compat alias for the round-2 seam name."""
    return bls12_377_config()


def bls12_381_config() -> CapConfig:
    """BLS12-381 instance (reference config.rs:25-84 bls12_381 feature).

    The curve algebra (377-line generic BLS12 factory instantiated with
    x = -0xd201000000010000, M-type twist) lives in crypto/bls12_381.py;
    the embedded curve is Jubjub (ed_on_bls12_381, TE a=-1,
    d=-(10240/10241), cofactor 8).  Fr has 2-adicity 32 — every radix-2
    NTT domain the framework uses is available.  TurboPlonk proofs over
    this curve run through the curve-generic host pipeline
    (plonk/prover_host.py, exercised by tests/test_multicurve.py).
    """
    from cap_tpu.crypto import bls12_381 as B
    from cap_tpu.fields.host import FQ_BLS12_381, FR_BLS12_381, FR_EMB_BLS12_381

    return CapConfig(
        name="bls12_381",
        base_field=FQ_BLS12_381,
        scalar_field=FR_BLS12_381,
        embedded_scalar_field=FR_EMB_BLS12_381,
        embedded_generator=B.EMB_GEN,
    )
