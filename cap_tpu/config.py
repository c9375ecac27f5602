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


def bls12_377_scalar_config() -> CapConfig:
    """BLS12-377 seam instance (reference config.rs:63-84 bls12_377 feature).

    The scalar field is fully live — field arithmetic, NTT domains, and the
    MXU matmul path are generic over its constants (tests/test_multicurve.py).
    The 377-bit base field needs the 24-limb layout extension and the
    ed_on_bls12_377 embedded curve constants before proofs can run on this
    curve; until then base/embedded entries are None and any use raises.
    """
    from cap_tpu.fields.host import FR_BLS12_377

    return CapConfig(
        name="bls12_377",
        base_field=None,
        scalar_field=FR_BLS12_377,
        embedded_scalar_field=None,
        embedded_generator=None,
    )
