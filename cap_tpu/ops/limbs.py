"""Host <-> device conversion for the fixed-limb field representation.

Device layout (shared by every kernel in cap_tpu.ops): a field element is a
vector of NLIMBS=16 little-endian limbs of LIMB_BITS=16 bits, stored as
uint32 (so every limb product fits a native 32-bit lane multiply on the VPU
— the design constraint that drives the whole limb scheme; SURVEY.md §7
"hard parts" (3)).  Arithmetic values are kept in Montgomery form
(R = 2^256); scalar values destined for bit-windowing (MSM) stay in plain
form.
"""

from __future__ import annotations

import numpy as np

from cap_tpu.fields.host import LIMB_BITS, LIMB_MASK, NLIMBS, PrimeField


def ints_to_limbs(values, mont_field: PrimeField | None = None) -> np.ndarray:
    """Pack Python ints into a [n, 16] uint32 limb array.

    If `mont_field` is given, values are converted to Montgomery form first.
    """
    n = len(values)
    buf = bytearray(n * 32)
    if mont_field is not None:
        p, r = mont_field.p, mont_field.mont_r
        for i, v in enumerate(values):
            buf[32 * i : 32 * i + 32] = (v * r % p).to_bytes(32, "little")
    else:
        for i, v in enumerate(values):
            buf[32 * i : 32 * i + 32] = int(v).to_bytes(32, "little")
    u16 = np.frombuffer(bytes(buf), dtype="<u2").reshape(n, NLIMBS)
    return u16.astype(np.uint32)


def limbs_to_ints(arr, mont_field: PrimeField | None = None) -> list[int]:
    """Unpack a [n, 16] limb array back to Python ints (undoing Montgomery)."""
    a = np.asarray(arr, dtype=np.uint32).reshape(-1, NLIMBS)
    u16 = a.astype("<u2")
    raw = u16.tobytes()
    out = []
    for i in range(a.shape[0]):
        v = int.from_bytes(raw[32 * i : 32 * i + 32], "little")
        if mont_field is not None:
            v = v * mont_field.mont_rinv % mont_field.p
        out.append(v)
    return out


def int_to_limbs(value: int, mont_field: PrimeField | None = None) -> np.ndarray:
    return ints_to_limbs([value], mont_field)[0]


def limbs_to_int(arr, mont_field: PrimeField | None = None) -> int:
    return limbs_to_ints(np.asarray(arr).reshape(1, NLIMBS), mont_field)[0]


__all__ = [
    "NLIMBS",
    "LIMB_BITS",
    "LIMB_MASK",
    "ints_to_limbs",
    "limbs_to_ints",
    "int_to_limbs",
    "limbs_to_int",
]
