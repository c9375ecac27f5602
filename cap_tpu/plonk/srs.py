"""KZG structured reference string: setup, caching, device-side commitment.

Mirrors the consumed `jf-plonk` SRS surface (SURVEY.md §2.2; reference
src/proof/mod.rs:59-141): `universal_setup` (fresh tau from an RNG — test
SRS), load/store, and degree accounting (`compute_universal_param_size` =
eval domain + 2, reference src/utils/mod.rs:89-113).

The reference embeds the 131072-point Aztec Ignition CRS; that binary is not
retrievable in this environment, so `universal_setup` generates a tau-based
SRS (exactly what the reference's own test path does) and `load_srs` /
`store_srs` persist it as .npz.  G1 powers are computed on-device with the
fixed-base batched double-and-add kernel (cap_tpu.ops.msm) — generating a
2^17 SRS is itself a TPU workload.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cap_tpu.crypto.bn254 import G1_GEN, G2_GEN, g1_mul, g2_mul
from cap_tpu.fields.host import FQ, FR
from cap_tpu.ops import ec, msm
from cap_tpu.ops.limbs import ints_to_limbs


@dataclass
class UniversalSrs:
    """Powers-of-tau SRS.  g1_powers are device-resident Montgomery limb
    arrays (the MSM operand layout); g2 tau stays host-side (verifier only).
    """

    max_degree: int
    g1_x: jnp.ndarray  # [N, 16] affine x, Montgomery
    g1_y: jnp.ndarray  # [N, 16] affine y, Montgomery
    g2_gen: tuple      # host G2 affine
    g2_tau: tuple      # host G2 affine
    g1_gen_host: tuple = G1_GEN

    @property
    def num_points(self) -> int:
        return self.g1_x.shape[0]


def _g1_pow_table() -> tuple:
    """Host table of 2^k * G1 as device projective arrays, k in 0..253."""
    pts = []
    cur = G1_GEN
    for _ in range(msm.SCALAR_BITS):
        pts.append(cur)
        cur = g1_mul(cur, 2)
    return ec.points_to_device(pts)


def universal_setup(max_degree: int, rng) -> UniversalSrs:
    """Generate a fresh tau SRS with `max_degree+1` G1 powers (test/staging).

    Reference twin: `universal_setup` (src/proof/mod.rs:59-69).
    """
    tau = FR.rand(rng)
    n = max_degree + 1
    powers = [1] * n
    for i in range(1, n):
        powers[i] = powers[i - 1] * tau % FR.p
    table = _g1_pow_table()
    scal = msm.scalars_to_device(powers)
    proj = jax.jit(msm.batch_scalar_mul_gen)(scal, table)
    # normalize to affine on device: x/z, y/z via batched inversion
    px, py, pz = proj
    from cap_tpu.ops import field_jax as fj

    zinv = fj.inv(pz, fj.FQ_CTX)
    ax = fj.mont_mul(px, zinv, fj.FQ_CTX)
    ay = fj.mont_mul(py, zinv, fj.FQ_CTX)
    return UniversalSrs(
        max_degree=max_degree,
        g1_x=ax,
        g1_y=ay,
        g2_gen=G2_GEN,
        g2_tau=g2_mul(G2_GEN, tau),
    )


def store_srs(srs: UniversalSrs, path: str) -> None:
    g2 = [
        srs.g2_gen[0].c0, srs.g2_gen[0].c1, srs.g2_gen[1].c0, srs.g2_gen[1].c1,
        srs.g2_tau[0].c0, srs.g2_tau[0].c1, srs.g2_tau[1].c0, srs.g2_tau[1].c1,
    ]
    g2_bytes = b"".join(v.to_bytes(32, "little") for v in g2)
    np.savez_compressed(
        path,
        max_degree=srs.max_degree,
        g1_x=np.asarray(srs.g1_x),
        g1_y=np.asarray(srs.g1_y),
        g2=np.frombuffer(g2_bytes, dtype=np.uint8),
    )


def load_srs(path: str) -> UniversalSrs:
    """Load a stored SRS (integrity by checksum is the caller's concern)."""
    with np.load(path) as z:
        g2b = z["g2"].tobytes()
        vals = [int.from_bytes(g2b[32 * i : 32 * (i + 1)], "little") for i in range(8)]
        from cap_tpu.crypto.bn254 import Fq2

        return UniversalSrs(
            max_degree=int(z["max_degree"]),
            g1_x=jnp.asarray(z["g1_x"]),
            g1_y=jnp.asarray(z["g1_y"]),
            g2_gen=(Fq2(vals[0], vals[1]), Fq2(vals[2], vals[3])),
            g2_tau=(Fq2(vals[4], vals[5]), Fq2(vals[6], vals[7])),
        )


_STAGING_CACHE: dict = {}


def universal_setup_for_staging(max_degree: int, data_dir: str = "data") -> UniversalSrs:
    """Deterministic staging SRS, cached on disk (reference proof/mod.rs:113-141).

    NOT for production (tau is derived from a public seed); the real
    deployment path is importing a ceremony CRS via `load_srs`.
    """
    if max_degree in _STAGING_CACHE:
        return _STAGING_CACHE[max_degree]
    os.makedirs(data_dir, exist_ok=True)
    path = os.path.join(data_dir, f"staging-srs-{max_degree}.npz")
    if os.path.exists(path):
        srs = load_srs(path)
    else:
        from cap_tpu.utils.rng import CapRng

        srs = universal_setup(max_degree, CapRng(b"cap-tpu staging srs (INSECURE)"))
        store_srs(srs, path)
    _STAGING_CACHE[max_degree] = srs
    return srs


# ---------------------------------------------------------------------------
# commitment / opening primitives
# ---------------------------------------------------------------------------


def _padded_points(srs: UniversalSrs, m: int) -> tuple:
    """First `m` SRS points as projective arrays, identity-padded to CHUNK."""
    mp = ((m + msm.CHUNK - 1) // msm.CHUNK) * msm.CHUNK
    k = min(mp, srs.num_points)
    one = jnp.broadcast_to(jnp.asarray(ints_to_limbs([1], FQ)), (k, 16))
    px, py, pz = srs.g1_x[:k], srs.g1_y[:k], one
    if k < mp:  # pad with identity points (z = 0)
        pad = mp - k
        z16 = jnp.zeros((pad, 16), jnp.uint32)
        o16 = jnp.broadcast_to(jnp.asarray(ints_to_limbs([1], FQ)), (pad, 16))
        px = jnp.concatenate([px, z16])
        py = jnp.concatenate([py, o16])
        pz = jnp.concatenate([pz, z16])
    return px, py, pz


def _pad_coeffs_batch(batch, mp: int):
    k, m, _ = batch.shape
    if m == mp:
        return batch
    return jnp.concatenate(
        [batch, jnp.zeros((k, mp - m, 16), jnp.uint32)], axis=1
    )


def _pad_coeffs(coeffs_plain, mp: int):
    m = coeffs_plain.shape[0]
    if m == mp:
        return coeffs_plain
    return jnp.concatenate(
        [coeffs_plain, jnp.zeros((mp - m, 16), jnp.uint32)], axis=0
    )


def commit(srs: UniversalSrs, coeffs_plain):
    """KZG commit: MSM of SRS points by *plain-form* coefficient limbs.

    coeffs_plain: [m, 16] uint32 plain (non-Montgomery) limbs, m <= num SRS
    points.  Returns a host affine point (device bit-sums + host Horner).
    Batched commitment for the prover lives in cap_tpu.plonk.prover
    (`commit_batch`).
    """
    m = coeffs_plain.shape[0]
    assert m <= srs.num_points, "polynomial degree exceeds SRS"
    pts = _padded_points(srs, m)
    return msm.msm(pts, _pad_coeffs(coeffs_plain, pts[0].shape[0]))
