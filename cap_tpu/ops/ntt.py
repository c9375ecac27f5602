"""Radix-2 NTT / iNTT over the circuit field, vectorized on limb arrays.

The prover's polynomial engine (SURVEY.md §7 Stage 4): wire/selector/sigma
polynomials move between coefficient and evaluation form here, and the
quotient polynomial is computed on an 8n coset.  All butterflies are
vectorized over [n/2, 16]-limb arrays; the stage loop is unrolled at trace
time (log2(n) static stages), which XLA fuses into a handful of kernels.

Sharded multi-chip NTT (butterfly stages with `all_to_all` over ICI) lives in
cap_tpu.parallel; this module is the single-chip core it builds on.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import FR, NLIMBS, PrimeField
from cap_tpu.ops import field_jax as fj
from cap_tpu.ops.limbs import ints_to_limbs


def _bit_reverse_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


@dataclass(frozen=True)
class NttDomain:
    """Host-precomputed constants for a size-n radix-2 evaluation domain."""

    n: int
    field: PrimeField
    omega: int
    omega_inv: int
    n_inv: int
    bitrev: np.ndarray                     # [n] int64
    stage_tw: tuple                        # per-stage [m/2,16] fwd twiddles (Montgomery)
    stage_tw_inv: tuple                    # same for inverse
    n_inv_mont: np.ndarray                 # [16] Montgomery n^-1

    def elements(self) -> list[int]:
        """Host list [1, w, w^2, ...] (plain ints)."""
        out = [1]
        for _ in range(self.n - 1):
            out.append(out[-1] * self.omega % self.field.p)
        return out

    def vanishing_eval(self, x: int) -> int:
        """Z_H(x) = x^n - 1 evaluated on the host."""
        return (pow(x, self.n, self.field.p) - 1) % self.field.p


@lru_cache(maxsize=None)
def get_domain(n: int, field: PrimeField = FR) -> NttDomain:
    assert n & (n - 1) == 0 and n >= 2
    p = field.p
    omega = field.root_of_unity(n)
    omega_inv = pow(omega, -1, p)
    n_inv = pow(n, -1, p)
    logn = n.bit_length() - 1

    def stage_tables(w):
        tables = []
        for s in range(1, logn + 1):
            m = 1 << s
            wm = pow(w, n // m, p)
            pows = [1]
            for _ in range(m // 2 - 1):
                pows.append(pows[-1] * wm % p)
            tables.append(ints_to_limbs(pows, field))
        return tuple(tables)

    return NttDomain(
        n=n,
        field=field,
        omega=omega,
        omega_inv=omega_inv,
        n_inv=n_inv,
        bitrev=_bit_reverse_perm(n),
        stage_tw=stage_tables(omega),
        stage_tw_inv=stage_tables(omega_inv),
        n_inv_mont=ints_to_limbs([n_inv], field)[0],
    )


def _ntt_core(x, stage_tables, n: int, field: PrimeField = FR):
    from cap_tpu.ops import field_jax as fjx, pallas_field as pfl

    ctx = fjx.ctx_for(field)
    logn = n.bit_length() - 1
    use_bf = pfl.use_pallas() and n >= 2048 and (n // 2) % 128 == 0
    for s in range(1, logn + 1):
        m = 1 << s
        tw = jnp.asarray(stage_tables[s - 1])          # [m/2, 16]
        xr = x.reshape(n // m, 2, m // 2, NLIMBS)
        if use_bf:
            # fused flat-Pallas butterfly; values stay redundant (< 2p)
            # across stages, one normalize pass at the end
            u = xr[:, 0].reshape(n // 2, NLIMBS)
            v = xr[:, 1].reshape(n // 2, NLIMBS)
            twf = jnp.broadcast_to(
                tw[None], (n // m, m // 2, NLIMBS)
            ).reshape(n // 2, NLIMBS)
            a, b = pfl.butterfly_pallas(u, v, twf, ctx)
            x = jnp.stack(
                [a.reshape(n // m, m // 2, NLIMBS), b.reshape(n // m, m // 2, NLIMBS)],
                axis=1,
            ).reshape(n, NLIMBS)
        else:
            u = xr[:, 0]
            v = fj.mont_mul(xr[:, 1], tw[None, :, :], ctx)
            x = jnp.stack([fj.add(u, v, ctx), fj.sub(u, v, ctx)], axis=1).reshape(
                n, NLIMBS
            )
    if use_bf:
        x = pfl.normalize_elem(x, ctx)
    return x


def _emul(x, y, field: PrimeField):
    """Elementwise mont_mul, flat-Pallas when the shape allows."""
    from cap_tpu.ops import field_jax as fjx, pallas_field as pfl

    ctx = fjx.ctx_for(field)
    if (
        pfl.use_pallas()
        and x.ndim == 2
        and x.shape[0] % pfl.BLK == 0
        and y.shape == x.shape
    ):
        return pfl.mont_mul_pallas(x, y, ctx)
    return fj.mont_mul(x, y, ctx)


def ntt(coeffs, domain: NttDomain, mxu=None):
    """Coefficients -> evaluations on H (natural order). [n,16] Montgomery.

    mxu: optional ntt_mxu.MxuNttTables routing the transform through the
    int8-matmul MXU path.  Tables must be threaded in as jit ARGUMENTS —
    this runtime embeds closed-over device arrays into the remote-compile
    payload, and the big-domain tables exceed its size limit."""
    if mxu is not None:
        from cap_tpu.ops import ntt_mxu as nm

        return nm.ntt_mxu(coeffs, mxu, domain.field)
    x = coeffs[jnp.asarray(domain.bitrev)]
    return _ntt_core(x, domain.stage_tw, domain.n, domain.field)


def intt(evals, domain: NttDomain, mxu=None):
    """Evaluations on H -> coefficients. [n,16] Montgomery."""
    if mxu is not None:
        from cap_tpu.ops import ntt_mxu as nm

        return nm.ntt_mxu(evals, mxu, domain.field)
    x = evals[jnp.asarray(domain.bitrev)]
    x = _ntt_core(x, domain.stage_tw_inv, domain.n, domain.field)
    scale = jnp.broadcast_to(jnp.asarray(domain.n_inv_mont), x.shape)
    return _emul(x, scale, domain.field)


@lru_cache(maxsize=None)
def _coset_tables(n: int, shift: int, field: PrimeField = FR):
    p = field.p
    pows = [1]
    for _ in range(n - 1):
        pows.append(pows[-1] * shift % p)
    inv_shift = pow(shift, -1, p)
    inv_pows = [1]
    for _ in range(n - 1):
        inv_pows.append(inv_pows[-1] * inv_shift % p)
    return ints_to_limbs(pows, field), ints_to_limbs(inv_pows, field)


def coset_ntt(coeffs, domain: NttDomain, shift: int, mxu=None):
    """Evaluate on the coset shift*H: scale coefficient i by shift^i, then NTT.

    mxu: optional coset-folded MxuNttTables (built with shift=)."""
    if mxu is not None:
        from cap_tpu.ops import ntt_mxu as nm

        return nm.ntt_mxu(coeffs, mxu, domain.field)
    pows, _ = _coset_tables(domain.n, shift, domain.field)
    scaled = _emul(coeffs, jnp.asarray(pows), domain.field)
    return ntt(scaled, domain)


def coset_intt(evals, domain: NttDomain, shift: int, mxu=None):
    """Inverse of coset_ntt."""
    if mxu is not None:
        from cap_tpu.ops import ntt_mxu as nm

        return nm.ntt_mxu(evals, mxu, domain.field)
    _, inv_pows = _coset_tables(domain.n, shift, domain.field)
    coeffs = intt(evals, domain)
    return _emul(coeffs, jnp.asarray(inv_pows), domain.field)


# ---------------------------------------------------------------------------
# host reference (tests ground-truth against this)
# ---------------------------------------------------------------------------


def ntt_host(coeffs: list[int], domain: NttDomain) -> list[int]:
    p = domain.field.p
    els = domain.elements()
    out = []
    for i in range(domain.n):
        acc = 0
        x = els[i]
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        out.append(acc)
    return out
