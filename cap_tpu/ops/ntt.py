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


# ---------------------------------------------------------------------------
# 8-row coset decomposition of the 8n quotient coset (round 4)
#
# One 8n-point coset NTT costs 8n*log(8n) butterflies through the slow
# big-domain regime (measured 17 ms per 2^18 transform on the MXU path);
# decomposing the 8n coset into 8 cosets of H — row r evaluates at
# s_r * H with s_r = shift * w8^r — replaces it with 8 size-n transforms
# (the fast, table-cached 2^15 regime) plus one elementwise scale.  As a
# bonus Z_H(x) = x^n - 1 = mu_r - 1 is CONSTANT on each row.
#
# Inverse: per-row iNTT gives b[r, i] = sum_m t_{i+n*m} * mu_r^m (t taken
# mod X^n - mu_r); the 8 super-coefficients t_{i+n*m} come back through the
# static 8x8 inverse Vandermonde in mu_r.
#
# Row-major [8, n] layout relates to the natural 8n ordering by
# natural[r + 8j] = rows[r, j], i.e. rows = natural.reshape(n, 8).T.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def coset_row_consts(n: int, shift: int, field: PrimeField = FR):
    """Host-side static tables for the row scheme (NUMPY — callers wrap in
    jnp and thread them through jit as arguments)."""
    p = field.p
    w8 = field.root_of_unity(8 * n)
    s_rows = [shift * pow(w8, r, p) % p for r in range(8)]
    mu = [pow(s, n, p) for s in s_rows]

    def pows_host(s):
        out = [1]
        for _ in range(n - 1):
            out.append(out[-1] * s % p)
        return out

    S = np.stack([np.asarray(ints_to_limbs(pows_host(s), field))
                  for s in s_rows])                         # [8, n, 16]
    Sinv = np.stack([
        np.asarray(ints_to_limbs(pows_host(pow(s, -1, p)), field))
        for s in s_rows
    ])
    mu_mont = np.asarray(ints_to_limbs(mu, field))          # [8, 16]
    # inverse Vandermonde V[r][m] = mu_r^m over GF(p)
    V = [[pow(mu[r], m, p) for m in range(8)] for r in range(8)]
    # Gauss-Jordan inverse
    aug = [row[:] + [1 if i == j else 0 for j in range(8)]
           for i, row in enumerate(V)]
    for col in range(8):
        piv = next(r for r in range(col, 8) if aug[r][col] % p != 0)
        aug[col], aug[piv] = aug[piv], aug[col]
        inv = pow(aug[col][col], -1, p)
        aug[col] = [v * inv % p for v in aug[col]]
        for r in range(8):
            if r != col and aug[r][col] % p:
                f = aug[r][col]
                aug[r] = [(aug[r][k] - f * aug[col][k]) % p for k in range(16)]
    vinv = [[aug[m][8 + r] for r in range(8)] for m in range(8)]
    vinv_mont = np.stack([np.asarray(ints_to_limbs(row, field))
                          for row in vinv])                 # [8, 8, 16]
    return {"S": S, "Sinv": Sinv, "mu_mont": mu_mont, "vinv": vinv_mont}


def _pmul_flat(a, b, field: PrimeField):
    """Elementwise mont_mul via the flat Pallas kernel on any shape whose
    flattened element count is block-aligned (scan-CIOS otherwise)."""
    from cap_tpu.ops import field_jax as fjx, pallas_field as pfl

    ctx = fjx.ctx_for(field)
    total = 1
    for d in a.shape[:-1]:
        total *= d
    if pfl.use_pallas() and total % pfl.BLK == 0:
        bb = jnp.broadcast_to(b, a.shape)
        out = pfl.mont_mul_pallas(
            a.reshape(total, NLIMBS), bb.reshape(total, NLIMBS), ctx
        )
        return out.reshape(a.shape)
    return fj.mont_mul(a, b, ctx)


def coset_ntt_rows(coeffs, domain: NttDomain, rowc, mxu_fwd=None):
    """[m,16] Montgomery coeffs (m <= n+8) -> [8, n, 16] row evaluations.

    rowc: device dict from coset_row_consts (S/Sinv/mu_mont/vinv as jnp
    arrays, threaded through jit as arguments)."""
    n = domain.n
    m = coeffs.shape[0]
    assert m <= n + 8
    field = domain.field
    base = coeffs[:n]
    if m < n:
        base = jnp.concatenate(
            [base, jnp.zeros((n - m, NLIMBS), jnp.uint32)], axis=0
        )
    rows = jnp.broadcast_to(base[None], (8, n, NLIMBS))
    if m > n:
        top = coeffs[n:]                                   # [m-n, 16]
        fold = fj.mont_mul(rowc["mu_mont"][:, None, :], top[None])  # [8,m-n,16]
        rows = jnp.concatenate(
            [fj.add(rows[:, : m - n], fold), rows[:, m - n :]], axis=1
        )
    scaled = _pmul_flat(rows, rowc["S"], domain.field)
    if mxu_fwd is not None:
        from cap_tpu.ops import ntt_mxu as nm

        return nm.ntt_mxu_batch(scaled, mxu_fwd)
    import jax

    return jax.vmap(lambda r: ntt(r, domain))(scaled)


def coset_ntt_rows_batch(coeffs_batch, domain: NttDomain, rowc, mxu_fwd=None):
    """[k, m, 16] -> [k, 8, n, 16]: all k*8 size-n transforms in ONE batched
    MXU call."""
    import jax

    n = domain.n
    k = coeffs_batch.shape[0]
    prep = jax.vmap(
        lambda c: _rows_scaled(c, domain, rowc)
    )(coeffs_batch)                                        # [k, 8, n, 16]
    flat = prep.reshape(k * 8, n, NLIMBS)
    if mxu_fwd is not None:
        from cap_tpu.ops import ntt_mxu as nm

        out = nm.ntt_mxu_batch(flat, mxu_fwd)
    else:
        out = jax.vmap(lambda r: ntt(r, domain))(flat)
    return out.reshape(k, 8, n, NLIMBS)


def _rows_scaled(coeffs, domain: NttDomain, rowc):
    n = domain.n
    m = coeffs.shape[0]
    base = coeffs[:n]
    if m < n:
        base = jnp.concatenate(
            [base, jnp.zeros((n - m, NLIMBS), jnp.uint32)], axis=0
        )
    rows = jnp.broadcast_to(base[None], (8, n, NLIMBS))
    if m > n:
        top = coeffs[n:]
        fold = fj.mont_mul(rowc["mu_mont"][:, None, :], top[None])
        rows = jnp.concatenate(
            [fj.add(rows[:, : m - n], fold), rows[:, m - n :]], axis=1
        )
    return _pmul_flat(rows, rowc["S"], domain.field)


def coset_intt_rows(rows_evals, domain: NttDomain, rowc, mxu_inv=None):
    """[8, n, 16] row evaluations -> [8n, 16] coefficients (ascending k)."""
    import jax

    n = domain.n
    if mxu_inv is not None:
        from cap_tpu.ops import ntt_mxu as nm

        e = nm.ntt_mxu_batch(rows_evals, mxu_inv)
    else:
        e = jax.vmap(lambda r: intt(r, domain))(rows_evals)
    b = _pmul_flat(e, rowc["Sinv"], domain.field)          # [8, n, 16]
    # t_{i + n*m} = sum_r vinv[m, r] * b[r, i]: ONE batched Pallas multiply
    # over all 64 (m, r) pairs, then a 3-level pairwise add tree — the
    # naive loop was 64 small scan-CIOS launches
    btile = jnp.broadcast_to(b[None], (8, 8, n, NLIMBS))
    vb = jnp.broadcast_to(rowc["vinv"][:, :, None, :], (8, 8, n, NLIMBS))
    prods = _pmul_flat(btile, vb, domain.field)            # [8, 8, n, 16]
    acc = prods
    while acc.shape[1] > 1:
        half = acc.shape[1] // 2
        acc = fj.add(acc[:, :half], acc[:, half:])
    return acc[:, 0].reshape(8 * n, NLIMBS)                # [8n, 16]
