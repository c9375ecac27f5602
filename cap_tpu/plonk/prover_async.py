"""Async TurboPlonk prover: device-resident Fiat-Shamir, ONE host sync.

The per-round prover (prover.py) pays a ~29 ms tunnel round trip per
Fiat-Shamir round on this runtime — commits travel to the host, are
Keccak-absorbed there, and the next round's program waits on the drawn
challenge: ~200 ms of pure latency across the 7 host reads of a prove.

This variant keeps the WHOLE transcript on device in the default
SolidityTranscript layout (append-only byte buffer, every challenge
re-hashes state||buf — crypto/keccak_jax.keccak256_bytes_arr makes that a
fori_loop over rate blocks): four jitted programs (rounds 1, 2, 3, 4+5)
chain through device (buf, state) arrays and device challenge scalars, so
the host enqueues all four back-to-back WITHOUT blocking and reads one
result bundle at the end.  Proof bytes are identical to the sync prover
(same rng draw order, same transcript math) — asserted on-chip by
scripts/probe_async.py and by verifying with the host verifier.

Round-5's linearization scalars (the sync prover's host bigint block) are
computed on device from the evaluations; the handful of inversions
(zeta^-1, (zeta*omega)^-1, L1 denominator) ride one rolled-loop Fermat
kernel call (pallas_field.inv_elem).

Reference role: jf-plonk's 5-round prover with SolidityTranscript
(src/proof/transfer.rs:181-187); the async structure is TPU-native
latency hiding, not a reference feature.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from cap_tpu.crypto.keccak_jax import keccak256_bytes_arr, words8_to_bytes_arr
from cap_tpu.fields.host import FQ, FR, NLIMBS
from cap_tpu.ops import field_jax as fj, msm_signed as msg_mod
from cap_tpu.ops import pallas_field as pfl
from cap_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
from cap_tpu.plonk import prover as pv
from cap_tpu.plonk.structs import PlonkProof


def _mont(v: int):
    return jnp.asarray(ints_to_limbs([v], FR)[0])


def _mont_many(vs):
    return jnp.asarray(ints_to_limbs(list(vs), FR))


# ---------------------------------------------------------------------------
# device SolidityTranscript (functional: (buf, state) byte arrays)
# ---------------------------------------------------------------------------


def ds_challenge(buf, state):
    """SolidityTranscript challenge: h0/h1 = keccak(state||buf||tag);
    state' = h0||h1; value = LE(state'[:48]) mod r, returned in Montgomery
    form.  All byte arrays are one-byte-per-uint32."""
    L = 64 + buf.shape[0] + 1
    m0 = jnp.concatenate([state, buf, jnp.zeros(1, jnp.uint32)])
    m1 = jnp.concatenate([state, buf, jnp.ones(1, jnp.uint32)])
    h0 = keccak256_bytes_arr(m0, L)
    h1 = keccak256_bytes_arr(m1, L)
    state2 = jnp.concatenate(
        [words8_to_bytes_arr(h0), words8_to_bytes_arr(h1)]
    )
    lo = _words_to_limbs16(h0)
    hi = _words_to_limbs16(list(h1[:4]) + [jnp.uint32(0)] * 4)
    r2 = jnp.asarray(_R2_NP)
    lo_m = fj.mont_mul(lo, r2)
    hi_m = fj.mont_mul(fj.mont_mul(hi, r2), r2)
    return fj.add(lo_m, hi_m), state2


_R2_NP = ints_to_limbs([pow(2, 512, FR.p)])[0]


def _words_to_limbs16(words):
    limbs = []
    for w in words:
        limbs.append(w & jnp.uint32(0xFFFF))
        limbs.append(w >> jnp.uint32(16))
    return jnp.stack(limbs)


def _limbs_to_bytes(x_plain):
    """[k, 16] PLAIN canonical limb arrays -> [k*32] LE byte array."""
    b = jnp.stack(
        [x_plain & jnp.uint32(0xFF), x_plain >> jnp.uint32(8)], axis=-1
    )  # [k, 16, 2]
    return b.reshape(-1)


def g1_batch_bytes_dev(c):
    """[k, 3, 16] canonical-projective Montgomery G1 -> [k*32] compressed
    bytes (arkworks 0.3 layout, utils/serde.g1_to_bytes twin)."""
    k = c.shape[0]
    z = c[:, 2]
    zinv = pfl.inv_elem(z, fj.FQ_CTX)          # 0 -> 0 (infinity)
    xa = fj.mont_mul(c[:, 0], zinv, fj.FQ_CTX)
    ya = fj.mont_mul(c[:, 1], zinv, fj.FQ_CTX)
    x_pl = fj.from_mont(xa, fj.FQ_CTX)
    y_pl = fj.from_mont(ya, fj.FQ_CTX)
    inf = fj.is_zero(z)                         # [k]
    # positive y: 2y > p  <=>  p - 2y borrows (over 17 virtual limbs)
    two_y = []
    carry = jnp.zeros((k,), jnp.uint32)
    for j in range(NLIMBS):
        v = (y_pl[:, j] << 1) | carry
        two_y.append(v & jnp.uint32(0xFFFF))
        carry = v >> jnp.uint32(16)
    p_limbs = [np.uint32(int(v)) for v in fj.FQ_CTX.p_np]
    borrow = jnp.zeros((k,), jnp.uint32)
    for j in range(NLIMBS):
        d = p_limbs[j] + jnp.uint32(0x10000) - two_y[j] - borrow
        borrow = jnp.uint32(1) - (d >> jnp.uint32(16))
    # top "limb": p's bit 256 is 0, 2y's carry is `carry`
    borrow = jnp.where(carry > 0, jnp.uint32(1), borrow)
    pos = borrow == 1
    x_pl = fj.select(~inf, x_pl, fj.zero((k,), fj.FQ_CTX))
    by = _limbs_to_bytes(x_pl).reshape(k, 32)
    flags = jnp.where(
        inf, jnp.uint32(0x40), jnp.where(pos, jnp.uint32(0x80), jnp.uint32(0))
    )
    by = by.at[:, 31].set(by[:, 31] | flags)
    return by.reshape(-1)


def scalars_bytes_dev(vals_mont):
    """[k,16] Montgomery Fr scalars -> [k*32] LE plain bytes."""
    return _limbs_to_bytes(fj.from_mont(vals_mont))


# ---------------------------------------------------------------------------
# async round programs (per domain size, cached)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _async_kernels(n: int, engine: str):
    K = pv._kernels(n, None, engine)
    p = FR.p

    def _commit(tab, plain_batch):
        from cap_tpu.ops import msm_affine as aff

        k, m, _ = plain_batch.shape
        mp = tab.shape[1]
        padded = jnp.concatenate(
            [plain_batch, jnp.zeros((k, mp - m, NLIMBS), jnp.uint32)], axis=1
        )
        if engine == "affine":
            return aff.msm_affine_commit_device(tab, padded)
        return msg_mod.msm_signed_commit_device(tab, padded)

    @jax.jit
    def round1(tab, wit_u16, wire_idx, blinds, buf, state, intt_tabs=None):
        wire_evals = K.gather_phase(wit_u16, wire_idx)
        wire_ext, wire_plain = K.wires_phase(wire_evals, blinds, intt_tabs)
        c1 = _commit(tab, wire_plain)
        buf = jnp.concatenate([buf, g1_batch_bytes_dev(c1)])
        beta, state = ds_challenge(buf, state)
        gamma, state = ds_challenge(buf, state)
        return wire_evals, wire_ext, c1, buf, state, beta, gamma

    @jax.jit
    def round2(tab, wire_evals, sigma_evals, ks_x, beta, gamma, blinds,
               buf, state, intt_tabs=None):
        z_coeffs, z_plain = K.z_phase(wire_evals, sigma_evals, ks_x, beta,
                                      gamma, blinds, intt_tabs)
        c2 = _commit(tab, z_plain[None])
        buf = jnp.concatenate([buf, g1_batch_bytes_dev(c2)])
        alpha, state = ds_challenge(buf, state)
        return z_coeffs, c2, buf, state, alpha

    @jax.jit
    def round3(tab, wire_ext, z_coeffs, pub_mont, sel_r, sigma_r, ksx_r,
               l1_r, izh_r, alpha, beta, gamma, rowc, buf, state,
               intt_tabs=None, fwd_n=None):
        t_chunks, t_plain, tail_ok = K.quotient_phase_rows(
            wire_ext, z_coeffs, pub_mont, sel_r, sigma_r, ksx_r, l1_r,
            izh_r, alpha, beta, gamma, rowc, intt_tabs, fwd_n,
        )
        c3 = _commit(tab, t_plain)
        buf = jnp.concatenate([buf, g1_batch_bytes_dev(c3)])
        zeta, state = ds_challenge(buf, state)
        return t_chunks, tail_ok, c3, buf, state, zeta

    omega_m_np = ints_to_limbs([pv.get_domain(n).omega], FR)[0]
    n_m_np = ints_to_limbs([n % p], FR)[0]

    def _pow_static(x, e: int):
        """x^e for static e >= 1 (square-and-multiply, traced)."""
        bits = bin(e)[2:]
        acc = x
        for b in bits[1:]:
            acc = fj.mont_sqr(acc)
            if b == "1":
                acc = fj.mont_mul(acc, x)
        return acc

    @jax.jit
    def round45_full(tab, wire_ext, sel_coeffs, sigma_coeffs, z_coeffs,
                     t_chunks, wire_ks_m, alpha, beta, gamma, zeta,
                     buf, state):
        omega_m = jnp.asarray(omega_m_np)
        zw = fj.mont_mul(zeta, omega_m)
        evs = K.evals_phase(wire_ext, sigma_coeffs, z_coeffs, zeta, zw)
        ev10 = jnp.concatenate([evs[:9], evs[10:11]])
        buf = jnp.concatenate([buf, scalars_bytes_dev(ev10)])
        v, state = ds_challenge(buf, state)

        one = fj.one_mont(())
        abar = [evs[j] for j in range(5)]
        sig_e = [evs[5 + j] for j in range(4)]
        z_om = evs[10]
        zh_zeta = fj.sub(_pow_static(zeta, n), one)
        n_m = jnp.asarray(n_m_np)
        den_l1 = fj.mont_mul(n_m, fj.sub(zeta, one))
        invs = pfl.inv_elem(jnp.stack([zeta, zw, den_l1]))
        zeta_inv, zw_inv, l1_den_inv = invs[0], invs[1], invs[2]
        l1_zeta = fj.mont_mul(zh_zeta, l1_den_inv)
        alpha2 = fj.mont_sqr(alpha)

        f_zeta = one
        for j in range(5):
            term = fj.add(
                fj.add(abar[j], fj.mont_mul(beta, fj.mont_mul(wire_ks_m[j], zeta))),
                gamma,
            )
            f_zeta = fj.mont_mul(f_zeta, term)
        pi3 = one
        for j in range(4):
            term = fj.add(fj.add(abar[j], fj.mont_mul(beta, sig_e[j])), gamma)
            pi3 = fj.mont_mul(pi3, term)

        zero = fj.zero(())
        gate = [
            abar[0], abar[1], abar[2], abar[3],
            fj.mont_mul(abar[0], abar[1]), fj.mont_mul(abar[2], abar[3]),
            _pow_static(abar[0], 5), _pow_static(abar[1], 5),
            _pow_static(abar[2], 5), _pow_static(abar[3], 5),
            fj.mont_mul(
                fj.mont_mul(fj.mont_mul(abar[0], abar[1]),
                            fj.mont_mul(abar[2], abar[3])),
                abar[4],
            ),
            one,
            fj.sub(zero, abar[4]),
        ]
        r13 = fj.add(fj.mont_mul(alpha, f_zeta), fj.mont_mul(alpha2, l1_zeta))
        r14 = fj.sub(
            zero,
            fj.mont_mul(fj.mont_mul(fj.mont_mul(alpha, beta), z_om), pi3),
        )
        zeta_n2 = _pow_static(zeta, n + 2)
        rt = []
        zk = one
        for k_i in range(5):
            rt.append(fj.sub(zero, fj.mont_mul(zh_zeta, zk)))
            zk = fj.mont_mul(zk, zeta_n2)
        r_scalars = jnp.stack(gate + [r13, r14] + rt)
        vp = [one]
        for _ in range(9):
            vp.append(fj.mont_mul(vp[-1], v))
        v_pows = jnp.stack(vp)

        m_r = n + 3
        polys_r = jnp.concatenate([
            jnp.stack([pv.srs_pad(sel_coeffs[i], m_r) for i in range(13)]),
            pv.srs_pad(z_coeffs, m_r)[None],
            pv.srs_pad(sigma_coeffs[4], m_r)[None],
            jnp.stack([pv.srs_pad(t_chunks[i], m_r) for i in range(5)]),
        ])
        r_poly = K.lincomb(polys_r, r_scalars)
        polys_q = jnp.concatenate([
            r_poly[None],
            jnp.stack([pv.srs_pad(wire_ext[j], m_r) for j in range(5)]),
            jnp.stack([pv.srs_pad(sigma_coeffs[j], m_r) for j in range(4)]),
        ])
        q_poly = K.lincomb(polys_q, v_pows)
        w_zeta_c, w_zeta_plain = K.open_phase(q_poly, zeta, zeta_inv)
        w_om_c, w_om_plain = K.open_phase(
            pv.srs_pad(z_coeffs, m_r), zw, zw_inv
        )
        c5 = _commit(tab, jnp.stack([w_zeta_plain, w_om_plain]))
        return evs, c5

    from types import SimpleNamespace

    return SimpleNamespace(
        round1=round1, round2=round2, round3=round3, round45=round45_full,
    )


def prove_async(rng, pk, witness_values, pub_inputs,
                ext_msg: bytes | None = None) -> PlonkProof:
    """Device-transcript prove: 4 programs, ONE host sync at the end.
    Byte-identical to prover.prove under the SolidityTranscript default."""
    import os

    from cap_tpu.plonk.transcript import SolidityTranscript

    n = pk.n
    p = FR.p
    engine = os.environ.get("CAP_MSM", "signed")
    A = _async_kernels(n, engine)
    srs = pk.srs
    tab = pv.signed_table(srs, n + 3)
    mxu = pv._mxu_pack(n)

    # prologue on host (all inputs known before proving)
    t = SolidityTranscript()
    t.begin_proof(pk.vk, pub_inputs, ext_msg)
    buf0 = jnp.asarray(np.frombuffer(t.buf, np.uint8).astype(np.uint32))
    state0 = jnp.zeros(64, jnp.uint32)

    # rng draws in the sync prover's order
    blinds1 = _mont_many([FR.rand(rng) for _ in range(10)]).reshape(5, 2, NLIMBS)
    blinds_z = _mont_many([FR.rand(rng) for _ in range(3)])

    if isinstance(witness_values, np.ndarray):
        wit_u16 = jnp.asarray(witness_values.astype(np.uint16, copy=False))
    else:
        wit_u16 = jnp.asarray(ints_to_limbs(witness_values).astype(np.uint16))
    wire_idx = getattr(pk, "wire_index_dev", None)
    if wire_idx is None:
        wire_idx = jnp.asarray(np.asarray(pk.wire_index, dtype=np.int32))
        pk.wire_index_dev = wire_idx
    pub_mont = jnp.asarray(ints_to_limbs([v % p for v in pub_inputs], FR))
    rows_tabs = getattr(pk, "_row_tables", None)
    if rows_tabs is None:
        rows_tabs = pv._kernels(n, None, engine).to_rows_tables(
            pk.sel_coset, pk.sigma_coset, pk.ks_x_coset, pk.l1_coset,
            pk.inv_zh_coset,
        )
        pk._row_tables = rows_tabs

    wire_evals, wire_ext, c1, buf, state, beta, gamma = A.round1(
        tab, wit_u16, wire_idx, blinds1, buf0, state0, mxu["intt_n"]
    )
    z_coeffs, c2, buf, state, alpha = A.round2(
        tab, wire_evals, pk.sigma_evals_dev, pk.ks_x_dev, beta, gamma,
        blinds_z, buf, state, mxu["intt_n"],
    )
    t_chunks, tail_ok, c3, buf, state, zeta = A.round3(
        tab, wire_ext, z_coeffs, pub_mont, *rows_tabs, alpha, beta, gamma,
        pv._row_consts_dev(n), buf, state, mxu["intt_n"], mxu["fwd_n"],
    )
    wire_ks_m = _mont_many([k % p for k in pk.wire_ks])
    evs_d, c5 = A.round45(
        tab, wire_ext, pk.sel_coeffs, pk.sigma_coeffs, z_coeffs, t_chunks,
        wire_ks_m, alpha, beta, gamma, zeta, buf, state,
    )

    # ONE sync: everything the proof needs
    c1h, c2h, c3h, evs, c5h, tail = jax.device_get(
        (c1, c2, c3, evs_d, c5, tail_ok)
    )
    if not bool(tail):
        from cap_tpu.errors import FailedConstraintSystemError

        raise FailedConstraintSystemError("witness does not satisfy the circuit")
    wire_comms = msg_mod.points_from_batch_result(c1h)
    z_comm = msg_mod.points_from_batch_result(c2h)[0]
    t_comms = msg_mod.points_from_batch_result(c3h)
    w_comms = msg_mod.points_from_batch_result(c5h)
    evi = limbs_to_ints(np.asarray(evs), FR)
    return PlonkProof(
        wire_comms=wire_comms,
        z_comm=z_comm,
        t_comms=t_comms,
        wire_evals=evi[:5],
        sigma_evals=evi[5:9],
        z_omega_eval=evi[10],
        w_zeta=w_comms[0],
        w_zeta_omega=w_comms[1],
    )
