"""Single-program TurboPlonk prover: all 5 rounds + Fiat–Shamir on device.

The round-by-round prover (prover.prove) pays a host↔device round trip
(~28 ms on this runtime) per transcript round — the commit points must
reach the host to be Keccak-hashed before the next round's challenge
exists.  Here the ENTIRE prove is one jitted XLA program:

  witness/blinds upload → r1 wires+commit → [device keccak] beta,gamma →
  r2 z+commit → alpha → r3 quotient+commit → zeta → r4 evals → v →
  r5 linearization+openings+commit → one transfer of (13 affine points,
  10 evaluations, tail_ok) back to the host.

The transcript twin hashes the exact byte stream of plonk/transcript.py
(word-aligned layout) with crypto/keccak_jax.py, so fused proofs are
BYTE-IDENTICAL to round-by-round proofs for the same rng — that equality
is the regression test (tests/test_keccak_device.py).

Commit points are normalized to affine on device (one batched Montgomery
inversion per commit batch) because the transcript absorbs affine bytes.

Single-device only: with a prover mesh installed, prover.prove keeps the
round-by-round path (collectives + in-program transcript composition is
round-4 work).  Reference role: jf-plonk's prove hot loop
(SURVEY.md §3.1 bottom box).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from cap_tpu.crypto.keccak_jax import keccak256_words
from cap_tpu.fields.host import FR, NLIMBS
from cap_tpu.ops import field_jax as fj
from cap_tpu.ops import msm_signed as msg_mod
from cap_tpu.ops.limbs import ints_to_limbs
from cap_tpu.plonk import srs as srs_mod
from cap_tpu.plonk.circuit import SELECTORS


def _w(v: int):
    return jnp.uint32(v & 0xFFFFFFFF)


def _label_words(label: bytes):
    """Static words for len(label) || label zero-padded to 4 bytes."""
    pad = label + b"\x00" * ((-len(label)) % 4)
    ws = [_w(int.from_bytes(pad[i : i + 4], "little")) for i in range(0, len(pad), 4)]
    return [_w(len(label))] + ws


def _limbs_to_words(x):
    """[..., 16] u32 16-bit limbs -> list of 8 scalar u32 words per element,
    elements flattened in C order."""
    flat = x.reshape(-1, NLIMBS)
    out = []
    for i in range(flat.shape[0]):
        e = flat[i]
        for j in range(0, NLIMBS, 2):
            out.append(e[j] | (e[j + 1] << np.uint32(16)))
    return out


def _words_to_limbs(words):
    """8 scalar u32 words -> [16] u32 16-bit limb array."""
    limbs = []
    for w_ in words:
        limbs.append(w_ & np.uint32(0xFFFF))
        limbs.append(w_ >> np.uint32(16))
    return jnp.stack(limbs)


class DeviceTranscript:
    """Word-stream twin of plonk.transcript.Transcript (same byte layout)."""

    def __init__(self, init_state_words):
        self.state = list(init_state_words)

    def append_words(self, label: bytes, words, byte_len: int):
        msg = (
            self.state
            + _label_words(label)
            + [_w(byte_len)]
            + list(words)
        )
        self.state = keccak256_words(msg)

    def _tagged(self, tag: int, label: bytes):
        return self.state + [_w(tag)] + _label_words(label)

    def challenge_mont(self, label: bytes, ctx=None):
        """Draw a challenge; returns its Montgomery [16] limb form."""
        ctx = ctx or fj.FR_CTX
        h1 = keccak256_words(self._tagged(1, label))
        h2 = keccak256_words(self._tagged(2, label))
        self.state = keccak256_words(self._tagged(3, label))
        lo = _words_to_limbs(h1)                      # value v_lo < 2^256
        hi_words = list(h2[:4]) + [_w(0)] * 4
        hi = _words_to_limbs(hi_words)                # value v_hi < 2^128
        r2 = _r2_const(ctx.name, ctx.p_int)
        # v = v_lo + v_hi * 2^256;  v*R = mm(lo, R2) + mm(mm(hi, R2), R2)
        lo_m = fj.mont_mul(lo, r2, ctx)
        hi_m = fj.mont_mul(fj.mont_mul(hi, r2, ctx), r2, ctx)
        return fj.add(lo_m, hi_m, ctx)


@lru_cache(maxsize=None)
def _r2_const_np(name: str, p: int):
    return ints_to_limbs([pow(2, 512, p)])[0]


def _r2_const(name: str, p: int):
    # per-trace jnp conversion (a cached traced constant would leak scopes)
    return jnp.asarray(_r2_const_np(name, p))


def _mont(v: int, ctx=None):
    ctx = ctx or fj.FR_CTX
    p = ctx.p_int
    r = pow(2, 256, p)
    return jnp.asarray(ints_to_limbs([v * r % p])[0])


def _points_to_affine_words(res, ctx=None):
    """[k, 3, 16] canonical projective Montgomery points -> (words, plain
    affine x/y limb arrays, infinity mask).

    One batched inversion across the k z-coordinates; infinity lanes
    encode as 64 zero bytes (matching transcript._encode_g1)."""
    ctx = ctx or fj.FQ_CTX
    x, y, z = res[:, 0], res[:, 1], res[:, 2]
    inf = fj.is_zero(z)                              # [k]
    z_safe = fj.select(~inf, z, fj.one_mont(z.shape[:-1], ctx))
    zi = fj.batch_inv_nonzero(z_safe, ctx)
    ax = fj.from_mont(fj.mont_mul(x, zi, ctx), ctx)
    ay = fj.from_mont(fj.mont_mul(y, zi, ctx), ctx)
    zero = jnp.zeros_like(ax)
    ax = jnp.where(inf[:, None], zero, ax)
    ay = jnp.where(inf[:, None], zero, ay)
    k = res.shape[0]
    words = []
    for i in range(k):
        words += _limbs_to_words(ax[i])
        words += _limbs_to_words(ay[i])
    return words, ax, ay, inf


def _commit(srs_tab, coeffs_plain):
    """[k, m, 16] plain coeffs -> [k, 3, 16] canonical projective points."""
    padded = srs_mod._pad_coeffs_batch(coeffs_plain, srs_tab.shape[1])
    return msg_mod.msm_signed_commit_device(srs_tab, padded)


def build_fused_prove(pk, ext_byte_len: int | None, mxu):
    """Build the single-program prove function for a proving key.

    ext_byte_len: length of the extra transcript message (None = absent);
    part of the trace signature.  Returns fn(wit_u16, wire_idx, blinds1,
    blinds_z, pub_plain, vk_words, ext_words, tab, *pk_arrays) ->
    (ax, ay, inf, wire_evs, sig_evs, z_om, tail_ok) — everything the host
    needs to assemble the PlonkProof in ONE transfer.
    """
    from cap_tpu.plonk import prover as pv

    n = pk.n
    K = pv._kernels(n)
    p = FR.p
    omega = pk.domain.omega
    wire_ks = list(pk.wire_ks)
    npub = pk.num_pub

    # transcript init state (constant): keccak256(pad4(init label))
    from cap_tpu.plonk.transcript import Transcript

    init_state = np.frombuffer(Transcript().state, dtype="<u4")
    init_words = [_w(int(v)) for v in init_state]

    one_m = _mont(1)
    omega_m = _mont(omega)
    ks_m = [_mont(k_) for k_ in wire_ks]

    def fn(wit_u16, wire_idx, blinds1, blinds_z, pub_plain, vk_words,
           ext_words, tab, sel_coeffs, sigma_coeffs, sigma_evals_dev,
           ks_x_dev, sel_coset, sigma_coset, ks_x_coset, l1_coset,
           inv_zh_coset):
        FRC = fj.FR_CTX
        mm = lambda a, b: fj.mont_mul(a, b, FRC)

        tr = DeviceTranscript(init_words)
        tr.append_words(b"vk", list(vk_words), 32)
        tr.append_words(b"pub", _limbs_to_words(pub_plain), 32 * npub)
        if ext_byte_len is not None:
            tr.append_words(b"ext", list(ext_words), ext_byte_len)

        # round 1 — wires
        wire_evals = K.gather_phase(wit_u16, wire_idx)
        wire_ext, wire_plain = K.wires_phase(wire_evals, blinds1, mxu["intt_n"])
        wire_res = _commit(tab, wire_plain)
        wwords, wax, way, winf = _points_to_affine_words(wire_res)
        tr.append_words(b"wires", wwords, 64 * 5)
        beta = tr.challenge_mont(b"beta")
        gamma = tr.challenge_mont(b"gamma")

        # round 2 — permutation grand product
        z_coeffs, z_plain = K.z_phase(
            wire_evals, sigma_evals_dev, ks_x_dev, beta, gamma, blinds_z,
            mxu["intt_n"],
        )
        z_res = _commit(tab, z_plain[None])
        zwords, zax, zay, zinf = _points_to_affine_words(z_res)
        tr.append_words(b"z", zwords, 64)
        alpha = tr.challenge_mont(b"alpha")

        # round 3 — quotient
        pub_mont = fj.to_mont(pub_plain, FRC)
        t_chunks, t_plain, tail_ok = K.quotient_phase(
            wire_ext, z_coeffs, pub_mont,
            sel_coset, sigma_coset, ks_x_coset, l1_coset, inv_zh_coset,
            alpha, beta, gamma,
            mxu["intt_n"], mxu["cos8_fwd"], mxu["cos8_inv"],
        )
        t_res = _commit(tab, t_plain)
        twords, tax, tay, tinf = _points_to_affine_words(t_res)
        tr.append_words(b"t", twords, 64 * 5)
        zeta = tr.challenge_mont(b"zeta")

        # round 4 — evaluations
        zw = mm(zeta, omega_m)
        evs_d = K.evals_phase(wire_ext, sigma_coeffs, z_coeffs, zeta, zw)
        wire_evs_d, sig_evs_d, z_om_d = evs_d[:5], evs_d[5:10], evs_d[10]
        wire_evs_p = fj.from_mont(wire_evs_d, FRC)          # [5,16] plain
        sig_evs_p = fj.from_mont(sig_evs_d[:4], FRC)        # [4,16]
        z_om_p = fj.from_mont(z_om_d, FRC)                  # [16]
        ew = (
            _limbs_to_words(wire_evs_p)
            + _limbs_to_words(sig_evs_p)
            + _limbs_to_words(z_om_p)
        )
        tr.append_words(b"evals", ew, 32 * 10)
        v = tr.challenge_mont(b"v")

        # round 5 — linearization + openings (host scalar math -> device)
        abar = [wire_evs_d[j] for j in range(5)]
        sbar = [sig_evs_d[j] for j in range(4)]
        zeta_n = fj.pow_const(zeta, n, FRC)
        zh_zeta = fj.sub(zeta_n, one_m, FRC)
        n_inv_m = _mont(pow(n, -1, p))
        l1_den = fj.sub(zeta, one_m, FRC)
        l1_zeta = mm(mm(zh_zeta, n_inv_m), fj.inv(l1_den[None], FRC)[0])
        f_zeta = one_m
        for j in range(5):
            term = fj.add(fj.add(abar[j], mm(mm(beta, ks_m[j]), zeta), FRC), gamma, FRC)
            f_zeta = mm(f_zeta, term)
        pi3 = one_m
        for j in range(4):
            term = fj.add(fj.add(abar[j], mm(beta, sbar[j]), FRC), gamma, FRC)
            pi3 = mm(pi3, term)
        alpha2 = fj.mont_sqr(alpha, FRC)

        gate = {
            "lc0": abar[0], "lc1": abar[1], "lc2": abar[2], "lc3": abar[3],
            "mul0": mm(abar[0], abar[1]), "mul1": mm(abar[2], abar[3]),
            "hash0": fj.pow_const(abar[0], 5, FRC),
            "hash1": fj.pow_const(abar[1], 5, FRC),
            "hash2": fj.pow_const(abar[2], 5, FRC),
            "hash3": fj.pow_const(abar[3], 5, FRC),
            "ecc": mm(mm(mm(mm(abar[0], abar[1]), abar[2]), abar[3]), abar[4]),
            "c": one_m,
            "o": fj.neg(abar[4], FRC),
        }
        m_r = n + 3
        polys = [pv.srs_pad(sel_coeffs[i], m_r) for i in range(13)]
        scalars = [gate[name] for name in SELECTORS]
        polys.append(pv.srs_pad(z_coeffs, m_r))
        scalars.append(fj.add(mm(alpha, f_zeta), mm(alpha2, l1_zeta), FRC))
        polys.append(pv.srs_pad(sigma_coeffs[4], m_r))
        scalars.append(fj.neg(mm(mm(mm(alpha, beta), z_om_d), pi3), FRC))
        zeta_n2 = fj.pow_const(zeta, n + 2, FRC)
        zk = zh_zeta
        for k_i in range(5):
            scalars.append(fj.neg(zk, FRC))
            polys.append(pv.srs_pad(t_chunks[k_i], m_r))
            zk = mm(zk, zeta_n2)
        r_poly = K.lincomb(jnp.stack(polys), jnp.stack(scalars))

        open_polys = [r_poly] + [pv.srs_pad(wire_ext[j], m_r) for j in range(5)] + [
            pv.srs_pad(sigma_coeffs[j], m_r) for j in range(4)
        ]
        v_pows = [fj.one_mont((), FRC)]
        for _ in range(9):
            v_pows.append(mm(v_pows[-1], v))
        q_poly = K.lincomb(jnp.stack(open_polys), jnp.stack(v_pows))

        zeta_inv = fj.inv(zeta[None], FRC)[0]
        zw_inv = fj.inv(zw[None], FRC)[0]
        w_zeta_c, w_zeta_plain = K.open_phase(q_poly, zeta, zeta_inv)
        w_om_c, w_om_plain = K.open_phase(pv.srs_pad(z_coeffs, m_r), zw, zw_inv)
        w_res = _commit(tab, jnp.stack([w_zeta_plain, w_om_plain]))
        wwords2, w2ax, w2ay, w2inf = _points_to_affine_words(w_res)
        tr.append_words(b"w", wwords2, 64 * 2)
        # (the u challenge is verifier-side only; state is discarded here)

        ax = jnp.concatenate([wax, zax, tax, w2ax], axis=0)    # [13,16]
        ay = jnp.concatenate([way, zay, tay, w2ay], axis=0)
        inf = jnp.concatenate([winf, zinf, tinf, w2inf], axis=0)
        return (
            ax, ay, inf,
            wire_evs_p, sig_evs_p, z_om_p,
            tail_ok,
        )

    return jax.jit(fn)


def prove_fused(rng, pk, witness_values, pub_inputs, ext_msg: bytes | None = None):
    """Drop-in for prover.prove (single device, no mesh): same rng stream,
    byte-identical proofs."""
    from cap_tpu.crypto.keccak_jax import bytes_to_words
    from cap_tpu.ops.limbs import limbs_to_int, limbs_to_ints
    from cap_tpu.plonk import prover as pv
    from cap_tpu.plonk.structs import PlonkProof

    n = pk.n
    srs = pk.srs
    p = FR.p
    mxu = pv._mxu_pack(n)
    tab = pv.signed_table(srs, n + 3)

    cache = getattr(pk, "_fused_fns", None)
    if cache is None:
        cache = pk._fused_fns = {}
    key = None if ext_msg is None else len(ext_msg)
    fn = cache.get(key)
    if fn is None:
        fn = build_fused_prove(pk, key, mxu)
        cache[key] = fn

    if isinstance(witness_values, np.ndarray):
        wit_u16 = jnp.asarray(witness_values.astype(np.uint16, copy=False))
    else:
        wit_u16 = jnp.asarray(ints_to_limbs(witness_values).astype(np.uint16))
    wire_idx = getattr(pk, "wire_index_dev", None)
    if wire_idx is None:
        wire_idx = jnp.asarray(np.asarray(pk.wire_index, dtype=np.int32))
        pk.wire_index_dev = wire_idx

    blinds1 = jnp.asarray(
        ints_to_limbs([FR.rand(rng) for _ in range(10)], FR)
    ).reshape(5, 2, NLIMBS)
    blinds_z = jnp.asarray(ints_to_limbs([FR.rand(rng) for _ in range(3)], FR))
    pub_plain = jnp.asarray(ints_to_limbs([v % p for v in pub_inputs]))
    vk_words = jnp.asarray(
        np.frombuffer(pk.vk.digest(), dtype="<u4").astype(np.uint32)
    )
    if ext_msg is None:
        ext_words = jnp.zeros((0,), jnp.uint32)
    else:
        ext_words = jnp.stack(bytes_to_words(ext_msg)) if ext_msg else jnp.zeros(
            (0,), jnp.uint32
        )

    ax, ay, inf, wevs, sevs, zom, tail_ok = fn(
        wit_u16, wire_idx, blinds1, blinds_z, pub_plain, vk_words, ext_words,
        tab, pk.sel_coeffs, pk.sigma_coeffs, pk.sigma_evals_dev,
        pk.ks_x_dev, pk.sel_coset, pk.sigma_coset, pk.ks_x_coset,
        pk.l1_coset, pk.inv_zh_coset,
    )
    # ONE host sync for everything
    ax_h = np.asarray(ax)
    ay_h = np.asarray(ay)
    inf_h = np.asarray(inf)
    wevs_h = limbs_to_ints(np.asarray(wevs))
    sevs_h = limbs_to_ints(np.asarray(sevs))
    zom_h = limbs_to_int(np.asarray(zom))
    if not bool(np.asarray(tail_ok)):
        from cap_tpu.errors import FailedConstraintSystemError

        raise FailedConstraintSystemError("witness does not satisfy the circuit")

    xs = limbs_to_ints(ax_h)
    ys = limbs_to_ints(ay_h)
    pts = [
        None if inf_h[i] else (xs[i], ys[i]) for i in range(13)
    ]
    return PlonkProof(
        wire_comms=pts[0:5],
        z_comm=pts[5],
        t_comms=pts[6:11],
        wire_evals=wevs_h,
        sigma_evals=sevs_h,
        z_omega_eval=zom_h,
        w_zeta=pts[11],
        w_zeta_omega=pts[12],
    )
