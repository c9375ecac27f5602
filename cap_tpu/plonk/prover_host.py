"""Curve-generic host TurboPlonk prover/verifier.

Two jobs (VERDICT r2 item 6 / reference src/config.rs:25-84):
  * the **multi-curve CapConfig path**: proofs over BLS12-377 (and any
    future pairing curve) run through this host pipeline — the device
    kernels stay specialized to the production bn254 limb layout, exactly
    as the reference specializes its asm to one field at a time;
  * a **differential cross-check** for the device prover on bn254: same
    rounds, same algebra, independent implementation.

The algebra mirrors plonk/prover.py round for round (wire blinding at
(X^n - 1) multiples, grand-product z with 3 blinds, 8n-coset quotient,
linearization, suffix/synthetic-division openings) with plain Python ints
and an O(n log n) host NTT.  The transcript is a SolidityTranscript-style
byte buffer with fixed-width little-endian point encodings sized to the
curve's base field; prover and verifier here are self-consistent (no
cross-curve serialization parity is claimed — see utils/serde.py for the
arkworks bn254 layouts).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from cap_tpu.crypto.keccak import keccak256
from cap_tpu.fields.host import FR, PrimeField
from cap_tpu.plonk.circuit import SELECTORS, PlonkCircuit


# -- curve adapters -----------------------------------------------------------


@dataclass(frozen=True)
class HostCurve:
    name: str
    fr: PrimeField
    fq_bytes: int
    g1_gen: tuple
    g1_add: Callable
    g1_mul: Callable
    g1_neg: Callable
    g2_gen: object
    g2_mul: Callable
    pairing_check: Callable

    def point_bytes(self, pt) -> bytes:
        if pt is None:
            return b"\xff" * (2 * self.fq_bytes)
        x, y = pt
        return int(x).to_bytes(self.fq_bytes, "little") + int(y).to_bytes(
            self.fq_bytes, "little"
        )


def bn254_host_curve() -> HostCurve:
    from cap_tpu.crypto import bn254 as C

    return HostCurve(
        name="bn254", fr=FR, fq_bytes=32,
        g1_gen=C.G1_GEN, g1_add=C.g1_add, g1_mul=C.g1_mul, g1_neg=C.g1_neg,
        g2_gen=C.G2_GEN, g2_mul=C.g2_mul, pairing_check=C.pairing_check,
    )


def bls12_377_host_curve() -> HostCurve:
    from cap_tpu.crypto import bls12_377 as C
    from cap_tpu.fields.host import FR_BLS12_377

    def g2_mul(pt, k):
        return C.g2_mul(pt, k)

    return HostCurve(
        name="bls12_377", fr=FR_BLS12_377, fq_bytes=48,
        g1_gen=C.G1_GEN, g1_add=C.g1_add, g1_mul=C.g1_mul, g1_neg=C.g1_neg,
        g2_gen=C.G2_GEN, g2_mul=g2_mul, pairing_check=C.pairing_check,
    )


def bls12_381_host_curve() -> HostCurve:
    from cap_tpu.crypto import bls12_381 as C
    from cap_tpu.fields.host import FR_BLS12_381

    return HostCurve(
        name="bls12_381", fr=FR_BLS12_381, fq_bytes=48,
        g1_gen=C.G1_GEN, g1_add=C.g1_add, g1_mul=C.g1_mul, g1_neg=C.g1_neg,
        g2_gen=C.G2_GEN, g2_mul=C.g2_mul, pairing_check=C.pairing_check,
    )


# -- host NTT (iterative radix-2) ----------------------------------------------


def _fft(vals: list[int], omega: int, p: int) -> list[int]:
    n = len(vals)
    assert n & (n - 1) == 0
    a = list(vals)
    # bit-reversal permutation
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    length = 2
    while length <= n:
        wlen = pow(omega, n // length, p)
        for start in range(0, n, length):
            w = 1
            half = length // 2
            for k in range(start, start + half):
                u, v = a[k], a[k + half] * w % p
                a[k] = (u + v) % p
                a[k + half] = (u - v) % p
                w = w * wlen % p
        length <<= 1
    return a


def ntt_h(coeffs: list[int], n: int, omega: int, p: int) -> list[int]:
    c = list(coeffs) + [0] * (n - len(coeffs))
    return _fft(c, omega, p)


def intt_h(evals: list[int], n: int, omega: int, p: int) -> list[int]:
    inv = _fft(list(evals), pow(omega, -1, p), p)
    ninv = pow(n, -1, p)
    return [v * ninv % p for v in inv]


def coset_ntt_h(coeffs, n, omega, shift, p):
    s = 1
    scaled = []
    for c in list(coeffs) + [0] * (n - len(coeffs)):
        scaled.append(c * s % p)
        s = s * shift % p
    return _fft(scaled, omega, p)


def coset_intt_h(evals, n, omega, shift, p):
    c = intt_h(evals, n, omega, p)
    sinv = pow(shift, -1, p)
    s = 1
    out = []
    for v in c:
        out.append(v * s % p)
        s = s * sinv % p
    return out


# -- transcript ----------------------------------------------------------------


class _HostTranscript:
    """SolidityTranscript challenge scheme over a raw byte buffer."""

    def __init__(self):
        self.buf = b""
        self.state = b"\x00" * 64

    def append(self, data: bytes) -> None:
        self.buf += data

    def challenge(self, fr: PrimeField) -> int:
        h0 = keccak256(self.state + self.buf + b"\x00")
        h1 = keccak256(self.state + self.buf + b"\x01")
        self.state = h0 + h1
        return int.from_bytes(self.state[:48], "little") % fr.p


# -- SRS / keys ------------------------------------------------------------------


@dataclass
class HostSrs:
    curve: HostCurve
    g1_powers: list
    g2_tau: object

    @property
    def max_degree(self) -> int:
        return len(self.g1_powers) - 1


@dataclass
class HostVerifyingKey:
    curve: HostCurve
    n: int
    num_pub: int
    wire_ks: list
    selector_comms: dict
    sigma_comms: list
    g2_tau: object

    def digest_bytes(self) -> bytes:
        c = self.curve
        out = [
            self.n.to_bytes(8, "little"),
            self.num_pub.to_bytes(8, "little"),
        ]
        out += [int(k).to_bytes(c.fr.byte_len, "little") for k in self.wire_ks]
        out += [c.point_bytes(self.selector_comms[s]) for s in SELECTORS]
        out += [c.point_bytes(pt) for pt in self.sigma_comms]
        return b"".join(out)


@dataclass
class HostProvingKey:
    vk: HostVerifyingKey
    srs: HostSrs
    n: int
    omega: int
    wire_index: list
    wire_ks: list
    sel_coeffs: dict
    sigma_coeffs: list
    sigma_values: list


@dataclass
class HostProof:
    wire_comms: list
    z_comm: object
    t_comms: list
    wire_evals: list
    sigma_evals: list
    z_omega_eval: int
    w_zeta: object
    w_zeta_omega: object


def setup_host(max_degree: int, rng, curve: HostCurve) -> HostSrs:
    p = curve.fr.p
    tau = rng.randrange(p - 1) + 1
    powers = []
    acc = curve.g1_gen
    powers.append(curve.g1_gen)
    cur = tau
    # g^(tau^i) via per-power scalar mul (host scale; fine for CPU-suite n)
    for _ in range(max_degree):
        powers.append(curve.g1_mul(curve.g1_gen, cur))
        cur = cur * tau % p
    return HostSrs(curve, powers, curve.g2_mul(curve.g2_gen, tau))


def _commit(srs: HostSrs, coeffs: list[int]):
    c = srs.curve
    if c.name == "bn254":
        # threaded C++ bucket Pippenger (native/cap_native.cpp) — the other
        # curves keep the generic ladder (no 4x64 field context for them)
        from cap_tpu.utils import native

        r = native.g1_msm_pippenger(coeffs, srs.g1_powers[: len(coeffs)])
        if r is not NotImplemented:
            return r
    acc = None
    for i, v in enumerate(coeffs):
        if v % c.fr.p:
            acc = c.g1_add(acc, c.g1_mul(srs.g1_powers[i], v))
    return acc


def preprocess_host(srs: HostSrs, circuit: PlonkCircuit):
    curve = srs.curve
    p = curve.fr.p
    fin = circuit.finalize_for_arithmetization()
    n = fin.n
    if srs.max_degree < n + 2:
        raise ValueError(f"SRS degree {srs.max_degree} < required {n + 2}")
    omega = curve.fr.root_of_unity(n)
    sel_coeffs = {
        name: intt_h(fin.selectors[name], n, omega, p) for name in SELECTORS
    }
    sigma_coeffs = [intt_h(s, n, omega, p) for s in fin.sigma_values]
    selector_comms = {name: _commit(srs, sel_coeffs[name]) for name in SELECTORS}
    sigma_comms = [_commit(srs, sc) for sc in sigma_coeffs]
    vk = HostVerifyingKey(
        curve=curve, n=n, num_pub=fin.num_pub, wire_ks=list(fin.wire_ks),
        selector_comms=selector_comms, sigma_comms=sigma_comms,
        g2_tau=srs.g2_tau,
    )
    pk = HostProvingKey(
        vk=vk, srs=srs, n=n, omega=omega,
        wire_index=fin.wire_index, wire_ks=list(fin.wire_ks),
        sel_coeffs=sel_coeffs, sigma_coeffs=sigma_coeffs,
        sigma_values=fin.sigma_values,
    )
    return pk, vk


# -- prover ----------------------------------------------------------------------


def _poly_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


def prove_host(rng, pk: HostProvingKey, witness_values, pub_inputs,
               ext_msg: bytes | None = None) -> HostProof:
    curve = pk.srs.curve
    f = curve.fr
    p = f.p
    n = pk.n
    omega = pk.omega
    srs = pk.srs

    tr = _HostTranscript()
    if ext_msg is not None:
        tr.append(ext_msg)
    tr.append(pk.vk.digest_bytes())
    for v in pub_inputs:
        tr.append(int(v % p).to_bytes(f.byte_len, "little"))

    # round 1 — wire polynomials with (b0 X + b1)(X^n - 1) blinding
    wires = [[witness_values[i] % p for i in col] for col in pk.wire_index]
    wire_ext = []
    for j in range(5):
        coeffs = intt_h(wires[j], n, omega, p)
        b0, b1 = f.rand(rng), f.rand(rng)
        ext = coeffs + [0, 0]
        ext[0] = (ext[0] - b1) % p
        ext[1] = (ext[1] - b0) % p
        ext[n] = (ext[n] + b1) % p
        ext[n + 1] = (ext[n + 1] + b0) % p
        wire_ext.append(ext)
    wire_comms = [_commit(srs, w) for w in wire_ext]
    for c in wire_comms:
        tr.append(curve.point_bytes(c))
    beta = tr.challenge(f)
    gamma = tr.challenge(f)

    # round 2 — permutation grand product
    ks = pk.wire_ks
    xs = [1]
    for _ in range(n - 1):
        xs.append(xs[-1] * omega % p)
    z_vals = [1]
    for i in range(n - 1):
        num = den = 1
        for j in range(5):
            num = num * ((wires[j][i] + beta * ks[j] % p * xs[i] + gamma) % p) % p
            den = den * ((wires[j][i] + beta * pk.sigma_values[j][i] + gamma) % p) % p
        z_vals.append(z_vals[-1] * num % p * pow(den, -1, p) % p)
    zc = intt_h(z_vals, n, omega, p)
    b0, b1, b2 = f.rand(rng), f.rand(rng), f.rand(rng)
    zc = zc + [0, 0, 0]
    zc[0] = (zc[0] - b2) % p
    zc[1] = (zc[1] - b1) % p
    zc[2] = (zc[2] - b0) % p
    zc[n] = (zc[n] + b2) % p
    zc[n + 1] = (zc[n + 1] + b1) % p
    zc[n + 2] = (zc[n + 2] + b0) % p
    z_comm = _commit(srs, zc)
    tr.append(curve.point_bytes(z_comm))
    alpha = tr.challenge(f)

    # round 3 — quotient on the 8n coset
    m8 = 8 * n
    omega8 = f.root_of_unity(m8)
    g = f.multiplicative_generator()
    pubs_padded = [v % p for v in pub_inputs] + [0] * (n - len(pub_inputs))
    pi_coeffs = intt_h(pubs_padded, n, omega, p)

    w8 = [coset_ntt_h(w, m8, omega8, g, p) for w in wire_ext]
    z8 = coset_ntt_h(zc, m8, omega8, g, p)
    zw8 = z8[8:] + z8[:8]
    pi8 = coset_ntt_h(pi_coeffs, m8, omega8, g, p)
    sel8 = {name: coset_ntt_h(pk.sel_coeffs[name], m8, omega8, g, p)
            for name in SELECTORS}
    sig8 = [coset_ntt_h(sc, m8, omega8, g, p) for sc in pk.sigma_coeffs]

    xs8 = [1]
    for _ in range(m8 - 1):
        xs8.append(xs8[-1] * omega8 % p)
    xs8 = [g * x % p for x in xs8]
    gn = pow(g, n, p)
    zeta8n = pow(omega8, n, p)
    zh8 = [(gn * pow(zeta8n, i, p) - 1) % p for i in range(8)]
    inv_zh8 = [pow(v, -1, p) for v in zh8]
    n_inv = pow(n, -1, p)
    alpha2 = alpha * alpha % p

    t8 = []
    for i in range(m8):
        w = [w8[j][i] for j in range(5)]
        gate = (
            sel8["lc0"][i] * w[0] + sel8["lc1"][i] * w[1]
            + sel8["lc2"][i] * w[2] + sel8["lc3"][i] * w[3]
            + sel8["mul0"][i] * (w[0] * w[1] % p)
            + sel8["mul1"][i] * (w[2] * w[3] % p)
            + sel8["hash0"][i] * pow(w[0], 5, p)
            + sel8["hash1"][i] * pow(w[1], 5, p)
            + sel8["hash2"][i] * pow(w[2], 5, p)
            + sel8["hash3"][i] * pow(w[3], 5, p)
            + sel8["ecc"][i] * (w[0] * w[1] % p * w[2] % p * w[3] % p * w[4] % p)
            + sel8["c"][i]
            - sel8["o"][i] * w[4]
            + pi8[i]
        ) % p
        fnum = gden = 1
        for j in range(5):
            fnum = fnum * ((w[j] + beta * ks[j] % p * xs8[i] + gamma) % p) % p
            gden = gden * ((w[j] + beta * sig8[j][i] + gamma) % p) % p
        perm = (z8[i] * fnum - zw8[i] * gden) % p
        l1 = zh8[i % 8] * n_inv % p * pow((xs8[i] - 1) % p, -1, p) % p
        F_ = (gate + alpha * perm + alpha2 * ((z8[i] - 1) % p) * l1) % p
        t8.append(F_ * inv_zh8[i % 8] % p)
    tc = coset_intt_h(t8, m8, omega8, g, p)
    assert all(v == 0 for v in tc[5 * (n + 2):]), "unsatisfied circuit"
    t_chunks = [tc[k * (n + 2): (k + 1) * (n + 2)] for k in range(5)]
    t_comms = [_commit(srs, c) for c in t_chunks]
    for c in t_comms:
        tr.append(curve.point_bytes(c))
    zeta = tr.challenge(f)

    # round 4 — evaluations
    wire_evs = [_poly_eval(w, zeta, p) for w in wire_ext]
    sig_evs = [_poly_eval(sc, zeta, p) for sc in pk.sigma_coeffs[:4]]
    zw_pt = zeta * omega % p
    z_omega_eval = _poly_eval(zc, zw_pt, p)
    for v in wire_evs + sig_evs + [z_omega_eval]:
        tr.append(int(v).to_bytes(f.byte_len, "little"))
    v_ch = tr.challenge(f)

    # round 5 — linearization + batched openings
    abar = wire_evs
    zh_zeta = (pow(zeta, n, p) - 1) % p
    l1_zeta = zh_zeta * pow(n * (zeta - 1) % p, -1, p) % p
    f_zeta = 1
    for j in range(5):
        f_zeta = f_zeta * ((abar[j] + beta * ks[j] % p * zeta + gamma) % p) % p
    pi3 = 1
    for j in range(4):
        pi3 = pi3 * ((abar[j] + beta * sig_evs[j] + gamma) % p) % p
    gate_coeffs = {
        "lc0": abar[0], "lc1": abar[1], "lc2": abar[2], "lc3": abar[3],
        "mul0": abar[0] * abar[1] % p, "mul1": abar[2] * abar[3] % p,
        "hash0": pow(abar[0], 5, p), "hash1": pow(abar[1], 5, p),
        "hash2": pow(abar[2], 5, p), "hash3": pow(abar[3], 5, p),
        "ecc": abar[0] * abar[1] % p * abar[2] % p * abar[3] % p * abar[4] % p,
        "c": 1, "o": (p - abar[4]) % p,
    }
    m_r = n + 3
    r_poly = [0] * m_r
    def _acc(poly, s):
        for i, c in enumerate(poly):
            r_poly[i] = (r_poly[i] + s * c) % p
    for name in SELECTORS:
        _acc(pk.sel_coeffs[name], gate_coeffs[name])
    _acc(zc, (alpha * f_zeta + alpha2 * l1_zeta) % p)
    _acc(pk.sigma_coeffs[4], (p - alpha * beta % p * z_omega_eval % p * pi3 % p) % p)
    for k_i in range(5):
        _acc(t_chunks[k_i], (p - zh_zeta * pow(zeta, k_i * (n + 2), p)) % p)

    q_poly = list(r_poly)
    vp = 1
    open_polys = [w + [0] for w in wire_ext] + [
        sc + [0] * (m_r - len(sc)) for sc in pk.sigma_coeffs[:4]
    ]
    for poly in open_polys:
        vp = vp * v_ch % p
        for i, c in enumerate(poly):
            q_poly[i] = (q_poly[i] + vp * c) % p

    def _open_at(poly, pt):
        """(poly(X) - poly(pt)) / (X - pt) by synthetic division."""
        out = [0] * (len(poly) - 1)
        acc = 0
        for i in range(len(poly) - 1, 0, -1):
            acc = (acc * pt + poly[i]) % p
            out[i - 1] = acc
        return out

    w_zeta_poly = _open_at(q_poly, zeta)
    w_zw_poly = _open_at(zc + [0] * (m_r - len(zc)), zw_pt)
    w_zeta = _commit(srs, w_zeta_poly)
    w_zeta_omega = _commit(srs, w_zw_poly)
    tr.append(curve.point_bytes(w_zeta))
    tr.append(curve.point_bytes(w_zeta_omega))
    tr.challenge(f)  # u, symmetry with the verifier

    return HostProof(
        wire_comms=wire_comms, z_comm=z_comm, t_comms=t_comms,
        wire_evals=wire_evs, sigma_evals=sig_evs, z_omega_eval=z_omega_eval,
        w_zeta=w_zeta, w_zeta_omega=w_zeta_omega,
    )


# -- verifier ----------------------------------------------------------------------


def verify_host(vk: HostVerifyingKey, pub_inputs, proof: HostProof,
                ext_msg: bytes | None = None) -> bool:
    curve = vk.curve
    f = curve.fr
    p = f.p
    n = vk.n
    if len(pub_inputs) != vk.num_pub:
        return False
    omega = f.root_of_unity(n)

    tr = _HostTranscript()
    if ext_msg is not None:
        tr.append(ext_msg)
    tr.append(vk.digest_bytes())
    for v in pub_inputs:
        tr.append(int(v % p).to_bytes(f.byte_len, "little"))
    for c in proof.wire_comms:
        tr.append(curve.point_bytes(c))
    beta = tr.challenge(f)
    gamma = tr.challenge(f)
    tr.append(curve.point_bytes(proof.z_comm))
    alpha = tr.challenge(f)
    for c in proof.t_comms:
        tr.append(curve.point_bytes(c))
    zeta = tr.challenge(f)
    for v in proof.wire_evals + proof.sigma_evals + [proof.z_omega_eval]:
        tr.append(int(v).to_bytes(f.byte_len, "little"))
    v_ch = tr.challenge(f)
    tr.append(curve.point_bytes(proof.w_zeta))
    tr.append(curve.point_bytes(proof.w_zeta_omega))
    u = tr.challenge(f)

    zh_zeta = (pow(zeta, n, p) - 1) % p
    if zh_zeta == 0:
        return False
    l1_zeta = zh_zeta * pow(n * (zeta - 1) % p, -1, p) % p
    # PI(zeta)
    pi_zeta = 0
    w_pow = 1
    n_inv = pow(n, -1, p)
    for v in pub_inputs:
        pi_zeta = (pi_zeta + v * zh_zeta % p * n_inv % p * w_pow % p
                   * pow((zeta - w_pow) % p, -1, p)) % p
        w_pow = w_pow * omega % p

    abar = proof.wire_evals
    sbar = proof.sigma_evals
    zw = proof.z_omega_eval
    alpha2 = alpha * alpha % p
    f_zeta = 1
    for j in range(5):
        f_zeta = f_zeta * ((abar[j] + beta * vk.wire_ks[j] % p * zeta + gamma) % p) % p
    pi3 = 1
    for j in range(4):
        pi3 = pi3 * ((abar[j] + beta * sbar[j] + gamma) % p) % p
    r0 = (pi_zeta - alpha2 * l1_zeta - alpha * zw % p * pi3 % p
          * ((abar[4] + gamma) % p)) % p
    r_eval = (p - r0) % p

    gate_coeffs = {
        "lc0": abar[0], "lc1": abar[1], "lc2": abar[2], "lc3": abar[3],
        "mul0": abar[0] * abar[1] % p, "mul1": abar[2] * abar[3] % p,
        "hash0": pow(abar[0], 5, p), "hash1": pow(abar[1], 5, p),
        "hash2": pow(abar[2], 5, p), "hash3": pow(abar[3], 5, p),
        "ecc": abar[0] * abar[1] % p * abar[2] % p * abar[3] % p * abar[4] % p,
        "c": 1, "o": (p - abar[4]) % p,
    }
    r_comm = None
    for name in SELECTORS:
        r_comm = curve.g1_add(r_comm, curve.g1_mul(vk.selector_comms[name], gate_coeffs[name]))
    r_comm = curve.g1_add(r_comm, curve.g1_mul(proof.z_comm, (alpha * f_zeta + alpha2 * l1_zeta) % p))
    r_comm = curve.g1_add(r_comm, curve.g1_mul(vk.sigma_comms[4], (p - alpha * beta % p * zw % p * pi3 % p) % p))
    for k_i in range(5):
        r_comm = curve.g1_add(
            r_comm,
            curve.g1_mul(proof.t_comms[k_i], (p - zh_zeta * pow(zeta, k_i * (n + 2), p)) % p),
        )

    v_pows = [pow(v_ch, i, p) for i in range(10)]
    open_comms = [r_comm] + proof.wire_comms + vk.sigma_comms[:4]
    open_evals = [r_eval] + abar + sbar
    f_comm = None
    for c, vp in zip(open_comms, v_pows):
        f_comm = curve.g1_add(f_comm, curve.g1_mul(c, vp))
    f_comm = curve.g1_add(f_comm, curve.g1_mul(proof.z_comm, u))
    e_scalar = (sum(vp * e for vp, e in zip(v_pows, open_evals)) + u * zw) % p

    a_pt = curve.g1_add(proof.w_zeta, curve.g1_mul(proof.w_zeta_omega, u))
    b_pt = curve.g1_add(
        curve.g1_add(
            curve.g1_mul(proof.w_zeta, zeta),
            curve.g1_mul(proof.w_zeta_omega, u * zeta % p * omega % p),
        ),
        curve.g1_add(f_comm, curve.g1_neg(curve.g1_mul(curve.g1_gen, e_scalar))),
    )
    return curve.pairing_check(
        [(a_pt, vk.g2_tau), (curve.g1_neg(b_pt), curve.g2_gen)]
    )
