"""TurboPlonk verifier and batch verifier (host-side).

Verification is a handful of G1 scalar muls plus two pairings — host Python
is plenty; batch verification folds many proofs into ONE multi-pairing with
random coefficients, the amortization `txn_batch_verify` relies on
(reference src/lib.rs:455-529, SURVEY.md §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.bn254 import (
    G1_GEN,
    g1_add,
    g1_mul,
    g1_neg,
    pairing_check,
)
from cap_tpu.fields.host import FR
from cap_tpu.plonk.circuit import SELECTORS
from cap_tpu.plonk.prover import eval_pub_poly
from cap_tpu.plonk.structs import PlonkProof, VerifyingKey
from cap_tpu.plonk.transcript import new_transcript
from cap_tpu.ops.ntt import get_domain


@dataclass
class _PairingAccumulator:
    """One proof reduced to the KZG check e(A, [tau]_2) == e(B, [1]_2)."""

    a: tuple
    b: tuple


def _prepare(vk: VerifyingKey, pub_inputs, proof: PlonkProof, ext_msg):
    """Replay the transcript and fold the proof into a pairing accumulator."""
    p = FR.p
    n = vk.n
    if len(pub_inputs) != vk.num_pub:
        raise ValueError("public input length mismatch")

    tr = new_transcript()
    tr.begin_proof(vk, pub_inputs, ext_msg)
    tr.append_points(b"wires", proof.wire_comms)
    beta = tr.challenge(b"beta")
    gamma = tr.challenge(b"gamma")
    tr.append_point(b"z", proof.z_comm)
    alpha = tr.challenge(b"alpha")
    tr.append_points(b"t", proof.t_comms)
    zeta = tr.challenge(b"zeta")
    tr.append_scalars(
        b"evals", proof.wire_evals + proof.sigma_evals + [proof.z_omega_eval]
    )
    v = tr.challenge(b"v")
    tr.append_points(b"w", [proof.w_zeta, proof.w_zeta_omega])
    u = tr.challenge(b"u")

    domain = get_domain(n)
    omega = domain.omega
    zh_zeta = (pow(zeta, n, p) - 1) % p
    if zh_zeta == 0:
        raise ValueError("zeta landed in the evaluation domain")
    l1_zeta = zh_zeta * pow(n * (zeta - 1) % p, -1, p) % p
    pi_zeta = eval_pub_poly(pub_inputs, zeta, domain)

    abar = proof.wire_evals
    sbar = proof.sigma_evals
    zw = proof.z_omega_eval
    alpha2 = alpha * alpha % p

    f_zeta = 1
    for j in range(5):
        f_zeta = f_zeta * ((abar[j] + beta * vk.wire_ks[j] * zeta + gamma) % p) % p
    pi3 = 1
    for j in range(4):
        pi3 = pi3 * ((abar[j] + beta * sbar[j] + gamma) % p) % p

    r0 = (
        pi_zeta
        - alpha2 * l1_zeta
        - alpha * zw % p * pi3 % p * ((abar[4] + gamma) % p)
    ) % p
    r_eval = (p - r0) % p

    # [r] = sum(scalar_i * [poly_i])
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
        r_comm = g1_add(r_comm, g1_mul(vk.selector_comms[name], gate_coeffs[name]))
    r_comm = g1_add(
        r_comm, g1_mul(proof.z_comm, (alpha * f_zeta + alpha2 * l1_zeta) % p)
    )
    r_comm = g1_add(
        r_comm,
        g1_mul(
            vk.sigma_comms[4],
            (p - alpha * beta % p * zw % p * pi3 % p) % p,
        ),
    )
    for k_i in range(5):
        r_comm = g1_add(
            r_comm,
            g1_mul(proof.t_comms[k_i], (p - zh_zeta * pow(zeta, k_i * (n + 2), p)) % p),
        )

    # batched-opening commitment F and scalar E
    v_pows = [pow(v, i, p) for i in range(10)]
    open_comms = [r_comm] + proof.wire_comms + vk.sigma_comms[:4]
    open_evals = [r_eval] + abar + sbar
    f_comm = None
    for vp, c in zip(v_pows, open_comms):
        f_comm = g1_add(f_comm, g1_mul(c, vp))
    f_comm = g1_add(f_comm, g1_mul(proof.z_comm, u))
    e_scalar = (sum(vp * e for vp, e in zip(v_pows, open_evals)) + u * zw) % p

    # e(W + u*Ww, [tau]_2) == e(zeta*W + u*zeta*omega*Ww + F - E*G, [1]_2)
    a_pt = g1_add(proof.w_zeta, g1_mul(proof.w_zeta_omega, u))
    b_pt = g1_add(
        g1_add(
            g1_mul(proof.w_zeta, zeta),
            g1_mul(proof.w_zeta_omega, u * zeta % p * omega % p),
        ),
        g1_add(f_comm, g1_neg(g1_mul(G1_GEN, e_scalar))),
    )
    return _PairingAccumulator(a=a_pt, b=b_pt)


def verify(vk: VerifyingKey, pub_inputs, proof: PlonkProof, ext_msg: bytes | None = None) -> bool:
    try:
        acc = _prepare(vk, pub_inputs, proof, ext_msg)
    except (ValueError, AssertionError):
        return False
    return pairing_check(
        [(acc.a, vk.g2_tau), (g1_neg(acc.b), vk.g2_gen)]
    )


def batch_verify(vks, pub_inputs_list, proofs, ext_msgs=None) -> bool:
    """Fold many proofs into one 2-pairing check with random coefficients.

    `PlonkKzgSnark::batch_verify` twin (reference src/lib.rs:517-522).
    """
    m = len(proofs)
    if not (len(vks) == len(pub_inputs_list) == m):
        raise ValueError("batch_verify arg length mismatch")
    if ext_msgs is None:
        ext_msgs = [None] * m
    if len(ext_msgs) != m:
        raise ValueError("batch_verify arg length mismatch")
    if m == 0:
        return True
    accs = []
    g2_tau = vks[0].g2_tau
    g2_gen = vks[0].g2_gen
    for vk, pis, proof, ext in zip(vks, pub_inputs_list, proofs, ext_msgs):
        if vk.g2_tau != g2_tau:
            raise ValueError("batch_verify requires a shared SRS")
        try:
            accs.append(_prepare(vk, pis, proof, ext))
        except (ValueError, AssertionError):
            return False
    from cap_tpu.utils.rng import CapRng

    rng = CapRng()
    a_acc, b_acc = None, None
    for acc in accs:
        r = rng.randrange(1 << 127) + 1
        a_acc = g1_add(a_acc, g1_mul(acc.a, r))
        b_acc = g1_add(b_acc, g1_mul(acc.b, r))
    return pairing_check([(a_acc, g2_tau), (g1_neg(b_acc), g2_gen)])
