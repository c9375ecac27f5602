"""In-circuit Rescue: permutation, sponge, PRF, commitment gadgets.

Twin of `jf-primitives` circuit gadgets (SURVEY.md §2.2); MUST mirror
cap_tpu.crypto.rescue exactly — the host module is the specification
(which in turn follows the reference spec PDF §4.1.3 Algorithms 2-3:
inverse S-box first each round, then the forward box).

Cost: 12 gates per round (4 inverse-sbox witnesses constrained by u^5 = s,
4 MDS linear combinations, 4 fused sbox+MDS via hash selectors), ~148
gates per permutation.
"""

from __future__ import annotations

from cap_tpu.crypto.rescue import (
    RATE,
    ROUNDS,
    STATE_WIDTH,
    RescuePermutation,
    rescue_params,
)
from cap_tpu.fields.host import FR
from cap_tpu.plonk.circuit import PlonkCircuit

_params = rescue_params(FR)
_host_perm = RescuePermutation(FR)


_native_trace = None


def _trace_fn():
    global _native_trace
    if _native_trace is None:
        try:
            from cap_tpu.utils import native

            _native_trace = native.rescue_trace if native.HAVE_NATIVE else False
        except Exception:
            _native_trace = False
    return _native_trace if _native_trace is not False else None


def rescue_permutation_gadget(c: PlonkCircuit, state, consts=None,
                              collect: bool = False):
    """state: 4 vars -> 4 vars after one full Rescue PRP pass with CONSTANT
    round keys `consts` (default: the fixed-key permutation's round keys;
    pass params.key_inj to realize spec Alg 2 KeyScheduling in-circuit).

    collect=True returns the list of 25 post-injection states (the round
    keys when running the key schedule) instead of just the final state.

    Witness values come from the C++ trace (one call per permutation) when
    available for the default constants; the constraint structure is
    identical either way.
    """
    assert len(state) == STATE_WIDTH
    p = c.f.p
    pr = _params
    mds = pr.mds
    default_keys = consts is None
    keys = pr.round_keys if default_keys else consts
    tf = _trace_fn() if default_keys else None
    trace = tf([c.witness(v) for v in state]) if tf is not None else None
    w = 0
    states = []

    def wval(compute):
        nonlocal w
        if trace is not None:
            v = trace[w]
            w += 1
            return v
        return compute()

    # initial key injection
    s = []
    for i in range(STATE_WIDTH):
        vi = wval(lambda i=i: (c.witness(state[i]) + keys[0][i]) % p)
        si = c.hint(vi, "addc", state[i], keys[0][i] % p)
        c.custom_gate([state[i], 0, 0, 0, si], lc0=1, c=keys[0][i], o=1)
        s.append(si)
    states.append(list(s))
    for r in range(ROUNDS):
        k1 = keys[2 * r + 1]
        k2 = keys[2 * r + 2]
        # inverse S-box FIRST (spec Alg 2): witness u_j with u_j^5 == s_j
        u = []
        for j in range(STATE_WIDTH):
            uv = wval(lambda j=j: pow(c.witness(s[j]), pr.alpha_inv, p))
            uj = c.hint(uv, "root5", s[j])
            c.custom_gate([uj, 0, 0, 0, s[j]], hash0=1, o=1)
            u.append(uj)
        # MDS + key injection: v_i = sum_j M[i][j] u_j + k1_i
        v = []
        for i in range(STATE_WIDTH):
            vv = wval(
                lambda i=i: (sum(mds[i][j] * c.witness(u[j]) for j in range(STATE_WIDTH)) + k1[i]) % p
            )
            vi = c.hint(vv, "lc", tuple(u), tuple(mds[i]), k1[i] % p)
            sels = {f"lc{j}": mds[i][j] for j in range(STATE_WIDTH)}
            c.custom_gate(list(u) + [vi], o=1, c=k1[i], **sels)
            v.append(vi)
        states.append(list(v))
        # forward S-box + MDS fused: s_i = sum_j M[i][j] v_j^5 + k2_i
        if trace is None:
            vv_ = [c.witness(x) for x in v]
            v5 = [pow(x, pr.alpha, p) for x in vv_]
        s = []
        for i in range(STATE_WIDTH):
            sv_ = wval(
                lambda i=i: (sum(mds[i][j] * v5[j] for j in range(STATE_WIDTH)) + k2[i]) % p
            )
            si = c.hint(sv_, "p5lc", tuple(v), tuple(mds[i]), k2[i] % p)
            c.custom_gate(
                list(v) + [si],
                hash0=mds[i][0], hash1=mds[i][1], hash2=mds[i][2], hash3=mds[i][3],
                c=k2[i], o=1,
            )
            s.append(si)
        states.append(list(s))
    return states if collect else s


def _constant_var(c: PlonkCircuit, v: int) -> int:
    return c.constant(v)


def key_scheduling_gadget(c: PlonkCircuit, key_vars):
    """spec Alg 2 KeyScheduling in-circuit: run the key vector through the
    alternating-S-box/MDS schedule with the key-injection constants, and
    return all 25 round-key variable vectors."""
    return rescue_permutation_gadget(c, key_vars, consts=_params.key_inj,
                                     collect=True)


def prp_with_round_key_vars_gadget(c: PlonkCircuit, msg_consts, rk_vars):
    """spec Alg 2 RescueWithRoundKeys where the round keys are circuit
    VARIABLES (the counter-mode key stream: msg = [nonce, 0, 0, 0] constants,
    rk_vars = key_scheduling_gadget output).  Returns the 4 output vars.

    Cost: ~20 gates/round (the variable key can't ride the gate's constant
    selector, so each MDS adds one explicit key-add gate per slot)."""
    p = c.f.p
    pr = _params
    mds = pr.mds
    assert len(rk_vars) == 2 * ROUNDS + 1
    # s = msg + rk[0] (msg entries are plain ints)
    s = [
        rk_vars[0][i] if msg_consts[i] % p == 0
        else c.add_constant(rk_vars[0][i], msg_consts[i] % p)
        for i in range(STATE_WIDTH)
    ]
    for r in range(ROUNDS):
        k1, k2 = rk_vars[2 * r + 1], rk_vars[2 * r + 2]
        # inverse S-box: u^5 == s
        u = []
        for j in range(STATE_WIDTH):
            uv = pow(c.witness(s[j]), pr.alpha_inv, p)
            uj = c.hint(uv, "root5", s[j])
            c.custom_gate([uj, 0, 0, 0, s[j]], hash0=1, o=1)
            u.append(uj)
        # MDS then + variable key
        w = [c.lc(u, list(mds[i])) for i in range(STATE_WIDTH)]
        s = [c.add(w[i], k1[i]) for i in range(STATE_WIDTH)]
        # forward S-box + MDS fused, then + variable key
        sv = [pow(c.witness(x), pr.alpha, p) for x in s]
        y = []
        for i in range(STATE_WIDTH):
            yv = sum(mds[i][j] * sv[j] for j in range(STATE_WIDTH)) % p
            yi = c.hint(yv, "p5lc", tuple(s), tuple(mds[i]), 0)
            c.custom_gate(
                list(s) + [yi],
                hash0=mds[i][0], hash1=mds[i][1], hash2=mds[i][2], hash3=mds[i][3],
                o=1,
            )
            y.append(yi)
        s = [c.add(y[i], k2[i]) for i in range(STATE_WIDTH)]
    return s


def rescue_sponge_no_padding_gadget(c: PlonkCircuit, inputs, num_outputs: int = 1):
    """Mirror of RescuePermutation._sponge with iv=0 (rate-3 absorption)."""
    assert len(inputs) % RATE == 0
    state = [c.zero, c.zero, c.zero, c.zero]
    for off in range(0, len(inputs), RATE):
        chunk = inputs[off : off + RATE]
        state = [c.add(state[i], chunk[i]) for i in range(RATE)] + state[RATE:]
        state = rescue_permutation_gadget(c, state)
    out = []
    while True:
        out.extend(state[:RATE])
        if len(out) >= num_outputs:
            return out[:num_outputs]
        state = rescue_permutation_gadget(c, state)


def rescue_hash_3_to_1_gadget(c: PlonkCircuit, a: int, b: int, d: int) -> int:
    return rescue_sponge_no_padding_gadget(c, [a, b, d], 1)[0]


def prf_gadget(c: PlonkCircuit, key: int, inputs, output_len: int = 1):
    """Mirror of RescuePRF.eval (spec §4.1.5 Alg 5, Full-State Keyed Sponge):
    state [0,0,0,key], input zero-padded to a multiple of the full state
    width and absorbed in chunks of STATE_WIDTH."""
    padded = list(inputs) + [c.zero] * ((-len(inputs)) % STATE_WIDTH)
    state = [c.zero, c.zero, c.zero, key]
    for off in range(0, len(padded), STATE_WIDTH):
        chunk = padded[off : off + STATE_WIDTH]
        state = [c.add(state[i], chunk[i]) for i in range(STATE_WIDTH)]
        state = rescue_permutation_gadget(c, state)
    out = []
    while True:
        out.extend(state[:RATE])
        if len(out) >= output_len:
            return out[:output_len]
        state = rescue_permutation_gadget(c, state)


def commitment_gadget(c: PlonkCircuit, inputs, blind: int, input_len: int) -> int:
    """Mirror of RescueCommitment.commit (spec §4.2.5): the plain zero-IV
    sponge over [blind, inputs...] zero-padded to a rate multiple."""
    assert len(inputs) == input_len
    msg = [blind] + list(inputs)
    msg += [c.zero] * ((-len(msg)) % RATE)
    return rescue_sponge_no_padding_gadget(c, msg, 1)[0]
