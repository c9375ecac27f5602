"""In-circuit Rescue: permutation, sponge, PRF, commitment gadgets.

Twin of `jf-primitives` circuit gadgets (SURVEY.md §2.2); MUST mirror
cap_tpu.crypto.rescue exactly — the host module is the specification.

Cost: 12 gates per round (4 fused sbox+MDS via hash selectors, 4 inverse
sbox witnesses constrained by u^5 = t, 4 MDS linear combinations), ~148
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


def rescue_permutation_gadget(c: PlonkCircuit, state):
    """state: 4 vars -> 4 vars after one full Rescue permutation.

    Witness values come from the C++ trace (one call per permutation) when
    available; the constraint structure is identical either way.
    """
    assert len(state) == STATE_WIDTH
    p = c.f.p
    pr = _params
    mds = pr.mds
    tf = _trace_fn()
    trace = tf([c.witness(v) for v in state]) if tf is not None else None
    w = 0

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
        vi = wval(lambda i=i: (c.witness(state[i]) + pr.round_keys[0][i]) % p)
        si = c.hint(vi, "addc", state[i], pr.round_keys[0][i] % p)
        c.custom_gate([state[i], 0, 0, 0, si], lc0=1, c=pr.round_keys[0][i], o=1)
        s.append(si)
    for r in range(ROUNDS):
        k1 = pr.round_keys[2 * r + 1]
        k2 = pr.round_keys[2 * r + 2]
        # forward S-box + MDS fused: t_i = sum_j M[i][j] s_j^5 + k1_i
        if trace is None:
            sv = [c.witness(x) for x in s]
            s5 = [pow(v, pr.alpha, p) for v in sv]
        t = []
        for i in range(STATE_WIDTH):
            tv = wval(
                lambda i=i: (sum(mds[i][j] * s5[j] for j in range(STATE_WIDTH)) + k1[i]) % p
            )
            ti = c.hint(tv, "p5lc", tuple(s), tuple(mds[i]), k1[i] % p)
            c.custom_gate(
                list(s) + [ti],
                hash0=mds[i][0], hash1=mds[i][1], hash2=mds[i][2], hash3=mds[i][3],
                c=k1[i], o=1,
            )
            t.append(ti)
        # inverse S-box: witness u_j with u_j^5 == t_j
        u = []
        for j in range(STATE_WIDTH):
            uv = wval(lambda j=j: pow(c.witness(t[j]), pr.alpha_inv, p))
            uj = c.hint(uv, "root5", t[j])
            c.custom_gate([uj, 0, 0, 0, t[j]], hash0=1, o=1)
            u.append(uj)
        # MDS + key injection
        s = []
        for i in range(STATE_WIDTH):
            sv_ = wval(
                lambda i=i: (sum(mds[i][j] * c.witness(u[j]) for j in range(STATE_WIDTH)) + k2[i]) % p
            )
            si = c.hint(sv_, "lc", tuple(u), tuple(mds[i]), k2[i] % p)
            sels = {f"lc{j}": mds[i][j] for j in range(STATE_WIDTH)}
            c.custom_gate(list(u) + [si], o=1, c=k2[i], **sels)
            s.append(si)
    return s


def _constant_var(c: PlonkCircuit, v: int) -> int:
    return c.constant(v)


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
    """Mirror of RescuePRF.eval: state [0,0,0,key], zero-padded absorption."""
    padded = list(inputs) + [c.zero] * ((-len(inputs)) % RATE)
    state = [c.zero, c.zero, c.zero, key]
    for off in range(0, len(padded), RATE):
        chunk = padded[off : off + RATE]
        state = [c.add(state[i], chunk[i]) for i in range(RATE)] + state[RATE:]
        state = rescue_permutation_gadget(c, state)
    out = []
    while True:
        out.extend(state[:RATE])
        if len(out) >= output_len:
            return out[:output_len]
        state = rescue_permutation_gadget(c, state)


def commitment_gadget(c: PlonkCircuit, inputs, blind: int, input_len: int) -> int:
    """Mirror of RescueCommitment.commit: iv = input_len + 1 in the capacity."""
    assert len(inputs) == input_len
    msg = [blind] + list(inputs)
    msg += [c.zero] * ((-len(msg)) % RATE)
    iv = _constant_var(c, (input_len + 1) % c.f.p)
    state = [c.zero, c.zero, c.zero, iv]
    for off in range(0, len(msg), RATE):
        chunk = msg[off : off + RATE]
        state = [c.add(state[i], chunk[i]) for i in range(RATE)] + state[RATE:]
        state = rescue_permutation_gadget(c, state)
    return state[0]
