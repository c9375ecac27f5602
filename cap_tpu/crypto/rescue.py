"""Rescue PRP, fixed-key permutation, sponge, PRF, commitment and
counter-mode cipher over a prime field.

Mirrors the consumed `jf-primitives::rescue` surface (SURVEY.md §2.2;
reference usage: src/structs.rs:91,1035-1053, src/keys.rs:558-597) with the
construction pinned by the reference's own specification PDF
(`/root/reference/cap-specification.pdf`, release 2022-03-04, spec §4.1.3
listing 1.1 and Algorithms 2-3):

  * instance `Rescue(security=128, q, m=4, alpha=5)`, nr = 12 rounds;
  * the PRP is `RescueWithRoundKeys` (spec Alg 2): S <- m + k[0], then for
    each of the 2*nr half-rounds, ALTERNATING S-boxes starting with the
    INVERSE box — S <- S^(1/alpha) on even half-rounds, S <- S^alpha on odd
    ones — each followed by `LinearOp(MDS, S, k[i])`;
  * round keys come from `KeyScheduling(k)` (spec Alg 2): the key vector is
    itself run through the same alternating-S-box/MDS schedule, with the
    *key-injection* vectors keyinj[0..2nr] (keyinj[0] = IC,
    keyinj[i+1] = K*keyinj[i] + C) added each half-round;
  * the fixed-key permutation used by all hashes is the PRP with key 0
    (spec Alg 3), i.e. round keys = KeyScheduling(0).

The spec pins the *generation* of (MDS, IC, K, C) to the KU Leuven
Marvellous `instance_generator.sage` at revision 1bad94a239dd52f7206cd7f2d
3a7f023e006f533 (spec §4.1.3 listing 1.1) — that script is unreachable in
this environment (zero egress), so the concrete constants below are derived
by a documented deterministic procedure (Vandermonde-echelon MDS over the
smallest primitive element; SHAKE-256 sampling for IC/K/C) and are the ONE
remaining non-parity seam: dropping in the generator's exact tables is a
data-only change via CAP_RESCUE_TABLE (see `load_params_table`).  Every
consumer (host hashing, circuit gadgets, native C++ kernel) keys off this
module, so the stack stays self-consistent either way.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import lru_cache

from cap_tpu.fields.host import FR, PrimeField

STATE_WIDTH = 4
RATE = 3
CAPACITY = 1
ROUNDS = 12          # spec §4.1.3: "We set the number of rounds nr = 12"
ALPHA = 5
SECURITY_LEVEL = 128

# Factorization of r-1 for BN254 Fr (verified at import: product and
# primality), needed to find the smallest primitive element.
_PMINUS1_FACTORS = {
    # bn254 Fr
    21888242871839275222246405745257275088548364400416034343698204186575808495617: (
        2, 3, 13, 29, 983, 11003, 237073, 405928799, 1670836401704629,
        13818364434197438864469338081,
    ),
}


def _is_prime(x: int) -> bool:
    """Deterministic Miller-Rabin for < 3.3e24 plus strong bases beyond."""
    if x < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if x % sp == 0:
            return x == sp
    d, s = x - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        v = pow(a, d, x)
        if v in (1, x - 1):
            continue
        for _ in range(s - 1):
            v = v * v % x
            if v == x - 1:
                break
        else:
            return False
    return True


def _smallest_primitive_root(p: int) -> int | None:
    """Smallest primitive element of GF(p), or None when p-1's factorization
    is not on record."""
    factors = _PMINUS1_FACTORS.get(p)
    if factors is None:
        return None
    n = p - 1
    m = n
    for q in factors:
        assert _is_prime(q), f"non-prime factor {q} on record for p-1"
        while m % q == 0:
            m //= q
    assert m == 1, "recorded factorization of p-1 is incomplete"
    g = 2
    while any(pow(g, n // q, p) == 1 for q in factors):
        g += 1
    return g


def _vandermonde_mds(p: int, m: int, g: int) -> tuple:
    """MDS matrix as the transpose of the right half of the reduced echelon
    form of the m x 2m Vandermonde matrix V[i][j] = g^(i*j) — the published
    Marvellous/Rescue-Prime construction shape (constants seam, see module
    docstring)."""
    V = [[pow(g, i * j, p) for j in range(2 * m)] for i in range(m)]
    row = 0
    for col in range(2 * m):
        if row == m:
            break
        piv = next((r for r in range(row, m) if V[r][col] % p != 0), None)
        if piv is None:
            continue
        V[row], V[piv] = V[piv], V[row]
        inv = pow(V[row][col], -1, p)
        V[row] = [v * inv % p for v in V[row]]
        for r in range(m):
            if r != row and V[r][col] % p != 0:
                f = V[r][col]
                V[r] = [(V[r][j] - f * V[row][j]) % p for j in range(2 * m)]
        row += 1
    return tuple(tuple(V[i][m + j] for i in range(m)) for j in range(m))


def _sample_field_elements(p: int, label: str, count: int) -> list[int]:
    """Deterministic field elements: SHAKE-256 over a Marvellous-style seed
    string, (bytelen(p)+1)-byte little-endian draws reduced mod p."""
    bpi = (p.bit_length() + 7) // 8 + 1
    seed = f"Rescue({SECURITY_LEVEL},{p},{STATE_WIDTH},{ALPHA})/{label}"
    stream = hashlib.shake_256(seed.encode("ascii")).digest(bpi * count)
    return [
        int.from_bytes(stream[i * bpi : (i + 1) * bpi], "little") % p
        for i in range(count)
    ]


@dataclass(frozen=True)
class RescueParams:
    field: PrimeField
    alpha: int
    alpha_inv: int        # inverse of alpha mod p-1 (inverse-S-box exponent)
    mds: tuple            # w x w matrix, row-major tuples
    key_inj: tuple        # 2*ROUNDS+1 width-w key-injection vectors (IC first)
    round_keys: tuple     # KeyScheduling(0): 2*ROUNDS+1 width-w vectors


def _linear_op(p: int, M: tuple, v, c):
    """spec Alg 2 LinearOp: M*v + c."""
    return tuple(
        (sum(M[i][j] * v[j] for j in range(STATE_WIDTH)) + c[i]) % p
        for i in range(STATE_WIDTH)
    )


def _key_injection(p: int, ic, K, C) -> tuple:
    """spec Alg 2 KeyInjection: keyinj[0] = IC, keyinj[i+1] = K*keyinj[i]+C."""
    inj = [tuple(ic)]
    for _ in range(2 * ROUNDS):
        inj.append(_linear_op(p, K, inj[-1], C))
    return tuple(inj)


def key_scheduling(params: "RescueParams", key) -> tuple:
    """spec Alg 2 KeyScheduling(k) -> 2*nr+1 round-key vectors.

    The key vector is run through the alternating S-box / MDS schedule with
    the key-injection vectors added: even half-rounds raise to 1/alpha, odd
    ones to alpha (the same alternation the permutation itself uses)."""
    p = params.field.p
    prev = tuple((key[i] + params.key_inj[0][i]) % p for i in range(STATE_WIDTH))
    keys = [prev]
    for i in range(2 * ROUNDS):
        e = params.alpha_inv if i % 2 == 0 else params.alpha
        prev = tuple(pow(x, e, p) for x in prev)
        prev = _linear_op(p, params.mds, prev, params.key_inj[i + 1])
        keys.append(prev)
    return tuple(keys)


def load_params_table(field: PrimeField, table: dict) -> RescueParams:
    """Build RescueParams from an external constants table (bit-parity
    injection point).

    table: {"p": int-or-hex-str, "mds": 4x4, "round_keys": 25x4,
    "key_inj": 25x4 (optional — needed only for the keyed PRP / counter-mode
    cipher)} — e.g. the Marvellous generator's exact tables dumped to JSON.
    Every consumer (host permutation, circuit gadget, native C++ kernel)
    keys off rescue_params(), so pointing CAP_RESCUE_TABLE at such a file
    swaps the whole stack's constants with no code change.
    """
    p = field.p
    tp = table.get("p")
    if tp is not None:
        tp = int(tp, 0) if isinstance(tp, str) else int(tp)
        if tp != p:
            raise ValueError(f"rescue table is for p={tp:#x}, field has {p:#x}")
    mds = tuple(tuple(int(v) % p for v in row) for row in table["mds"])
    rks = tuple(tuple(int(v) % p for v in row) for row in table["round_keys"])
    if len(mds) != STATE_WIDTH or any(len(r) != STATE_WIDTH for r in mds):
        raise ValueError("rescue table: mds must be 4x4")
    if len(rks) != 2 * ROUNDS + 1 or any(len(r) != STATE_WIDTH for r in rks):
        raise ValueError("rescue table: round_keys must be 25x4")
    inj = table.get("key_inj")
    if inj is not None:
        inj = tuple(tuple(int(v) % p for v in row) for row in inj)
        if len(inj) != 2 * ROUNDS + 1 or any(len(r) != STATE_WIDTH for r in inj):
            raise ValueError("rescue table: key_inj must be 25x4")
    else:
        inj = rks  # keyed-PRP path unavailable without the real injections
    alpha = int(table.get("alpha", ALPHA))
    return RescueParams(field, alpha, pow(alpha, -1, p - 1), mds, inj, rks)


@lru_cache(maxsize=None)
def rescue_params(field: PrimeField = FR) -> RescueParams:
    import json
    import os

    path = os.environ.get("CAP_RESCUE_TABLE")
    if path and field.name == "bn254::Fr":
        with open(path) as f:
            return load_params_table(field, json.load(f))
    p = field.p
    assert (p - 1) % ALPHA != 0, "alpha must be coprime to p-1"
    alpha_inv = pow(ALPHA, -1, p - 1)
    g = _smallest_primitive_root(p)
    if g is not None:
        mds = _vandermonde_mds(p, STATE_WIDTH, g)
    else:
        # fields without a recorded p-1 factorization: Cauchy-matrix MDS
        xs = list(range(STATE_WIDTH))
        ys = list(range(STATE_WIDTH, 2 * STATE_WIDTH))
        mds = tuple(
            tuple(field.inv(xs[i] + ys[j]) for j in range(STATE_WIDTH))
            for i in range(STATE_WIDTH)
        )
    # IC, K, C per spec Alg 2 (sampling = the documented constants seam)
    ic = tuple(_sample_field_elements(p, "IC", STATE_WIDTH))
    kf = _sample_field_elements(p, "K", STATE_WIDTH * STATE_WIDTH)
    K = tuple(tuple(kf[i * STATE_WIDTH : (i + 1) * STATE_WIDTH]) for i in range(STATE_WIDTH))
    C = tuple(_sample_field_elements(p, "C", STATE_WIDTH))
    inj = _key_injection(p, ic, K, C)
    params = RescueParams(field, ALPHA, alpha_inv, mds, inj, ())
    # fixed-key round keys = KeyScheduling(0) (spec Alg 3)
    rks = key_scheduling(params, (0,) * STATE_WIDTH)
    return RescueParams(field, ALPHA, alpha_inv, mds, inj, rks)


def _native_permute(state):
    """C++ fast path (cap_tpu.utils.native); None if the lib is absent."""
    global _native_fn
    if _native_fn is None:
        try:
            from cap_tpu.utils import native

            _native_fn = native.rescue_permute if native.HAVE_NATIVE else False
        except Exception:
            _native_fn = False
    if _native_fn is False:
        return None
    return _native_fn(state)


_native_fn = None


def permute_with_round_keys(params: RescueParams, state, round_keys):
    """spec Alg 2 RescueWithRoundKeys: S <- m + k[0]; then per half-round i
    (1-based): S^(1/alpha) when (i-1) is even else S^alpha, then MDS*S+k[i]."""
    p = params.field.p
    s = [(state[i] + round_keys[0][i]) % p for i in range(STATE_WIDTH)]
    for i in range(1, 2 * ROUNDS + 1):
        e = params.alpha_inv if (i - 1) % 2 == 0 else params.alpha
        s = [pow(x, e, p) for x in s]
        s = list(_linear_op(p, params.mds, s, round_keys[i]))
    return s


class RescuePermutation:
    """Width-4 fixed-key Rescue permutation plus the derived primitives."""

    def __init__(self, field: PrimeField = FR):
        self.field = field
        self.params = rescue_params(field)

    # -- core permutation ---------------------------------------------------
    def permute(self, state):
        """One full fixed-key permutation of a 4-element state (spec Alg 3)."""
        f = self.field
        assert len(state) == STATE_WIDTH
        if f.name == "bn254::Fr":
            native = _native_permute(state)
            if native is not None:
                return native
        return permute_with_round_keys(self.params, state, self.params.round_keys)

    # -- sponge (spec §4.1.4, Algorithm 4) ------------------------------------
    def sponge_no_padding(self, inputs, num_outputs: int = 1):
        assert len(inputs) % RATE == 0, "no-padding sponge needs multiple of rate"
        return self._sponge(inputs, num_outputs)

    def sponge_with_padding(self, inputs, num_outputs: int = 1):
        padded = list(inputs) + [1]
        padded += [0] * ((-len(padded)) % RATE)
        return self._sponge(padded, num_outputs)

    def _sponge(self, inputs, num_outputs: int):
        f = self.field
        state = [0, 0, 0, 0]
        for off in range(0, len(inputs), RATE):
            for i, v in enumerate(inputs[off : off + RATE]):
                state[i] = (state[i] + v) % f.p
            state = self.permute(state)
        out = []
        while True:
            out.extend(state[:RATE])
            if len(out) >= num_outputs:
                return out[:num_outputs]
            state = self.permute(state)

    def hash_3_to_1(self, a: int, b: int, c: int) -> int:
        """`Permutation::hash_3_to_1` twin (reference src/keys.rs:563-567)."""
        return self.sponge_no_padding([a, b, c], 1)[0]


class RescuePRF:
    """Full-State Keyed Sponge PRF — `jf_primitives::prf::PRF` twin
    (reference src/keys.rs:589-596; spec §4.1.5 Algorithm 5).

    Spec: state = [0, 0, 0, key]; the input is zero-padded to a multiple of
    the FULL state width w = 4 and absorbed in chunks of w (full-state
    absorption, not rate-limited); output = state[0] (squeeze rate-wise for
    longer outputs, spec §4.1.5 footnote 7).
    """

    def __init__(self, input_len: int, output_len: int, field: PrimeField = FR):
        self.input_len = input_len
        self.output_len = output_len
        self.perm = RescuePermutation(field)
        self.field = field

    def eval(self, key: int, inputs) -> list[int]:
        assert len(inputs) == self.input_len
        f = self.field
        padded = list(inputs) + [0] * ((-len(inputs)) % STATE_WIDTH)
        state = [0, 0, 0, key % f.p]
        for off in range(0, len(padded), STATE_WIDTH):
            for i, v in enumerate(padded[off : off + STATE_WIDTH]):
                state[i] = (state[i] + v) % f.p
            state = self.perm.permute(state)
        out = []
        while True:
            out.extend(state[:RATE])
            if len(out) >= self.output_len:
                return out[: self.output_len]
            state = self.perm.permute(state)


class RescueCommitment:
    """Rescue sponge commitment — `jf_primitives::commitment` twin.

    Spec §4.2.5: Com(m, blind) := sponge(blind ‖ m) — the PLAIN zero-IV
    sponge CRHF over [blind, inputs...] zero-padded to a multiple of the
    rate (the spec's record instance is 12 inputs = 4 permutations; the
    reference adds reveal_threshold for 13 -> padded 15).  Used for record
    commitments (reference src/structs.rs:1035-1053).
    """

    def __init__(self, input_len: int, field: PrimeField = FR):
        self.input_len = input_len
        self.perm = RescuePermutation(field)
        self.field = field

    def commit(self, inputs, blind: int) -> int:
        assert len(inputs) == self.input_len
        f = self.field
        msg = [blind % f.p] + [v % f.p for v in inputs]
        msg += [0] * ((-len(msg)) % RATE)
        return self.perm.sponge_no_padding(msg, 1)[0]


# ---------------------------------------------------------------------------
# counter-mode cipher (spec §4.1.6, Algorithm 6) — the ElGamal key stream
# ---------------------------------------------------------------------------


def _native_counter_stream(key4, nblocks: int):
    global _native_stream_fn
    if _native_stream_fn is None:
        try:
            from cap_tpu.utils import native

            _native_stream_fn = (
                native.rescue_counter_stream if native.HAVE_NATIVE else False
            )
        except Exception:
            _native_stream_fn = False
    if _native_stream_fn is False:
        return None
    return _native_stream_fn(key4, nblocks)


_native_stream_fn = None


def apply_key_stream(field: PrimeField, key4, data, is_add: bool) -> list[int]:
    """spec Alg 6 ApplyKeyStream: round keys = KeyScheduling(key4); block i
    of StateSize elements is offset by RescueWithRoundKeys([i,0,0,0], rks)
    (added when encrypting, subtracted when decrypting; a trailing partial
    block uses the stream prefix)."""
    p = field.p
    nblocks = (len(data) + STATE_WIDTH - 1) // STATE_WIDTH
    stream = None
    if field.name == "bn254::Fr":
        stream = _native_counter_stream([v % p for v in key4], nblocks)
    if stream is None:
        params = rescue_params(field)
        rks = key_scheduling(params, tuple(v % field.p for v in key4))
        stream = []
        for b in range(nblocks):
            stream.extend(permute_with_round_keys(params, [b, 0, 0, 0], rks))
    if is_add:
        return [(d + s) % p for d, s in zip(data, stream)]
    return [(d - s) % p for d, s in zip(data, stream)]
