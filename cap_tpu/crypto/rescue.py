"""Rescue permutation, sponge, PRF and commitment over a prime field.

Mirrors the consumed `jf-primitives::rescue` surface (SURVEY.md §2.2;
reference usage: src/structs.rs:91,1035-1053, src/keys.rs:558-597).  Instance:
state width 4, rate 3, capacity 1, S-box x^5 / x^(1/5), 12 rounds with 25
round-key injections, MDS mixing each half-round — the same *shape* as the
jellyfish BN254 instance.

The MDS matrix and round constants are derived by the published
**Rescue-Prime instantiation algorithms** (Szepieniec–Ashur–Dhooghe,
ePrint 2020/1143 §2.3: `get_mds_matrix` = transpose of the right half of
the reduced echelon form of the m x 2m Vandermonde matrix over the smallest
primitive element; `get_round_constants` = SHAKE-256 over the ASCII seed
string "Rescue-XLIX(p,m,capacity,security_level)") rather than ad-hoc
self-generation (VERDICT r2 item 5).  With K0 = 0 and forward-then-inverse
S-box halves, `permute` below IS the Rescue-XLIX permutation of the spec.
The whole stack (host hashing, circuit gadgets, native C++ kernel, device
paths) keys off this module, so it stays self-consistent; dropping in a
different constants table (e.g. jellyfish's exact tables, once vectors are
available) is a data-only change via CAP_RESCUE_TABLE.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import lru_cache

from cap_tpu.fields.host import FR, PrimeField

STATE_WIDTH = 4
RATE = 3
CAPACITY = 1
ROUNDS = 12          # jellyfish's BN254 instance count; >= the spec minimum
ALPHA = 5
SECURITY_LEVEL = 128

# Factorization of r-1 for BN254 Fr (verified at import: product and
# primality), needed to find the smallest primitive element per the spec.
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
    is not on record (spec step 1 of `get_mds_matrix`)."""
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


def _rescue_prime_mds(p: int, m: int, g: int) -> tuple:
    """`get_mds_matrix(p, m)` per ePrint 2020/1143: reduced echelon form of
    the m x 2m matrix V[i][j] = g^(i*j); MDS = transpose of the right half."""
    V = [[pow(g, i * j, p) for j in range(2 * m)] for i in range(m)]
    # Gauss-Jordan to reduced row echelon form over GF(p)
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
    # transpose of the right half
    return tuple(tuple(V[i][m + j] for i in range(m)) for j in range(m))


def _rescue_prime_round_constants(
    p: int, m: int, capacity: int, security_level: int, n_rounds: int
) -> list[int]:
    """`get_round_constants` per ePrint 2020/1143: SHAKE-256 of the ASCII
    seed string, bytes_per_int = ceil(bitlen(p)/8)+1, little-endian mod p."""
    bpi = (p.bit_length() + 7) // 8 + 1
    num = 2 * m * n_rounds
    seed = f"Rescue-XLIX({p},{m},{capacity},{security_level})"
    stream = hashlib.shake_256(seed.encode("ascii")).digest(bpi * num)
    return [
        int.from_bytes(stream[i * bpi : (i + 1) * bpi], "little") % p
        for i in range(num)
    ]


def _rescue_prime_min_rounds(p: int, m: int, capacity: int,
                             security_level: int, alpha: int) -> int:
    """`get_number_of_rounds` per ePrint 2020/1143 (Groebner-basis bound
    with the 1.5x safety margin)."""
    from math import comb, ceil

    rate = m - capacity
    target = 1 << security_level
    l1 = 25
    for N in range(1, 26):
        v = m * (N - 1) + rate
        dcon = ((alpha - 1) * m * (N - 1)) // 2 + 2
        if comb(v + dcon, v) ** 2 > target:
            l1 = N
            break
    return ceil(1.5 * max(5, l1))


@dataclass(frozen=True)
class RescueParams:
    field: PrimeField
    alpha: int
    alpha_inv: int  # inverse of alpha mod p-1  (exponent for the inverse S-box)
    mds: tuple            # 4x4 matrix, row-major tuples
    round_keys: tuple     # 25 tuples of width 4 (K0 .. K24)


def _expand_field_elements(field: PrimeField, label: bytes, count: int) -> list[int]:
    """Deterministic uniform field elements via SHAKE-256 rejection sampling."""
    out = []
    ctr = 0
    while len(out) < count:
        h = hashlib.shake_256()
        h.update(b"cap-tpu/rescue-v1")
        h.update(label)
        h.update(ctr.to_bytes(8, "little"))
        v = int.from_bytes(h.digest(48), "little") % field.p
        out.append(v)
        ctr += 1
    return out


def load_params_table(field: PrimeField, table: dict) -> RescueParams:
    """Build RescueParams from an external constants table (bit-parity
    injection point, VERDICT round-1 item 5 / SURVEY §4.7).

    table: {"p": int-or-hex-str, "mds": 4x4, "round_keys": 25x4} — e.g.
    jellyfish's published BN254 tables dumped to JSON.  Every consumer
    (host permutation, circuit gadget, native C++ kernel, device batch
    path) keys off rescue_params(), so pointing CAP_RESCUE_TABLE at such a
    file swaps the whole stack's constants with no code change.
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
    alpha = int(table.get("alpha", ALPHA))
    return RescueParams(field, alpha, pow(alpha, -1, p - 1), mds, rks)


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
        # Rescue-Prime spec instantiation (ePrint 2020/1143).  ROUNDS=12 is
        # jellyfish's instance count; assert it clears the spec's own bound.
        assert ROUNDS >= _rescue_prime_min_rounds(
            p, STATE_WIDTH, CAPACITY, SECURITY_LEVEL, ALPHA
        ), "ROUNDS below the Rescue-Prime minimum"
        mds = _rescue_prime_mds(p, STATE_WIDTH, g)
        flat = _rescue_prime_round_constants(
            p, STATE_WIDTH, CAPACITY, SECURITY_LEVEL, ROUNDS
        )
        # K0 = 0 + the spec's 2*m*N injected constants = Rescue-XLIX exactly
        round_keys = ((0,) * STATE_WIDTH,) + tuple(
            tuple(flat[r * STATE_WIDTH : (r + 1) * STATE_WIDTH])
            for r in range(2 * ROUNDS)
        )
        return RescueParams(field, ALPHA, alpha_inv, mds, round_keys)
    # fields without a recorded p-1 factorization: legacy v1 scheme
    # (SHAKE-256 expansion; Cauchy-matrix MDS) — self-consistent, documented
    xs = list(range(STATE_WIDTH))
    ys = list(range(STATE_WIDTH, 2 * STATE_WIDTH))
    mds = tuple(
        tuple(field.inv(xs[i] + ys[j]) for j in range(STATE_WIDTH))
        for i in range(STATE_WIDTH)
    )
    flat = _expand_field_elements(field, b"round-keys", (2 * ROUNDS + 1) * STATE_WIDTH)
    round_keys = tuple(
        tuple(flat[r * STATE_WIDTH : (r + 1) * STATE_WIDTH])
        for r in range(2 * ROUNDS + 1)
    )
    return RescueParams(field, ALPHA, alpha_inv, mds, round_keys)


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


class RescuePermutation:
    """Width-4 Rescue permutation plus the derived symmetric primitives."""

    def __init__(self, field: PrimeField = FR):
        self.field = field
        self.params = rescue_params(field)

    # -- core permutation ---------------------------------------------------
    def _mds_mul(self, state, key):
        f = self.field
        m = self.params.mds
        return [
            (sum(m[i][j] * state[j] for j in range(STATE_WIDTH)) + key[i]) % f.p
            for i in range(STATE_WIDTH)
        ]

    def permute(self, state):
        """One full permutation of a 4-element state (list of ints)."""
        f = self.field
        pr = self.params
        assert len(state) == STATE_WIDTH
        if f.name == "bn254::Fr":
            native = _native_permute(state)
            if native is not None:
                return native
        s = [(state[i] + pr.round_keys[0][i]) % f.p for i in range(STATE_WIDTH)]
        for r in range(ROUNDS):
            s = self._mds_mul([pow(x, pr.alpha, f.p) for x in s], pr.round_keys[2 * r + 1])
            s = self._mds_mul([pow(x, pr.alpha_inv, f.p) for x in s], pr.round_keys[2 * r + 2])
        return s

    # -- sponge -------------------------------------------------------------
    def sponge_no_padding(self, inputs, num_outputs: int = 1):
        assert len(inputs) % RATE == 0, "no-padding sponge needs multiple of rate"
        return self._sponge(inputs, num_outputs, iv=0)

    def sponge_with_padding(self, inputs, num_outputs: int = 1):
        padded = list(inputs) + [1]
        padded += [0] * ((-len(padded)) % RATE)
        return self._sponge(padded, num_outputs, iv=0)

    def _sponge(self, inputs, num_outputs: int, iv: int):
        f = self.field
        state = [0, 0, 0, iv % f.p]
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
    """Rescue-based PRF — `jf_primitives::prf::PRF` twin (src/keys.rs:589-596).

    Spec: state = [0, 0, 0, key]; absorb inputs zero-padded to a multiple of
    the rate; squeeze `out_len` elements.  The input length is fixed per use
    site (uid/commitment pairs, asset-code digests), so zero-padding is safe.
    """

    def __init__(self, input_len: int, output_len: int, field: PrimeField = FR):
        self.input_len = input_len
        self.output_len = output_len
        self.perm = RescuePermutation(field)
        self.field = field

    def eval(self, key: int, inputs) -> list[int]:
        assert len(inputs) == self.input_len
        f = self.field
        padded = list(inputs) + [0] * ((-len(inputs)) % RATE)
        state = [0, 0, 0, key % f.p]
        for off in range(0, len(padded), RATE):
            for i, v in enumerate(padded[off : off + RATE]):
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

    Spec (self-defined, mirrored by the circuit gadget): initial state
    [0,0,0, input_len + 1] (length-domain-separation in the capacity), absorb
    [blind, inputs...] zero-padded to a multiple of the rate, squeeze 1.
    Used for record commitments (reference src/structs.rs:1035-1053).
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
        state = [0, 0, 0, (self.input_len + 1) % f.p]
        for off in range(0, len(msg), RATE):
            for i, v in enumerate(msg[off : off + RATE]):
                state[i] = (state[i] + v) % f.p
            state = self.perm.permute(state)
        return state[0]
