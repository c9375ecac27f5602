"""TurboPlonk constraint system (the `jf-relation::PlonkCircuit` twin).

Gate equation over the 5 wires w0..w4 (w4 is the output wire), 13 selectors
(SURVEY.md §2.2 "jf-relation"):

    q_lc0*w0 + q_lc1*w1 + q_lc2*w2 + q_lc3*w3
  + q_mul0*w0*w1 + q_mul1*w2*w3
  + q_hash0*w0^5 + q_hash1*w1^5 + q_hash2*w2^5 + q_hash3*w3^5
  + q_ecc*w0*w1*w2*w3*w4
  + q_c + PI(row)  -  q_o*w4  =  0

The x^5 hash gates make Rescue rounds 12 gates each; the ecc quintic gate
makes a twisted-Edwards point addition exactly 2 gates (see
cap_tpu.plonk.gadgets.ecc).  Witness values are computed eagerly during
synthesis, like the reference's `create_variable` flow; `witness_mut`
supports the mutate-one-wire UNSAT probes of the reference test strategy
(SURVEY.md §4.2).

Circuit shape must be witness-independent: preprocess builds the same
circuit from a dummy witness (reference src/proof/transfer.rs:124-155).
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.fields.host import FR, PrimeField

SELECTORS = (
    "lc0", "lc1", "lc2", "lc3",
    "mul0", "mul1",
    "hash0", "hash1", "hash2", "hash3",
    "ecc", "c", "o",
)

ALPHA = 5  # hash-gate exponent, matches the Rescue S-box


@dataclass
class Finalized:
    """Static arithmetization: everything the prover/verifier key needs."""

    n: int                    # evaluation domain size (power of two)
    num_pub: int
    selectors: dict           # name -> list[int] length n
    wire_index: list          # 5 lists of variable indices, length n
    sigma_values: list        # 5 lists of field elements (permutation polys on H)
    wire_ks: list             # 5 coset representatives k_j
    num_app_gates: int


def next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


class PlonkCircuit:
    def __init__(self, field: PrimeField = FR):
        self.f = field
        self.witness_values: list[int] = [0, 1]
        self.pub_vars: list[int] = []
        self.gates: list = []  # (wires tuple5, sels dict)
        self._finalized: Finalized | None = None
        # witness tape: one op per created variable describing how to
        # recompute its value from the LOAD inputs (see plonk/tape.py);
        # entries for vars 0/1 are constants
        self.tape: list = [("const", 0), ("const", 1)]
        self.num_loads = 0
        self.enforce_constant(0, 0)
        self.enforce_constant(1, 1)

    # -- variables ---------------------------------------------------------
    @property
    def zero(self) -> int:
        return 0

    @property
    def one(self) -> int:
        return 1

    def create_variable(self, val: int) -> int:
        self.witness_values.append(val % self.f.p)
        self.tape.append(("raw", val % self.f.p))
        return len(self.witness_values) - 1

    def _tag(self, *op) -> None:
        """Replace the last tape entry ('raw') with a structured op."""
        self.tape[-1] = op

    def load(self, val: int) -> int:
        """Create a variable whose value is a per-prove witness/public input
        (the leaf of the witness tape — see extract-inputs in circuits/*)."""
        v = self.create_variable(val)
        self._tag("load", self.num_loads)
        self.num_loads += 1
        return v

    def load_bool(self, val) -> int:
        v = self.load(1 if val else 0)
        self.enforce_bool(v)
        return v

    def constant(self, val: int) -> int:
        """Variable pinned to a (shape-level) constant via a gate."""
        val = val % self.f.p
        if val == 0:
            return 0
        if val == 1:
            return 1
        v = self.create_variable(val)
        self._tag("const", val)
        self.enforce_constant(v, val)
        return v

    def create_public_variable(self, val: int) -> int:
        v = self.create_variable(val)
        self.set_variable_public(v)
        return v

    def set_variable_public(self, var: int) -> None:
        self.pub_vars.append(var)

    def create_boolean_variable(self, val) -> int:
        v = self.create_variable(1 if val else 0)
        self.enforce_bool(v)
        return v

    def hint(self, val: int, *op) -> int:
        """Create a variable with an explicit tape op (no gate); the caller
        is responsible for constraining it."""
        v = self.create_variable(val)
        self._tag(*op)
        return v

    def witness(self, var: int) -> int:
        return self.witness_values[var]

    def witness_mut(self, var: int, val: int) -> None:
        """Test hook: overwrite a witness value (for UNSAT soundness probes)."""
        self.witness_values[var] = val % self.f.p

    # -- gates -------------------------------------------------------------
    def custom_gate(self, wires, **sels) -> None:
        """Append a raw gate.  wires: up to 5 variable ids (padded with var 0);
        sels: selector name -> field value."""
        assert self._finalized is None, "circuit already finalized"
        w = tuple(list(wires) + [0] * (5 - len(wires)))
        s = {k: v % self.f.p for k, v in sels.items() if v % self.f.p != 0}
        for k in s:
            assert k in SELECTORS, k
        self.gates.append((w, s))

    def num_gates(self) -> int:
        return len(self.gates) + len(self.pub_vars)

    # -- arithmetic gadget surface (jf-relation names) ----------------------
    def add_gate(self, a: int, b: int, c: int) -> None:
        """Enforce a + b == c."""
        self.custom_gate([a, b, 0, 0, c], lc0=1, lc1=1, o=1)

    def sub_gate(self, a: int, b: int, c: int) -> None:
        self.custom_gate([a, b, 0, 0, c], lc0=1, lc1=-1, o=1)

    def mul_gate(self, a: int, b: int, c: int) -> None:
        self.custom_gate([a, b, 0, 0, c], mul0=1, o=1)

    def add(self, a: int, b: int) -> int:
        c = self.create_variable(self.witness(a) + self.witness(b))
        self._tag("add", a, b)
        self.add_gate(a, b, c)
        return c

    def sub(self, a: int, b: int) -> int:
        c = self.create_variable(self.witness(a) - self.witness(b))
        self._tag("sub", a, b)
        self.sub_gate(a, b, c)
        return c

    def mul(self, a: int, b: int) -> int:
        c = self.create_variable(self.witness(a) * self.witness(b))
        self._tag("mul", a, b)
        self.mul_gate(a, b, c)
        return c

    def add_constant(self, a: int, const: int) -> int:
        c = self.create_variable(self.witness(a) + const)
        self._tag("addc", a, const % self.f.p)
        self.custom_gate([a, 0, 0, 0, c], lc0=1, c=const, o=1)
        return c

    def mul_constant(self, a: int, const: int) -> int:
        c = self.create_variable(self.witness(a) * const)
        self._tag("mulc", a, const % self.f.p)
        self.custom_gate([a, 0, 0, 0, c], lc0=const, o=1)
        return c

    def lc(self, wires, coeffs) -> int:
        """Output var = sum coeffs[i]*wires[i] (up to 4 inputs)."""
        assert len(wires) == len(coeffs) <= 4
        val = sum(self.witness(w) * c for w, c in zip(wires, coeffs))
        out = self.create_variable(val)
        self._tag("lc", tuple(wires), tuple(c % self.f.p for c in coeffs), 0)
        sels = {f"lc{i}": c for i, c in enumerate(coeffs)}
        self.custom_gate(list(wires) + [0] * (4 - len(wires)) + [out], o=1, **sels)
        return out

    def lc_with_constant(self, wires, coeffs, const: int) -> int:
        val = sum(self.witness(w) * c for w, c in zip(wires, coeffs)) + const
        out = self.create_variable(val)
        self._tag("lc", tuple(wires), tuple(c % self.f.p for c in coeffs), const % self.f.p)
        sels = {f"lc{i}": c for i, c in enumerate(coeffs)}
        self.custom_gate(list(wires) + [0] * (4 - len(wires)) + [out], o=1, c=const, **sels)
        return out

    def mul_add(self, wires, q_muls) -> int:
        """out = q_muls[0]*w0*w1 + q_muls[1]*w2*w3."""
        assert len(wires) == 4 and len(q_muls) == 2
        val = (
            q_muls[0] * self.witness(wires[0]) * self.witness(wires[1])
            + q_muls[1] * self.witness(wires[2]) * self.witness(wires[3])
        )
        out = self.create_variable(val)
        self._tag("muladd", tuple(wires), q_muls[0] % self.f.p, q_muls[1] % self.f.p)
        self.custom_gate(list(wires) + [out], mul0=q_muls[0], mul1=q_muls[1], o=1)
        return out

    def sum(self, vars_) -> int:
        """Sum of an arbitrary list of variables (3 per extra gate)."""
        if not vars_:
            return 0
        acc = vars_[0]
        i = 1
        while i < len(vars_):
            chunk = vars_[i : i + 3]
            acc = self.lc([acc] + list(chunk), [1] * (1 + len(chunk)))
            i += 3
        return acc

    def power_5(self, a: int) -> int:
        out = self.create_variable(pow(self.witness(a), 5, self.f.p))
        self._tag("pow5", a)
        self.custom_gate([a, 0, 0, 0, out], hash0=1, o=1)
        return out

    # -- equality / constants ----------------------------------------------
    def enforce_equal(self, a: int, b: int) -> None:
        self.custom_gate([a, b, 0, 0, 0], lc0=1, lc1=-1)

    def enforce_constant(self, a: int, const: int) -> None:
        self.custom_gate([a, 0, 0, 0, 0], lc0=1, c=-const)

    def enforce_bool(self, a: int) -> None:
        self.custom_gate([a, a, 0, 0, 0], mul0=1, lc0=-1)

    def enforce_true(self, a: int) -> None:
        self.enforce_constant(a, 1)

    def enforce_false(self, a: int) -> None:
        self.enforce_constant(a, 0)

    # -- booleans & predicates ---------------------------------------------
    def logic_neg(self, a: int) -> int:
        out = self.create_variable(1 - self.witness(a))
        self._tag("notv", a)
        self.custom_gate([a, 0, 0, 0, out], lc0=-1, c=1, o=1)
        return out

    def logic_and(self, a: int, b: int) -> int:
        return self.mul(a, b)

    def logic_and_all(self, vars_) -> int:
        if not vars_:
            return 1
        acc = vars_[0]
        for v in vars_[1:]:
            acc = self.logic_and(acc, v)
        return acc

    def logic_or(self, a: int, b: int) -> int:
        """out = a + b - a*b."""
        val = self.witness(a) + self.witness(b) - self.witness(a) * self.witness(b)
        out = self.create_variable(val)
        self._tag("orv", a, b)
        self.custom_gate([a, b, 0, 0, out], lc0=1, lc1=1, mul0=-1, o=1)
        return out

    def logic_or_gate(self, a: int, b: int) -> None:
        """Enforce a OR b is true (both boolean)."""
        self.custom_gate([a, b, 0, 0, 0], lc0=1, lc1=1, mul0=-1, c=-1)

    def is_zero(self, a: int) -> int:
        """Boolean var: a == 0.  Standard inverse-witness trick."""
        av = self.witness(a)
        inv_v = 0 if av == 0 else pow(av, -1, self.f.p)
        b_v = 1 if av == 0 else 0
        inv = self.create_variable(inv_v)
        self._tag("inv0", a)
        b = self.create_variable(b_v)
        self._tag("eqz", a)
        # a*inv + b - 1 == 0
        self.custom_gate([a, inv, b, 0, 0], mul0=1, lc2=1, c=-1)
        # a*b == 0
        self.custom_gate([a, b, 0, 0, 0], mul0=1)
        return b

    def is_equal(self, a: int, b: int) -> int:
        return self.is_zero(self.sub(a, b))

    def conditional_select(self, b: int, x0: int, x1: int) -> int:
        """out = x0 if b == 0 else x1 (b boolean)."""
        out_v = self.witness(x1) if self.witness(b) else self.witness(x0)
        out = self.create_variable(out_v)
        self._tag("sel", b, x0, x1)
        # out = b*x1 - b*x0 + x0
        self.custom_gate([b, x1, b, x0, out], mul0=1, mul1=-1, lc3=1, o=1)
        return out

    # -- ranges -------------------------------------------------------------
    def unpack(self, a: int, bit_len: int) -> list[int]:
        """LE bit decomposition with packing constraint (canonical: requires
        bit_len <= field bits - 1 so no wraparound ambiguity exists)."""
        assert bit_len < self.f.bit_len
        av = self.witness(a)
        bits = []
        for i in range(bit_len):
            b = self.create_boolean_variable((av >> i) & 1)
            self._tag("bit", a, i)
            bits.append(b)
        acc = self.pack_bits(bits)
        self.enforce_equal(acc, a)
        return bits

    def pack_bits(self, bits) -> int:
        """Var holding sum 2^i b_i (3 bits per gate)."""
        acc = 0  # var 0 == 0
        for j in range(0, len(bits), 3):
            chunk = bits[j : j + 3]
            coeffs = [1] + [pow(2, j + t, self.f.p) for t in range(len(chunk))]
            acc = self.lc([acc] + chunk, coeffs)
        return acc

    def enforce_in_range(self, a: int, bit_len: int) -> None:
        self.unpack(a, bit_len)

    def unpack_with_wrap(self, a: int, bit_len: int) -> list[int]:
        """Full-width (>= field bits) decomposition — NOT canonical: the
        prover may encode v or v+p when v+p < 2^bit_len.  Safe only where the
        consumer is invariant mod the embedded-group order (e.g. scalar muls
        by a hash-derived challenge; see gadgets/schnorr.py)."""
        assert bit_len >= self.f.bit_len
        av = self.witness(a)
        bits = []
        for i in range(bit_len):
            b = self.create_boolean_variable((av >> i) & 1)
            self._tag("bit", a, i)
            bits.append(b)
        acc = self.pack_bits(bits)
        self.enforce_equal(acc, a)
        return bits

    def check_in_range_conditional(self, a: int, bit_len: int) -> int:
        """Boolean b; constrains b==1 => a in [0, 2^bit_len).

        One-sided (sound for use inside OR clauses): when b == 0 nothing is
        claimed.  Mirrors the reveal-threshold gating of the reference
        transfer circuit (src/circuit/transfer.rs:181-188).
        """
        av = self.witness(a)
        in_range = av < (1 << bit_len)
        b = self.create_boolean_variable(in_range)
        self._tag("ltp2", a, bit_len)
        bits = []
        for i in range(bit_len):
            bv = self.create_boolean_variable((av >> i) & 1 if in_range else 0)
            self._tag("bit_if", b, a, i)
            bits.append(bv)
        acc = self.pack_bits(bits)
        # b * (acc - a) == 0
        diff = self.sub(acc, a)
        self.custom_gate([b, diff, 0, 0, 0], mul0=1)
        return b

    # -- finalization -------------------------------------------------------
    def _coset_ks(self, n: int) -> list[int]:
        ks = [1]
        cand = 2
        seen = {pow(1, n, self.f.p)}
        while len(ks) < 5:
            t = pow(cand, n, self.f.p)
            if t not in seen:
                ks.append(cand)
                seen.add(t)
            cand += 1
        return ks

    def finalize_for_arithmetization(self) -> Finalized:
        if self._finalized is not None:
            return self._finalized
        num_pub = len(self.pub_vars)
        pub_gates = [((0, 0, 0, 0, v), {"o": 1}) for v in self.pub_vars]
        all_gates = pub_gates + self.gates
        n = next_pow2(max(len(all_gates), 2))
        pad = n - len(all_gates)
        all_gates = all_gates + [((0, 0, 0, 0, 0), {})] * pad

        selectors = {name: [0] * n for name in SELECTORS}
        wire_index = [[0] * n for _ in range(5)]
        for row, (wires, sels) in enumerate(all_gates):
            for col in range(5):
                wire_index[col][row] = wires[col]
            for k, v in sels.items():
                selectors[k][row] = v

        # permutation: cycles over positions of each variable
        ks = self._coset_ks(n)
        from cap_tpu.ops.ntt import get_domain

        dom = get_domain(n, self.f)
        omega_pows = dom.elements()
        positions: dict[int, list] = {}
        for col in range(5):
            wi = wire_index[col]
            for row in range(n):
                positions.setdefault(wi[row], []).append((col, row))
        sigma_values = [[0] * n for _ in range(5)]
        p = self.f.p
        for var, poss in positions.items():
            m = len(poss)
            for t, (col, row) in enumerate(poss):
                ncol, nrow = poss[(t + 1) % m]
                sigma_values[col][row] = ks[ncol] * omega_pows[nrow] % p

        self._finalized = Finalized(
            n=n,
            num_pub=num_pub,
            selectors=selectors,
            wire_index=wire_index,
            sigma_values=sigma_values,
            wire_ks=ks,
            num_app_gates=len(self.gates),
        )
        return self._finalized

    def eval_domain_size(self) -> int:
        return self.finalize_for_arithmetization().n

    def srs_size(self) -> int:
        """`compute_universal_param_size` twin (reference utils/mod.rs:89-113)."""
        return self.eval_domain_size() + 2

    def public_input(self) -> list[int]:
        return [self.witness_values[v] for v in self.pub_vars]

    def wire_values(self) -> list[list[int]]:
        """Witness gathered per wire column (length-n lists of ints)."""
        fin = self.finalize_for_arithmetization()
        w = self.witness_values
        return [[w[idx] for idx in col] for col in fin.wire_index]

    # -- satisfiability ------------------------------------------------------
    def check_circuit_satisfiability(self, pub_inputs) -> bool:
        fin = self.finalize_for_arithmetization()
        if len(pub_inputs) != fin.num_pub:
            return False
        p = self.f.p
        w = self.witness_values
        sel = fin.selectors
        wi = fin.wire_index
        for row in range(fin.n):
            ws = [w[wi[c][row]] for c in range(5)]
            pi = pub_inputs[row] if row < fin.num_pub else 0
            acc = (
                sel["lc0"][row] * ws[0]
                + sel["lc1"][row] * ws[1]
                + sel["lc2"][row] * ws[2]
                + sel["lc3"][row] * ws[3]
                + sel["mul0"][row] * ws[0] * ws[1]
                + sel["mul1"][row] * ws[2] * ws[3]
                + sel["c"][row]
                + pi
                - sel["o"][row] * ws[4]
            )
            if sel["hash0"][row]:
                acc += sel["hash0"][row] * pow(ws[0], ALPHA, p)
            if sel["hash1"][row]:
                acc += sel["hash1"][row] * pow(ws[1], ALPHA, p)
            if sel["hash2"][row]:
                acc += sel["hash2"][row] * pow(ws[2], ALPHA, p)
            if sel["hash3"][row]:
                acc += sel["hash3"][row] * pow(ws[3], ALPHA, p)
            if sel["ecc"][row]:
                acc += sel["ecc"][row] * ws[0] * ws[1] * ws[2] * ws[3] * ws[4]
            if acc % p != 0:
                return False
        return True
