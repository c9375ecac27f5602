"""In-circuit 3-ary Rescue Merkle root recomputation.

Twin of `MerkleTreeGadget::compute_merkle_root` (SURVEY.md §2.2; reference
usage: src/circuit/gadgets.rs:162-168).  MUST mirror cap_tpu.crypto.merkle
(spec §4.1.8): leaf = H3(0, uid, elem); node = H3(child0, child1, child2);
position = uid in base 3, least-significant digit at the leaf level.

Each level's branch digit d in {0,1,2} is encoded as two booleans
(d = b0 + 2*b1 with b0*b1 = 0), and the three children are arranged with
conditional selects before the sponge.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.merkle import AccMemberWitness, base3_digits
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets.rescue import rescue_hash_3_to_1_gadget


@dataclass(frozen=True)
class MerklePathNodeVar:
    sibling1: int
    sibling2: int
    b0: int  # low bit of the branch digit
    b1: int  # high bit (digit = b0 + 2*b1, b0*b1 == 0)


@dataclass(frozen=True)
class AccMemberWitnessVar:
    uid: int                  # variable
    path: tuple               # MerklePathNodeVar per level (leaf first)


def create_acc_member_witness_var(
    c: PlonkCircuit, wit: AccMemberWitness, depth: int
) -> AccMemberWitnessVar:
    digits = base3_digits(wit.uid, depth)
    uid_var = c.load(wit.uid)
    nodes = []
    coeffs_acc = None
    # digit vars + uid consistency: uid == sum 3^i d_i
    dvars = []
    for lvl in range(depth):
        node = wit.merkle_path.nodes[lvl]
        d = digits[lvl]
        b0 = c.load_bool(d & 1)
        b1 = c.load_bool((d >> 1) & 1)
        c.custom_gate([b0, b1, 0, 0, 0], mul0=1)  # exclude digit 3
        nodes.append(
            MerklePathNodeVar(c.load(node.sibling1), c.load(node.sibling2), b0, b1)
        )
        dvars.append((b0, b1))
    # uid = sum 3^i (b0_i + 2 b1_i)
    acc = c.zero
    p = c.f.p
    for i, (b0, b1) in enumerate(dvars):
        acc = c.lc([acc, b0, b1], [1, pow(3, i, p), 2 * pow(3, i, p) % p])
    c.enforce_equal(acc, uid_var)
    return AccMemberWitnessVar(uid_var, tuple(nodes))


def compute_merkle_root(
    c: PlonkCircuit, uid: int, elem: int, path
) -> int:
    """Returns the root variable recomputed from (uid, elem) along `path`."""
    cur = rescue_hash_3_to_1_gadget(c, c.zero, uid, elem)
    for node in path:
        is0 = c.logic_and(c.logic_neg(node.b0), c.logic_neg(node.b1))
        # children arrangement by digit d:
        #   d=0: (cur, s1, s2);  d=1: (s1, cur, s2);  d=2: (s1, s2, cur)
        c0 = c.conditional_select(is0, node.sibling1, cur)
        inner = c.conditional_select(is0, node.sibling2, node.sibling1)
        c1 = c.conditional_select(node.b0, inner, cur)
        c2 = c.conditional_select(node.b1, node.sibling2, cur)
        cur = rescue_hash_3_to_1_gadget(c, c0, c1, c2)
    return cur
