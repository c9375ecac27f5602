"""Sparse 3-ary Rescue Merkle accumulator.

Mirrors `jf_primitives::merkle_tree` (SURVEY.md §2.2; reference usage:
src/structs.rs AccMemberWitness, benches depth 26 ~ 2.5e12 leaves —
src/bench_utils/mod.rs:42).  Node values per the reference's specification
PDF §4.1.8 (domain separation of leaf / internal / empty nodes):

  leaf value       = H(0, uid, elem)      (the 0 marks "leaf")
  internal node    = H(child0, child1, child2), child0 != 0 under left-fill
  empty node       = 0 at EVERY level (an all-empty subtree is never hashed)
  position         = uid decomposed base-3 (spec decompBase3),
                     least-significant digit at leaf level

The tree is sparse (dict-backed): only nodes on inserted paths are stored,
so depth-26 trees cost O(depth) per insertion.  The circuit twin is
`MerkleTreeGadget.compute_merkle_root` in cap_tpu.circuits.gadgets.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.rescue import RescuePermutation
from cap_tpu.fields.host import FR

_perm = RescuePermutation(FR)


def _h3(a: int, b: int, c: int) -> int:
    return _perm.hash_3_to_1(a, b, c)


def leaf_hash(uid: int, elem: int) -> int:
    """Leaf value H(0, uid, elem) — spec §4.1.8 domain separation."""
    return _h3(0, uid % FR.p, elem % FR.p)


def empty_node_value(level: int) -> int:
    """Value of an all-empty subtree: 0 at every level (spec §4.1.8:
    "Empty node value: 0" — empty subtrees are never hashed)."""
    return 0


@dataclass(frozen=True)
class MerklePathNode:
    """Siblings of the path node at one level (branch index is derived from uid)."""

    sibling1: int
    sibling2: int


@dataclass(frozen=True)
class MerklePath:
    nodes: tuple  # leaf-level first, length == tree depth


@dataclass(frozen=True)
class AccMemberWitness:
    """Accumulator membership witness (reference: AccMemberWitness)."""

    merkle_path: MerklePath
    root: int
    uid: int

    @staticmethod
    def lookup_from_tree(tree: "MerkleTree", uid: int) -> "AccMemberWitness":
        return AccMemberWitness(tree.get_path(uid), tree.root, uid)

    @staticmethod
    def dummy(depth: int) -> "AccMemberWitness":
        """All-empty path — used by dummy inputs whose root check is bypassed."""
        nodes = tuple(
            MerklePathNode(empty_node_value(k), empty_node_value(k))
            for k in range(depth)
        )
        return AccMemberWitness(MerklePath(nodes), empty_node_value(depth), 0)


def base3_digits(uid: int, depth: int) -> list[int]:
    out = []
    for _ in range(depth):
        out.append(uid % 3)
        uid //= 3
    assert uid == 0, "uid out of range for tree depth"
    return out


def compute_root_from_path(uid: int, elem: int, path: MerklePath) -> int:
    """Recompute the root from a leaf and its path (host twin of the gadget)."""
    depth = len(path.nodes)
    cur = leaf_hash(uid, elem)
    for level, (digit, node) in enumerate(zip(base3_digits(uid, depth), path.nodes)):
        s1, s2 = node.sibling1, node.sibling2
        if digit == 0:
            cur = _h3(cur, s1, s2)
        elif digit == 1:
            cur = _h3(s1, cur, s2)
        else:
            cur = _h3(s1, s2, cur)
    return cur


class MerkleTree:
    """Append-only sparse 3-ary Merkle tree of fixed depth."""

    def __init__(self, depth: int):
        assert 1 <= depth <= 40
        self.depth = depth
        self.capacity = 3**depth
        self._num_leaves = 0
        # nodes[(level, index)] — level 0 are leaf hashes, level `depth` is root
        self._nodes: dict = {}
        self._leaf_elems: dict = {}

    # -- queries ------------------------------------------------------------
    @property
    def num_leaves(self) -> int:
        return self._num_leaves

    def _node(self, level: int, index: int) -> int:
        return self._nodes.get((level, index), empty_node_value(level))

    @property
    def root(self) -> int:
        return self._node(self.depth, 0)

    def leaf_elem(self, uid: int) -> int:
        return self._leaf_elems[uid]

    # -- updates ------------------------------------------------------------
    def push(self, elem: int) -> int:
        """Insert `elem` at the next uid; returns the uid."""
        uid = self._num_leaves
        if uid >= self.capacity:
            raise ValueError("merkle tree is full")
        self._leaf_elems[uid] = elem % FR.p
        self._nodes[(0, uid)] = leaf_hash(uid, elem)
        idx = uid
        for level in range(1, self.depth + 1):
            idx //= 3
            children = [self._node(level - 1, 3 * idx + j) for j in range(3)]
            self._nodes[(level, idx)] = _h3(*children)
        self._num_leaves += 1
        return uid

    def get_path(self, uid: int) -> MerklePath:
        assert 0 <= uid < self._num_leaves, "uid not present"
        nodes = []
        idx = uid
        for level in range(self.depth):
            branch = idx % 3
            parent = idx // 3
            sibs = [self._node(level, 3 * parent + j) for j in range(3) if j != branch]
            nodes.append(MerklePathNode(sibs[0], sibs[1]))
            idx = parent
        return MerklePath(tuple(nodes))

    def check_proof(self, uid: int, elem: int, path: MerklePath) -> bool:
        return compute_root_from_path(uid, elem, path) == self.root


def check_merkle_proof(root: int, uid: int, elem: int, path: MerklePath) -> bool:
    return compute_root_from_path(uid, elem, path) == root
