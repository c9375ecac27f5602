"""Host crypto layer tests: fields, Keccak, Rescue, curves, signatures,
encryption, Merkle tree.  Mirrors the reference's inline unit-test strategy
(SURVEY.md §4.1)."""

import pytest

from cap_tpu.fields.host import FQ, FR, FR_EMB, hash_to_field
from cap_tpu.utils.rng import CapRng, test_rng


class TestFields:
    def test_basic_arithmetic(self):
        rng = test_rng()
        for f in (FQ, FR, FR_EMB):
            a, b = f.rand(rng), f.rand(rng)
            assert f.add(a, b) == (a + b) % f.p
            assert f.mul(f.inv(a), a) == 1
            assert f.sub(a, a) == 0
            assert f.mul(a, f.p - 1) == f.neg(a)

    def test_sqrt(self):
        rng = test_rng()
        for f in (FQ, FR):
            for _ in range(5):
                a = f.rand(rng)
                sq = f.sq(a)
                r = f.sqrt(sq)
                assert r is not None and f.sq(r) == sq

    def test_batch_inv(self):
        rng = test_rng()
        xs = [FR.rand(rng) for _ in range(17)]
        invs = FR.batch_inv(xs)
        assert all(FR.mul(x, i) == 1 for x, i in zip(xs, invs))

    def test_roots_of_unity(self):
        for k in (1, 2, 8, 16):
            w = FR.root_of_unity(1 << k)
            assert pow(w, 1 << k, FR.p) == 1
            assert pow(w, 1 << (k - 1), FR.p) == FR.p - 1

    def test_two_adicity(self):
        assert FR.two_adicity == 28  # known BN254 Fr property

    def test_limb_roundtrip(self):
        rng = test_rng()
        a = FR.rand(rng)
        assert FR.from_limbs(FR.to_limbs(a)) == a
        assert FR.from_mont(FR.to_mont(a)) == a

    def test_hash_to_field(self):
        a = hash_to_field(FR, b"dom", b"msg")
        b = hash_to_field(FR, b"dom", b"msg")
        c = hash_to_field(FR, b"dom", b"msg2")
        assert a == b != c and 0 <= a < FR.p


class TestKeccak:
    def test_vectors(self):
        from cap_tpu.crypto.keccak import keccak256

        # the two canonical Ethereum test vectors
        assert (
            keccak256(b"").hex()
            == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
        )
        assert (
            keccak256(b"abc").hex()
            == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
        )

    def test_multiblock(self):
        from cap_tpu.crypto.keccak import keccak256

        # crosses the 136-byte rate boundary; compare incremental determinism
        assert keccak256(b"x" * 135) != keccak256(b"x" * 136) != keccak256(b"x" * 137)
        assert len(keccak256(b"y" * 1000)) == 32


class TestRescue:
    def test_permutation_deterministic_and_injective_ish(self):
        from cap_tpu.crypto.rescue import RescuePermutation

        p = RescuePermutation(FR)
        s1 = p.permute([1, 2, 3, 4])
        assert s1 == p.permute([1, 2, 3, 4])
        assert s1 != p.permute([1, 2, 3, 5])
        assert all(0 <= v < FR.p for v in s1)

    def test_mds_invertible(self):
        from cap_tpu.crypto.rescue import rescue_params

        pr = rescue_params(FR)
        # determinant of the 4x4 Cauchy matrix must be nonzero
        import itertools

        m = pr.mds
        det = 0
        for perm in itertools.permutations(range(4)):
            sign = 1
            # count inversions
            inv = sum(
                1 for i in range(4) for j in range(i + 1, 4) if perm[i] > perm[j]
            )
            sign = -1 if inv % 2 else 1
            term = sign
            for i in range(4):
                term = term * m[i][perm[i]] % FR.p
            det = (det + term) % FR.p
        assert det != 0

    def test_sponge_and_padding(self):
        from cap_tpu.crypto.rescue import RescuePermutation

        p = RescuePermutation(FR)
        out = p.sponge_no_padding([1, 2, 3], 2)
        assert len(out) == 2
        # padding makes [1,2] and [1,2,1 (pad)] distinct inputs
        assert p.sponge_with_padding([1, 2]) != p.sponge_with_padding([1, 2, 1])
        assert p.hash_3_to_1(1, 2, 3) == p.sponge_no_padding([1, 2, 3], 1)[0]

    def test_prf_and_commitment(self):
        from cap_tpu.crypto.rescue import RescueCommitment, RescuePRF

        prf = RescuePRF(2, 1, FR)
        k1 = prf.eval(7, [1, 2])
        assert k1 == prf.eval(7, [1, 2]) and k1 != prf.eval(8, [1, 2])

        comm = RescueCommitment(12, FR)
        c = comm.commit(list(range(12)), blind=99)
        assert c == comm.commit(list(range(12)), blind=99)
        assert c != comm.commit(list(range(12)), blind=98)
        # spec §4.2.5: Com(m, blind) is the PLAIN zero-IV sponge over
        # [blind, m...] zero-padded to a rate multiple (fixed-length scheme,
        # no length-IV domain separation)
        from cap_tpu.crypto.rescue import RescuePermutation

        perm = RescuePermutation(FR)
        msg = [99] + list(range(12)) + [0, 0]
        assert c == perm.sponge_no_padding(msg, 1)[0]


class TestJubjub:
    def test_group_law(self):
        from cap_tpu.crypto import jubjub as jj

        rng = test_rng()
        g = jj.GENERATOR
        assert g.on_curve()
        assert g.mul_scalar(jj.SUBGROUP_ORDER).is_neutral()
        a, b = jj.rand_scalar(rng), jj.rand_scalar(rng)
        assert g.mul_scalar(a).add(g.mul_scalar(b)) == g.mul_scalar(a + b)
        p = jj.rand_point(rng)
        assert p.add(p.neg()).is_neutral()
        assert p.add(jj.NEUTRAL) == p

    def test_point_from_x(self):
        from cap_tpu.crypto import jubjub as jj

        p = jj.rand_point(test_rng())
        q = jj.point_from_x(p.x, p.y % 2)
        assert q == p


class TestSchnorr:
    def test_sign_verify(self):
        from cap_tpu.crypto import schnorr

        rng = test_rng()
        kp = schnorr.SchnorrKeyPair.generate(rng)
        msg = [1, 2, 3, FR.p - 1]
        sig = kp.sign(msg, rng)
        assert schnorr.verify(kp.vk, msg, sig)
        assert not schnorr.verify(kp.vk, [1, 2, 3, 4], sig)
        other = schnorr.SchnorrKeyPair.generate(rng)
        assert not schnorr.verify(other.vk, msg, sig)


class TestElGamal:
    def test_roundtrip(self):
        from cap_tpu.crypto.elgamal import ElGamalKeyPair

        rng = test_rng()
        kp = ElGamalKeyPair.generate(rng)
        msg = [5, 6, 7, 8, 9]
        ct = kp.enc_key().encrypt(rng, msg)
        assert kp.decrypt(ct) == msg
        # scalars encoding roundtrip
        from cap_tpu.crypto.elgamal import ElGamalCiphertext

        sc = ct.to_scalars()
        assert ElGamalCiphertext.from_scalars(sc) == ct

    def test_deterministic(self):
        from cap_tpu.crypto.elgamal import ElGamalKeyPair

        rng = test_rng()
        kp = ElGamalKeyPair.generate(rng)
        c1 = kp.enc_key().deterministic_encrypt(12345, [1, 2])
        c2 = kp.enc_key().deterministic_encrypt(12345, [1, 2])
        assert c1 == c2


class TestAead:
    def test_roundtrip_and_auth(self):
        from cap_tpu.crypto.aead import AeadCiphertext, AeadKeyPair

        rng = CapRng(7)
        kp = AeadKeyPair.generate(rng)
        ct = kp.enc_key().encrypt(rng, b"hello memo", b"label")
        assert kp.decrypt(ct, b"label") == b"hello memo"
        with pytest.raises(Exception):
            kp.decrypt(ct, b"wrong-label")
        # serialization roundtrip
        assert AeadCiphertext.from_bytes(ct.to_bytes()) == ct


class TestMerkle:
    def test_push_and_prove(self):
        from cap_tpu.crypto.merkle import AccMemberWitness, MerkleTree, check_merkle_proof

        t = MerkleTree(4)
        elems = [11, 22, 33, 44, 55]
        for e in elems:
            t.push(e)
        assert t.num_leaves == 5
        for uid, e in enumerate(elems):
            w = AccMemberWitness.lookup_from_tree(t, uid)
            assert w.root == t.root
            assert check_merkle_proof(t.root, uid, e, w.merkle_path)
            assert not check_merkle_proof(t.root, uid, e + 1, w.merkle_path)

    def test_root_changes_and_history(self):
        from cap_tpu.crypto.merkle import MerkleTree

        t = MerkleTree(3)
        r0 = t.root
        t.push(1)
        r1 = t.root
        t.push(2)
        assert len({r0, r1, t.root}) == 3

    def test_deep_tree_sparse(self):
        from cap_tpu.crypto.merkle import AccMemberWitness, MerkleTree, check_merkle_proof

        t = MerkleTree(26)  # benchmark depth; must stay O(depth) per push
        uid = t.push(12345)
        w = AccMemberWitness.lookup_from_tree(t, uid)
        assert check_merkle_proof(t.root, uid, 12345, w.merkle_path)


class TestRng:
    def test_determinism_and_fork(self):
        r1, r2 = test_rng(), test_rng()
        assert r1.randbytes(64) == r2.randbytes(64)
        f1 = r1.fork(b"a")
        f2 = r1.fork(b"b")
        assert f1.randbytes(16) != f2.randbytes(16)

    def test_range(self):
        r = CapRng(3)
        vals = [r.randrange(10) for _ in range(100)]
        assert set(vals) <= set(range(10)) and len(set(vals)) > 5
