"""Gadget-level circuit tests (reference test strategy §4.2, SURVEY.md):
(a) build from a real witness, (b) host/circuit value consistency,
(c) satisfiability passes, (d) mutate one wire -> UNSAT."""

from cap_tpu.crypto import jubjub as jj
from cap_tpu.crypto.elgamal import ElGamalKeyPair
from cap_tpu.crypto.merkle import AccMemberWitness, MerkleTree
from cap_tpu.crypto.rescue import RescueCommitment, RescuePermutation, RescuePRF
from cap_tpu.crypto.schnorr import SchnorrKeyPair
from cap_tpu.fields.host import FR
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets import ecc, elgamal, merkle, rescue, schnorr
from cap_tpu.utils.rng import test_rng


def sat(c):
    return c.check_circuit_satisfiability(c.public_input())


from tests.test_witness_tape import harvest_inputs  # noqa: E402


class TestBasicGates:
    def test_arith(self):
        c = PlonkCircuit()
        a = c.create_variable(7)
        b = c.create_variable(11)
        s = c.add(a, b)
        assert c.witness(s) == 18
        m = c.mul(a, b)
        assert c.witness(m) == 77
        d = c.sub(b, a)
        lc = c.lc([a, b, s, m], [1, 2, 3, 4])
        assert c.witness(lc) == (7 + 22 + 54 + 308) % FR.p
        c.enforce_equal(d, c.create_variable(4))
        assert sat(c)
        c.witness_mut(m, 78)
        assert not sat(c)

    def test_bool_logic(self):
        c = PlonkCircuit()
        t = c.create_boolean_variable(1)
        f = c.create_boolean_variable(0)
        assert c.witness(c.logic_or(t, f)) == 1
        assert c.witness(c.logic_and(t, f)) == 0
        assert c.witness(c.logic_neg(f)) == 1
        c.logic_or_gate(t, f)
        assert sat(c)
        c2 = PlonkCircuit()
        x = c2.create_variable(5)  # not boolean
        c2.enforce_bool(x)
        assert not sat(c2)

    def test_is_zero_equal_select(self):
        c = PlonkCircuit()
        a = c.create_variable(9)
        z = c.create_variable(0)
        assert c.witness(c.is_zero(z)) == 1
        assert c.witness(c.is_zero(a)) == 0
        assert c.witness(c.is_equal(a, c.create_variable(9))) == 1
        b = c.create_boolean_variable(1)
        assert c.witness(c.conditional_select(b, z, a)) == 9
        assert sat(c)

    def test_unpack_range(self):
        c = PlonkCircuit()
        a = c.create_variable(0b1011)
        bits = c.unpack(a, 5)
        assert [c.witness(b) for b in bits] == [1, 1, 0, 1, 0]
        assert sat(c)
        c.witness_mut(bits[0], 0)
        assert not sat(c)

    def test_range_conditional(self):
        c = PlonkCircuit()
        a = c.create_variable(100)
        b = c.check_in_range_conditional(a, 7)
        assert c.witness(b) == 1
        big = c.create_variable(1 << 20)
        b2 = c.check_in_range_conditional(big, 7)
        assert c.witness(b2) == 0
        assert sat(c)
        # claiming in-range for an out-of-range value must be UNSAT
        c.witness_mut(b2, 1)
        assert not sat(c)

    def test_public_inputs(self):
        c = PlonkCircuit()
        a = c.create_public_variable(42)
        b = c.create_variable(8)
        c.enforce_equal(c.add(a, b), c.create_public_variable(50))
        assert c.public_input() == [42, 50]
        assert sat(c)
        assert not c.check_circuit_satisfiability([43, 50])


class TestEccGadgets:
    def test_point_add_matches_host(self):
        rng = test_rng()
        c = PlonkCircuit()
        p1 = jj.rand_point(rng)
        p2 = jj.rand_point(rng)
        v1 = ecc.create_point_variable(c, p1)
        v2 = ecc.create_point_variable(c, p2)
        v3 = ecc.ecc_add(c, v1, v2)
        expect = p1.add(p2)
        assert ecc.point_witness(c, v3) == expect
        assert sat(c)
        c.witness_mut(v3.x, (expect.x + 1) % FR.p)
        assert not sat(c)

    def test_add_neutral_and_double(self):
        rng = test_rng()
        c = PlonkCircuit()
        p = jj.rand_point(rng)
        v = ecc.create_point_variable(c, p)
        nv = ecc.neutral_point_variable(c)
        r = ecc.ecc_add(c, v, nv)
        assert ecc.point_witness(c, r) == p
        d = ecc.ecc_double(c, v)
        assert ecc.point_witness(c, d) == p.double()
        assert sat(c)

    def test_fixed_base_mul(self):
        rng = test_rng()
        c = PlonkCircuit()
        s = rng.randrange(1 << 64)
        sv = c.create_variable(s)
        r = ecc.fixed_base_scalar_mul(c, sv, jj.GENERATOR, 64)
        assert ecc.point_witness(c, r) == jj.GENERATOR.mul_scalar(s)
        assert sat(c)
        c.witness_mut(r.y, 12345)
        assert not sat(c)

    def test_variable_base_mul(self):
        rng = test_rng()
        c = PlonkCircuit()
        p = jj.rand_point(rng)
        s = rng.randrange(1 << 48)
        pv = ecc.create_point_variable(c, p)
        sv = c.create_variable(s)
        r = ecc.variable_base_scalar_mul(c, sv, pv, 48)
        assert ecc.point_witness(c, r) == p.mul_scalar(s)
        assert sat(c)

    def test_neutral_predicate(self):
        c = PlonkCircuit()
        nv = ecc.neutral_point_variable(c)
        assert c.witness(ecc.is_neutral_point(c, nv)) == 1
        pv = ecc.create_point_variable(c, jj.GENERATOR)
        assert c.witness(ecc.is_neutral_point(c, pv)) == 0
        assert sat(c)


class TestRescueGadgets:
    def test_permutation_matches_host(self):
        c = PlonkCircuit()
        host = RescuePermutation(FR)
        inp = [5, 6, 7, 8]
        vars_ = [c.create_variable(v) for v in inp]
        out = rescue.rescue_permutation_gadget(c, vars_)
        assert [c.witness(v) for v in out] == host.permute(inp)
        assert sat(c)
        c.witness_mut(out[0], 1)
        assert not sat(c)

    def test_sponge_prf_commitment(self):
        c = PlonkCircuit()
        host = RescuePermutation(FR)
        vs = [c.create_variable(v) for v in [1, 2, 3]]
        out = rescue.rescue_sponge_no_padding_gadget(c, vs, 2)
        assert [c.witness(v) for v in out] == host.sponge_no_padding([1, 2, 3], 2)

        key = c.create_variable(99)
        prf_out = rescue.prf_gadget(c, key, vs, 1)
        assert c.witness(prf_out[0]) == RescuePRF(3, 1).eval(99, [1, 2, 3])[0]

        blind = c.create_variable(7)
        ins = [c.create_variable(v) for v in range(12)]
        com = rescue.commitment_gadget(c, ins, blind, 12)
        assert c.witness(com) == RescueCommitment(12).commit(list(range(12)), 7)
        assert sat(c)


class TestSchnorrGadget:
    def test_verify_matches_host(self):
        rng = test_rng()
        c = PlonkCircuit()
        kp = SchnorrKeyPair.generate(rng)
        msg = [3, 1, 4, 1, 5]
        sig = kp.sign(msg, rng)
        vkv = ecc.create_point_variable(c, kp.vk)
        msgv = [c.create_variable(m) for m in msg]
        sigv = schnorr.create_signature_variable(c, sig)
        ok = schnorr.check_signature_validity(c, vkv, msgv, sigv)
        assert c.witness(ok) == 1
        assert sat(c)

    def test_bad_signature_detected(self):
        rng = test_rng()
        c = PlonkCircuit()
        kp = SchnorrKeyPair.generate(rng)
        sig = kp.sign([1, 2, 3], rng)
        vkv = ecc.create_point_variable(c, kp.vk)
        msgv = [c.create_variable(m) for m in [1, 2, 4]]  # wrong msg
        sigv = schnorr.create_signature_variable(c, sig)
        ok = schnorr.check_signature_validity(c, vkv, msgv, sigv)
        assert c.witness(ok) == 0
        assert sat(c)  # circuit satisfiable, predicate is just false


class TestChallengeWrapSoundness:
    """Adversarial probe of unpack_with_wrap (VERDICT r1 weak #8).

    The challenge decomposition admits two encodings (ch and ch+p when
    ch+p < 2^254).  The wrap freedom must NOT yield a second accepting
    witness: re-witnessing the circuit with the ch+p bit encoding (all
    downstream wires recomputed consistently, exactly what a malicious
    prover could do) must leave the verification equation UNSAT, because
    p is not a multiple of the embedded-group order."""

    def _build(self, rng):
        c = PlonkCircuit()
        kp = SchnorrKeyPair.generate(rng)
        msg = [5, 8, 13]
        sig = kp.sign(msg, rng)
        vkv = ecc.create_point_variable(c, kp.vk)
        msgv = [c.load(m) for m in msg]
        sigv = schnorr.create_signature_variable(c, sig)
        schnorr.enforce_signature_validity(c, vkv, msgv, sigv)
        return c

    def test_wrap_encoding_cannot_satisfy(self):
        from cap_tpu.plonk import tape as tape_mod

        rng = test_rng()
        found_wrappable = False
        for _ in range(40):
            c = self._build(rng)
            assert sat(c)
            # locate the 254-bit challenge decomposition on the tape
            bit_ops = {}
            for i, op in enumerate(c.tape):
                if op[0] == "bit" and op[2] == 0:
                    bit_ops.setdefault(op[1], []).append(i)
                elif op[0] == "bit":
                    if op[1] in bit_ops:
                        bit_ops[op[1]].append(i)
            ch_var, bit_vars = max(bit_ops.items(), key=lambda kv: len(kv[1]))
            assert len(bit_vars) == 254
            ch = c.witness(ch_var)
            if ch + FR.p >= 1 << 254:
                continue  # this challenge admits only the canonical encoding
            found_wrappable = True
            wrapped = ch + FR.p
            overrides = {
                v: (wrapped >> i) & 1 for i, v in enumerate(bit_vars)
            }
            inputs = harvest_inputs(c)
            w2 = tape_mod.replay_with_overrides(c.tape, inputs, overrides)
            # positive control: replay without overrides reproduces the build
            assert tape_mod.replay(c.tape, inputs) == c.witness_values
            c.witness_values = w2
            assert not sat(c), (
                "wrap-encoded challenge satisfied the circuit — "
                "unpack_with_wrap is NOT sound here"
            )
        assert found_wrappable, "no wrappable challenge in 40 trials"


class TestMerkleGadget:
    def test_root_matches_host(self):
        c = PlonkCircuit()
        t = MerkleTree(4)
        for e in [10, 20, 30, 40, 50]:
            t.push(e)
        uid = 3
        wit = AccMemberWitness.lookup_from_tree(t, uid)
        wv = merkle.create_acc_member_witness_var(c, wit, 4)
        elem = c.create_variable(40)
        root = merkle.compute_merkle_root(c, wv.uid, elem, wv.path)
        assert c.witness(root) == t.root
        assert sat(c)
        c.witness_mut(root, (t.root + 1) % FR.p)
        assert not sat(c)

    def test_wrong_uid_gives_wrong_root(self):
        c = PlonkCircuit()
        t = MerkleTree(3)
        for e in [10, 20, 30, 40]:
            t.push(e)
        wit = AccMemberWitness.lookup_from_tree(t, 1)
        wv = merkle.create_acc_member_witness_var(c, wit, 3)
        elem = c.create_variable(30)  # elem of uid 2, path of uid 1
        root = merkle.compute_merkle_root(c, wv.uid, elem, wv.path)
        assert c.witness(root) != t.root
        assert sat(c)


class TestElGamalGadget:
    def test_encrypt_matches_host(self):
        rng = test_rng()
        c = PlonkCircuit()
        kp = ElGamalKeyPair.generate(rng)
        msg = [11, 22, 33, 44]
        r = jj.rand_scalar(rng)
        ct_host = kp.enc_key().deterministic_encrypt(r, msg)
        pkv = elgamal.create_enc_key_variable(c, kp.pk)
        rv = c.create_variable(r)
        msgv = [c.create_variable(m) for m in msg]
        ctv = elgamal.elgamal_encrypt(c, pkv, rv, msgv)
        assert ecc.point_witness(c, ctv.ephemeral) == ct_host.ephemeral
        assert tuple(c.witness(v) for v in ctv.symm_ctxts) == ct_host.symm_ctxts
        # equality check against the host ciphertext vars
        ctv2 = elgamal.create_ciphertext_variable(c, ct_host)
        eq = elgamal.check_ciphertext_equal(c, ctv, ctv2)
        assert c.witness(eq) == 1
        assert sat(c)
