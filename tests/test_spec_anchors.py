"""Spec-derived parity anchors (VERDICT r3 item 6).

Every test here asserts a construction against the reference's OWN
specification PDF (`/root/reference/cap-specification.pdf`, release
2022-03-04, branch main@b4e67cb) — the only parity source reachable under
zero egress.  Section numbers cite that document.  What the spec pins:

  §4.1.2  DSA-over-Jubjub: deterministic nonce r = H(alg_desc, m, sk),
          challenge c = H(X, R, m) with the PADDED sponge, s = r + c*x,
          verify rejects low-order X ("Fail if 8X = 0").
  §4.1.3  Rescue instance Rescue(128, q, 4, 5), nr = 12; Alg 2:
          RescueWithRoundKeys alternates S-boxes starting with x^(1/alpha);
          round keys = KeyScheduling(key) over key-injection vectors;
          Alg 3: the fixed-key permutation is the PRP with key 0.
  §4.1.4  Sponge CRHF: zero IV, rate 3 / capacity 1; padded variant
          appends 1 then zero-fills.
  §4.1.5  PRF = Full-State Keyed Sponge: state [0,0,0,k], absorb in
          chunks of the FULL width 4, output state[0].
  §4.1.6  Counter-mode cipher: block i keystream =
          RescueWithRoundKeys([i,0,0,0], KeyScheduling(k)).
  §4.1.7  Hybrid ElGamal: symmetric key = Perm([U.x, U.y, 0, 0]).
  §4.1.8  Merkle tree: empty node = 0, leaf = H(0, uid, elem),
          internal = H(a, b, c); decompBase3 positions.
  §4.2.5  Record commitment Com(m, blind) = plain sponge(blind || m);
          nullifier = PRF_nk(uid, arc) (one full-state chunk);
          internal asset code = PRF_seed(digest, 0, 0, 0).

What the spec does NOT pin bit-level: the concrete (MDS, IC, K, C) values —
it defers to the Marvellous instance_generator.sage at revision 1bad94a
(§4.1.3 listing 1.1), which is egress-blocked.  Those constants remain the
documented CAP_RESCUE_TABLE seam (tests/test_parity_vectors.py).
"""

import pytest

from cap_tpu.crypto.rescue import (
    ALPHA,
    RATE,
    ROUNDS,
    STATE_WIDTH,
    RescueCommitment,
    RescuePermutation,
    RescuePRF,
    apply_key_stream,
    key_scheduling,
    permute_with_round_keys,
    rescue_params,
)
from cap_tpu.fields.host import FR
from cap_tpu.utils.rng import test_rng

P = FR.p


# -- §4.1.3: permutation structure -------------------------------------------


def test_instance_parameters():
    """Rescue(128, q, 4, 5) with nr = 12 (spec §4.1.3 listing 1.1)."""
    assert STATE_WIDTH == 4 and RATE == 3 and ALPHA == 5 and ROUNDS == 12
    pr = rescue_params(FR)
    assert len(pr.round_keys) == 2 * ROUNDS + 1 == 25
    assert len(pr.key_inj) == 2 * ROUNDS + 1
    assert pr.alpha_inv == pow(5, -1, P - 1)


def test_permutation_is_inverse_alpha_first():
    """spec Alg 2 RescueWithRoundKeys: half-round i applies x^(1/alpha) when
    (i-1) is even — recompute the permutation inline and compare."""
    pr = rescue_params(FR)
    state = [11, 22, 33, 44]
    s = [(state[i] + pr.round_keys[0][i]) % P for i in range(4)]
    for i in range(1, 2 * ROUNDS + 1):
        e = pr.alpha_inv if (i - 1) % 2 == 0 else ALPHA
        s = [pow(x, e, P) for x in s]
        s = [
            (sum(pr.mds[r][j] * s2 for j, s2 in enumerate(s)) + pr.round_keys[i][r]) % P
            for r in range(4)
        ]
        if i == 1:
            # after the FIRST half-round the S-box must have been x^(1/5):
            # applying x^5 to the pre-MDS values recovers the inputs
            pass
    assert RescuePermutation(FR).permute(state) == s


def test_round_keys_are_key_scheduling_of_zero():
    """spec Alg 3: fixed-key permutation = PRP with key 0."""
    pr = rescue_params(FR)
    assert key_scheduling(pr, (0, 0, 0, 0)) == pr.round_keys
    # KeyScheduling(0)[0] = 0 + keyinj[0] = IC
    assert pr.round_keys[0] == pr.key_inj[0]


def test_prp_keyed_vs_fixed():
    """RescuePRP(m, k) = RescueWithRoundKeys(m, KeyScheduling(k)); a nonzero
    key must change the output (spec Alg 2)."""
    pr = rescue_params(FR)
    m = [5, 6, 7, 8]
    fixed = permute_with_round_keys(pr, m, pr.round_keys)
    assert fixed == RescuePermutation(FR).permute(m)
    keyed = permute_with_round_keys(pr, m, key_scheduling(pr, (1, 2, 3, 4)))
    assert keyed != fixed


# -- §4.1.4: sponge -----------------------------------------------------------


def test_sponge_zero_iv_and_padding():
    rp = RescuePermutation(FR)
    # zero IV: sponge of one rate-block [a,b,c] is Perm([a,b,c,0])[0]
    out = rp.permute([7, 8, 9, 0])
    assert rp.sponge_no_padding([7, 8, 9], 1)[0] == out[0]
    assert rp.hash_3_to_1(7, 8, 9) == out[0]
    # padded variant appends 1 then zero-fills to a rate multiple
    assert rp.sponge_with_padding([7, 8]) == rp.sponge_no_padding([7, 8, 1])
    assert rp.sponge_with_padding([7, 8, 9]) == rp.sponge_no_padding(
        [7, 8, 9, 1, 0, 0]
    )


# -- §4.1.5: PRF = Full-State Keyed Sponge ------------------------------------


def test_prf_full_state_absorption():
    rp = RescuePermutation(FR)
    key = 12345
    # one chunk of width 4: PRF_k(a, b, c, d) = Perm([a, b, c, d+k])[0]
    got = RescuePRF(4, 1, FR).eval(key, [1, 2, 3, 4])[0]
    assert got == rp.permute([1, 2, 3, (4 + key) % P])[0]
    # zero-padding to the FULL width: input [a] absorbs as [a, 0, 0, 0]
    got1 = RescuePRF(1, 1, FR).eval(key, [9])[0]
    assert got1 == rp.permute([9, 0, 0, key])[0]
    # two-element input (the nullifier shape): [uid, arc, 0, 0]
    got2 = RescuePRF(2, 1, FR).eval(key, [6, 7])[0]
    assert got2 == rp.permute([6, 7, 0, key])[0]


# -- §4.1.6 / §4.1.7: counter-mode cipher and hybrid ElGamal -------------------


def test_counter_mode_key_stream():
    pr = rescue_params(FR)
    key4 = (3, 1, 4, 1)
    rks = key_scheduling(pr, key4)
    data = list(range(10))  # 2 full blocks + partial
    ct = apply_key_stream(FR, key4, data, True)
    # block i offset = RescueWithRoundKeys([i,0,0,0], rks)
    for i in range(3):
        stream = permute_with_round_keys(pr, [i, 0, 0, 0], rks)
        for j, s in enumerate(stream):
            idx = 4 * i + j
            if idx < len(data):
                assert ct[idx] == (data[idx] + s) % P
    assert apply_key_stream(FR, key4, ct, False) == data


def test_elgamal_symmetric_key_is_permuted_dh_point():
    from cap_tpu.crypto.elgamal import ElGamalKeyPair
    from cap_tpu.crypto.jubjub import GENERATOR

    rng = test_rng()
    kp = ElGamalKeyPair.generate(rng)
    r = 987654321
    ct = kp.enc_key().deterministic_encrypt(r, [10, 20, 30, 40, 50])
    assert ct.ephemeral == GENERATOR.mul_scalar(r)
    shared = kp.pk.mul_scalar(r)
    key4 = RescuePermutation(FR).permute([shared.x, shared.y, 0, 0])
    pr = rescue_params(FR)
    stream = permute_with_round_keys(pr, [0, 0, 0, 0], key_scheduling(pr, key4))
    assert ct.symm_ctxts[0] == (10 + stream[0]) % P
    assert kp.decrypt(ct) == [10, 20, 30, 40, 50]


# -- §4.1.2: DSA over Jubjub ---------------------------------------------------


def test_schnorr_spec_shape():
    from cap_tpu.crypto import schnorr as sch
    from cap_tpu.crypto.jubjub import SUBGROUP_ORDER, TEPoint

    rng = test_rng()
    kp = sch.SchnorrKeyPair.generate(rng)
    msg = [42, 43]
    sig1 = kp.sign(msg, rng)
    sig2 = kp.sign(msg, rng)
    # deterministic nonce (spec: r = H(alg_desc, m, sk))
    assert sig1 == sig2
    assert sch.verify(kp.vk, msg, sig1)
    # challenge = PADDED sponge over (X, R, m) — vk first (spec Alg 1)
    rp = RescuePermutation(FR)
    c_expect = rp.sponge_with_padding(
        [kp.vk.x, kp.vk.y, sig1.sig_r.x, sig1.sig_r.y] + msg, 1
    )[0]
    assert sch.challenge(kp.vk, sig1.sig_r, msg) == c_expect
    # verification equation s*B == R + c*X
    from cap_tpu.crypto.jubjub import GENERATOR

    assert GENERATOR.mul_scalar(sig1.s) == sig1.sig_r.add(
        kp.vk.mul_scalar(c_expect)
    )
    # low-order public key rejected ("Fail if 8X = 0"): the 8-torsion point
    # (0, -1) doubles to the identity in 3 steps
    low = TEPoint(0, P - 1)
    assert low.mul_scalar(8).is_neutral()
    assert not sch.verify(low, msg, sig1)


# -- §4.1.8: Merkle tree -------------------------------------------------------


def test_merkle_node_domain_separation():
    from cap_tpu.crypto import merkle as mk

    rp = RescuePermutation(FR)
    # empty node value: 0 at every level
    for lvl in (0, 1, 5, 26):
        assert mk.empty_node_value(lvl) == 0
    # leaf = H(0, uid, elem)
    assert mk.leaf_hash(3, 77) == rp.hash_3_to_1(0, 3, 77)
    t = mk.MerkleTree(3)
    uid = t.push(55)
    # internal nodes above a single leaf hash (leaf, 0, 0) chains
    cur = mk.leaf_hash(0, 55)
    for _ in range(3):
        cur = rp.hash_3_to_1(cur, 0, 0)
    assert t.root == cur
    assert t.check_proof(uid, 55, t.get_path(uid))


def test_decomp_base3_positions():
    from cap_tpu.crypto.merkle import MerkleTree, base3_digits

    # spec Alg 8 decompBase3: leaf position in base 3 (we store LSD-first;
    # the spec lists big-endian — same digits)
    assert base3_digits(14, 4) == [2, 1, 1, 0]  # 14 = 2 + 1*3 + 1*9
    t = MerkleTree(2)
    uids = [t.push(100 + i) for i in range(5)]
    for uid in uids:
        assert t.check_proof(uid, 100 + uid, t.get_path(uid))


# -- §4.2.5: commitments, nullifiers, asset codes ------------------------------


def test_record_commitment_is_plain_sponge():
    rp = RescuePermutation(FR)
    inputs = list(range(1, 13))
    blind = 999
    got = RescueCommitment(12, FR).commit(inputs, blind)
    assert got == rp.sponge_no_padding([blind] + inputs + [0, 0], 1)[0]


def test_nullifier_is_full_state_prf():
    from cap_tpu.keys import NullifierKey

    rp = RescuePermutation(FR)
    nk = NullifierKey(31337)
    uid, rc = 5, 123456789
    assert nk.nullify(uid, rc).value == rp.permute([uid, rc, 0, 31337])[0]


def test_internal_asset_code_prf_shape():
    """derive_at(s, aux) = PRF_s(aux, 0, 0, 0) (spec §4.2.5 circuit spec)."""
    from cap_tpu.structs import AssetCodeSeed, InternalAssetCode, asset_code_digest

    rp = RescuePermutation(FR)
    digest = asset_code_digest(b"spec-anchor-asset")
    iac = InternalAssetCode.new(AssetCodeSeed(77), b"spec-anchor-asset")
    assert iac.value == rp.permute([digest, 0, 0, 77])[0]
