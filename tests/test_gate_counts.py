"""Gate-count parity with jellyfish's hand-tuned circuits (VERDICT r3 item 8).

The one count the reference pins in-source: transfer 2-in/6-out at tree
depth 10 = 30740 constraints, eval domain 32768
(/root/reference/src/proof/transfer.rs:602-604).  Round 3 ran 10-30% over;
round 4's spec alignment (counter-mode ElGamal gadget, zero-IV commitment)
landed within 2%.  This test pins the <=5% envelope AND that no reference
grid shape crosses an avoidable domain tier.
"""

from cap_tpu.proof.freeze import dummy_freeze_circuit
from cap_tpu.proof.transfer import dummy_transfer_circuit


def dummy_mint_circuit(tree_depth: int):
    from cap_tpu.circuits.mint import build_mint_circuit
    from cap_tpu.proof.mint import MintPublicInput, MintWitness

    wit = MintWitness.dummy(tree_depth)
    pub = MintPublicInput.from_witness(wit, fee=0)
    return build_mint_circuit(wit, pub, tree_depth)

REF_2X6_D10 = 30740  # reference src/proof/transfer.rs:602-604


def test_transfer_2x6_depth10_within_5pct_of_reference():
    c = dummy_transfer_circuit(2, 6, 10)
    fin = c.finalize_for_arithmetization()
    n = c.num_gates()
    assert fin.n == 32768, f"domain {fin.n} != reference 32768"
    assert abs(n - REF_2X6_D10) / REF_2X6_D10 <= 0.05, (
        f"gate count {n} deviates >5% from reference {REF_2X6_D10}"
    )


def test_grid_shapes_domain_tiers():
    """Reference SRS-degree ladder (src/utils/mod.rs:137-193): each shape
    must land in the same power-of-two domain tier as the reference —
    crossing a tier silently doubles prove time."""
    # (builder, args, reference domain) — depth 26 grid + small freeze
    cases = [
        (dummy_transfer_circuit, (2, 2, 26), 32768),
        (dummy_mint_circuit, (26,), 16384),       # mint SRS 2^14+2
        (dummy_freeze_circuit, (2, 5), 16384),    # freeze-2 depth 5: 2^14+2
    ]
    for build, args, want in cases:
        fin = build(*args).finalize_for_arithmetization()
        assert fin.n == want, f"{build.__name__}{args}: domain {fin.n} != {want}"
