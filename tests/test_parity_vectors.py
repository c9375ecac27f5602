"""Bit-parity scaffolding (SURVEY §4.7, VERDICT round-1 item 5).

Three layers:
1. Regression pins: the self-generated Rescue constants and their derived
   outputs are frozen here, so any accidental change to the constant
   pipeline (host, device, native) fails loudly.
2. Injection: CAP_RESCUE_TABLE swaps the whole stack's Rescue constants
   from a JSON table with no code change — exercised in a subprocess with
   a synthetic table, checking host permutation against an independent
   inline evaluator AND circuit-gadget satisfiability under the injected
   constants (proves the "data-only swap" seam actually reaches every
   consumer).
3. Drop-in: if data/jellyfish_rescue_bn254.json + data/parity_vectors.json
   ever land (jellyfish's published tables + reference-generated vectors),
   the harness asserts our outputs match them exactly.
"""

import json
import os
import subprocess
import sys

import pytest

from cap_tpu.crypto.rescue import RescuePermutation, rescue_params
from cap_tpu.fields.host import FR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# -- layer 1: regression pins (spec Alg 2-3 instantiation, r4) ---------------
# The permutation structure follows the reference spec PDF §4.1.3 exactly
# (inverse-alpha S-box first each round, round keys = KeyScheduling(0) over
# the key-injection vectors); the CONSTANTS (MDS/IC/K/C sampling) remain the
# documented seam (the Marvellous generator script is egress-blocked).
# These pins freeze the current derivation.

PERM_1234 = [
    0x214E58C567808F9948E2F07B0630A5CB55F05B6E67C763D3916836D98E5D3EF6,
    0x2CFE0AD937DBFAAC91FDEBEEF95953D3986415060FED9D3950309921626ABEAC,
    0x1ABC21E70C5957A3E5881C2A32E2D9F97E535A21103D6F131F1DBC339506E3E4,
    0x02186FE6614857671EC1051D4D6B78F514B99C109B1A4D71B474B55CF0340A62,
]
SPONGE_567 = 0x00FC8CAA7D9CB93F33352603BC05C06C0DF12FAFB6BA606A31CBF079AFC96D0C
MDS00 = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593EFFFC2F8
RK10 = 0x2A1DE07510519270B02383704DFECE5E8E0FC7FF1466DB9AA84800B685AA174B
IC0 = 0x1947450AD436429BDE749AB7BB4BE062792D206CD766CA5BF874E108227786B0


def test_rescue_regression_vectors():
    rp = RescuePermutation(FR)
    assert rp.permute([1, 2, 3, 4]) == PERM_1234
    assert rp.sponge_with_padding([5, 6, 7], 1)[0] == SPONGE_567
    pr = rescue_params(FR)
    assert pr.mds[0][0] == MDS00
    # round keys = KeyScheduling(0): keys[0] = 0 + IC (spec Alg 2/3)
    assert pr.round_keys[0] == pr.key_inj[0]
    assert pr.key_inj[0][0] == IC0
    assert pr.round_keys[1][0] == RK10


# -- layer 2: constants injection reaches every consumer ---------------------

_SUBPROC = r"""
import json, sys
sys.path.insert(0, "@REPO@")
from cap_tpu.crypto.rescue import RescuePermutation, rescue_params, ROUNDS, STATE_WIDTH
from cap_tpu.fields.host import FR

pr = rescue_params(FR)
table = json.load(open("@PATH@"))
assert pr.mds[0][0] == int(table["mds"][0][0]), "table not injected"

# independent inline evaluation with the injected table
p = FR.p
mds = [[int(v) for v in row] for row in table["mds"]]
rks = [[int(v) for v in row] for row in table["round_keys"]]
ai = pow(5, -1, p - 1)
def mdsk(s, k):
    return [(sum(mds[i][j] * s[j] for j in range(4)) + k[i]) % p for i in range(4)]
s = [(v + rks[0][i]) % p for i, v in enumerate([9, 8, 7, 6])]
for r in range(ROUNDS):
    # spec Alg 2: inverse S-box first, then the forward box
    s = mdsk([pow(x, ai, p) for x in s], rks[2 * r + 1])
    s = mdsk([pow(x, 5, p) for x in s], rks[2 * r + 2])
got = RescuePermutation(FR).permute([9, 8, 7, 6])
assert got == s, "host permutation ignores injected constants"

# the circuit gadget must follow the same constants (host/circuit parity)
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets.rescue import rescue_sponge_no_padding_gadget
c = PlonkCircuit()
ins = [c.load(v) for v in (11, 22, 33)]
out = rescue_sponge_no_padding_gadget(c, ins, 1)[0]
host = RescuePermutation(FR).sponge_no_padding([11, 22, 33], 1)[0]
assert c.witness(out) == host, "gadget/host mismatch under injected constants"
assert c.check_circuit_satisfiability(c.public_input())
print("INJECTION-OK")
"""


def test_rescue_table_injection(tmp_path):
    pr = rescue_params(FR)
    # synthetic alternative table: rotate the round keys, tweak the MDS by
    # a benign +1 on one entry (keeps it invertible w.h.p. for this check)
    table = {
        "p": hex(FR.p),
        "alpha": 5,
        "mds": [[str((v + (i == j)) % FR.p) for j, v in enumerate(row)]
                for i, row in enumerate(pr.mds)],
        "round_keys": [[str(v) for v in pr.round_keys[(r + 3) % 25]]
                       for r in range(25)],
    }
    path = tmp_path / "rescue_table.json"
    path.write_text(json.dumps(table))
    env = dict(os.environ, CAP_RESCUE_TABLE=str(path), CAP_PALLAS="0",
               JAX_PLATFORMS="cpu")
    script = _SUBPROC.replace("@REPO@", REPO).replace("@PATH@", str(path))
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "INJECTION-OK" in res.stdout


# -- layer 3: jellyfish drop-in (activates when tables land) -----------------


def test_jellyfish_tables_if_present():
    jf = os.path.join(REPO, "data", "jellyfish_rescue_bn254.json")
    vec = os.path.join(REPO, "data", "parity_vectors.json")
    if not os.path.exists(jf):
        pytest.skip("jellyfish constants table not present (zero-egress env)")
    env = dict(os.environ, CAP_RESCUE_TABLE=jf, JAX_PLATFORMS="cpu")
    script = (
        "import json,sys; sys.path.insert(0, %r);"
        "from cap_tpu.crypto.rescue import RescuePermutation;"
        "from cap_tpu.fields.host import FR;"
        "v=json.load(open(%r));"
        "rp=RescuePermutation(FR);"
        "assert [hex(x) for x in rp.permute([int(s,0) for s in v['perm_in']])]"
        " == v['perm_out'];"
        "print('JF-OK')" % (REPO, vec)
    )
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
