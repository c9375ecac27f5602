"""CPU numeric check of the signed-window MSM (CAP_PALLAS=0 fallback)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CAP_PALLAS"] = "0"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import random

from cap_tpu.ops import ec, msm_signed as ms
from cap_tpu.ops.msm import scalars_to_device
from cap_tpu.fields.host import FR
from cap_tpu.crypto.bn254 import g1_msm_host

ms.WCHUNK = 256
random.seed(11)

from cap_tpu.crypto.bn254 import G1_GEN, g1j_from_affine, g1j_add, g1j_double, g1j_to_affine


def rand_pt(k):
    acc = (1, 1, 0); base = g1j_from_affine(G1_GEN)
    while k:
        if k & 1: acc = g1j_add(acc, base)
        base = g1j_double(base); k >>= 1
    return g1j_to_affine(acc)


m = 256
pts = [rand_pt(random.randrange(1, FR.p)) for _ in range(16)] * (m // 16)
px, py, _ = ec.points_to_device(pts)
print("building table...")
tab = ms.build_signed_table(px, py, m)
print("table:", tab.shape, tab.dtype)

# digit check
scalars = [random.randrange(FR.p) for _ in range(4)] + [0, 1, FR.p - 1, 512]
sc = scalars_to_device(scalars)
absd, neg = ms.signed_digits_device(sc)
absd_h, neg_h = np.asarray(absd), np.asarray(neg)
for i, s in enumerate(scalars):
    acc = 0
    for w in range(ms.NUM_WINDOWS):
        d = int(absd_h[i, w]) * (-1 if neg_h[i, w] else 1)
        acc += d * (1 << (ms.WINDOW_BITS * w))
    assert acc == s, (i, s, acc)
print("signed digits OK")

# full MSM vs host
k = 3
scal_batch = [[random.randrange(FR.p) for _ in range(m)] for _ in range(k)]
import jax.numpy as jnp
sb = jnp.stack([scalars_to_device(s) for s in scal_batch])
res = ms.msm_signed_batch_device(tab, sb)
got = ms.points_from_batch_result(res)
for i in range(k):
    want = g1_msm_host(scal_batch[i], pts)
    assert got[i] == want, f"poly {i} mismatch"
print("signed MSM batch OK")

# commit path (device Horner fold kernel / XLA fallback)
res2 = ms.msm_signed_commit_device(tab, sb)
got2 = ms.points_from_batch_result(res2)
for i in range(k):
    want = g1_msm_host(scal_batch[i], pts)
    assert got2[i] == want, f"commit-fold poly {i} mismatch"
print("signed MSM commit fold OK")
