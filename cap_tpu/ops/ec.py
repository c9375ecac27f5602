"""Vectorized BN254 G1 arithmetic in homogeneous projective coordinates.

Uses the complete addition formulas for short-Weierstrass curves with a = 0
(Renes–Costello–Batina 2015, Algorithm 7): a single branch-free formula that
is correct for *all* input pairs — doubling, identity (0:1:0), inverses —
which is exactly what SIMD/VPU execution and the MSM's masked tree
reductions need (SURVEY.md §7 "hard parts" (2)).  Cost: 12 field muls + 2
mul-by-3b + adds per point add, all on [.., 16]-limb Montgomery arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import FQ, NLIMBS
from cap_tpu.ops import field_jax as fj
from cap_tpu.ops.field_jax import FQ_CTX
from cap_tpu.ops.limbs import ints_to_limbs, limbs_to_ints

# 3*b for y^2 = x^3 + 3
_B3 = 9
_B3_MONT = ints_to_limbs([_B3], FQ)[0]


def identity(shape=()):
    """(0 : 1 : 0) in Montgomery limb form, broadcast to `shape`."""
    x = fj.zero(shape, FQ_CTX)
    y = fj.one_mont(shape, FQ_CTX)
    z = fj.zero(shape, FQ_CTX)
    return x, y, z


def from_affine(x, y):
    """Affine Montgomery limb arrays -> projective (Z = 1)."""
    return x, y, fj.one_mont(x.shape[:-1], FQ_CTX)


def ec_add(p1, p2):
    """Complete projective addition (RCB15 alg. 7, a=0, b3=9)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    m = lambda a, b: fj.mont_mul(a, b, FQ_CTX)
    add = lambda a, b: fj.add(a, b, FQ_CTX)
    sub = lambda a, b: fj.sub(a, b, FQ_CTX)
    b3 = jnp.asarray(_B3_MONT)  # [16]; broadcasts against any batch shape

    t0 = m(x1, x2)
    t1 = m(y1, y2)
    t2 = m(z1, z2)
    t3 = m(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))            # x1y2 + x2y1
    t4 = m(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))            # y1z2 + y2z1
    x3 = m(add(x1, z1), add(x2, z2))
    y3 = sub(x3, add(t0, t2))            # x1z2 + x2z1
    t0 = add(add(t0, t0), t0)            # 3*x1x2
    t2 = m(b3, t2)                        # b3*z1z2
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = m(b3, y3)                        # b3*(x1z2+x2z1)
    x3 = sub(m(t3, t1), m(t4, y3))
    y3 = add(m(y3, t0), m(t1, z3))
    z3 = add(m(z3, t4), m(t0, t3))
    return x3, y3, z3


def ec_add_mixed(p1, p2_affine):
    """Complete mixed addition (RCB15 alg. 8, a=0): p1 projective (may be the
    identity), p2 affine and NOT the identity.  11M + 2 mul-by-3b."""
    x1, y1, z1 = p1
    x2, y2 = p2_affine
    m = lambda a, b: fj.mont_mul(a, b, FQ_CTX)
    add = lambda a, b: fj.add(a, b, FQ_CTX)
    sub = lambda a, b: fj.sub(a, b, FQ_CTX)
    b3 = jnp.asarray(_B3_MONT)

    t0 = m(x1, x2)
    t1 = m(y1, y2)
    t3 = m(add(x2, y2), add(x1, y1))
    t3 = sub(t3, add(t0, t1))            # x1y2 + x2y1
    t4 = add(m(y2, z1), y1)              # y1 + y2z1
    y3 = add(m(x2, z1), x1)              # x1 + x2z1
    t0 = add(add(t0, t0), t0)            # 3*x1x2
    t2 = m(b3, z1)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = m(b3, y3)
    x3 = sub(m(t3, t1), m(t4, y3))
    y3 = add(m(y3, t0), m(t1, z3))
    z3 = add(m(z3, t4), m(t0, t3))
    return x3, y3, z3


def ec_double(p):
    return ec_add(p, p)


def ec_select(mask, p_true, p_false):
    """Per-lane point select; mask shape == batch shape."""
    return tuple(
        fj.select(mask, a, b) for a, b in zip(p_true, p_false)
    )


def ec_neg(p):
    x, y, z = p
    return x, fj.sub(fj.zero(y.shape[:-1], FQ_CTX), y, FQ_CTX), z


def tree_reduce(p):
    """Sum a batch of points along axis 0 via pairwise halving (log depth)."""
    x, y, z = p
    n = x.shape[0]
    while n > 1:
        half = n // 2
        lo = (x[:half], y[:half], z[:half])
        hi = (x[half : 2 * half], y[half : 2 * half], z[half : 2 * half])
        sx, sy, sz = ec_add(lo, hi)
        if n % 2:
            # fold the straggler into lane 0
            tail = (x[n - 1 : n], y[n - 1 : n], z[n - 1 : n])
            head = (sx[:1], sy[:1], sz[:1])
            hx, hy, hz = ec_add(head, tail)
            sx = jnp.concatenate([hx, sx[1:]], axis=0)
            sy = jnp.concatenate([hy, sy[1:]], axis=0)
            sz = jnp.concatenate([hz, sz[1:]], axis=0)
        x, y, z = sx, sy, sz
        n = half
    return x[0], y[0], z[0]


# ---------------------------------------------------------------------------
# host interop
# ---------------------------------------------------------------------------


def points_to_device(points) -> tuple:
    """Affine host points [(x,y) or None] -> (X, Y, Z) Montgomery limb arrays."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    return (
        jnp.asarray(ints_to_limbs(xs, FQ)),
        jnp.asarray(ints_to_limbs(ys, FQ)),
        jnp.asarray(ints_to_limbs(zs, FQ)),
    )


def point_to_host(p):
    """Single projective device point -> affine host tuple or None."""
    x, y, z = (np.asarray(c).reshape(1, NLIMBS) for c in p)
    xi = limbs_to_ints(x, FQ)[0]
    yi = limbs_to_ints(y, FQ)[0]
    zi = limbs_to_ints(z, FQ)[0]
    if zi == 0:
        return None
    zinv = pow(zi, -1, FQ.p)
    return (xi * zinv % FQ.p, yi * zinv % FQ.p)
