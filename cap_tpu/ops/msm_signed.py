"""Signed-window fixed-base MSM — the prover's KZG-commit engine (v3).

Replaces the round-1 unsigned c=8 windowed MSM (`msm.py`) for SRS commits:

  * **signed 10-bit digits** (balanced representation): 26 windows instead
    of 32 (-19% point adds), and the digit table only stores |d| ∈ [0, 512]
    — negation is a cheap in-kernel `2p - y`;
  * **fused uint16 table** `[513, m, 32]` (x‖y limbs): half the HBM of the
    round-1 uint32 layout and one gather per chunk step instead of two —
    2^17 points fit in ~2.2 GB (the full Aztec-CRS ceiling,
    reference `src/proof/mod.rs:83-101`);
  * **whole-MSM-on-device**: digit extraction, chunked Pallas mixed adds,
    lane-fold tree, cross-window Horner (10 doublings/window) and the final
    z-normalization all run in ONE jitted device program per *batch* of
    polynomials — the host receives only [k, 3, 16] projective points
    (~100 bytes/commit).  On this runtime a host↔device round trip costs
    ~29 ms, so the round-1 flow (transfer 32 window points per poly + host
    Horner) paid more in latency than in compute.

Sharded variant (point axis over a mesh) lives in cap_tpu.parallel.
Reference role: arkworks Pippenger inside jf-plonk (SURVEY.md §2.2 L1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cap_tpu.fields.host import FQ, FR, LIMB_BITS, NLIMBS
from cap_tpu.ops import ec, field_jax as fj, pallas_field as pfl
from cap_tpu.ops import limb_kernels as lk

import os as _os

# window width: CAP_MSM_C env (process-wide).  c=10 -> 26 windows at
# 33 KB/point of table (2^17 fits HBM); c=12 -> 22 windows (-15% point
# adds) at 131 KB/point (2^15 tables ~4.3 GB — the headline-shape sweet
# spot; keep 10 for multi-shape/grid runs where tables accumulate).
WINDOW_BITS = int(_os.environ.get("CAP_MSM_C", "10"))
NUM_WINDOWS = -(-254 // WINDOW_BITS)
HALF = 1 << (WINDOW_BITS - 1)
TABLE_ROWS = HALF + 1                  # |d| in [0, HALF]
# points per accumulation step; smaller chunks cut the pad-lane waste of
# non-chunk-multiple SRS sizes (6% -> 3% at 2^15 with 1024) at the cost of
# more chunk iterations and a taller table file namespace (mp changes)
WCHUNK = int(_os.environ.get("CAP_MSM_WCHUNK", "2048"))


def signed_digits_device(scalars):
    """[n,16] plain-limb scalars -> (absd, neg) both [n, 26] int32/bool.

    Balanced base-1024 digits: s = sum_w d_w * 1024^w with d_w in
    [-512, 512].  Works on uint32 limb arrays; fully vectorized.
    """
    n = scalars.shape[0]
    limbs = jnp.concatenate(
        [scalars, jnp.zeros((n, 1), jnp.uint32)], axis=1
    )  # [n, 17]
    digs = []
    for w in range(NUM_WINDOWS):
        bit = WINDOW_BITS * w
        li, sh = bit // LIMB_BITS, bit % LIMB_BITS
        raw = (limbs[:, li] >> sh) | (limbs[:, li + 1] << (LIMB_BITS - sh))
        digs.append((raw & jnp.uint32((1 << WINDOW_BITS) - 1)).astype(jnp.int32))
    d = jnp.stack(digs, axis=1)  # [n, 26] in [0, 1023]

    def step(carry, dw):
        v = dw + carry
        wrap = v > HALF
        out = jnp.where(wrap, v - (1 << WINDOW_BITS), v)
        return wrap.astype(jnp.int32), out

    carry, out = lax.scan(step, jnp.zeros((n,), jnp.int32), jnp.moveaxis(d, 1, 0))
    d = jnp.moveaxis(out, 0, 1)  # [n, 26] in [-512, 512]; top carry is 0 (<2^254)
    return jnp.abs(d), d < 0


def _batch_inverse(x, ctx):
    """Montgomery batched inversion of [m,16] (prefix/suffix-product trick).

    Shift-ladder prefix/suffix products with the flat Pallas multiplier on
    block-aligned sizes — the round-3 version used lax.associative_scan
    over the scan-CIOS multiply, which dominated the 348 s signed-table
    build (the cold-start cliff, VERDICT r3 item 2)."""
    from cap_tpu.ops import pallas_field as pfl

    m = x.shape[0]
    if pfl.use_pallas() and m % pfl.BLK == 0:
        pref = pfl.prefix_prod_fused(x, ctx)        # prod x[:i+1]
        suf = pfl.suffix_prod_fused(x, ctx)         # prod x[i:]
    else:
        pref = fj.prefix_prod(x, ctx)
        suf = fj.suffix_prod(x, ctx)
    total_inv = pfl.inv_elem(pref[-1:], ctx)
    prev = jnp.concatenate([fj.one_mont((1,), ctx), pref[:-1]], axis=0)
    nxt = jnp.concatenate([suf[1:], fj.one_mont((1,), ctx)], axis=0)
    return fj.mont_mul(fj.mont_mul(prev, nxt, ctx), total_inv, ctx)


def build_signed_table(px, py, m: int, mp: int | None = None) -> jnp.ndarray:
    """Precompute d*P_i for d in [0, 512]: [513, mp, 32] uint16 (x‖y limbs,
    Montgomery affine).  Row 0 duplicates the base (masked out at use).

    px, py: [m, 16] canonical Montgomery affine coords of the SRS points.
    mp: pad target (defaults to the next WCHUNK multiple; a mesh-sharded
    commit passes D*WCHUNK granularity so every device gets whole chunks).
    """
    if mp is None:
        mp = ((m + WCHUNK - 1) // WCHUNK) * WCHUNK
    assert mp % WCHUNK == 0 and mp >= m
    pad = mp - m
    if pad:
        one = jnp.broadcast_to(fj.one_mont((), fj.FQ_CTX), (pad, NLIMBS))
        px = jnp.concatenate([px, jnp.zeros((pad, NLIMBS), jnp.uint32)])
        py = jnp.concatenate([py, one])

    @jax.jit
    def _build_block(px, py):
        cblk = px.shape[0]
        one = fj.one_mont((cblk,), fj.FQ_CTX)

        def tiled(level):
            s = level[0].shape[0]
            return tuple(
                pfl.to_limb_major(c.reshape(s * cblk, NLIMBS)) for c in level
            )

        def untiled(t, s):
            return tuple(
                pfl.from_limb_major(c).reshape(s, cblk, NLIMBS) for c in t
            )

        # levelized d*P ladder: level j holds d in [2^j, 2^(j+1)) — evens by
        # one batched double of level j-1, odds by one batched mixed +P.
        # Levels run to d = HALF - 1 = 2^(c-2+1) - 1 only: balanced digits
        # gather |d| <= HALF, so the ladder stops a level short of 2^c and
        # the single d = HALF row comes from one extra double (dtop below).
        # (The first levelized version ran the ladder to 2^c - 1, building
        # 2x the rows the gather can ever touch — 2x table HBM and build
        # time for nothing.)
        levels = [(px[None], py[None], one[None])]  # d = 1
        for j in range(1, WINDOW_BITS - 1):
            prev = levels[-1]
            s = prev[0].shape[0]
            pt = tiled(prev)
            dt = pfl.ec_add_pallas_tiled(pt, pt)  # d = 2e (redundant coords)
            gx = jnp.tile(px, (s, 1))
            gy = jnp.tile(py, (s, 1))
            gt = (pfl.to_limb_major(gx), pfl.to_limb_major(gy))
            mask = jnp.ones((s * cblk // 128, 1, 128), jnp.uint32)
            ot = pfl.ec_add_mixed_pallas_tiled(dt, gt, mask)  # d = 2e + 1
            evens = untiled(dt, s)
            odds = untiled(ot, s)
            levels.append(
                tuple(
                    jnp.stack([e, o], axis=1).reshape(2 * s, cblk, NLIMBS)
                    for e, o in zip(evens, odds)
                )
            )
        phalf = tuple(c[0].reshape(cblk, NLIMBS) for c in levels[-1])
        thalf = tiled(tuple(c[None] for c in phalf))
        dtop = untiled(pfl.ec_add_pallas_tiled(thalf, thalf), 1)
        allx = jnp.concatenate([lv[0] for lv in levels] + [dtop[0]], axis=0)
        ally = jnp.concatenate([lv[1] for lv in levels] + [dtop[1]], axis=0)
        allz = jnp.concatenate([lv[2] for lv in levels] + [dtop[2]], axis=0)
        # normalize redundant coords then batch-invert z over the flattened rows
        norm = lambda a: jax.vmap(
            lambda t: pfl.from_limb_major(pfl.normalize_tiled(pfl.to_limb_major(t)))
        )(a)
        allx, ally, allz = norm(allx), norm(ally), norm(allz)
        flat_z = allz.reshape(-1, NLIMBS)
        # guard: padded lanes carry a fake (0,1) base whose chain may hit
        # z == 0, which would zero the whole prefix product — swap in 1
        zero_z = fj.is_zero(flat_z)
        flat_z = fj.select(~zero_z, flat_z, fj.one_mont((flat_z.shape[0],), fj.FQ_CTX))
        zinv = _batch_inverse(flat_z, fj.FQ_CTX).reshape(allz.shape)
        ax = fj.mont_mul(allx, zinv, fj.FQ_CTX)
        ay = fj.mont_mul(ally, zinv, fj.FQ_CTX)
        # prepend the d=0 row (= base point, masked at gather time)
        ax = jnp.concatenate([px[None], ax], axis=0)     # [513, C, 16]
        ay = jnp.concatenate([py[None], ay], axis=0)
        fused = jnp.concatenate([ax, ay], axis=-1)       # [513, C, 32]
        return fused.astype(jnp.uint16)

    blocks = []
    for k in range(mp // WCHUNK):
        blocks.append(
            _build_block(px[k * WCHUNK:(k + 1) * WCHUNK], py[k * WCHUNK:(k + 1) * WCHUNK])
        )
    return jnp.concatenate(blocks, axis=1)


def _ec_double_dev(p):
    return ec.ec_add(p, p)


def msm_signed_windows_device(table, scalars_batch):
    """Batched fixed-base MSM, device part: per-window sums.

    table: [513, mp, 32] uint16 from build_signed_table.
    scalars_batch: [k, mp, 16] plain-limb scalars (pad with zeros).
    Returns [k, 26, 3, 16]: canonical projective window sum T_w per
    polynomial; the commitment is sum_w 1024^w T_w (host Horner).
    """
    tab = table
    mp = tab.shape[1]
    k, n, _ = scalars_batch.shape
    assert n == mp, (n, mp)
    nchunks = mp // WCHUNK
    kw = k * NUM_WINDOWS
    nlanes = kw * WCHUNK

    absd, neg = jax.vmap(signed_digits_device)(scalars_batch)  # [k, mp, 26]
    absd = jnp.moveaxis(absd, 2, 1).reshape(kw, mp)            # [k*26, mp]
    neg = jnp.moveaxis(neg, 2, 1).reshape(kw, mp)

    ident = ec.identity((nlanes,))
    acc_t = tuple(pfl.to_limb_major(c) for c in ident)

    def chunk_body(c, acc_t):
        dg = lax.dynamic_slice_in_dim(absd, c * WCHUNK, WCHUNK, axis=1)   # [kw, C]
        ng = lax.dynamic_slice_in_dim(neg, c * WCHUNK, WCHUNK, axis=1)    # [kw, C]
        rows = lax.dynamic_slice_in_dim(tab, c * WCHUNK, WCHUNK, axis=1)  # [513, C, 32]
        # gather: out[w, c, :] = rows[dg[w, c], c, :]
        gathered = jnp.take_along_axis(
            rows[:, None, :, :], dg[None, :, :, None], axis=0
        )[0]                                                               # [kw, C, 32]
        g32 = gathered.astype(jnp.uint32).reshape(nlanes, 32)
        gx = g32[:, :NLIMBS]
        gy = g32[:, NLIMBS:]
        mask3 = (dg != 0).astype(jnp.uint32).reshape(-1, 1, 128)
        negm = ng.reshape(-1, 1, 128).astype(jnp.uint32)
        g_t = (pfl.to_limb_major(gx), pfl.to_limb_major(gy))
        return pfl.ec_add_mixed_signed_pallas_tiled(acc_t, g_t, mask3, negm)

    acc_t = lax.fori_loop(0, nchunks, chunk_body, acc_t)

    # lane-fold tree (Pallas while tile-aligned, then XLA)
    width = WCHUNK
    while width > 128:
        half = width // 2
        lo, hi = [], []
        for c in acc_t:
            c4 = c.reshape(kw, width // 128, NLIMBS, 128)
            lo.append(c4[:, : half // 128].reshape(-1, NLIMBS, 128))
            hi.append(c4[:, half // 128:].reshape(-1, NLIMBS, 128))
        acc_t = pfl.ec_add_pallas_tiled(tuple(lo), tuple(hi))
        width = half

    accs = tuple(
        pfl.from_limb_major(pfl.normalize_tiled(c)).reshape(kw, width, NLIMBS)
        for c in acc_t
    )
    acc = accs
    while width > 1:
        half = width // 2
        lo = tuple(c[:, :half] for c in acc)
        hi = tuple(c[:, half:width] for c in acc)
        acc = ec.ec_add(lo, hi)
        width = half
    t_win = tuple(c.reshape(k, NUM_WINDOWS, NLIMBS) for c in acc)  # [k, 26, 16]
    return jnp.stack(t_win, axis=2)  # [k, 26, 3, 16] projective (canonical)


def msm_signed_commit_device(table, scalars_batch):
    """Whole batched MSM on device: window sums + one-kernel Horner fold.

    Returns [k, 3, 16] canonical projective points — the host only
    z-normalizes (k tiny inversions).  Replaces the round-2a flow that
    shipped [k, 26, 3, 16] to the host for a bigint Horner (~8 ms host work
    + a larger transfer per commit batch)."""
    t_win_s = msm_signed_windows_device(table, scalars_batch)  # [k,26,3,16]
    k = t_win_s.shape[0]
    # t_win_s axes (k, w, coord, limb) -> per coord [w, limb, k-lanes]
    per = []
    for c in range(3):
        a = jnp.transpose(t_win_s[:, :, c, :], (1, 2, 0))  # [26, 16, k]
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 128 - k)))
        per.append(a)
    from cap_tpu.ops import pallas_field as pfl

    ox, oy, oz = pfl.horner_fold_pallas(tuple(per), NUM_WINDOWS, WINDOW_BITS)
    out = jnp.stack([ox, oy, oz], axis=0)  # [3, 16, 128]
    return jnp.transpose(out[:, :, :k], (2, 0, 1))  # [k, 3, 16]


def msm_signed_batch_device(table, scalars_batch):
    """Batched fixed-base MSM, entirely on device (including the Horner).

    Kept for mesh composition; the prover uses msm_signed_windows_device +
    host Horner instead — ~250 sequential scan-based EC ops on device cost
    ~400 ms of launch overhead vs ~8 ms of host bigint work + one 8 KB
    transfer."""
    t_win_s = msm_signed_windows_device(table, scalars_batch)
    t_win = tuple(t_win_s[:, :, i] for i in range(3))
    k = scalars_batch.shape[0]

    # cross-window Horner on device: acc = 1024*acc + T_w, MSB-first
    def horner_step(acc, w):
        widx = NUM_WINDOWS - 1 - w
        tw = tuple(lax.dynamic_index_in_dim(c, widx, axis=1, keepdims=False)
                   for c in t_win)  # [k, 16] each

        def dbl(i, a):
            return _ec_double_dev(a)

        acc = lax.fori_loop(0, WINDOW_BITS, dbl, acc)
        return ec.ec_add(acc, tw), None

    init = ec.identity((k,))
    # first window (MSB) without pre-doubling
    top = tuple(lax.dynamic_index_in_dim(c, NUM_WINDOWS - 1, axis=1, keepdims=False)
                for c in t_win)
    acc0 = ec.ec_add(init, top)
    acc_fin, _ = lax.scan(
        lambda a, w: horner_step(a, w + 1), acc0, jnp.arange(NUM_WINDOWS - 1)
    )
    return jnp.stack(acc_fin, axis=1)  # [k, 3, 16]


def points_from_windows_result(res) -> list:
    """[k, 26, 3, 16] device window sums -> k host affine points (or None).

    One batched z-inversion over all k*26 windows, then a 26-step Horner
    (10 doublings/window) per polynomial in host bigints.
    """
    from cap_tpu.crypto.bn254 import g1j_add, g1j_double, g1j_from_affine, g1j_to_affine
    from cap_tpu.ops.limbs import limbs_to_ints

    arr = np.asarray(res)
    k = arr.shape[0]
    flat = arr.reshape(k * NUM_WINDOWS, 3, NLIMBS)
    xs = limbs_to_ints(flat[:, 0], FQ)
    ys = limbs_to_ints(flat[:, 1], FQ)
    zs = limbs_to_ints(flat[:, 2], FQ)
    nz = [(i, z) for i, z in enumerate(zs) if z != 0]
    zinvs = FQ.batch_inv([z for _, z in nz]) if nz else []
    zmap = {i: zi for (i, _), zi in zip(nz, zinvs)}
    out = []
    for i in range(k):
        acc = (1, 1, 0)
        for w in reversed(range(NUM_WINDOWS)):
            for _ in range(WINDOW_BITS):
                acc = g1j_double(acc)
            j = i * NUM_WINDOWS + w
            if zs[j] != 0:
                zi = zmap[j]
                acc = g1j_add(
                    acc, g1j_from_affine((xs[j] * zi % FQ.p, ys[j] * zi % FQ.p))
                )
        out.append(g1j_to_affine(acc))
    return out


def points_from_batch_result(res) -> list:
    """[k, 3, 16] device result -> k host affine points (or None)."""
    from cap_tpu.ops.limbs import limbs_to_ints

    arr = np.asarray(res)
    k = arr.shape[0]
    xs = limbs_to_ints(arr[:, 0], FQ)
    ys = limbs_to_ints(arr[:, 1], FQ)
    zs = limbs_to_ints(arr[:, 2], FQ)
    out = []
    for i in range(k):
        if zs[i] == 0:
            out.append(None)
            continue
        zi = pow(zs[i], -1, FQ.p)
        out.append((xs[i] * zi % FQ.p, ys[i] * zi % FQ.p))
    return out


def msm_signed_host_check(table, scalars_host):
    """Host-side result for tests: full MSM via the device path."""
    from cap_tpu.ops.msm import scalars_to_device

    mp = table.shape[1]
    sc = list(scalars_host) + [0] * (mp - len(scalars_host))
    dev = msm_signed_batch_device(table, scalars_to_device(sc)[None])
    return points_from_batch_result(dev)[0]
