"""Multi-scalar multiplication on device (the prover's #1 hot kernel).

KZG commitments are MSMs over the fixed SRS (SURVEY.md §2.2: arkworks
Pippenger → "bucket-sharded Pippenger over ICI").  Round-1 design: a fully
dense, branch-free **per-bit masked reduction** —

    result = sum_b 2^b * T_b,   T_b = sum_{i : bit_b(s_i)=1} P_i

Per bit, T_b is computed in two fixed-shape phases so the compiled graph
stays tiny (a couple of `ec_add` instances inside `fori_loop`s):

  phase 1: chunk accumulation — CHUNK point-lanes sweep the n points,
           masked-selecting P_i or the identity (complete formulas make the
           identity a true neutral element, so masking is free of branches);
  phase 2: lane folding — the CHUNK partial sums are halved log2(CHUNK)
           times by adding a rolled copy of the lane vector.

The outer loop runs MSB-first with acc = 2*acc + T_b.  Zero scatter/gather,
zero data-dependent shapes; sharding across chips splits the point axis and
psum-reduces T_b (cap_tpu.parallel).  A sort-based Pippenger with bucket
compaction is the planned upgrade; this version is the correctness and
scaling anchor.

Scalars arrive as *plain* (non-Montgomery) 16x16-bit limb arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cap_tpu.fields.host import FQ, FR, LIMB_BITS, NLIMBS
from cap_tpu.ops import ec
from cap_tpu.ops.limbs import ints_to_limbs

SCALAR_BITS = 254
CHUNK = 256


def scalars_to_device(scalars) -> jnp.ndarray:
    """Host ints (mod r) -> [n, 16] plain limb array."""
    return jnp.asarray(ints_to_limbs([s % FR.p for s in scalars]))


def pad_msm_inputs(points_host, scalars_host, chunk: int = CHUNK):
    """Pad to a multiple of `chunk` with identity points / zero scalars."""
    n = len(points_host)
    pad = (-n) % chunk
    pts = list(points_host) + [None] * pad
    scs = list(scalars_host) + [0] * pad
    px, py, pz = ec.points_to_device(pts)
    return (px, py, pz), scalars_to_device(scs)


def _bits_of(scalars, b):
    """Bit b (traced) of each scalar row: [n] uint32 in {0,1}."""
    limb = b // LIMB_BITS
    shift = (b % LIMB_BITS).astype(jnp.uint32) if hasattr(b, "astype") else b % LIMB_BITS
    col = lax.dynamic_slice_in_dim(scalars, limb, 1, axis=1)[:, 0]
    return (col >> shift) & 1


def scalar_bits(scalars, nbits: int = SCALAR_BITS):
    """All bits of [n,16] plain limb scalars: [n, nbits] uint32 in {0,1}."""
    shifts = jnp.arange(LIMB_BITS, dtype=jnp.uint32)
    b = (scalars[:, :, None] >> shifts[None, None, :]) & 1  # [n, 16, 16]
    return b.reshape(scalars.shape[0], NLIMBS * LIMB_BITS)[:, :nbits]


def msm_device(points, scalars, nbits: int = SCALAR_BITS):
    """Device part of the MSM: per-bit sums T_b = sum_{bit_b(s_i)} P_i.

    Maintains all SCALAR_BITS bit-accumulators as one [254, CHUNK] lane array
    so every chunk step is a single ~65k-lane complete EC add (launch-count
    is n/CHUNK, not n*bits/CHUNK — TPU kernels need the work per launch).
    Returns [254]-batched projective points.
    """
    px, py, pz = points
    n = px.shape[0]
    assert n % CHUNK == 0, "pad inputs with pad_msm_inputs"
    nchunks = n // CHUNK
    bits = scalar_bits(scalars, nbits)  # [n, nbits]
    ident = ec.identity((nbits, CHUNK))

    def chunk_body(k, t_acc):
        sl = tuple(
            lax.dynamic_slice_in_dim(c, k * CHUNK, CHUNK, axis=0)
            for c in (px, py, pz)
        )
        bc = lax.dynamic_slice_in_dim(bits, k * CHUNK, CHUNK, axis=0)  # [CHUNK,nbits]
        mask = jnp.transpose(bc).astype(jnp.bool_)                     # [nbits,CHUNK]
        slb = tuple(
            jnp.broadcast_to(c[None], (nbits, CHUNK, NLIMBS)) for c in sl
        )
        sel = ec.ec_select(mask, slb, ident)
        return ec.ec_add(t_acc, sel)

    t_acc = lax.fori_loop(0, nchunks, chunk_body, ident)

    # fold the CHUNK lanes (axis 1) with a halving tree — static shapes
    width = CHUNK
    while width > 1:
        half = width // 2
        lo = tuple(c[:, :half] for c in t_acc)
        hi = tuple(c[:, half:width] for c in t_acc)
        t_acc = ec.ec_add(lo, hi)
        width = half
    return tuple(c[:, 0] for c in t_acc)  # [nbits] points, index = bit


def horner_bits_host(t_bits_host) -> tuple:
    """Host fold: sum_b 2^b T_b via Jacobian double-and-add (254 tiny steps
    — sequential, so host bigint beats launching 500 one-lane TPU kernels).

    t_bits_host: list of 254 affine-or-None host points (bit 0 first).
    Returns affine host point or None.
    """
    from cap_tpu.crypto.bn254 import g1j_add, g1j_double, g1j_from_affine, g1j_to_affine

    acc = (1, 1, 0)
    for pt in reversed(t_bits_host):
        acc = g1j_double(acc)
        if pt is not None:
            acc = g1j_add(acc, g1j_from_affine(pt))
    return g1j_to_affine(acc)


def tbits_to_host(t_bits) -> list:
    """[254]-batched projective device points -> list of host affine points."""
    import numpy as np
    from cap_tpu.fields.host import FQ
    from cap_tpu.ops.limbs import limbs_to_ints

    xs = limbs_to_ints(np.asarray(t_bits[0]), FQ)
    ys = limbs_to_ints(np.asarray(t_bits[1]), FQ)
    zs = limbs_to_ints(np.asarray(t_bits[2]), FQ)
    out = []
    nz = [(i, z) for i, z in enumerate(zs) if z != 0]
    zinvs = FQ.batch_inv([z for _, z in nz]) if nz else []
    zmap = {i: zi for (i, _), zi in zip(nz, zinvs)}
    for i in range(len(xs)):
        if zs[i] == 0:
            out.append(None)
        else:
            zi = zmap[i]
            out.append((xs[i] * zi % FQ.p, ys[i] * zi % FQ.p))
    return out


def msm(points, scalars):
    """Full MSM: device bit-sums + host Horner.  Returns host affine point."""
    t_bits = msm_device(points, scalars)
    return horner_bits_host(tbits_to_host(t_bits))


# ---------------------------------------------------------------------------
# windowed MSM with a precomputed digit table (fixed-base: SRS commitments)
# ---------------------------------------------------------------------------

WINDOW_BITS = 8
NUM_WINDOWS = 32          # ceil(254 / 8)
WCHUNK = 2048             # points per accumulation step


def build_window_table(px, py, m: int):
    """Precompute P_i * d for d in [1, 256) for the first m SRS points.

    Returns (tx, ty) of shape [256, mp, 16] (d-major Montgomery affine; the
    d=0 row is the base point but masked out by digit!=0 at gather time)
    with mp = m padded to a WCHUNK multiple.  Built with a scan-collect (no
    giant in-place updates) + one batched inversion.
    """
    from cap_tpu.ops import field_jax as fj

    mp = ((m + WCHUNK - 1) // WCHUNK) * WCHUNK
    pad = mp - m
    if pad:
        zero = jnp.zeros((pad, NLIMBS), jnp.uint32)
        one = jnp.broadcast_to(jnp.asarray(ints_to_limbs([1], FQ)[0]), (pad, NLIMBS))
        # pad with a placeholder (always masked out by zero digits)
        px = jnp.concatenate([px, zero])
        py = jnp.concatenate([py, one])

    @jax.jit
    def _build_block(px, py):
        """One WCHUNK block — keeps peak allocations ~tens of MB."""
        one_m = fj.one_mont((WCHUNK,), fj.FQ_CTX)
        base = (px, py, one_m)

        def step(acc, _):
            acc = ec.ec_add(acc, base)
            return acc, acc

        _, (txs, tys, tzs) = lax.scan(step, ec.identity((WCHUNK,)), None, length=255)
        # prepend the d=0 row (masked at gather time; use the base so the
        # batched inversion below never sees a zero z)
        tx = jnp.concatenate([px[None], txs], axis=0)   # [256, WCHUNK, 16]
        ty = jnp.concatenate([py[None], tys], axis=0)
        tz = jnp.concatenate([one_m[None], tzs], axis=0)
        zinv = fj.inv(tz, fj.FQ_CTX)
        ax = fj.mont_mul(tx, zinv, fj.FQ_CTX)
        ay = fj.mont_mul(ty, zinv, fj.FQ_CTX)
        return ax, ay

    blocks_x, blocks_y = [], []
    for k in range(mp // WCHUNK):
        bx, by = _build_block(
            px[k * WCHUNK : (k + 1) * WCHUNK], py[k * WCHUNK : (k + 1) * WCHUNK]
        )
        blocks_x.append(bx)
        blocks_y.append(by)
    return jnp.concatenate(blocks_x, axis=1), jnp.concatenate(blocks_y, axis=1)


def scalar_digits(scalars):
    """Base-256 digits of [n,16] plain limb scalars: [n, 32] int32."""
    lo = (scalars & 0xFF).astype(jnp.int32)
    hi = (scalars >> 8).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=-1).reshape(scalars.shape[0], NUM_WINDOWS)


def msm_windowed_device(table, scalars):
    """MSM via the digit table: returns [NUM_WINDOWS]-batched projective
    points T_w = sum_i P_i * digit_w(s_i) (fold with horner_windows_host)."""
    from cap_tpu.ops import field_jax as fj

    tx, ty = table
    mp = tx.shape[1]
    n = scalars.shape[0]
    assert n == mp, "scalars must be padded to the table size"
    digits = scalar_digits(scalars)  # [n, 32]
    nchunks = mp // WCHUNK
    ident = ec.identity((NUM_WINDOWS, WCHUNK))

    def chunk_body(k, acc):
        txc = lax.dynamic_slice_in_dim(tx, k * WCHUNK, WCHUNK, axis=1)  # [256,C,16]
        tyc = lax.dynamic_slice_in_dim(ty, k * WCHUNK, WCHUNK, axis=1)
        dg = lax.dynamic_slice_in_dim(digits, k * WCHUNK, WCHUNK, axis=0)  # [C,32]
        idx = jnp.transpose(dg)[:, :, None]  # [32, C, 1]
        gx = jnp.take_along_axis(txc, idx, axis=0)  # [32, C, 16]
        gy = jnp.take_along_axis(tyc, idx, axis=0)
        nonzero = (jnp.transpose(dg) != 0)[..., None]  # [32, C, 1]
        # mixed addition needs a non-identity affine addend; digit-0 lanes add
        # a garbage point and the select below restores the untouched acc
        cand = ec.ec_add_mixed(acc, (gx, gy))
        return tuple(jnp.where(nonzero, cn, ac) for cn, ac in zip(cand, acc))

    acc = lax.fori_loop(0, nchunks, chunk_body, ident)
    width = WCHUNK
    while width > 1:
        half = width // 2
        lo = tuple(c[:, :half] for c in acc)
        hi = tuple(c[:, half:width] for c in acc)
        acc = ec.ec_add(lo, hi)
        width = half
    return tuple(c[:, 0] for c in acc)  # [32] points


def msm_windowed_device_pallas(table, scalars):
    """Windowed MSM with the fused Pallas mixed-add kernel: the accumulator
    stays in limb-major tiled layout (redundant [0,2p) coords) across all
    chunk steps AND through the lane-fold tree; only the gathered table rows
    are converted per step (cheap), and coordinates are normalized once at
    the end."""
    from cap_tpu.ops import pallas_field as pfl

    tx, ty = table
    mp = tx.shape[1]
    n = scalars.shape[0]
    assert n == mp, "scalars must be padded to the table size"
    digits = scalar_digits(scalars)  # [n, 32]
    nchunks = mp // WCHUNK
    nlanes = NUM_WINDOWS * WCHUNK
    ident = ec.identity((nlanes,))
    acc_t = tuple(pfl.to_limb_major(c) for c in ident)

    def chunk_body(k, acc_t):
        txc = lax.dynamic_slice_in_dim(tx, k * WCHUNK, WCHUNK, axis=1)  # [256,C,16]
        tyc = lax.dynamic_slice_in_dim(ty, k * WCHUNK, WCHUNK, axis=1)
        dg = lax.dynamic_slice_in_dim(digits, k * WCHUNK, WCHUNK, axis=0)  # [C,32]
        dgt = jnp.transpose(dg)                                            # [32,C]
        idx = dgt[:, :, None]
        gx = jnp.take_along_axis(txc, idx, axis=0).astype(jnp.uint32).reshape(nlanes, NLIMBS)
        gy = jnp.take_along_axis(tyc, idx, axis=0).astype(jnp.uint32).reshape(nlanes, NLIMBS)
        mask3 = (dgt != 0).astype(jnp.uint32).reshape(-1, 1, 128)
        g_t = (pfl.to_limb_major(gx), pfl.to_limb_major(gy))
        return pfl.ec_add_mixed_pallas_tiled(acc_t, g_t, mask3)

    acc_t = lax.fori_loop(0, nchunks, chunk_body, acc_t)

    # fold the WCHUNK lanes per window with a Pallas halving tree while the
    # lane count stays tile-aligned, then normalize and finish on the XLA path
    width = WCHUNK
    while width > 128:  # below 128 the per-window lane axis no longer tiles
        half = width // 2
        lo, hi = [], []
        for c in acc_t:
            c4 = c.reshape(NUM_WINDOWS, width // 128, NLIMBS, 128)
            # split each window's lane axis in half (lane axis is tiled 128)
            lo.append(c4[:, : half // 128].reshape(-1, NLIMBS, 128))
            hi.append(c4[:, half // 128 :].reshape(-1, NLIMBS, 128))
        acc_t = pfl.ec_add_pallas_tiled(tuple(lo), tuple(hi))
        width = half

    accs = tuple(
        pfl.from_limb_major(pfl.normalize_tiled(c)).reshape(NUM_WINDOWS, width, NLIMBS)
        for c in acc_t
    )
    acc = accs
    while width > 1:
        half = width // 2
        lo = tuple(c[:, :half] for c in acc)
        hi = tuple(c[:, half:width] for c in acc)
        acc = ec.ec_add(lo, hi)
        width = half
    return tuple(c[:, 0] for c in acc)


def horner_windows_host(t_windows_host):
    """sum_w 256^w T_w on host (31*8 doublings + 31 adds)."""
    from cap_tpu.crypto.bn254 import g1j_add, g1j_double, g1j_from_affine, g1j_to_affine

    acc = (1, 1, 0)
    for pt in reversed(t_windows_host):
        for _ in range(WINDOW_BITS):
            acc = g1j_double(acc)
        if pt is not None:
            acc = g1j_add(acc, g1j_from_affine(pt))
    return g1j_to_affine(acc)


def batch_scalar_mul_gen(scalars, base_pow_table):
    """[s_i * G] for many scalars of a fixed base G.

    base_pow_table: (x, y, z) projective Montgomery arrays of [2^k * G] for
    k in 0..253 (host-precomputed).  Used for test-SRS generation on device.
    Returns projective [n]-batched points.
    """
    n = scalars.shape[0]
    tx, ty, tz = base_pow_table

    def body(k, acc):
        mask = _bits_of(scalars, k).astype(jnp.bool_)
        pk = tuple(jnp.broadcast_to(c[k], (n, NLIMBS)) for c in (tx, ty, tz))
        cand = ec.ec_add(acc, pk)
        return ec.ec_select(mask, cand, acc)

    return lax.fori_loop(0, SCALAR_BITS, body, ec.identity((n,)))


def msm_host_check(points_host, scalars_host):
    """Host ground truth (tiny sizes only)."""
    from cap_tpu.crypto.bn254 import g1_msm_host

    return g1_msm_host(scalars_host, points_host)
