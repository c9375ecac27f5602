"""Multi-chip sharding of the prover's hot kernels over a jax Mesh.

The reference parallelizes with rayon threads in one address space
(SURVEY.md §2.3); the TPU-native equivalents here are:

* **MSM** — "TP"-style intra-proof sharding: the point axis is split across
  devices with `shard_map`; each device computes partial per-bit sums T_b
  over its shard, partials are combined with a log2(D) complete-EC-add tree
  (EC addition is not a `psum`-able monoid, so the reduction is explicit),
  and the 254-step Horner tail stays on host.
* **NTT** — the four-step factorization n = D*m: residue-class local NTTs
  (over w^D), then an `all_to_all` transpose, then the D-point combining
  transform with twiddles — butterfly-stage exchange rides ICI.
* **Batch proving/verification** — proof-level data parallelism: independent
  notes are proven on independent meshes/hosts; `txn_batch_verify` already
  reduces any number of proofs to one multi-pairing.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cap_tpu.fields.host import FR, NLIMBS
from cap_tpu.ops import ec, field_jax as fj, msm as msm_mod
from cap_tpu.ops.limbs import ints_to_limbs


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("x",))


# ---------------------------------------------------------------------------
# sharded MSM
# ---------------------------------------------------------------------------


def sharded_msm_device(mesh: Mesh, points, scalars):
    """Device part of the MSM with the point axis sharded over mesh axis x.

    points: (px, py, pz) [n,16] arrays, scalars [n,16] plain; n must be a
    multiple of D*CHUNK.  Returns [254]-batched projective points (combined).
    """
    d = mesh.shape["x"]

    def local(px, py, pz, sc):
        t = msm_mod.msm_device((px, py, pz), sc)
        # -> [254,16] per coord; add leading axis for the gather
        return tuple(c[None] for c in t)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("x"), P("x"), P("x"), P("x")),
        out_specs=(P("x"), P("x"), P("x")),
        check_vma=False,
    )
    tx, ty, tz = f(points[0], points[1], points[2], scalars)  # [D, 254, 16]
    part = (tx, ty, tz)
    width = d
    while width > 1:
        half = width // 2
        lo = tuple(c[:half] for c in part)
        hi = tuple(c[half:width] for c in part)
        part = ec.ec_add(lo, hi)
        width = half
    return tuple(c[0] for c in part)


def sharded_msm(mesh: Mesh, points_host, scalars_host):
    """Full sharded MSM from host points/scalars; returns host affine point."""
    d = mesh.shape["x"]
    pts, scs = msm_mod.pad_msm_inputs(points_host, scalars_host, chunk=d * msm_mod.CHUNK)
    jf = jax.jit(partial(sharded_msm_device, mesh))
    t_bits = jf(pts, scs)
    return msm_mod.horner_bits_host(msm_mod.tbits_to_host(t_bits))


# ---------------------------------------------------------------------------
# mesh-parallel prover kernels (round 2): the signed-window commit MSM and
# the quotient evaluation sharded over the point axis.  These are what
# `plonk.prover` calls when a prover mesh is installed
# (cap_tpu.parallel.set_prover_mesh) — SURVEY.md §2.3 row 1.
# ---------------------------------------------------------------------------

_PROVER_MESH: list = [None]


def set_prover_mesh(mesh: Mesh | None) -> None:
    """Install (or clear) the mesh the TurboPlonk prover shards over.

    With a mesh set, `plonk.prover.commit_batch` splits the SRS point axis
    across `mesh` devices (each device runs the signed-window chunk loop on
    its shard; per-window partial sums are combined with a log2(D) complete
    EC-add tree), and the quotient evaluation shards the 8n coset axis.
    Proving keys/tables are unchanged — the mesh only alters device layout.
    """
    _PROVER_MESH[0] = mesh


def prover_mesh() -> Mesh | None:
    return _PROVER_MESH[0]


def sharded_commit_parts(mesh: Mesh, table, scalars_batch):
    """Per-device signed-window sums, point axis sharded over x.

    Returns [D, k, 26, 3, 16] (device-sharded on axis 0, no collectives)."""
    from cap_tpu.ops import msm_signed as ms

    def local(tab_shard, sc_shard):
        return ms.msm_signed_windows_device(tab_shard, sc_shard)[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "x"), P(None, "x")),
        out_specs=P("x"),
        check_vma=False,
    )
    return f(table, scalars_batch)


def sharded_commit_windows(mesh: Mesh, table, scalars_batch):
    """Signed-window MSM window sums with the point axis sharded over x.

    table: [513, mp, 32] uint16; scalars_batch: [k, mp, 16] plain limbs;
    mp must be a multiple of D * msm_signed.WCHUNK.  Returns [k, 26, 3, 16]
    canonical projective window sums, combined across devices with a
    log2(D) EC-add tree (XLA inserts the cross-device exchanges — riding
    ICI on a real TPU mesh)."""
    d = mesh.shape["x"]
    parts = sharded_commit_parts(mesh, table, scalars_batch)
    width = d
    cur = tuple(parts[:, :, :, c] for c in range(3))
    while width > 1:
        half = width // 2
        lo = tuple(c[:half] for c in cur)
        hi = tuple(c[half:width] for c in cur)
        cur = ec.ec_add(lo, hi)
        width = half
    return jnp.stack([c[0] for c in cur], axis=2)  # [k, 26, 3, 16]


def sharded_commit_host_points(mesh: Mesh, table, scalars_batch) -> list:
    """Sharded commit with the cross-device combine on the HOST.

    Each device computes window sums over its point shard (no collectives
    at all); the [D, k, 26] partials come back to the host, which combines
    and Horner-folds in bigints.  This is the CPU-mesh path: XLA:CPU's
    collective rendezvous hard-aborts the process when virtual devices
    outnumber cores and shard compute is long (observed 40 s timeout →
    abort at 8 devices on 4 cores), so the dryrun must not depend on
    cross-device collectives for correctness checks."""
    parts = np.asarray(
        jax.jit(lambda t, s: sharded_commit_parts(mesh, t, s))(table, scalars_batch)
    )  # [D, k, 26, 3, 16]
    return combine_parts_host(parts, parts.shape[1])


def combine_parts_host(parts_np, k: int) -> list:
    """[D, k, 26, 3, 16] per-device window partials -> k host affine points
    (bigint combine + Horner; the CPU-mesh path's collective-free tail)."""
    from cap_tpu.crypto.bn254 import (
        g1j_add, g1j_double, g1j_from_affine, g1j_to_affine,
    )
    from cap_tpu.fields.host import FQ
    from cap_tpu.ops import msm_signed as ms
    from cap_tpu.ops.limbs import limbs_to_ints

    d = parts_np.shape[0]
    flat = parts_np.reshape(-1, 3, parts_np.shape[-1])
    xs = limbs_to_ints(flat[:, 0], FQ)
    ys = limbs_to_ints(flat[:, 1], FQ)
    zs = limbs_to_ints(flat[:, 2], FQ)
    nz = [(i, z) for i, z in enumerate(zs) if z != 0]
    zinvs = FQ.batch_inv([z for _, z in nz]) if nz else []
    zmap = {i: zi for (i, _), zi in zip(nz, zinvs)}
    out = []
    for i in range(k):
        acc = (1, 1, 0)
        for w in reversed(range(ms.NUM_WINDOWS)):
            for _ in range(ms.WINDOW_BITS):
                acc = g1j_double(acc)
            for dev in range(d):
                j = (dev * k + i) * ms.NUM_WINDOWS + w
                if zs[j] != 0:
                    zi = zmap[j]
                    acc = g1j_add(
                        acc,
                        g1j_from_affine((xs[j] * zi % FQ.p, ys[j] * zi % FQ.p)),
                    )
        out.append(g1j_to_affine(acc))
    return out


def sharded_commit_device(mesh: Mesh, table, scalars_batch):
    """Full sharded commit: sharded window sums + the Horner window fold.
    Returns [k, 3, 16] canonical projective points."""
    from cap_tpu.ops import msm_signed as ms, pallas_field as pfl

    t_win_s = sharded_commit_windows(mesh, table, scalars_batch)
    k = t_win_s.shape[0]
    per = []
    for c in range(3):
        a = jnp.transpose(t_win_s[:, :, c, :], (1, 2, 0))  # [26, 16, k]
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 128 - k)))
        per.append(a)
    ox, oy, oz = pfl.horner_fold_pallas(tuple(per), ms.NUM_WINDOWS, ms.WINDOW_BITS)
    out = jnp.stack([ox, oy, oz], axis=0)
    return jnp.transpose(out[:, :, :k], (2, 0, 1))


def sharded_quotient_eval(mesh: Mesh, w8, z8, zw8, pi8, sel, sig, ksx, l1, izh,
                          alpha, beta, gamma):
    """Quotient gate+permutation evaluation sharded over the 8n coset axis.

    All poly inputs element-major ([5, m8, 16] / [m8, 16] / [13, m8, 16]);
    zw8 (the rolled z) is computed globally by the caller so the shard
    boundary needs no halo exchange.  Returns t8 [m8, 16].
    """
    from cap_tpu.ops import field_jax as fj

    def local(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, alpha, beta, gamma):
        from cap_tpu.ops import pallas_field as pfl

        m8l = z8.shape[0]
        if pfl.use_pallas() and m8l % 1024 == 0:
            from cap_tpu.plonk import phase_kernels as phk

            alpha2 = fj.mont_sqr(alpha)
            sc4 = jnp.stack([alpha, alpha2, beta, gamma])
            return phk.quotient_eval_pallas(
                w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, sc4,
                fj.FR_CTX.one_mont_np,
            )
        return _quotient_eval_xla(
            w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, alpha, beta, gamma
        )

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, "x"), P("x"), P("x"), P("x"), P(None, "x"), P(None, "x"),
            P(None, "x"), P("x"), P("x"), P(None), P(None), P(None),
        ),
        out_specs=P("x"),
        check_vma=False,
    )
    return f(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, alpha, beta, gamma)


def _quotient_eval_xla(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh,
                       alpha, beta, gamma):
    """Reference XLA quotient evaluation on (a shard of) the coset axis."""
    from cap_tpu.plonk.circuit import SELECTORS

    m8 = z8.shape[0]
    S = {name: sel[i] for i, name in enumerate(SELECTORS)}

    def pow5(x):
        x2 = fj.mont_sqr(x)
        return fj.mont_mul(fj.mont_sqr(x2), x)

    gate = fj.mont_mul(S["lc0"], w8[0])
    gate = fj.add(gate, fj.mont_mul(S["lc1"], w8[1]))
    gate = fj.add(gate, fj.mont_mul(S["lc2"], w8[2]))
    gate = fj.add(gate, fj.mont_mul(S["lc3"], w8[3]))
    gate = fj.add(gate, fj.mont_mul(S["mul0"], fj.mont_mul(w8[0], w8[1])))
    gate = fj.add(gate, fj.mont_mul(S["mul1"], fj.mont_mul(w8[2], w8[3])))
    gate = fj.add(gate, fj.mont_mul(S["hash0"], pow5(w8[0])))
    gate = fj.add(gate, fj.mont_mul(S["hash1"], pow5(w8[1])))
    gate = fj.add(gate, fj.mont_mul(S["hash2"], pow5(w8[2])))
    gate = fj.add(gate, fj.mont_mul(S["hash3"], pow5(w8[3])))
    prod = fj.mont_mul(
        fj.mont_mul(fj.mont_mul(w8[0], w8[1]), fj.mont_mul(w8[2], w8[3])), w8[4]
    )
    gate = fj.add(gate, fj.mont_mul(S["ecc"], prod))
    gate = fj.add(gate, S["c"])
    gate = fj.sub(gate, fj.mont_mul(S["o"], w8[4]))
    gate = fj.add(gate, pi8)

    gam = gamma[None, :]
    fnum = fj.one_mont((m8,))
    gden = fj.one_mont((m8,))
    for j in range(5):
        fnum = fj.mont_mul(fnum, fj.add(fj.add(w8[j], fj.mont_mul(beta, ksx[j])), gam))
        gden = fj.mont_mul(gden, fj.add(fj.add(w8[j], fj.mont_mul(beta, sig[j])), gam))
    perm = fj.sub(fj.mont_mul(z8, fnum), fj.mont_mul(zw8, gden))
    l1t = fj.mont_mul(fj.sub(z8, fj.one_mont((m8,))), l1)
    alpha2 = fj.mont_sqr(alpha)
    F = fj.add(gate, fj.add(fj.mont_mul(alpha, perm), fj.mont_mul(alpha2, l1t)))
    return fj.mont_mul(F, izh)


# ---------------------------------------------------------------------------
# sharded NTT (four-step with one all_to_all)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _sharded_ntt_tables(n: int, d: int):
    """Host-precomputed constants for the n = d*m four-step NTT."""
    p = FR.p
    m = n // d
    w = FR.root_of_unity(n)
    wd = pow(w, d, p)  # m-th root for the local NTTs
    # local NTT twiddle tables over wd (same layout as ops.ntt stage tables)
    from cap_tpu.ops.ntt import _bit_reverse_perm

    logm = m.bit_length() - 1
    stage_tw = []
    for s in range(1, logm + 1):
        mm = 1 << s
        wm = pow(wd, m // mm, p)
        pows = [1]
        for _ in range(mm // 2 - 1):
            pows.append(pows[-1] * wm % p)
        stage_tw.append(ints_to_limbs(pows, FR))
    # combine twiddles: for device j, rows k1 in its block, w^{dev*k1}
    # full [d, m] table: tw[dev][k1] = w^{dev*k1}
    tw = np.zeros((d, m, NLIMBS), np.uint32)
    for dev in range(d):
        base = pow(w, dev, p)
        pows = [1]
        for _ in range(m - 1):
            pows.append(pows[-1] * base % p)
        tw[dev] = ints_to_limbs(pows, FR)
    # wm_root: d-point combine uses (w^m)^{dev*k2}
    wm_mat = np.zeros((d, d, NLIMBS), np.uint32)  # [k2, dev]
    wm_root = pow(w, m, p)
    for k2 in range(d):
        row = [pow(wm_root, dev * k2, p) for dev in range(d)]
        wm_mat[k2] = ints_to_limbs(row, FR)
    return m, _bit_reverse_perm(m), tuple(stage_tw), tw, wm_mat


def sharded_ntt(mesh: Mesh, coeffs, n: int):
    """Evaluate a degree-<n polynomial on H_n, sharded over mesh axis x.

    coeffs: [n, 16] Montgomery, distributed cyclically: device dev holds
    coefficients a[dev::D] (callers lay data out with `cyclic_layout`).
    Output: evaluations, device j holding A[k] for k1-block j (use
    `uncyclic_output` to restore natural order on host-side tests).
    """
    d = mesh.shape["x"]
    m, bitrev, stage_tw, tw_np, wm_np = _sharded_ntt_tables(n, d)
    tw = jnp.asarray(tw_np)
    wm = jnp.asarray(wm_np)

    def local(block, tw_all, wm_all):
        # block: [1, m, 16] — this device's residue class a[dev::D]
        from cap_tpu.ops.ntt import _ntt_core

        x = block[0]
        x = x[jnp.asarray(bitrev)]
        b = _ntt_core(x, stage_tw, m)                     # [m,16] local NTT
        dev = lax.axis_index("x")
        twd = lax.dynamic_index_in_dim(tw_all, dev, keepdims=False)  # [m,16]
        b = fj.mont_mul(b, twd)                           # twiddle w^{dev*k1}
        # all_to_all: split k1 axis into D blocks, exchange
        b = b.reshape(d, m // d, NLIMBS)                  # [dst, m/D, 16]
        g = lax.all_to_all(b[None], "x", split_axis=1, concat_axis=0, tiled=False)
        # g: [D, 1, m/D, 16] — g[src] = B_src[k1 block of this device] * tw
        g = g[:, 0]                                       # [D, m/D, 16]
        # combine: A[k1, k2] = sum_src g[src, k1] * wm[k2, src]
        acc = []
        for k2 in range(d):
            terms = fj.mont_mul(g, wm_all[k2][:, None, :])  # [D, m/D, 16]
            acc.append(fj.field_sum(terms, axis=0))          # [m/D, 16]
        out = jnp.stack(acc, axis=0)                      # [k2, m/D, 16]
        return out[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("x"), None, None),
        out_specs=P("x"),
        check_vma=False,
    )
    blocks = coeffs.reshape(d, m, NLIMBS)
    return f(blocks, tw, wm)  # [D, d(k2), m/D, 16]


def cyclic_layout(coeffs_host_ints, n: int, d: int):
    """Host ints -> [D, m, 16] array, device dev holding a[dev::D]."""
    m = n // d
    arr = np.zeros((d, m, NLIMBS), np.uint32)
    limbs = ints_to_limbs(coeffs_host_ints, FR)
    for dev in range(d):
        arr[dev] = limbs[dev::d]
    return jnp.asarray(arr.reshape(d * m, NLIMBS))


def uncyclic_output(out, n: int, d: int):
    """[D, d, m/D, 16] sharded output -> evaluations in natural order (host)."""
    from cap_tpu.ops.limbs import limbs_to_ints

    m = n // d
    o = np.asarray(out).reshape(d, d, m // d, NLIMBS)  # [j(k1 blk), k2, k1 off]
    vals = [0] * n
    raw = limbs_to_ints(o.reshape(-1, NLIMBS), FR)
    idx = 0
    for j in range(d):
        for k2 in range(d):
            for off in range(m // d):
                k1 = j * (m // d) + off
                vals[k2 * m + k1] = raw[idx]
                idx += 1
    return vals
