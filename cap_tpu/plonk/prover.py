"""TurboPlonk prover + preprocessing, orchestrating the device kernels.

Pipeline per proof (SURVEY.md §3.1 bottom box — the hot loop):
  round 1: wire evals -> iNTT -> blind -> 5 KZG commits           (device)
  round 2: permutation grand product (scan) -> iNTT -> commit     (device)
  round 3: quotient on the 8n coset -> iNTT -> split -> 5 commits (device)
  round 4: polynomial evaluations at zeta                         (device)
  round 5: linearization + two batched opening proofs             (device)
with Keccak Fiat–Shamir on the host between rounds (transcript.py).

All device phases are jitted per domain size and cached; proving keys hold
the big coset tables on device.  Montgomery limb layout throughout.
"""

from __future__ import annotations

from functools import lru_cache
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import FR, NLIMBS
from cap_tpu.ops import field_jax as fj
from cap_tpu.ops.limbs import ints_to_limbs, limbs_to_int, limbs_to_ints
from cap_tpu.ops.ntt import coset_intt, coset_ntt, get_domain, intt, ntt
from cap_tpu.plonk import srs as srs_mod
from cap_tpu.plonk.circuit import SELECTORS, PlonkCircuit
from cap_tpu.plonk.structs import PlonkProof, ProvingKey, VerifyingKey
from cap_tpu.plonk.transcript import new_transcript

COSET_SHIFT_FOR = lru_cache(maxsize=None)(
    lambda n: FR.multiplicative_generator()
)


def _mont(v: int):
    return jnp.asarray(ints_to_limbs([v], FR)[0])


def _mont_many(vs):
    return jnp.asarray(ints_to_limbs(list(vs), FR))


from cap_tpu.ops import msm as msm_mod
from cap_tpu.ops import msm_signed as msg_mod

_msm_many_dev = jax.jit(
    lambda pts, coeffs: jax.vmap(lambda s: msm_mod.msm_device(pts, s))(coeffs)
)

_to_mont_j = jax.jit(fj.to_mont)


def gather_wires(plonk_pk, witness_values) -> list:
    """Witness gathered per wire column via the key's cached arithmetization
    (avoids re-running finalize_for_arithmetization on every prove)."""
    return [[witness_values[i] for i in col] for col in plonk_pk.wire_index]


def srs_pad(c, m):
    """Zero-pad a [k,16] coefficient array to [m,16]."""
    return jnp.concatenate([c, jnp.zeros((m - c.shape[0], NLIMBS), jnp.uint32)], axis=0)


_msm_windowed_many = jax.jit(
    lambda tab, coeffs: jax.vmap(lambda s: msm_mod.msm_windowed_device(tab, s))(coeffs)
)

_msm_signed_jit = jax.jit(msg_mod.msm_signed_windows_device)
_msm_commit_jit = jax.jit(msg_mod.msm_signed_commit_device)


def _msm_affine_commit_jit(tab, padded):
    from cap_tpu.ops import msm_affine as aff_mod

    return jax.jit(aff_mod.msm_affine_commit_device)(tab, padded)


def _window_table(srs, m: int):
    """Lazily build (and cache on the srs) the digit table covering >= m."""
    mp = ((m + msm_mod.WCHUNK - 1) // msm_mod.WCHUNK) * msm_mod.WCHUNK
    cached = getattr(srs, "_window_table", None)
    if cached is None or cached[0] < mp:
        k = min(mp, srs.num_points)
        tx, ty = msm_mod.build_window_table(srs.g1_x[:k], srs.g1_y[:k], k)
        srs._window_table = (tx.shape[1], tx, ty)
        cached = srs._window_table
    return cached


# table-file format version: bump when the packed layout (limb-major uint16
# planes, TABLE_ROWS x mp x 32) or NLIMBS changes, so stale files in the old
# layout are never silently loaded (ADVICE r2).
TABLE_FORMAT = "v2"


def _srs_fingerprint(srs, k: int) -> str:
    """Identity of the [:k] SRS prefix a table covers: spread sample points
    (indices 0, k//2, k-1 of both coordinates) + the prefix length.  The r2
    version hashed the SRS endpoints only — the generator carries zero
    entropy and truncated views of one CRS collided (ADVICE r2)."""
    import hashlib

    h = hashlib.sha256()
    for i in (0, k // 2, k - 1):
        h.update(np.asarray(srs.g1_x[i]).tobytes())
        h.update(np.asarray(srs.g1_y[i]).tobytes())
    h.update(str(k).encode())
    return h.hexdigest()[:16]


def signed_table(srs, m: int, mult: int | None = None):
    """Signed-window digit table covering >= m points (cached per size).

    The [513, mp, 32] uint16 layout costs ~33 KB/point: 1.1 GB at 2^15,
    4.3 GB at 2^17 (the Aztec CRS ceiling).  Tables are cached per padded
    size so commits of a smaller domain don't sweep a larger table, under
    a total-bytes budget (CAP_MSM_TABLE_BUDGET_GB, default 5.0): building
    a new size evicts smallest-first until the new total fits, so a
    multi-shape run (bench grid, mixed batches) can climb to 2^17 without
    accumulating every rung of the ladder in HBM.  `mult` overrides the
    pad granularity (mesh commits pass D*WCHUNK).

    Built tables are also persisted to disk (CAP_MSM_TABLE_DISK=0 to turn
    off; dir CAP_MSM_TABLE_DIR, default data/msm_tables): a table build is
    a ~4 min one-time device job per (SRS, size, c) while a reload is
    seconds, so cold-start provers skip straight to proving."""
    import os

    mult = mult or msg_mod.WCHUNK
    mp = ((m + mult - 1) // mult) * mult
    tables = getattr(srs, "_signed_tables", None)
    if tables is None:
        tables = srs._signed_tables = {}
    if mp not in tables:
        budget = float(os.environ.get("CAP_MSM_TABLE_BUDGET_GB", "5.0")) * 1e9
        bytes_per_point = (2 * msg_mod.HALF + 1) * 32 * 2
        need = mp * bytes_per_point
        while tables and sum(k * bytes_per_point for k in tables) + need > budget:
            smallest = min(tables)
            tables.pop(smallest).delete()
        # only sizeable tables are worth disk space (small ones rebuild in
        # seconds and the CPU suite churns many tiny throwaway SRS's)
        use_disk = (
            os.environ.get("CAP_MSM_TABLE_DISK", "1") == "1" and mp >= 16384
        )
        k = min(mp, srs.num_points)
        path = None
        if use_disk:
            tdir = os.environ.get("CAP_MSM_TABLE_DIR", "data/msm_tables")
            path = os.path.join(
                tdir,
                f"signed_{TABLE_FORMAT}_c{msg_mod.WINDOW_BITS}_m{mp}_"
                f"{_srs_fingerprint(srs, k)}.npy",
            )
        loaded = None
        if path is not None and os.path.exists(path):
            arr = np.load(path)
            want = (msg_mod.TABLE_ROWS, mp, 2 * NLIMBS)
            if arr.shape == want and arr.dtype == np.uint16:
                loaded = jnp.asarray(arr)
            # else: truncated/corrupt/stale file — fall through to rebuild
        if loaded is not None:
            tables[mp] = loaded
        else:
            tables[mp] = msg_mod.build_signed_table(
                srs.g1_x[:k], srs.g1_y[:k], k, mp=mp
            )
            if path is not None:
                import tempfile

                os.makedirs(os.path.dirname(path), exist_ok=True)
                fd, tmp = tempfile.mkstemp(
                    dir=os.path.dirname(path), suffix=".tmp"
                )
                try:
                    with os.fdopen(fd, "wb") as f:
                        np.save(f, np.asarray(tables[mp]))
                    os.replace(tmp, path)
                except BaseException:
                    try:
                        os.unlink(tmp)
                    finally:
                        raise
    return tables[mp]


def _prover_mesh():
    from cap_tpu.parallel.mesh import prover_mesh

    return prover_mesh()


@lru_cache(maxsize=None)
def _mxu_pack(n: int):
    """MXU NTT table sets for the prove path at domain n (None entries fall
    back to radix-2 butterflies).  Only built on TPU for domains where the
    radix-2 path leaves the fast VMEM regime; must be threaded through the
    jitted phases as arguments (see ops/ntt_mxu.py pytree note)."""
    import os

    if os.environ.get("CAP_NTT_MXU", "1") != "1" or jax.default_backend() != "tpu":
        return {"intt_n": None, "cos8_fwd": None, "cos8_inv": None}
    from cap_tpu.ops import ntt_mxu as nm

    g = COSET_SHIFT_FOR(n)

    def mk(size, inverse, shift):
        # Below 2^15 the radix-2 butterflies stay in the fast VMEM regime;
        # above 2^19 the [73, a, k*b] int32 accumulation workspace starts
        # competing with the 2^17-SRS digit table for HBM.
        if size < (1 << 15) or size > (1 << 19):
            return None
        return nm.mxu_tables(size, FR, inverse=inverse, shift=shift)

    return {
        "intt_n": mk(n, True, None),
        "fwd_n": mk(n, False, None),
        "cos8_fwd": mk(8 * n, False, g),
        "cos8_inv": mk(8 * n, True, g),
    }


@lru_cache(maxsize=None)
def _row_consts_dev(n: int):
    """Device tables for the 8-row coset quotient scheme (ntt.coset_row_consts),
    threaded through jit as arguments like the MXU tables."""
    from cap_tpu.ops.ntt import coset_row_consts

    host = coset_row_consts(n, COSET_SHIFT_FOR(n))
    return {k: jnp.asarray(v) for k, v in host.items()}


@lru_cache(maxsize=None)
def _mesh_commit_fn(mesh):
    from cap_tpu.parallel import mesh as pm

    return jax.jit(lambda tab, sc: pm.sharded_commit_device(mesh, tab, sc))


def commit_batch(srs, coeffs_plain_batch) -> list:
    """Commit [k, m, 16] plain coefficient arrays -> k host affine points.

    Default path: the signed-window MSM (msm_signed.py) — digit extraction,
    Pallas point adds, window fold and Horner all in one device program, so
    the host sees only [k, 3, 16] (~29 ms round-trips dominate anything
    chattier on this runtime).  CAP_MSM=windowed / bits select the round-1
    engines (kept for cross-checks and the CPU suite)."""
    import os

    k, m, _ = coeffs_plain_batch.shape
    mode = os.environ.get("CAP_MSM", "signed")
    if mode in ("signed", "affine"):
        mesh = _prover_mesh()
        if mesh is not None and jax.default_backend() == "cpu":
            # virtual-CPU mesh: per-device shards only, host combine —
            # XLA:CPU collectives hard-abort under device>core starvation
            from cap_tpu.parallel import mesh as pm

            d = mesh.shape["x"]
            tab = signed_table(srs, m, mult=d * msg_mod.WCHUNK)
            padded = srs_mod._pad_coeffs_batch(coeffs_plain_batch, tab.shape[1])
            return pm.sharded_commit_host_points(mesh, tab, padded)
        res = commit_batch_device(srs, coeffs_plain_batch)
        return msg_mod.points_from_batch_result(res)
    if mode == "host":
        # host bucket Pippenger — small CPU-suite proofs, where device MSM
        # compile/table overhead dwarfs the work
        from cap_tpu.crypto.bn254 import g1_msm_pippenger
        from cap_tpu.fields.host import FQ
        from cap_tpu.ops.limbs import limbs_to_ints

        coeffs = limbs_to_ints(
            np.asarray(coeffs_plain_batch).reshape(k * m, NLIMBS)
        )
        xs = limbs_to_ints(np.asarray(srs.g1_x[:m]), FQ)
        ys = limbs_to_ints(np.asarray(srs.g1_y[:m]), FQ)
        pts = list(zip(xs, ys))
        return [
            g1_msm_pippenger(coeffs[i * m : (i + 1) * m], pts) for i in range(k)
        ]
    if mode == "windowed":
        mp, tx, ty = _window_table(srs, m)
        padded = srs_mod._pad_coeffs_batch(coeffs_plain_batch, mp)
        tw = _msm_windowed_many((tx[:, :mp], ty[:, :mp]), padded)
        tw_np = tuple(np.asarray(c) for c in tw)
        out = []
        for i in range(k):
            twi = tuple(c[i] for c in tw_np)
            out.append(msm_mod.horner_windows_host(msm_mod.tbits_to_host(twi)))
        return out
    pts = srs_mod._padded_points(srs, m)
    padded = srs_mod._pad_coeffs_batch(coeffs_plain_batch, pts[0].shape[0])
    tb = _msm_many_dev(pts, padded)
    tb_np = tuple(np.asarray(c) for c in tb)
    out = []
    for i in range(k):
        tbi = tuple(c[i] for c in tb_np)
        out.append(msm_mod.horner_bits_host(msm_mod.tbits_to_host(tbi)))
    return out


def commit_batch_device(srs, coeffs_plain_batch):
    """Device half of the signed-window commit: [k, 3, 16] canonical
    projective points — window sums AND the 26-step Horner fold run on
    device (fold is one Pallas kernel, pallas_field.horner_fold_pallas);
    the host only z-normalizes k points.

    With a prover mesh installed (parallel.set_prover_mesh) the point axis
    is sharded across the mesh: each device accumulates windows over its
    SRS shard, partials combine in a log2(D) EC-add tree over ICI."""
    k, m, _ = coeffs_plain_batch.shape
    mesh = _prover_mesh()
    if mesh is not None:
        d = mesh.shape["x"]
        tab = signed_table(srs, m, mult=d * msg_mod.WCHUNK)
        padded = srs_mod._pad_coeffs_batch(coeffs_plain_batch, tab.shape[1])
        return _mesh_commit_fn(mesh)(tab, padded)
    tab = signed_table(srs, m)
    padded = srs_mod._pad_coeffs_batch(coeffs_plain_batch, tab.shape[1])
    import os

    if (os.environ.get("CAP_MSM", "signed") == "affine"
            and jax.default_backend() == "tpu"):
        return _msm_affine_commit_jit(tab, padded)
    return _msm_commit_jit(tab, padded)


# ---------------------------------------------------------------------------
# per-domain jitted kernels
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _kernels(n: int, mesh=None, engine: str = "signed"):
    dom = get_domain(n)
    dom8 = get_domain(8 * n)
    g = COSET_SHIFT_FOR(n)

    def _pows(s, length: int):
        """[s^0 .. s^(length-1)] by a doubling ladder: [arr] ++ arr*s^L —
        ~length muls total, no prefix scan (a measured sore spot)."""
        target = 1
        while target < length:
            target <<= 1
        arr = fj.one_mont((1,))
        pk = s[None]
        cur = 1
        while cur < target:
            arr = jnp.concatenate([arr, fj.mont_mul(arr, pk)], axis=0)
            pk = fj.mont_mul(pk, pk)
            cur *= 2
        return arr[:length]

    def _pad(c, m):
        return jnp.concatenate(
            [c, jnp.zeros((m - c.shape[0], NLIMBS), jnp.uint32)], axis=0
        )

    @jax.jit
    def gather_phase(wit_plain_u16, wire_idx):
        """[nv,16] uint16 witness + [5,n] int32 -> [5,n,16] Montgomery evals.

        The witness is uploaded once (~0.8 MB at 2^15) and expanded on
        device; round 1 uploaded the gathered 10 MB wire array instead,
        which cost ~4x the transfer time on this runtime's tunnel."""
        wit = wit_plain_u16.astype(jnp.uint32)
        gathered = wit[wire_idx.reshape(-1)].reshape(5, n, NLIMBS)
        return fj.to_mont(gathered)

    @jax.jit
    def wires_phase(wire_evals, blinds, intt_tabs=None):
        """[5,n,16] evals + [5,2,16] blinds -> ([5,n+2,16] mont, plain)."""
        if intt_tabs is not None:
            from cap_tpu.ops import ntt_mxu as nm

            coeffs = nm.ntt_mxu_batch(wire_evals, intt_tabs)
        else:
            coeffs = jax.vmap(lambda e: intt(e, dom))(wire_evals)
        ext = jnp.concatenate(
            [coeffs, jnp.zeros((5, 2, NLIMBS), jnp.uint32)], axis=1
        )
        b0, b1 = blinds[:, 0], blinds[:, 1]
        ext = ext.at[:, 0].set(fj.sub(ext[:, 0], b1))
        ext = ext.at[:, 1].set(fj.sub(ext[:, 1], b0))
        ext = ext.at[:, n].set(fj.add(ext[:, n], b1))
        ext = ext.at[:, n + 1].set(fj.add(ext[:, n + 1], b0))
        return ext, fj.from_mont(ext)

    def _fast_mul(m: int):
        """Flat-Pallas mont_mul for [m,16] arrays when aligned, else scan."""
        from cap_tpu.ops import pallas_field as pfl

        if pfl.use_pallas() and m % pfl.BLK == 0:
            return lambda a, b: pfl.mont_mul_pallas(a, b)
        return None

    @jax.jit
    def z_phase(wire_evals, sigma_evals, ks_x, beta, gamma, blinds,
                intt_tabs=None):
        """Grand product z: returns ([n+3,16] mont coeffs, plain)."""
        from cap_tpu.ops import pallas_field as pfl

        if pfl.use_pallas() and n % 1024 == 0:
            from cap_tpu.plonk import phase_kernels as phk

            sc2 = jnp.stack([beta, gamma])
            num, den = phk.z_numden_pallas(wire_evals, sigma_evals, ks_x, sc2)
        else:
            gam = gamma[None, :]
            num = fj.one_mont((n,))
            den = fj.one_mont((n,))
            for j in range(5):
                nj = fj.add(fj.add(wire_evals[j], fj.mont_mul(beta, ks_x[j])), gam)
                dj = fj.add(
                    fj.add(wire_evals[j], fj.mont_mul(beta, sigma_evals[j])), gam
                )
                num = fj.mont_mul(num, nj)
                den = fj.mont_mul(den, dj)
        # z_k = prod_{i<k} num_i/den_i computed as prefix(num) * suffix(den)
        # * inv(total): two product sweeps + ONE scalar inversion, replacing
        # a full-array Fermat pow + associative_scan.  On TPU the sweeps are
        # the fused lane-major kernels (~log2(32)+2 muls/element, 2 HBM
        # round trips) instead of the 30-launch shift ladder — measured
        # 4.87 -> 4.20 ms for the pair at 2^15 (scripts/probe_zfuse.py)
        if pfl.use_pallas() and n % 1024 == 0:
            pnum = pfl.prefix_prod_fused(num)
            sden = pfl.suffix_prod_fused(den)
        else:
            fmul = _fast_mul(n)
            pnum = fj.prefix_prod(num, mul=fmul)
            sden = fj.suffix_prod(den, mul=fmul)
        # rolled-loop Pallas Fermat: the scan-based fj.inv held ~35 ms of
        # every round-2 program on this runtime (round-5 measurement)
        total_inv = pfl.inv_elem(sden[:1])
        z_main = fj.mont_mul(fj.mont_mul(pnum[:-1], sden[1:]), total_inv)
        z_evals = jnp.concatenate([fj.one_mont((1,)), z_main], axis=0)
        zc = intt(z_evals, dom, mxu=intt_tabs)
        zc = jnp.concatenate([zc, jnp.zeros((3, NLIMBS), jnp.uint32)], axis=0)
        b0, b1, b2 = blinds[0], blinds[1], blinds[2]
        zc = zc.at[0].set(fj.sub(zc[0], b2))
        zc = zc.at[1].set(fj.sub(zc[1], b1))
        zc = zc.at[2].set(fj.sub(zc[2], b0))
        zc = zc.at[n].set(fj.add(zc[n], b2))
        zc = zc.at[n + 1].set(fj.add(zc[n + 1], b1))
        zc = zc.at[n + 2].set(fj.add(zc[n + 2], b0))
        return zc, fj.from_mont(zc)

    def _pow5(x):
        x2 = fj.mont_sqr(x)
        return fj.mont_mul(fj.mont_sqr(x2), x)

    @jax.jit
    def quotient_phase(
        wire_ext, z_coeffs, pub_mont,
        sel_coset, sigma_coset, ks_x_coset, l1_coset, inv_zh_coset,
        alpha, beta, gamma,
        intt_tabs=None, cos8_fwd=None, cos8_inv=None,
    ):
        m8 = 8 * n
        pub_evals = _pad(pub_mont, n)  # PI poly is zero past the pub rows
        pi_coeffs = intt(pub_evals, dom, mxu=intt_tabs)
        if cos8_fwd is not None:
            from cap_tpu.ops import ntt_mxu as nm

            stack = jnp.stack(
                [_pad(wire_ext[j], m8) for j in range(5)]
                + [_pad(z_coeffs, m8), _pad(pi_coeffs, m8)]
            )
            ev8 = nm.ntt_mxu_batch(stack, cos8_fwd)
            w8 = ev8[:5]
            z8 = ev8[5]
            pi8 = ev8[6]
        else:
            w8 = jax.vmap(lambda c: coset_ntt(_pad(c, m8), dom8, g))(wire_ext)
            z8 = coset_ntt(_pad(z_coeffs, m8), dom8, g)
            pi8 = coset_ntt(_pad(pi_coeffs, m8), dom8, g)
        zw8 = jnp.roll(z8, -8, axis=0)

        from cap_tpu.ops import pallas_field as pfl

        if mesh is not None:
            from cap_tpu.parallel import mesh as pm

            t8 = pm.sharded_quotient_eval(
                mesh, w8, z8, zw8, pi8, sel_coset, sigma_coset, ks_x_coset,
                l1_coset, inv_zh_coset, alpha, beta, gamma,
            )
        elif pfl.use_pallas() and m8 % 1024 == 0:
            from cap_tpu.plonk import phase_kernels as phk

            alpha2 = fj.mont_sqr(alpha)
            sc4 = jnp.stack([alpha, alpha2, beta, gamma])
            t8 = phk.quotient_eval_pallas(
                w8, z8, zw8, pi8, sel_coset, sigma_coset, ks_x_coset,
                l1_coset, inv_zh_coset, sc4, fj.FR_CTX.one_mont_np,
            )
        else:
            S = {name: sel_coset[i] for i, name in enumerate(SELECTORS)}
            gate = fj.mont_mul(S["lc0"], w8[0])
            gate = fj.add(gate, fj.mont_mul(S["lc1"], w8[1]))
            gate = fj.add(gate, fj.mont_mul(S["lc2"], w8[2]))
            gate = fj.add(gate, fj.mont_mul(S["lc3"], w8[3]))
            gate = fj.add(gate, fj.mont_mul(S["mul0"], fj.mont_mul(w8[0], w8[1])))
            gate = fj.add(gate, fj.mont_mul(S["mul1"], fj.mont_mul(w8[2], w8[3])))
            gate = fj.add(gate, fj.mont_mul(S["hash0"], _pow5(w8[0])))
            gate = fj.add(gate, fj.mont_mul(S["hash1"], _pow5(w8[1])))
            gate = fj.add(gate, fj.mont_mul(S["hash2"], _pow5(w8[2])))
            gate = fj.add(gate, fj.mont_mul(S["hash3"], _pow5(w8[3])))
            prod = fj.mont_mul(
                fj.mont_mul(fj.mont_mul(w8[0], w8[1]), fj.mont_mul(w8[2], w8[3])),
                w8[4],
            )
            gate = fj.add(gate, fj.mont_mul(S["ecc"], prod))
            gate = fj.add(gate, S["c"])
            gate = fj.sub(gate, fj.mont_mul(S["o"], w8[4]))
            gate = fj.add(gate, pi8)

            gam = gamma[None, :]
            fnum = fj.one_mont((m8,))
            gden = fj.one_mont((m8,))
            for j in range(5):
                fnum = fj.mont_mul(
                    fnum, fj.add(fj.add(w8[j], fj.mont_mul(beta, ks_x_coset[j])), gam)
                )
                gden = fj.mont_mul(
                    gden, fj.add(fj.add(w8[j], fj.mont_mul(beta, sigma_coset[j])), gam)
                )
            perm = fj.sub(fj.mont_mul(z8, fnum), fj.mont_mul(zw8, gden))
            l1t = fj.mont_mul(fj.sub(z8, fj.one_mont((m8,))), l1_coset)
            alpha2 = fj.mont_sqr(alpha)
            F = fj.add(
                gate, fj.add(fj.mont_mul(alpha, perm), fj.mont_mul(alpha2, l1t))
            )
            t8 = fj.mont_mul(F, inv_zh_coset)
        tc = coset_intt(t8, dom8, g, mxu=cos8_inv)
        chunks = tc[: 5 * (n + 2)].reshape(5, n + 2, NLIMBS)
        tail = tc[5 * (n + 2) :]
        return chunks, fj.from_mont(chunks), fj.is_zero(tail).all()

    def _to_rows(t):
        """[..., 8n, 16] natural-order coset table -> row-major layout
        (index r*n + j), matching coset_ntt_rows output: a reshape+swap,
        no gather (ntt.py row-scheme comment)."""
        sh = t.shape
        return (
            t.reshape(sh[:-2] + (sh[-2] // 8, 8, NLIMBS))
            .swapaxes(-3, -2)
            .reshape(sh)
        )

    @jax.jit
    def quotient_phase_rows(
        wire_ext, z_coeffs, pub_mont,
        sel_coset, sigma_coset, ks_x_coset, l1_coset, inv_zh_coset,
        alpha, beta, gamma, rowc,
        intt_tabs=None, fwd_n=None,
    ):
        """Quotient via the 8-row coset decomposition (single-device path):
        56 size-n MXU transforms instead of eight 2^18 ones — measured
        17 ms/transform at 8n vs ~0.9 ms at n on this chip."""
        from cap_tpu.ops.ntt import coset_intt_rows, coset_ntt_rows_batch

        m8 = 8 * n
        pub_evals = _pad(pub_mont, n)
        pi_coeffs = intt(pub_evals, dom, mxu=intt_tabs)
        stack7 = jnp.stack(
            [_pad(wire_ext[j], n + 3) for j in range(5)]
            + [_pad(z_coeffs, n + 3), _pad(pi_coeffs, n + 3)]
        )
        rows7 = coset_ntt_rows_batch(stack7, dom, rowc, mxu_fwd=fwd_n)
        w8 = rows7[:5].reshape(5, m8, NLIMBS)
        z8 = rows7[5].reshape(m8, NLIMBS)
        zw8 = jnp.roll(rows7[5], -1, axis=1).reshape(m8, NLIMBS)
        pi8 = rows7[6].reshape(m8, NLIMBS)

        from cap_tpu.ops import pallas_field as pfl

        # pk tables arrive ALREADY row-major (cached once per key in
        # prove() via to_rows_tables — transposing 25 [8n,16] tables per
        # prove costs real HBM relayout time)
        sel_r, sigma_r, ksx_r, l1_r, izh_r = (
            sel_coset, sigma_coset, ks_x_coset, l1_coset, inv_zh_coset
        )
        if pfl.use_pallas() and m8 % 1024 == 0:
            from cap_tpu.plonk import phase_kernels as phk

            alpha2 = fj.mont_sqr(alpha)
            sc4 = jnp.stack([alpha, alpha2, beta, gamma])
            t8 = phk.quotient_eval_pallas(
                w8, z8, zw8, pi8, sel_r, sigma_r, ksx_r,
                l1_r, izh_r, sc4, fj.FR_CTX.one_mont_np,
            )
        else:
            t8 = _quotient_eval_plain(
                w8, z8, zw8, pi8, sel_r, sigma_r, ksx_r, l1_r, izh_r,
                alpha, beta, gamma,
            )
        tc = coset_intt_rows(
            t8.reshape(8, n, NLIMBS), dom, rowc, mxu_inv=intt_tabs
        )
        chunks = tc[: 5 * (n + 2)].reshape(5, n + 2, NLIMBS)
        tail = tc[5 * (n + 2) :]
        return chunks, fj.from_mont(chunks), fj.is_zero(tail).all()

    def _quotient_eval_plain(w8, z8, zw8, pi8, sel, sigma, ksx, l1, izh,
                             alpha, beta, gamma):
        m8 = 8 * n
        S = {name: sel[i] for i, name in enumerate(SELECTORS)}
        gate = fj.mont_mul(S["lc0"], w8[0])
        gate = fj.add(gate, fj.mont_mul(S["lc1"], w8[1]))
        gate = fj.add(gate, fj.mont_mul(S["lc2"], w8[2]))
        gate = fj.add(gate, fj.mont_mul(S["lc3"], w8[3]))
        gate = fj.add(gate, fj.mont_mul(S["mul0"], fj.mont_mul(w8[0], w8[1])))
        gate = fj.add(gate, fj.mont_mul(S["mul1"], fj.mont_mul(w8[2], w8[3])))
        gate = fj.add(gate, fj.mont_mul(S["hash0"], _pow5(w8[0])))
        gate = fj.add(gate, fj.mont_mul(S["hash1"], _pow5(w8[1])))
        gate = fj.add(gate, fj.mont_mul(S["hash2"], _pow5(w8[2])))
        gate = fj.add(gate, fj.mont_mul(S["hash3"], _pow5(w8[3])))
        prod = fj.mont_mul(
            fj.mont_mul(fj.mont_mul(w8[0], w8[1]), fj.mont_mul(w8[2], w8[3])),
            w8[4],
        )
        gate = fj.add(gate, fj.mont_mul(S["ecc"], prod))
        gate = fj.add(gate, S["c"])
        gate = fj.sub(gate, fj.mont_mul(S["o"], w8[4]))
        gate = fj.add(gate, pi8)
        gam = gamma[None, :]
        fnum = fj.one_mont((m8,))
        gden = fj.one_mont((m8,))
        for j in range(5):
            fnum = fj.mont_mul(
                fnum, fj.add(fj.add(w8[j], fj.mont_mul(beta, ksx[j])), gam)
            )
            gden = fj.mont_mul(
                gden, fj.add(fj.add(w8[j], fj.mont_mul(beta, sigma[j])), gam)
            )
        perm = fj.sub(fj.mont_mul(z8, fnum), fj.mont_mul(zw8, gden))
        l1t = fj.mont_mul(fj.sub(z8, fj.one_mont((m8,))), l1)
        alpha2 = fj.mont_sqr(alpha)
        F = fj.add(
            gate, fj.add(fj.mont_mul(alpha, perm), fj.mont_mul(alpha2, l1t))
        )
        return fj.mont_mul(F, izh)

    def _mm_flat(x, y):
        """Elementwise mont_mul on arbitrary [m,16] via the flat Pallas
        kernel (padded to a block multiple); scan-XLA off-TPU."""
        from cap_tpu.ops import pallas_field as pfl

        if not pfl.use_pallas():
            return fj.mont_mul(x, y)
        m = x.shape[0]
        mp = ((m + pfl.BLK - 1) // pfl.BLK) * pfl.BLK
        pad = ((0, mp - m), (0, 0))
        return pfl.mont_mul_pallas(jnp.pad(x, pad), jnp.pad(y, pad))[:m]

    @jax.jit
    def evals_phase(wire_ext, sigma_coeffs, z_coeffs, zeta_m, zw_m):
        """All 11 openings in one fused multiply + one vectorized tree-sum."""
        zeta_pows = _pows(zeta_m, n + 3)
        zeta_om_pows = _pows(zw_m, n + 3)

        def pad(c):
            return jnp.concatenate(
                [c, jnp.zeros((n + 3 - c.shape[0], NLIMBS), jnp.uint32)], axis=0
            )

        polys = jnp.stack(
            [pad(wire_ext[j]) for j in range(5)]
            + [pad(sigma_coeffs[j]) for j in range(5)]
            + [pad(z_coeffs)]
        )  # [11, n+3, 16]
        pws = jnp.stack([zeta_pows] * 10 + [zeta_om_pows])
        prods = _mm_flat(
            polys.reshape(11 * (n + 3), NLIMBS), pws.reshape(11 * (n + 3), NLIMBS)
        ).reshape(11, n + 3, NLIMBS)
        return fj.field_sum(prods, axis=-2)  # [11, 16] — ONE host transfer

    @jax.jit
    def lincomb(polys, scalars):
        """[k,m,16] mont polys x [k,16] mont scalars -> [m,16]."""
        k, m, _ = polys.shape
        prods = _mm_flat(
            polys.reshape(k * m, NLIMBS),
            jnp.broadcast_to(scalars[:, None, :], (k, m, NLIMBS)).reshape(
                k * m, NLIMBS
            ),
        ).reshape(k, m, NLIMBS)
        return fj.field_sum(prods, axis=0)

    @jax.jit
    def open_phase(q_poly, zeta_m, zeta_inv_m):
        """(q(X) - q(zeta)) / (X - zeta) by suffix summation.

        c_i = zeta^{-(i+1)} * S_{i+1} with S_i = sum_{j>=i} q_j zeta^j:
        one elementwise multiply, a log-depth adds-only suffix ladder, one
        more multiply — ~3m modmuls total (the round-1 version paid a
        2n-point NTT + batched inversion + iNTT, ~100x more multiplies).
        q(zeta) cancels out, so the evaluation is not even needed."""
        m = q_poly.shape[0]  # n + 3
        zp = _pows(zeta_m, m)
        zip_ = _pows(zeta_inv_m, m)
        s = fj.suffix_sum(_mm_flat(q_poly, zp))
        wc = _mm_flat(s[1:], zip_[1:])[: n + 2]
        return wc, fj.from_mont(wc)

    # ---- fused per-transcript-round programs (single-device signed MSM):
    # each round is ONE jitted program ending in its commit, so a prove
    # costs exactly 5 host syncs (one per Fiat-Shamir round) — on this
    # runtime a sync is ~29 ms of tunnel latency, so the unfused flow's
    # extra trips (separate commit dispatch + pow-table rebuilds) were
    # pure overhead.

    def _commit_in(tab, plain_batch):
        from cap_tpu.ops import msm_affine as aff
        from cap_tpu.ops import msm_signed as msg

        k, m, _ = plain_batch.shape
        mp = tab.shape[1]
        padded = jnp.concatenate(
            [plain_batch, jnp.zeros((k, mp - m, NLIMBS), jnp.uint32)], axis=1
        )
        if engine == "affine":
            return aff.msm_affine_commit_device(tab, padded)
        return msg.msm_signed_commit_device(tab, padded)

    @jax.jit
    def round1_fused(tab, wit_plain_u16, wire_idx, blinds, intt_tabs=None):
        wire_evals = gather_phase(wit_plain_u16, wire_idx)
        wire_ext, wire_plain = wires_phase(wire_evals, blinds, intt_tabs)
        return wire_evals, wire_ext, _commit_in(tab, wire_plain)

    @jax.jit
    def round2_fused(tab, wire_evals, sigma_evals, ks_x, beta, gamma, blinds,
                     intt_tabs=None):
        z_coeffs, z_plain = z_phase(wire_evals, sigma_evals, ks_x, beta,
                                    gamma, blinds, intt_tabs)
        return z_coeffs, _commit_in(tab, z_plain[None])

    @jax.jit
    def round3_fused(tab, wire_ext, z_coeffs, pub_mont, sel_rows, sigma_rows,
                     ksx_rows, l1_rows, izh_rows, alpha, beta, gamma,
                     rowc, intt_tabs=None, fwd_n=None):
        t_chunks, t_plain, tail_ok = quotient_phase_rows(
            wire_ext, z_coeffs, pub_mont, sel_rows, sigma_rows, ksx_rows,
            l1_rows, izh_rows, alpha, beta, gamma, rowc,
            intt_tabs, fwd_n,
        )
        return t_chunks, tail_ok, _commit_in(tab, t_plain)

    @jax.jit
    def to_rows_tables(sel, sigma, ksx, l1, izh):
        """One-time natural->row-major conversion of the pk coset tables."""
        return (_to_rows(sel), _to_rows(sigma), _to_rows(ksx),
                _to_rows(l1), _to_rows(izh))

    @jax.jit
    def round5_fused(tab, sel_coeffs, z_coeffs, sigma_coeffs, t_chunks,
                     wire_ext, r_scalars, v_pows, zeta_m, zeta_inv_m,
                     zw_m, zw_inv_m):
        """Linearization + both opening quotients + the k=2 commit in ONE
        program.  r_scalars: [20,16] mont scalars for
        [13 selectors, z, sigma4, t0..t4]; v_pows: [10,16]."""
        m_r = n + 3
        polys_r = jnp.concatenate([
            jnp.stack([srs_pad(sel_coeffs[i], m_r) for i in range(13)]),
            srs_pad(z_coeffs, m_r)[None],
            srs_pad(sigma_coeffs[4], m_r)[None],
            jnp.stack([srs_pad(t_chunks[i], m_r) for i in range(5)]),
        ])
        r_poly = lincomb(polys_r, r_scalars)
        polys_q = jnp.concatenate([
            r_poly[None],
            jnp.stack([srs_pad(wire_ext[j], m_r) for j in range(5)]),
            jnp.stack([srs_pad(sigma_coeffs[j], m_r) for j in range(4)]),
        ])
        q_poly = lincomb(polys_q, v_pows)
        w_zeta_c, w_zeta_plain = open_phase(q_poly, zeta_m, zeta_inv_m)
        w_om_c, w_om_plain = open_phase(srs_pad(z_coeffs, m_r), zw_m, zw_inv_m)
        return _commit_in(tab, jnp.stack([w_zeta_plain, w_om_plain]))

    # ---- mesh-fused per-round programs (VERDICT r4 item 5): with a prover
    # mesh installed, each Fiat-Shamir round is ONE jitted program — the
    # phase compute plus the point-sharded window partials under shard_map —
    # instead of separate phase and commit dispatches.  The cross-device
    # combine stays on the host (bigint tree), which is both the
    # XLA:CPU-safe path (virtual-mesh collectives hard-abort under device >
    # core starvation) and a tiny [D, k, 26] transfer on real hardware.

    def _commit_parts_in(tab, plain_batch):
        from cap_tpu.parallel import mesh as pm

        k, m, _ = plain_batch.shape
        mp = tab.shape[1]
        padded = jnp.concatenate(
            [plain_batch, jnp.zeros((k, mp - m, NLIMBS), jnp.uint32)], axis=1
        )
        return pm.sharded_commit_parts(mesh, tab, padded)

    @jax.jit
    def round1_mesh(tab, wit_plain_u16, wire_idx, blinds):
        wire_evals = gather_phase(wit_plain_u16, wire_idx)
        wire_ext, wire_plain = wires_phase(wire_evals, blinds)
        return wire_evals, wire_ext, _commit_parts_in(tab, wire_plain)

    @jax.jit
    def round2_mesh(tab, wire_evals, sigma_evals, ks_x, beta, gamma, blinds):
        z_coeffs, z_plain = z_phase(wire_evals, sigma_evals, ks_x, beta,
                                    gamma, blinds)
        return z_coeffs, _commit_parts_in(tab, z_plain[None])

    @jax.jit
    def round3_mesh(tab, wire_ext, z_coeffs, pub_mont, sel_coset, sigma_coset,
                    ksx_coset, l1_coset, izh_coset, alpha, beta, gamma):
        t_chunks, t_plain, tail_ok = quotient_phase(
            wire_ext, z_coeffs, pub_mont, sel_coset, sigma_coset, ksx_coset,
            l1_coset, izh_coset, alpha, beta, gamma,
        )
        return t_chunks, tail_ok, _commit_parts_in(tab, t_plain)

    @jax.jit
    def round5_mesh(tab, sel_coeffs, z_coeffs, sigma_coeffs, t_chunks,
                    wire_ext, r_scalars, v_pows, zeta_m, zeta_inv_m,
                    zw_m, zw_inv_m):
        m_r = n + 3
        polys_r = jnp.concatenate([
            jnp.stack([srs_pad(sel_coeffs[i], m_r) for i in range(13)]),
            srs_pad(z_coeffs, m_r)[None],
            srs_pad(sigma_coeffs[4], m_r)[None],
            jnp.stack([srs_pad(t_chunks[i], m_r) for i in range(5)]),
        ])
        r_poly = lincomb(polys_r, r_scalars)
        polys_q = jnp.concatenate([
            r_poly[None],
            jnp.stack([srs_pad(wire_ext[j], m_r) for j in range(5)]),
            jnp.stack([srs_pad(sigma_coeffs[j], m_r) for j in range(4)]),
        ])
        q_poly = lincomb(polys_q, v_pows)
        w_zeta_c, w_zeta_plain = open_phase(q_poly, zeta_m, zeta_inv_m)
        w_om_c, w_om_plain = open_phase(srs_pad(z_coeffs, m_r), zw_m, zw_inv_m)
        return _commit_parts_in(tab, jnp.stack([w_zeta_plain, w_om_plain]))

    return SimpleNamespace(
        dom=dom, dom8=dom8, g=g,
        gather_phase=gather_phase,
        wires_phase=wires_phase, z_phase=z_phase,
        quotient_phase=quotient_phase, evals_phase=evals_phase,
        quotient_phase_rows=quotient_phase_rows,
        to_rows_tables=to_rows_tables,
        lincomb=lincomb, open_phase=open_phase,
        round1_fused=round1_fused, round2_fused=round2_fused,
        round3_fused=round3_fused, round5_fused=round5_fused,
        round1_mesh=round1_mesh, round2_mesh=round2_mesh,
        round3_mesh=round3_mesh, round5_mesh=round5_mesh,
    )


# ---------------------------------------------------------------------------
# preprocessing
# ---------------------------------------------------------------------------


def preprocess(srs: srs_mod.UniversalSrs, circuit: PlonkCircuit):
    """Build (ProvingKey, VerifyingKey) — `PlonkKzgSnark::preprocess` twin."""
    fin = circuit.finalize_for_arithmetization()
    sel_evals = jnp.asarray(
        np.stack([ints_to_limbs(fin.selectors[name], FR) for name in SELECTORS])
    )
    sigma_evals = jnp.asarray(np.stack([ints_to_limbs(s, FR) for s in fin.sigma_values]))
    pk, vk = preprocess_from_arrays(
        srs, fin.n, fin.num_pub, list(fin.wire_ks),
        np.asarray(fin.wire_index, dtype=np.int32),
        sel_evals, sigma_evals, sigma_values_host=fin.sigma_values,
    )
    pk.num_gates = circuit.num_gates()
    return pk, vk


def preprocess_from_arrays(
    srs: srs_mod.UniversalSrs, n: int, num_pub: int, wire_ks: list,
    wire_index, sel_evals, sigma_evals, *,
    sigma_values_host=None, comms=None,
):
    """Array-driven preprocessing core.

    Drives both fresh preprocessing (from a finalized circuit's selector /
    sigma evaluation tables) and `parameters.load_*` full-mode key loading —
    the stored .npz holds exactly (n, num_pub, wire_ks, wire_index,
    sel_evals, sigma_evals) plus the 18 commitments, so loading never
    re-synthesizes the Python circuit or re-runs the commit MSMs
    (reference parameters.rs:485-557 pk blobs).

    comms: optional (selector_comms dict, sigma_comms list) to skip the
    18-poly commit batch.
    """
    if srs.max_degree < n + 2:
        raise ValueError(f"SRS degree {srs.max_degree} < required {n + 2}")
    import os as _os
    import time as _time

    _pk_dbg = _os.environ.get("CAP_PK_TIMING") == "1"
    _pk_t = [_time.time()]

    def _pkmark(label, *vals):
        if _pk_dbg:
            if vals:
                jax.block_until_ready(vals)
            now = _time.time()
            print(f"  [pkload] {label}: {now - _pk_t[0]:.1f}s", flush=True)
            _pk_t[0] = now

    K = _kernels(n)
    _pkmark("kernels")
    p = FR.p
    m8 = 8 * n

    # identity-permutation values k_j * x on H and on the coset, plus the
    # coset Z_H^-1 and L1 tables — all derived ON DEVICE from a handful of
    # scalars (round-5: the round-4 host version looped ~2M Python bigint
    # muls + limb conversions + ~180 MB of tunnel uploads, dominating the
    # stored-key load at 2^15; see VERDICT r4 item "warm-up")
    ks = wire_ks
    gn = pow(K.g, n, p)
    zeta8 = pow(K.dom8.omega, n, p)
    zh8 = [(gn * pow(zeta8, i, p) - 1) % p for i in range(8)]
    inv_zh8 = FR.batch_inv(zh8)
    n_inv = pow(n, -1, p)

    def _pk_tables_derived(omega_m, omega8g_first_m, omega8_m, ks_m,
                           zh_ninv8_m, inv_zh8_m):
        """Derived tables (ks_x [5,n,16], ks_x_coset [5,8n,16], coset_x
        [8n,16], l1_coset [8n,16], inv_zh_coset [8n,16]) from scalar seeds
        — ON DEVICE (the round-4 host version looped ~2M Python bigint
        muls + ~180 MB of tunnel uploads)."""

        def pows(first, step, length):
            # geometric ladder: arr ++ arr * step^len(arr)
            arr = first[None]
            stepk = step[None]
            while arr.shape[0] < length:
                arr = jnp.concatenate([arr, fj.mont_mul(arr, stepk)], axis=0)
                stepk = fj.mont_mul(stepk, stepk)
            return arr[:length]

        xs = pows(fj.one_mont((), ), omega_m, n)
        xs8 = pows(omega8g_first_m, omega8_m, m8)
        ks_x = jnp.stack([fj.mont_mul(k[None], xs) for k in ks_m])
        ks_x8 = jnp.stack([fj.mont_mul(k[None], xs8) for k in ks_m])
        den = fj.sub(xs8, fj.one_mont((m8,)))
        from cap_tpu.ops import msm_signed as msg

        dinv = msg._batch_inverse(den, fj.FR_CTX)
        num = jnp.tile(zh_ninv8_m, (m8 // 8, 1))
        l1 = fj.mont_mul(num, dinv)
        izh = jnp.tile(inv_zh8_m, (m8 // 8, 1))
        return ks_x, ks_x8, xs8, l1, izh

    @jax.jit
    def _pk_tables(sel_evals, sigma_evals, omega_m, omega8g_first_m,
                   omega8_m, ks_m, zh_ninv8_m, inv_zh8_m):
        """ONE program for the whole pk-load device pipeline: selector /
        sigma iNTTs, 8n coset tables, and the derived tables.  A single
        program matters on this runtime: every distinct jitted program
        costs ~40-70 s of per-process setup (axon cached-binary load), so
        the round-4 three-program load path paid ~170 s before any device
        work."""
        to_c = jax.vmap(lambda e: intt(e, K.dom))
        sel_coeffs = to_c(sel_evals)
        sigma_coeffs = to_c(sigma_evals)

        def pad8(c):
            return coset_ntt(
                jnp.concatenate([c, jnp.zeros((m8 - n, NLIMBS), jnp.uint32)]),
                K.dom8, K.g,
            )

        sel_coset = jax.vmap(pad8)(sel_coeffs)
        sigma_coset = jax.vmap(pad8)(sigma_coeffs)
        return (sel_coeffs, sigma_coeffs, sel_coset, sigma_coset,
                *_pk_tables_derived(omega_m, omega8g_first_m, omega8_m,
                                    ks_m, zh_ninv8_m, inv_zh8_m))

    _seeds = (
        _mont(K.dom.omega), _mont(K.g), _mont(K.dom8.omega),
        _mont_many(ks),
        _mont_many([z * n_inv % p for z in zh8]),
        _mont_many(inv_zh8),
    )
    if jax.default_backend() == "cpu":
        # split flow off-TPU: the one-program pipeline's peak working set
        # (all coeff+coset+derived tables live in one XLA program) aborts
        # XLA:CPU allocation late in a long full-suite process; three
        # smaller programs let intermediates free between stages.  On TPU
        # the single program is the point (~40-70 s per-process setup per
        # program on this runtime).
        to_c = jax.jit(jax.vmap(lambda e: intt(e, K.dom)))
        sel_coeffs = to_c(sel_evals)
        sigma_coeffs = to_c(sigma_evals)

        def _pad8one(c):
            return coset_ntt(
                jnp.concatenate([c, jnp.zeros((m8 - n, NLIMBS), jnp.uint32)]),
                K.dom8, K.g,
            )

        pad8 = jax.jit(jax.vmap(_pad8one))
        sel_coset = pad8(sel_coeffs)
        sigma_coset = pad8(sigma_coeffs)

        @jax.jit
        def _derived(omega_m, omega8g_first_m, omega8_m, ks_m, zh_ninv8_m,
                     inv_zh8_m):
            return _pk_tables_derived(
                omega_m, omega8g_first_m, omega8_m, ks_m, zh_ninv8_m,
                inv_zh8_m,
            )

        ks_x, ks_x_coset, coset_x, l1_coset, inv_zh_coset = _derived(*_seeds)
    else:
        (sel_coeffs, sigma_coeffs, sel_coset, sigma_coset, ks_x, ks_x_coset,
         coset_x, l1_coset, inv_zh_coset) = _pk_tables(
            sel_evals, sigma_evals, *_seeds
        )
    _pkmark("pk tables", sel_coset, l1_coset)

    # commitments (18 at once) unless supplied from a stored key
    if comms is None:
        allc = jnp.concatenate([sel_coeffs, sigma_coeffs], axis=0)
        plain = jax.jit(fj.from_mont)(allc)
        host_comms = commit_batch(srs, plain)
        selector_comms = {name: host_comms[i] for i, name in enumerate(SELECTORS)}
        sigma_comms = host_comms[13:18]
    else:
        selector_comms, sigma_comms = comms

    vk = VerifyingKey(
        n=n, num_pub=num_pub, wire_ks=list(ks),
        selector_comms=selector_comms, sigma_comms=sigma_comms,
        g2_gen=srs.g2_gen, g2_tau=srs.g2_tau,
    )
    pk = ProvingKey(
        vk=vk, n=n, num_pub=num_pub,
        domain=K.dom, domain8=K.dom8, coset_shift=K.g,
        wire_index=wire_index, sigma_values_host=sigma_values_host,
        wire_ks=list(ks),
        sel_coeffs=sel_coeffs, sigma_coeffs=sigma_coeffs,
        sel_coset=sel_coset, sigma_coset=sigma_coset,
        sigma_evals_dev=sigma_evals, ks_x_coset=ks_x_coset,
        coset_x=coset_x, l1_coset=l1_coset, inv_zh_coset=inv_zh_coset,
    )
    pk.ks_x_dev = ks_x
    pk.srs = srs
    return pk, vk


# ---------------------------------------------------------------------------
# proving
# ---------------------------------------------------------------------------


def prove(rng, pk: ProvingKey, witness_values, pub_inputs, ext_msg: bytes | None = None) -> PlonkProof:
    """Generate a TurboPlonk proof.

    witness_values: the circuit's witness list (ints); wires are gathered on
    device through the key's cached arithmetization (0.8 MB uploaded instead
    of the 10 MB gathered wire array — the tunnel is this runtime's slowest
    link).
    pub_inputs: list of ints (the circuit's public inputs, in order).
    ext_msg: extra transcript binding (jf's `Option<ext_msg>` hook).
    CAP_PROVE_TIMING=1 prints a per-stage wall-clock breakdown.

    """
    import os
    import time as _time

    timing = os.environ.get("CAP_PROVE_TIMING", "0") == "1"
    _t = [_time.time()]

    def _mark(label):
        if timing:
            now = _time.time()
            print(f"  [prove] {label}: {(now - _t[0]) * 1e3:.0f} ms", flush=True)
            _t[0] = now

    n = pk.n
    engine = os.environ.get("CAP_MSM", "signed")
    K = _kernels(n, _prover_mesh(), engine)
    srs = pk.srs
    p = FR.p

    # fused per-round programs: single device, signed/affine MSM engine —
    # one jit call (= one ~29 ms host sync) per Fiat-Shamir round instead
    # of separate phase + commit dispatches
    mesh_obj = _prover_mesh()
    fused_rounds = (
        engine in ("signed", "affine")
        and mesh_obj is None
        and jax.default_backend() != "cpu"
    )
    # mesh-fused rounds (VERDICT r4 item 5): one program per FS round on
    # the mesh too, window partials combined on the host
    mesh_fused = mesh_obj is not None and engine in ("signed", "affine")
    if (
        fused_rounds
        and os.environ.get("CAP_ASYNC", "0") == "1"
        and os.environ.get("CAP_TRANSCRIPT", "solidity") == "solidity"
    ):
        # device-resident Fiat-Shamir: 4 chained programs, one host sync
        from cap_tpu.plonk.prover_async import prove_async

        return prove_async(rng, pk, witness_values, pub_inputs, ext_msg)
    if fused_rounds:
        tab = signed_table(srs, n + 3)
    elif mesh_fused:
        tab = signed_table(srs, n + 3,
                           mult=mesh_obj.shape["x"] * msg_mod.WCHUNK)
    else:
        tab = None
    if mesh_fused:
        from cap_tpu.parallel import mesh as pm_mod

    transcript = new_transcript()
    transcript.begin_proof(pk.vk, pub_inputs, ext_msg)

    # round 1 — wire polynomials: upload the witness once (uint16 limbs),
    # gather + Montgomery-convert on device.  witness_values is either a
    # list of ints or a pre-packed (n_vars, 16) u16 limb array from the
    # native tape replayer (proof/tape_cache.py).
    if isinstance(witness_values, np.ndarray):
        wit_u16 = jnp.asarray(witness_values.astype(np.uint16, copy=False))
    else:
        wit_u16 = jnp.asarray(ints_to_limbs(witness_values).astype(np.uint16))
    wire_idx = getattr(pk, "wire_index_dev", None)
    if wire_idx is None:
        wire_idx = jnp.asarray(np.asarray(pk.wire_index, dtype=np.int32))
        pk.wire_index_dev = wire_idx
    blinds1 = _mont_many([FR.rand(rng) for _ in range(10)]).reshape(5, 2, NLIMBS)
    mxu = _mxu_pack(n)
    if fused_rounds:
        wire_evals, wire_ext, c1 = K.round1_fused(
            tab, wit_u16, wire_idx, blinds1, mxu["intt_n"]
        )
        wire_comms = msg_mod.points_from_batch_result(c1)
    elif mesh_fused:
        wire_evals, wire_ext, c1 = K.round1_mesh(
            tab, wit_u16, wire_idx, blinds1
        )
        wire_comms = pm_mod.combine_parts_host(np.asarray(c1), 5)
    else:
        wire_evals = K.gather_phase(wit_u16, wire_idx)
        wire_ext, wire_plain = K.wires_phase(wire_evals, blinds1, mxu["intt_n"])
        _mark("pack+to_mont")
        wire_comms = commit_batch(srs, wire_plain)
    _mark("round1 wires+commit")
    transcript.append_points(b"wires", wire_comms)
    beta = transcript.challenge(b"beta")
    gamma = transcript.challenge(b"gamma")

    # round 2 — permutation grand product
    blinds_z = _mont_many([FR.rand(rng) for _ in range(3)])
    if fused_rounds:
        z_coeffs, c2 = K.round2_fused(
            tab, wire_evals, pk.sigma_evals_dev, pk.ks_x_dev,
            _mont(beta), _mont(gamma), blinds_z, mxu["intt_n"],
        )
        z_comm = msg_mod.points_from_batch_result(c2)[0]
    elif mesh_fused:
        z_coeffs, c2 = K.round2_mesh(
            tab, wire_evals, pk.sigma_evals_dev, pk.ks_x_dev,
            _mont(beta), _mont(gamma), blinds_z,
        )
        z_comm = pm_mod.combine_parts_host(np.asarray(c2), 1)[0]
    else:
        z_coeffs, z_plain = K.z_phase(
            wire_evals, pk.sigma_evals_dev, pk.ks_x_dev, _mont(beta), _mont(gamma),
            blinds_z, mxu["intt_n"],
        )
        z_comm = commit_batch(srs, z_plain[None])[0]
    _mark("round2 z+commit")
    transcript.append_point(b"z", z_comm)
    alpha = transcript.challenge(b"alpha")

    # round 3 — quotient
    pub_mont = jnp.asarray(ints_to_limbs([v % p for v in pub_inputs], FR))
    if fused_rounds:
        rows_tabs = getattr(pk, "_row_tables", None)
        if rows_tabs is None:
            rows_tabs = K.to_rows_tables(
                pk.sel_coset, pk.sigma_coset, pk.ks_x_coset, pk.l1_coset,
                pk.inv_zh_coset,
            )
            pk._row_tables = rows_tabs
        t_chunks, tail_ok, c3 = K.round3_fused(
            tab, wire_ext, z_coeffs, pub_mont, *rows_tabs,
            _mont(alpha), _mont(beta), _mont(gamma),
            _row_consts_dev(n), mxu["intt_n"], mxu["fwd_n"],
        )
        # one bundled fetch: a separate bool(tail_ok) read costs a full
        # ~29 ms tunnel round trip on this runtime
        c3, tail_ok = jax.device_get((c3, tail_ok))
        t_comms = msg_mod.points_from_batch_result(c3)
    elif mesh_fused:
        t_chunks, tail_ok, c3 = K.round3_mesh(
            tab, wire_ext, z_coeffs, pub_mont,
            pk.sel_coset, pk.sigma_coset, pk.ks_x_coset, pk.l1_coset,
            pk.inv_zh_coset,
            _mont(alpha), _mont(beta), _mont(gamma),
        )
        c3, tail_ok = jax.device_get((c3, tail_ok))
        t_comms = pm_mod.combine_parts_host(np.asarray(c3), 5)
    else:
        t_chunks, t_plain, tail_ok = K.quotient_phase(
            wire_ext, z_coeffs, pub_mont,
            pk.sel_coset, pk.sigma_coset, pk.ks_x_coset, pk.l1_coset, pk.inv_zh_coset,
            _mont(alpha), _mont(beta), _mont(gamma),
            mxu["intt_n"], mxu["cos8_fwd"], mxu["cos8_inv"],
        )
        t_comms = commit_batch(srs, t_plain)
    _mark("round3 quotient+commit")
    if not bool(tail_ok):
        # F(X) is not divisible by Z_H — the witness does not satisfy the
        # circuit (device-side replacement for the Python row sweep)
        from cap_tpu.errors import FailedConstraintSystemError

        raise FailedConstraintSystemError("witness does not satisfy the circuit")
    transcript.append_points(b"t", t_comms)
    zeta = transcript.challenge(b"zeta")

    # round 4 — evaluations (zeta power tables built on device; the 11
    # evaluations come back in ONE [11,16] transfer — three separate
    # device_gets here cost 3x the ~29 ms tunnel round trip)
    omega = pk.domain.omega
    zw = zeta * omega % p
    evs_d = K.evals_phase(
        wire_ext, pk.sigma_coeffs, z_coeffs, _mont(zeta), _mont(zw)
    )
    evs = limbs_to_ints(np.asarray(evs_d), FR)
    wire_evs = evs[:5]
    sig_evs = evs[5:9]
    z_omega_eval = evs[10]
    _mark("round4 evals")
    transcript.append_scalars(b"evals", wire_evs + sig_evs + [z_omega_eval])
    v = transcript.challenge(b"v")

    # round 5 — linearization poly r(X) and batched openings
    abar = wire_evs
    zh_zeta = (pow(zeta, n, p) - 1) % p
    l1_zeta = zh_zeta * pow(n * (zeta - 1) % p, -1, p) % p
    f_zeta = 1
    for j in range(5):
        f_zeta = f_zeta * ((abar[j] + beta * pk.wire_ks[j] * zeta + gamma) % p) % p
    pi3 = 1
    for j in range(4):
        pi3 = pi3 * ((abar[j] + beta * sig_evs[j] + gamma) % p) % p
    alpha2 = alpha * alpha % p

    # r(X) = sum(scalar_i * poly_i): selectors, z, sigma4, t chunks
    gate_coeffs = {
        "lc0": abar[0], "lc1": abar[1], "lc2": abar[2], "lc3": abar[3],
        "mul0": abar[0] * abar[1] % p, "mul1": abar[2] * abar[3] % p,
        "hash0": pow(abar[0], 5, p), "hash1": pow(abar[1], 5, p),
        "hash2": pow(abar[2], 5, p), "hash3": pow(abar[3], 5, p),
        "ecc": abar[0] * abar[1] % p * abar[2] % p * abar[3] % p * abar[4] % p,
        "c": 1, "o": (p - abar[4]) % p,
    }
    m_r = n + 3
    r_scalars = [gate_coeffs[name] for name in SELECTORS]
    r_scalars.append((alpha * f_zeta + alpha2 * l1_zeta) % p)
    r_scalars.append((p - alpha * beta % p * z_omega_eval % p * pi3 % p) % p)
    r_scalars += [
        (p - zh_zeta * pow(zeta, k_i * (n + 2), p)) % p for k_i in range(5)
    ]
    # batched opening at zeta: r, a0..a4, sigma0..sigma3 with powers of v
    # (r(zeta) itself is recomputed by the verifier; the suffix-sum opening
    # kernel never needs the claimed evaluations — they cancel exactly)
    v_pows = [pow(v, i, p) for i in range(10)]

    if fused_rounds:
        c5 = K.round5_fused(
            tab, pk.sel_coeffs, z_coeffs, pk.sigma_coeffs, t_chunks, wire_ext,
            _mont_many(r_scalars), _mont_many(v_pows),
            _mont(zeta), _mont(pow(zeta, -1, p)), _mont(zw), _mont(pow(zw, -1, p)),
        )
        w_comms = msg_mod.points_from_batch_result(c5)
    elif mesh_fused:
        c5 = K.round5_mesh(
            tab, pk.sel_coeffs, z_coeffs, pk.sigma_coeffs, t_chunks, wire_ext,
            _mont_many(r_scalars), _mont_many(v_pows),
            _mont(zeta), _mont(pow(zeta, -1, p)), _mont(zw), _mont(pow(zw, -1, p)),
        )
        w_comms = pm_mod.combine_parts_host(np.asarray(c5), 2)
    else:
        polys = [srs_pad(pk.sel_coeffs[i], m_r) for i in range(13)]
        polys.append(srs_pad(z_coeffs, m_r))
        polys.append(srs_pad(pk.sigma_coeffs[4], m_r))
        for k_i in range(5):
            polys.append(srs_pad(t_chunks[k_i], m_r))
        r_poly = K.lincomb(jnp.stack(polys), _mont_many(r_scalars))
        open_polys = [r_poly] + [srs_pad(wire_ext[j], m_r) for j in range(5)] + [
            srs_pad(pk.sigma_coeffs[j], m_r) for j in range(4)
        ]
        q_poly = K.lincomb(jnp.stack(open_polys), _mont_many(v_pows))
        w_zeta_c, w_zeta_plain = K.open_phase(
            q_poly, _mont(zeta), _mont(pow(zeta, -1, p))
        )
        w_om_c, w_om_plain = K.open_phase(
            srs_pad(z_coeffs, m_r), _mont(zw), _mont(pow(zw, -1, p))
        )
        w_comms = commit_batch(srs, jnp.stack([w_zeta_plain, w_om_plain]))
    _mark("round5 openings+commit")
    transcript.append_points(b"w", w_comms)
    transcript.challenge(b"u")  # drawn for symmetry with the verifier

    return PlonkProof(
        wire_comms=wire_comms,
        z_comm=z_comm,
        t_comms=t_comms,
        wire_evals=wire_evs,
        sigma_evals=sig_evs,
        z_omega_eval=z_omega_eval,
        w_zeta=w_comms[0],
        w_zeta_omega=w_comms[1],
    )


def eval_pub_poly(pub_inputs, zeta: int, domain) -> int:
    """PI(zeta) = sum_i pi_i L_i(zeta) over the first |pub| domain points."""
    p = FR.p
    if not pub_inputs:
        return 0
    n = domain.n
    zh = (pow(zeta, n, p) - 1) % p
    omega_pows = [1]
    for _ in range(len(pub_inputs) - 1):
        omega_pows.append(omega_pows[-1] * domain.omega % p)
    n_inv = pow(n, -1, p)
    dens = [(zeta - w) % p for w in omega_pows]
    dinvs = FR.batch_inv(dens)
    acc = 0
    for pi, w, dinv in zip(pub_inputs, omega_pows, dinvs):
        acc = (acc + pi * zh % p * n_inv % p * w % p * dinv) % p
    return acc
