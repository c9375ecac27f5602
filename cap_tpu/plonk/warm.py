"""Parallel prover warm-up (round 5, VERDICT r4 item "warm-up <= 400 s").

Measured on this runtime: EVERY distinct jitted program costs ~40-120 s of
setup per process (axon remote compile-cache load), even fully cached —
the round-4 bench paid ~850 s of warm-up executing the prover's ~6
programs sequentially during the first prove.  The loads are
network/service-bound, so they parallelize: this module pre-dispatches
every per-round program with shape-exact dummy arguments from a thread
pool, overlapping the signed-table disk load + upload.  The real prove
then reuses the cached executables (identical shapes/dtypes) and pays
only device time.

Usage (bench.py): warm_prover(pk, srs) right after the key loads.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import NLIMBS


def _z(*shape, dtype=jnp.uint32):
    return jnp.zeros(shape, dtype)


def _prologue_len(pk, ext_len: int = 32) -> int:
    """Exact SolidityTranscript prologue byte length for this key (the
    async programs' transcript-buffer shapes depend on it)."""
    from cap_tpu.plonk.transcript import SolidityTranscript

    t = SolidityTranscript()
    t.begin_proof(pk.vk, [0] * pk.num_pub,
                  (b"\x00" * ext_len) if ext_len else None)
    return len(t.buf)


def warm_prover(pk, srs, engine: str | None = None, verbose: bool = False) -> float:
    """Pre-compile/load every program of the fused single-device prove path
    for `pk`'s shape, in parallel.  Returns elapsed seconds."""
    from cap_tpu.ops import msm_signed as msg
    from cap_tpu.plonk import prover as pv

    t0 = time.time()
    engine = engine or os.environ.get("CAP_MSM", "signed")
    if engine not in ("signed", "affine") or jax.default_backend() == "cpu":
        return 0.0
    n = pk.n

    def log(msg_):
        if verbose:
            print(f"  [warm_prover {time.time()-t0:6.1f}s] {msg_}", flush=True)

    use_async = (
        os.environ.get("CAP_ASYNC", "0") == "1"
        and os.environ.get("CAP_TRANSCRIPT", "solidity") == "solidity"
    )
    K = pv._kernels(n, None, engine)
    mxu = pv._mxu_pack(n)
    rowc = pv._row_consts_dev(n)
    if use_async:
        from cap_tpu.plonk import prover_async as pa

        A = pa._async_kernels(n, engine)

    # real table load/upload in parallel with the program loads
    def load_table():
        tab = pv.signed_table(srs, n + 3)
        jax.block_until_ready(tab)
        log("signed table ready")
        return tab

    nv = int(np.asarray(pk.wire_index).max()) + 1
    wire_idx = getattr(pk, "wire_index_dev", None)
    if wire_idx is None:
        wire_idx = jnp.asarray(np.asarray(pk.wire_index, dtype=np.int32))
        pk.wire_index_dev = wire_idx
    mp = ((n + 3 + msg.WCHUNK - 1) // msg.WCHUNK) * msg.WCHUNK
    dummy_tab = _z(msg.TABLE_ROWS, mp, 2 * NLIMBS, dtype=jnp.uint16)
    s16 = _z(16)

    def w_rows():
        rt = K.to_rows_tables(pk.sel_coset, pk.sigma_coset, pk.ks_x_coset,
                              pk.l1_coset, pk.inv_zh_coset)
        jax.block_until_ready(rt)
        pk._row_tables = rt
        log("to_rows_tables ready")
        return rt

    def w_r1():
        r = K.round1_fused(dummy_tab, _z(nv, NLIMBS, dtype=jnp.uint16),
                           wire_idx, _z(5, 2, NLIMBS), mxu["intt_n"])
        jax.block_until_ready(r)
        log("round1 ready")

    def w_r2():
        r = K.round2_fused(dummy_tab, _z(5, n, NLIMBS), pk.sigma_evals_dev,
                           pk.ks_x_dev, s16, s16, _z(3, NLIMBS),
                           mxu["intt_n"])
        jax.block_until_ready(r)
        log("round2 ready")

    def w_r3():
        # shape-true zero stand-ins for the row-major pk tables so this
        # warm call never waits on the to_rows_tables program
        m8 = 8 * n
        rows_tabs = (_z(13, m8, NLIMBS), _z(5, m8, NLIMBS),
                     _z(5, m8, NLIMBS), _z(m8, NLIMBS), _z(m8, NLIMBS))
        r = K.round3_fused(dummy_tab, _z(5, n + 2, NLIMBS), _z(n + 3, NLIMBS),
                           _z(pk.num_pub, NLIMBS), *rows_tabs,
                           s16, s16, s16, rowc, mxu["intt_n"], mxu["fwd_n"])
        jax.block_until_ready(r)
        log("round3 ready")

    def w_r4():
        r = K.evals_phase(_z(5, n + 2, NLIMBS), pk.sigma_coeffs,
                          _z(n + 3, NLIMBS), s16, s16)
        jax.block_until_ready(r)
        log("evals ready")

    def w_r5():
        r = K.round5_fused(dummy_tab, pk.sel_coeffs, _z(n + 3, NLIMBS),
                           pk.sigma_coeffs, _z(5, n + 2, NLIMBS),
                           _z(5, n + 2, NLIMBS), _z(20, NLIMBS),
                           _z(10, NLIMBS), s16, s16, s16, s16)
        jax.block_until_ready(r)
        log("round5 ready")

    if use_async:
        # the async rounds subsume gather/wires/z/quotient/evals/round5 —
        # warm those four programs instead of the five sync ones.  The
        # device transcript buffer length is part of each program's shape,
        # so it must match the real prove EXACTLY (the standard transfer
        # ext_msg is the 32-byte memo verification key).
        L0 = _prologue_len(pk, ext_len=int(os.environ.get("CAP_WARM_EXT", "32")))
        zb = _z(L0)
        st = _z(64)

        def a_r1():
            r = A.round1(dummy_tab, _z(nv, NLIMBS, dtype=jnp.uint16),
                         wire_idx, _z(5, 2, NLIMBS), zb, st, mxu["intt_n"])
            jax.block_until_ready(r)
            log("async round1 ready")
            return r

        def a_r2(buf_shape):
            r = A.round2(dummy_tab, _z(5, n, NLIMBS), pk.sigma_evals_dev,
                         pk.ks_x_dev, s16, s16, _z(3, NLIMBS),
                         _z(buf_shape), st, mxu["intt_n"])
            jax.block_until_ready(r)
            log("async round2 ready")
            return r

        def a_r3(buf_shape):
            m8 = 8 * n
            rows_tabs = (_z(13, m8, NLIMBS), _z(5, m8, NLIMBS),
                         _z(5, m8, NLIMBS), _z(m8, NLIMBS), _z(m8, NLIMBS))
            r = A.round3(dummy_tab, _z(5, n + 2, NLIMBS), _z(n + 3, NLIMBS),
                         _z(pk.num_pub, NLIMBS), *rows_tabs, s16, s16, s16,
                         rowc, _z(buf_shape), st, mxu["intt_n"], mxu["fwd_n"])
            jax.block_until_ready(r)
            log("async round3 ready")
            return r

        def a_r45(buf_shape):
            r = A.round45(dummy_tab, _z(5, n + 2, NLIMBS), pk.sel_coeffs,
                          pk.sigma_coeffs, _z(n + 3, NLIMBS),
                          _z(5, n + 2, NLIMBS), _z(5, NLIMBS),
                          s16, s16, s16, s16, _z(buf_shape), st)
            jax.block_until_ready(r)
            log("async round45 ready")
            return r

        with ThreadPoolExecutor(max_workers=8) as ex:
            futs = [ex.submit(w) for w in (load_table, w_rows, a_r1)]
            futs.append(ex.submit(lambda: a_r2(L0 + 5 * 32)))
            futs.append(ex.submit(lambda: a_r3(L0 + 6 * 32)))
            futs.append(ex.submit(lambda: a_r45(L0 + 11 * 32)))
            for f in futs:
                f.result()
        del dummy_tab
        log("all programs warm (async)")
        return time.time() - t0

    with ThreadPoolExecutor(max_workers=8) as ex:
        futs = [ex.submit(w)
                for w in (load_table, w_rows, w_r1, w_r2, w_r3, w_r4, w_r5)]
        for f in futs:
            f.result()
    del dummy_tab
    log("all programs warm")
    return time.time() - t0
