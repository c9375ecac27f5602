"""Account for every millisecond of the warm transfer prove (round 4).

Times each jitted prover phase in isolation (amortized over CHAIN reps to
remove the ~29 ms axon host-sync floor), at the headline shape (2-in/2-out,
domain 2^15), with the real proving key and signed MSM table.  The sum of
rows should reconstruct the ~1.5 s CAP_PROVE_TIMING breakdown; anything
missing is host work or transfer latency.

Run: PYTHONHASHSEED=0 python scripts/profile_prove_phases.py
"""

from __future__ import annotations

import os
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import FR, NLIMBS
from cap_tpu.ops import field_jax as fj, msm_signed as ms
from cap_tpu.ops.limbs import ints_to_limbs
from cap_tpu.utils.rng import test_rng


def timeit(label, fn, reps=3, sync=None):
    r = fn()
    (sync or (lambda x: jax.block_until_ready(x)))(r)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        r = fn()
        (sync or (lambda x: jax.block_until_ready(x)))(r)
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"{label:44s} {t*1e3:9.2f} ms", flush=True)
    return t


def main():
    from cap_tpu import parameters as params
    from cap_tpu.plonk import prover as pv
    from cap_tpu.plonk.srs import universal_setup_for_staging

    rng = test_rng()
    t0 = time.time()
    srs = universal_setup_for_staging(2**15 + 2, "data")
    try:
        pk = params.load_transfer_proving_key(2, 2, 6)
    except Exception as e:
        print(f"stored pk unusable ({e}); fresh preprocess", flush=True)
        from cap_tpu.proof import transfer as tproof

        pk, _vk = tproof.preprocess(srs, 2, 2, 6)
        params.store_transfer_proving_key(pk, 2, 2, 6, mode="full")
    pk = pk.plonk_pk
    pk.srs = srs
    print(f"pk+srs ready {time.time()-t0:.1f}s", flush=True)
    n = pk.n
    K = pv._kernels(n)
    mxu = pv._mxu_pack(n)
    p = FR.p

    tab = pv.signed_table(srs, n + 2)
    jax.block_until_ready(tab)
    print(f"table ready {time.time()-t0:.1f}s (mp={tab.shape[1]})", flush=True)

    # synthetic witness of the right shape
    nv = int(np.asarray(pk.wire_index).max()) + 1
    wit = np.random.randint(0, 1 << 16, size=(nv, NLIMBS), dtype=np.uint16)
    wit_u16 = jnp.asarray(wit)
    wire_idx = jnp.asarray(np.asarray(pk.wire_index, dtype=np.int32))
    sc = lambda: jnp.asarray(ints_to_limbs([FR.rand(rng)], FR)[0])

    wire_evals = K.gather_phase(wit_u16, wire_idx)
    blinds1 = jnp.asarray(ints_to_limbs([FR.rand(rng) for _ in range(10)], FR)).reshape(5, 2, NLIMBS)
    wire_ext, wire_plain = K.wires_phase(wire_evals, blinds1, mxu["intt_n"])
    blz = jnp.asarray(ints_to_limbs([FR.rand(rng) for _ in range(3)], FR))
    z_coeffs, z_plain = K.z_phase(wire_evals, pk.sigma_evals_dev, pk.ks_x_dev,
                                  sc(), sc(), blz, mxu["intt_n"])
    pub = jnp.asarray(ints_to_limbs([FR.rand(rng) for _ in range(27)], FR))
    qargs = (wire_ext, z_coeffs, pub, pk.sel_coset, pk.sigma_coset,
             pk.ks_x_coset, pk.l1_coset, pk.inv_zh_coset, sc(), sc(), sc(),
             mxu["intt_n"], mxu["cos8_fwd"], mxu["cos8_inv"])
    t_chunks, t_plain, tail_ok = K.quotient_phase(*qargs)

    # --- phases ---------------------------------------------------------
    timeit("gather_phase", lambda: K.gather_phase(wit_u16, wire_idx))
    timeit("wires_phase (5x iNTT+blind)",
           lambda: K.wires_phase(wire_evals, blinds1, mxu["intt_n"]))
    timeit("z_phase (grand product)",
           lambda: K.z_phase(wire_evals, pk.sigma_evals_dev, pk.ks_x_dev,
                             sc(), sc(), blz, mxu["intt_n"]))
    timeit("quotient_phase (no commit)", lambda: K.quotient_phase(*qargs))
    timeit("evals_phase", lambda: K.evals_phase(
        wire_ext, pk.sigma_coeffs, z_coeffs, sc(), sc()))

    m_r = n + 3
    polys20 = jnp.stack([pv.srs_pad(pk.sel_coeffs[i], m_r) for i in range(13)]
                        + [pv.srs_pad(z_coeffs, m_r)]
                        + [pv.srs_pad(t_chunks[i], m_r) for i in range(5)]
                        + [pv.srs_pad(pk.sigma_coeffs[4], m_r)])
    scal20 = jnp.asarray(ints_to_limbs([FR.rand(rng) for _ in range(20)], FR))
    timeit("lincomb k=20 (r-poly)", lambda: K.lincomb(polys20, scal20))
    polys10 = polys20[:10]
    scal10 = scal20[:10]
    timeit("lincomb k=10 (q-poly)", lambda: K.lincomb(polys10, scal10))
    q_poly = K.lincomb(polys10, scal10)
    zeta = FR.rand(rng)
    zeta_m = jnp.asarray(ints_to_limbs([zeta], FR)[0])
    zinv_m = jnp.asarray(ints_to_limbs([pow(zeta, -1, p)], FR)[0])
    timeit("open_phase (suffix-sum division)",
           lambda: K.open_phase(q_poly, zeta_m, zinv_m))

    # --- commits ----------------------------------------------------------
    for k in (1, 2, 5):
        pad = jnp.zeros((k, tab.shape[1] - wire_plain.shape[1], NLIMBS), jnp.uint32)
        plain = jnp.concatenate([wire_plain[:k], pad], axis=1)
        f = jax.jit(ms.msm_signed_windows_device)
        timeit(f"msm windows k={k}", lambda: f(tab, plain))
        g = jax.jit(ms.msm_signed_commit_device)
        timeit(f"msm windows+horner k={k}", lambda: g(tab, plain))
        timeit(f"commit k={k} incl host sync", lambda: g(tab, plain),
               sync=lambda r: np.asarray(r))

    # host-side transcript cost
    from cap_tpu.plonk.transcript import new_transcript
    vk = pk.vk
    pub_ints = [FR.rand(rng) for _ in range(27)]

    def transcript_run():
        tr = new_transcript()
        tr.begin_proof(vk, pub_ints, b"x" * 64)
        pts = [(FR.rand(rng), FR.rand(rng)) for _ in range(5)]
        tr.append_points(b"wires", pts)
        tr.challenge(b"beta")
        tr.challenge(b"gamma")
        tr.append_point(b"z", pts[0])
        tr.challenge(b"alpha")
        tr.append_points(b"t", pts)
        tr.challenge(b"zeta")
        tr.append_scalars(b"evals", pub_ints[:10])
        tr.challenge(b"v")
        tr.append_points(b"w", pts[:2])
        tr.challenge(b"u")
        return None

    t0 = time.time()
    for _ in range(10):
        transcript_run()
    print(f"{'host transcript (full prove)':44s} {(time.time()-t0)/10*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
