"""Profile the signed-MSM table lifecycle on the real chip.

Breaks the cold-start cliff (VERDICT r2 weak #4) into its parts:
  1. pure device build time per 2048-point block (no persistence)
  2. device -> host download of the built table (axon tunnel)
  3. host -> device upload of a disk-loaded table (the bench cold path)

Decision data: if the tunnel runs ~11 MB/s, a 1.1 GB table costs ~100 s in
EACH direction, so "persist to disk" only wins over "rebuild on device"
when the pure build is slower than one upload.

Run: PYTHONHASHSEED=0 python scripts/profile_table_build.py [log2_size]
"""

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


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    m = 1 << k
    from cap_tpu.ops import msm_signed as ms
    from cap_tpu.plonk.srs import universal_setup_for_staging

    t0 = time.time()
    srs = universal_setup_for_staging(m + 2, "data")
    print(f"srs ready {time.time()-t0:.1f}s", flush=True)

    px, py = srs.g1_x[:m], srs.g1_y[:m]

    # --- 1. pure device build, block by block ---------------------------
    t0 = time.time()
    tab = ms.build_signed_table(px, py, m)
    # force completion: device->host of one row slice (tiny)
    np.asarray(tab[0, :4])
    t_build = time.time() - t0
    nbytes = tab.size * 2
    print(f"build {t_build:.1f}s for {nbytes/1e9:.2f} GB table", flush=True)

    # --- 2. download (what disk persistence costs) ----------------------
    t0 = time.time()
    host = np.asarray(tab)
    t_down = time.time() - t0
    print(f"download {t_down:.1f}s -> {nbytes/1e6/t_down:.1f} MB/s", flush=True)

    # --- 3. upload (what the bench cold path costs) ----------------------
    t0 = time.time()
    dev = jnp.asarray(host)
    np.asarray(dev[0, :4])
    t_up = time.time() - t0
    print(f"upload {t_up:.1f}s -> {nbytes/1e6/t_up:.1f} MB/s", flush=True)

    print(
        f"VERDICT: rebuild-on-device {'WINS' if t_build < t_up else 'LOSES'} "
        f"vs disk-load ({t_build:.0f}s vs {t_up:.0f}s + np.load)",
        flush=True,
    )


if __name__ == "__main__":
    main()
