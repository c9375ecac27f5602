"""Round-4 depth-26 reference grid run -> docs/grid_r4.csv.

The reference criterion grid (src/bench_utils/mod.rs:40-42): transfer
{2,3,4}x{2,5}, mint, freeze {2,3}, batch-verify {1,2,4}, tree depth 26,
prove + verify per shape — run on the one real chip with the SIGNED MSM
engine (the headline engine; VERDICT r3 weak #2 flagged that grid_r3 was
windowed-only) and >=3 samples per cell (median reported; weak #6 flagged
a single contended sample shipping in the artifact).

Table note: the signed engine needs digit tables at 2^14/2^15/2^16; the
round-4 ladder build is minutes-scale and tables persist to
data/msm_tables, so re-runs are load-only.

Usage:  PYTHONHASHSEED=0 python scripts/run_grid_r4.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    t0 = time.time()

    def progress(msg):
        print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

    from cap_tpu.bench_utils import run_grid

    out = run_grid(
        out_path="docs/grid_r4.csv",
        srs_degree=2**17 + 2,
        samples=3,
        progress=progress,
    )
    progress("grid complete; docs/grid_r4.csv written")
    print(out)


if __name__ == "__main__":
    main()
