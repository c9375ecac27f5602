"""`gen-params` CLI (reference src/bin/gen-parameters.rs twin).

    python -m cap_tpu.gen_parameters universal-srs <size> [--dest DIR]
    python -m cap_tpu.gen_parameters prover-srs <n_in> <n_out> <depth> \
        {transfer|mint|freezing} [--srs-size N]

The reference binary has swapped match arms storing the mint key under the
freeze name and vice versa (gen-parameters.rs:89-95) — deliberately NOT
replicated here.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cap-tpu gen-params")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s1 = sub.add_parser("universal-srs", help="generate + store the staging SRS")
    s1.add_argument("size", type=int)
    s1.add_argument("--dest", default=None)

    s2 = sub.add_parser("prover-srs", help="generate + store per-shape keys")
    s2.add_argument("n_in", type=int)
    s2.add_argument("n_out", type=int)
    s2.add_argument("depth", type=int)
    s2.add_argument("circuit", choices=["transfer", "mint", "freezing"])
    s2.add_argument("--srs-size", type=int, default=None)
    s2.add_argument("--full", action="store_true",
                    help="store the full proving-key blob (.npz) instead of "
                         "the lazy JSON stub")

    args = ap.parse_args(argv)
    if args.dest:
        os.environ["CAP_TPU_PARAM_DIR"] = args.dest
    from cap_tpu import parameters
    from cap_tpu.proof import (
        compute_universal_param_size,
        freeze as freeze_proof,
        mint as mint_proof,
        transfer as transfer_proof,
    )

    t0 = time.time()
    if args.cmd == "universal-srs":
        srs = parameters.load_universal_parameter(args.size)
        print(f"stored staging SRS degree {srs.max_degree} "
              f"({time.time()-t0:.1f}s) -> {parameters.srs_path(args.size)}")
        return 0

    kind = {"freezing": "freeze"}.get(args.circuit, args.circuit)
    size = args.srs_size or compute_universal_param_size(
        kind, args.n_in, args.n_out, args.depth
    )
    srs = parameters.load_universal_parameter(size)
    if kind == "transfer":
        pk, vk = transfer_proof.preprocess(srs, args.n_in, args.n_out, args.depth)
        parameters.store_transfer_proving_key(
            pk, args.n_in, args.n_out, args.depth,
            mode="full" if args.full else "lazy")
        parameters.store_verifying_key(vk, "transfer", args.n_in, args.n_out, args.depth)
    elif kind == "mint":
        pk, vk = mint_proof.preprocess(srs, args.depth)
        parameters.store_mint_proving_key(
            pk, args.depth, mode="full" if args.full else "lazy")
        parameters.store_verifying_key(vk, "mint", 1, 2, args.depth)
    else:
        pk, vk = freeze_proof.preprocess(srs, args.n_in, args.depth)
        parameters.store_freeze_proving_key(
            pk, args.n_in, args.depth, mode="full" if args.full else "lazy")
        parameters.store_verifying_key(vk, "freeze", args.n_in, args.n_in, args.depth)
    print(f"stored {kind} keys ({time.time()-t0:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
