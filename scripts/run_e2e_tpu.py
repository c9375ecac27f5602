"""Full-stack end-to-end run on the TPU: all three note types prove+verify,
batch verification, and wallet/viewer flows.  Used by /verify and as the
pre-bench smoke test.

    python scripts/run_e2e_tpu.py [--depth D] [--skip-transfer]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--skip-transfer", action="store_true")
    args = ap.parse_args()

    from cap_tpu.errors import TxnApiError
    from cap_tpu.lib import TransactionNote, txn_batch_verify
    from cap_tpu.proof import (
        freeze as fproof,
        mint as mproof,
        transfer as tproof,
        universal_setup_for_staging,
    )
    from cap_tpu.utils.params_builder import (
        FreezeParamsBuilder,
        MintParamsBuilder,
        TransferParamsBuilder,
    )
    from cap_tpu.utils.rng import test_rng

    rng = test_rng()
    depth = args.depth
    srs = universal_setup_for_staging(2**15 + 2, "data")
    log("srs ready")

    notes, roots, vks = [], [], []

    t0 = time.time()
    mpk, mvk = mproof.preprocess(srs, depth)
    log(f"mint preprocess {time.time()-t0:.1f}s")
    mb = MintParamsBuilder(rng, depth, with_viewer=True)
    t0 = time.time()
    mnote, _, mint_ro, _ = mb.build_mint_note(mpk)
    log(f"mint generate {time.time()-t0:.1f}s")
    mnote.verify(mvk, mb.tree.root)
    vd = mb.viewer.open_mint_viewing_memo(mnote)
    assert vd.user_address == mb.recv.pub_key().address
    log("mint verify + viewer decode OK")
    notes.append(TransactionNote.mint(mnote)); roots.append(mb.tree.root); vks.append(mvk)

    if not args.skip_transfer:
        t0 = time.time()
        tpk, tvk = tproof.preprocess(srs, 2, 2, depth)
        log(f"transfer preprocess {time.time()-t0:.1f}s")
        tb = TransferParamsBuilder(rng, 2, 2, depth, non_native=True, with_viewer=True)
        t0 = time.time()
        tnote, _, _ = tb.build_transfer_note(tpk)
        log(f"transfer generate {time.time()-t0:.1f}s")
        tnote.verify(tvk, tb.tree.root, timestamp=5)
        ins, outs = tb.viewer.open_transfer_viewing_memo(tb.asset_def, tnote)
        assert ins and outs
        log("transfer verify + viewer decode OK")
        notes.append(TransactionNote.transfer(tnote)); roots.append(tb.tree.root); vks.append(tvk)

    t0 = time.time()
    fpk, fvk = fproof.preprocess(srs, 2, depth)
    log(f"freeze preprocess {time.time()-t0:.1f}s")
    fb = FreezeParamsBuilder(rng, 2, depth)
    t0 = time.time()
    fnote, _, fouts, _ = fb.build_freeze_note(fpk)
    log(f"freeze generate {time.time()-t0:.1f}s")
    fnote.verify(fvk, fb.tree.root)
    assert fouts[0].freeze_flag == 1
    log("freeze verify OK")
    notes.append(TransactionNote.freeze(fnote)); roots.append(fb.tree.root); vks.append(fvk)

    t0 = time.time()
    txn_batch_verify(notes, roots, 5, vks)
    log(f"mixed batch verify ({len(notes)} notes) {time.time()-t0:.1f}s OK")
    log("E2E ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
