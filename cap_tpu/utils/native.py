"""ctypes bridge to the C++ host accelerator (native/libcap_native.so).

Everything degrades gracefully: if the shared library is absent or fails to
load, `HAVE_NATIVE` is False and callers fall back to pure Python.  The
library is built with `make -C native` (done automatically on first import
if a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

from cap_tpu.fields.host import FQ, FR

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "libcap_native.so")

HAVE_NATIVE = False
_lib = None


def _to_limbs64(v: int) -> tuple:
    return tuple((v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4))


def _from_limbs64(arr) -> int:
    return sum(int(arr[i]) << (64 * i) for i in range(4))


U64_4 = ctypes.c_uint64 * 4
U64_16 = ctypes.c_uint64 * 16


def _init_lib() -> bool:
    global _lib, HAVE_NATIVE
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_REPO, "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return False
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return False
    # field contexts: which=0 -> Fr, which=1 -> Fq
    for which, F in ((0, FR), (1, FQ)):
        n0 = (-pow(F.p, -1, 1 << 64)) % (1 << 64)
        r = (1 << 256) % F.p
        r2 = r * r % F.p
        lib.cap_field_init(
            which, U64_4(*_to_limbs64(F.p)), U64_4(*_to_limbs64(r2)),
            U64_4(*_to_limbs64(r)), ctypes.c_uint64(n0),
        )
    # rescue constants (Montgomery form, 64-bit limbs)
    from cap_tpu.crypto.rescue import rescue_params

    pr = rescue_params(FR)
    mont = lambda v: _to_limbs64(v * ((1 << 256) % FR.p) % FR.p)
    mds_flat = []
    for i in range(4):
        for j in range(4):
            mds_flat.extend(mont(pr.mds[i][j]))
    rk_flat = []
    for r_ in range(25):
        for i in range(4):
            rk_flat.extend(mont(pr.round_keys[r_][i]))
    ainv = _to_limbs64(pr.alpha_inv)
    lib.cap_rescue_init(
        (ctypes.c_uint64 * len(mds_flat))(*mds_flat),
        (ctypes.c_uint64 * len(rk_flat))(*rk_flat),
        U64_4(*ainv),
    )
    # key-injection vectors for the keyed PRP / counter-mode stream
    # (older .so builds without the symbol: Python fallback stays)
    if hasattr(lib, "cap_rescue_set_keyinj"):
        inj_flat = []
        for r_ in range(25):
            for i in range(4):
                inj_flat.extend(mont(pr.key_inj[r_][i]))
        lib.cap_rescue_set_keyinj(
            (ctypes.c_uint64 * len(inj_flat))(*inj_flat)
        )
    from cap_tpu.crypto.jubjub import COEFF_A, COEFF_D

    lib.cap_te_init(U64_4(*mont(COEFF_A)), U64_4(*mont(COEFF_D)))
    _lib = lib
    HAVE_NATIVE = True
    return True


_init_lib()

_R256_FR = (1 << 256) % FR.p
_RINV_FR = pow(1 << 256, -1, FR.p)
_R256_FQ = (1 << 256) % FQ.p
_RINV_FQ = pow(1 << 256, -1, FQ.p)


def rescue_permute(state4) -> list | None:
    """Native Rescue permutation on 4 Fr ints; None if unavailable."""
    if not HAVE_NATIVE:
        return None
    buf = (ctypes.c_uint64 * 16)()
    for i, v in enumerate(state4):
        m = v * _R256_FR % FR.p
        for k in range(4):
            buf[4 * i + k] = (m >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    _lib.cap_rescue_permute(buf)
    out = []
    for i in range(4):
        v = sum(int(buf[4 * i + k]) << (64 * k) for k in range(4))
        out.append(v * _RINV_FR % FR.p)
    return out


def g1_mul(pt, scalar: int):
    """Native Jacobian scalar mul on an affine host point; None if no lib."""
    if not HAVE_NATIVE or pt is None:
        return None if not HAVE_NATIVE else None
    buf = (ctypes.c_uint64 * 12)()
    for idx, coord in enumerate((pt[0], pt[1], 1)):
        m = coord * _R256_FQ % FQ.p
        for k in range(4):
            buf[4 * idx + k] = (m >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    sc = U64_4(*_to_limbs64(scalar % FR.p))
    out = (ctypes.c_uint64 * 12)()
    _lib.cap_g1_mul(buf, sc, out)
    x = _from_limbs64(out[0:4]) * _RINV_FQ % FQ.p
    y = _from_limbs64(out[4:8]) * _RINV_FQ % FQ.p
    z = _from_limbs64(out[8:12]) * _RINV_FQ % FQ.p
    if z == 0:
        return None
    zinv = pow(z, -1, FQ.p)
    zi2 = zinv * zinv % FQ.p
    return (x * zi2 % FQ.p, y * zi2 % FQ.p * zinv % FQ.p)


def g1_msm_pippenger(scalars, points, c: int | None = None):
    """Native threaded bucket-Pippenger MSM over affine host points.

    Returns the affine result (None = infinity), or NotImplemented when the
    shared library is unavailable.  Infinity points and zero scalars are
    filtered host-side; window width defaults to ~log2(n)-3 (arkworks'
    VariableBaseMSM heuristic)."""
    if not HAVE_NATIVE:
        return NotImplemented
    pairs = [
        (s % FR.p, pt)
        for s, pt in zip(scalars, points)
        if pt is not None and s % FR.p != 0
    ]
    n = len(pairs)
    if n == 0:
        return None
    if c is None:
        c = min(16, max(4, n.bit_length() - 3))
    pts = (ctypes.c_uint64 * (12 * n))()
    scs = (ctypes.c_uint64 * (4 * n))()
    for i, (s, pt) in enumerate(pairs):
        for idx, coord in enumerate((pt[0], pt[1], 1)):
            m = coord * _R256_FQ % FQ.p
            for k in range(4):
                pts[12 * i + 4 * idx + k] = (m >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
        for k in range(4):
            scs[4 * i + k] = (s >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    out = (ctypes.c_uint64 * 12)()
    _lib.cap_g1_msm_pippenger(pts, scs, ctypes.c_int(n), ctypes.c_int(c), out)
    x = _from_limbs64(out[0:4]) * _RINV_FQ % FQ.p
    y = _from_limbs64(out[4:8]) * _RINV_FQ % FQ.p
    z = _from_limbs64(out[8:12]) * _RINV_FQ % FQ.p
    if z == 0:
        return None
    zinv = pow(z, -1, FQ.p)
    zi2 = zinv * zinv % FQ.p
    return (x * zi2 % FQ.p, y * zi2 % FQ.p * zinv % FQ.p)


def _pack_fr_mont(vals, buf, off=0):
    for i, v in enumerate(vals):
        m = v * _R256_FR % FR.p
        for k in range(4):
            buf[off + 4 * i + k] = (m >> (64 * k)) & 0xFFFFFFFFFFFFFFFF


def _unpack_fr_mont(buf, count, off=0):
    out = []
    for i in range(count):
        v = sum(int(buf[off + 4 * i + k]) << (64 * k) for k in range(4))
        out.append(v * _RINV_FR % FR.p)
    return out


def te_add(x1, y1, x2, y2):
    """Native TE point add on affine ints; None if unavailable."""
    if not HAVE_NATIVE:
        return None
    a = (ctypes.c_uint64 * 8)()
    b = (ctypes.c_uint64 * 8)()
    _pack_fr_mont([x1, y1], a)
    _pack_fr_mont([x2, y2], b)
    out = (ctypes.c_uint64 * 8)()
    _lib.cap_te_add(a, b, out)
    r = _unpack_fr_mont(out, 2)
    return r[0], r[1]


def te_mul(x, y, scalar: int):
    """Native TE scalar mul; None if unavailable."""
    if not HAVE_NATIVE:
        return None
    a = (ctypes.c_uint64 * 8)()
    _pack_fr_mont([x, y], a)
    sc = U64_4(*_to_limbs64(scalar))
    out = (ctypes.c_uint64 * 8)()
    _lib.cap_te_mul(a, sc, out)
    r = _unpack_fr_mont(out, 2)
    return r[0], r[1]


def rescue_trace(state4):
    """Full per-round witness trace (4 + 144 values); None if unavailable."""
    if not HAVE_NATIVE:
        return None
    st = (ctypes.c_uint64 * 16)()
    _pack_fr_mont(state4, st)
    out = (ctypes.c_uint64 * (4 * 148))()
    _lib.cap_rescue_trace(st, out)
    return _unpack_fr_mont(out, 148)


def tape_replay(code, consts, inputs, n_vars: int):
    """Run the native witness-tape replayer (cap_tape_replay).

    code: np.uint32 bytecode; consts: np.uint64 [nc,4] Montgomery pool;
    inputs: list of ints (plain form).  Returns plain-form np.uint64
    [n_vars,4] limbs, or None if the native library is unavailable.
    Raises on a malformed tape (native rc != 0).
    """
    if not HAVE_NATIVE:
        return None
    import numpy as np

    p = FR.p
    mask = 0xFFFFFFFFFFFFFFFF
    inp = np.zeros((max(len(inputs), 1), 4), dtype=np.uint64)
    for i, v in enumerate(inputs):
        v %= p
        inp[i, 0] = v & mask
        inp[i, 1] = (v >> 64) & mask
        inp[i, 2] = (v >> 128) & mask
        inp[i, 3] = (v >> 192) & mask
    out = np.empty((n_vars, 4), dtype=np.uint64)
    code = np.ascontiguousarray(code, dtype=np.uint32)
    consts = np.ascontiguousarray(consts, dtype=np.uint64)
    rc = _lib.cap_tape_replay(
        code.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_long(len(code)),
        consts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        inp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_long(n_vars),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise RuntimeError(f"cap_tape_replay failed (rc={rc})")
    return out


def keccak_f1600(state25: list) -> list | None:
    if not HAVE_NATIVE:
        return None
    buf = (ctypes.c_uint64 * 25)(*state25)
    _lib.cap_keccak_f1600(buf)
    return list(buf)


def keccak256(data: bytes) -> bytes | None:
    """Native whole-digest Keccak-256; None if unavailable."""
    if not HAVE_NATIVE or not hasattr(_lib, "cap_keccak256"):
        return None
    out = (ctypes.c_ubyte * 32)()
    _lib.cap_keccak256(
        ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_long(len(data)), out,
    )
    return bytes(out)


_pairing_ready = False


def _ensure_pairing() -> bool:
    """Lazy pairing init: Python computes the frobenius gamma tables and the
    ate loop bits and hands them to the C++ side (which holds no curve
    constants of its own)."""
    global _pairing_ready
    if _pairing_ready:
        return True
    if not HAVE_NATIVE:
        return False
    from cap_tpu.crypto.bn254 import (
        ATE_LOOP_COUNT,
        BN_X,
        Fq2,
        _FROB_X,
        _FROB_Y,
    )

    p = FQ.p
    montq = lambda v: _to_limbs64(v % p * _R256_FQ % p)

    def pack_f2(v):
        return list(montq(v.c0)) + list(montq(v.c1))

    xi = Fq2(9, 1)
    gam = []
    for e in (1, 2, 3):
        base = xi.pow((p**e - 1) // 6)
        acc = base
        for i in range(5):
            gam.extend(pack_f2(acc))
            acc = acc * base
    frob_xy = pack_f2(_FROB_X) + pack_f2(_FROB_Y)
    nbits = ATE_LOOP_COUNT.bit_length()
    bits = [(ATE_LOOP_COUNT >> (nbits - 1 - i)) & 1 for i in range(nbits)]
    _lib.cap_pairing_init(
        (ctypes.c_uint64 * len(gam))(*gam),
        (ctypes.c_uint64 * len(frob_xy))(*frob_xy),
        ctypes.c_uint64(BN_X),
        (ctypes.c_int * nbits)(*bits),
        ctypes.c_int(nbits),
        U64_4(*montq(9)),
    )
    _pairing_ready = True
    return True


def pairing_check(pairs) -> bool | None:
    """Native multi-pairing check: prod e(P_i, Q_i) == 1.

    pairs: list of (g1_affine_or_None, g2_affine (Fq2 pair) or None).
    Returns None if the native library is unavailable.
    """
    if not _ensure_pairing():
        return None
    n = len(pairs)
    if n == 0:
        return True
    p = FQ.p
    g1 = (ctypes.c_uint64 * (8 * n))()
    g2 = (ctypes.c_uint64 * (16 * n))()
    skip = (ctypes.c_int * n)()
    for i, (pt, q) in enumerate(pairs):
        if pt is None or q is None:
            skip[i] = 1
            continue
        for j, coord in enumerate((pt[0], pt[1])):
            m = coord % p * _R256_FQ % p
            for k in range(4):
                g1[8 * i + 4 * j + k] = (m >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
        qx, qy = q
        for j, coord in enumerate((qx.c0, qx.c1, qy.c0, qy.c1)):
            m = coord % p * _R256_FQ % p
            for k in range(4):
                g2[16 * i + 4 * j + k] = (m >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    return bool(_lib.cap_pairing_check(g1, g2, skip, ctypes.c_int(n)))


def rescue_counter_stream(key4, nblocks: int) -> list | None:
    """Native counter-mode key stream (spec Alg 6): returns nblocks*4 Fr
    ints (block i = RescueWithRoundKeys([i,0,0,0], KeyScheduling(key4))),
    or None when the library / key-injection table is unavailable."""
    if not HAVE_NATIVE or not hasattr(_lib, "cap_rescue_counter_stream"):
        return None
    kb = (ctypes.c_uint64 * 16)()
    for i, v in enumerate(key4):
        m = (v % FR.p) * _R256_FR % FR.p
        for k in range(4):
            kb[4 * i + k] = (m >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    nb = (ctypes.c_uint64 * (4 * nblocks))()
    for b in range(nblocks):
        m = b * _R256_FR % FR.p
        for k in range(4):
            nb[4 * b + k] = (m >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    out = (ctypes.c_uint64 * (16 * nblocks))()
    rc = _lib.cap_rescue_counter_stream(kb, nb, ctypes.c_int(nblocks), out)
    if rc != 0:
        return None
    res = []
    for idx in range(4 * nblocks):
        v = sum(int(out[4 * idx + k]) << (64 * k) for k in range(4))
        res.append(v * _RINV_FR % FR.p)
    return res
