"""On-device Fiat–Shamir transcript (Keccak over u32 word streams).

Word-stream twin of `plonk.transcript.Transcript`'s v2w byte layout,
running entirely inside a jitted program via `crypto.keccak_jax` — the
building block for whole-prove device pipelining (a prover variant that
never syncs to the host between rounds).  Round 4 retired the full fused
prover built on it (`prover_fused.py`, superseded by the per-round fused
programs in prover.py — see docs/STATUS.md); the transcript itself stays
as a tested component (tests/test_keccak_device.py asserts challenge
equality against the host transcript).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from cap_tpu.crypto.keccak_jax import keccak256_words
from cap_tpu.fields.host import NLIMBS
from cap_tpu.ops import field_jax as fj
from cap_tpu.ops.limbs import ints_to_limbs


def _w(v: int):
    return jnp.uint32(v & 0xFFFFFFFF)


def _label_words(label: bytes):
    """Static words for len(label) || label zero-padded to 4 bytes."""
    pad = label + b"\x00" * ((-len(label)) % 4)
    ws = [_w(int.from_bytes(pad[i : i + 4], "little")) for i in range(0, len(pad), 4)]
    return [_w(len(label))] + ws


def limbs_to_words(x):
    """[..., 16] u32 16-bit limbs -> list of 8 scalar u32 words per element,
    elements flattened in C order."""
    flat = x.reshape(-1, NLIMBS)
    out = []
    for i in range(flat.shape[0]):
        e = flat[i]
        for j in range(0, NLIMBS, 2):
            out.append(e[j] | (e[j + 1] << np.uint32(16)))
    return out


def words_to_limbs(words):
    """8 scalar u32 words -> [16] u32 16-bit limb array."""
    limbs = []
    for w_ in words:
        limbs.append(w_ & np.uint32(0xFFFF))
        limbs.append(w_ >> np.uint32(16))
    return jnp.stack(limbs)


@lru_cache(maxsize=None)
def _r2_const_np(name: str, p: int):
    return ints_to_limbs([pow(2, 512, p)])[0]


def _r2_const(name: str, p: int):
    # per-trace jnp conversion (a cached traced constant would leak scopes)
    return jnp.asarray(_r2_const_np(name, p))


class DeviceTranscript:
    """Word-stream twin of plonk.transcript.Transcript (same byte layout)."""

    def __init__(self, init_state_words):
        self.state = list(init_state_words)

    def append_words(self, label: bytes, words, byte_len: int):
        msg = (
            self.state
            + _label_words(label)
            + [_w(byte_len)]
            + list(words)
        )
        self.state = keccak256_words(msg)

    def _tagged(self, tag: int, label: bytes):
        return self.state + [_w(tag)] + _label_words(label)

    def challenge_mont(self, label: bytes, ctx=None):
        """Draw a challenge; returns its Montgomery [16] limb form."""
        ctx = ctx or fj.FR_CTX
        h1 = keccak256_words(self._tagged(1, label))
        h2 = keccak256_words(self._tagged(2, label))
        self.state = keccak256_words(self._tagged(3, label))
        lo = words_to_limbs(h1)                       # value v_lo < 2^256
        hi_words = list(h2[:4]) + [_w(0)] * 4
        hi = words_to_limbs(hi_words)                 # value v_hi < 2^128
        r2 = _r2_const(ctx.name, ctx.p_int)
        # v = v_lo + v_hi * 2^256;  v*R = mm(lo, R2) + mm(mm(hi, R2), R2)
        lo_m = fj.mont_mul(lo, r2, ctx)
        hi_m = fj.mont_mul(fj.mont_mul(hi, r2, ctx), r2, ctx)
        return fj.add(lo_m, hi_m, ctx)
