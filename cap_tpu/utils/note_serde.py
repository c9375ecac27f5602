"""Wire-format serialization for notes (reference lib.rs:215-267 twin).

TransactionNote: 1 flag byte (0=transfer, 1=mint, 2=freeze) || note body.
All field elements are 32-byte LE; points use utils.serde layouts; variable
lists carry a 2-byte LE count.
"""

from __future__ import annotations

import struct

from cap_tpu.crypto.elgamal import ElGamalCiphertext
from cap_tpu.crypto.jubjub import TEPoint
from cap_tpu.errors import DeserializationError
from cap_tpu.fields.host import FR
from cap_tpu.plonk.structs import PlonkProof
from cap_tpu.structs import (
    AssetCode,
    AssetDefinition,
    AssetPolicy,
    InternalAssetCode,
    Nullifier,
    RecordCommitment,
    RevealMap,
    ViewableMemo,
)
from cap_tpu.utils.serde import te_point_from_bytes, te_point_to_bytes

from cap_tpu.constants import VIEWABLE_DATA_LEN


class _W:
    def __init__(self):
        self.parts = []

    def fr(self, v):
        self.parts.append(FR.to_bytes_le(v))

    def frs(self, vs):
        self.u16(len(vs))
        for v in vs:
            self.fr(v)

    def u16(self, v):
        self.parts.append(struct.pack("<H", v))

    def u64(self, v):
        self.parts.append(struct.pack("<Q", v))

    def u128(self, v):
        self.parts.append(int(v).to_bytes(16, "little"))

    def pt(self, p: TEPoint):
        self.parts.append(te_point_to_bytes(p))

    def raw(self, b: bytes):
        self.u16(len(b))
        self.parts.append(b)

    def out(self) -> bytes:
        return b"".join(self.parts)


class _R:
    def __init__(self, data: bytes):
        self.d = data
        self.o = 0

    def take(self, n):
        if self.o + n > len(self.d):
            raise DeserializationError("truncated note")
        b = self.d[self.o : self.o + n]
        self.o += n
        return b

    def fr(self):
        return FR.from_bytes_le(self.take(32))

    def frs(self):
        n = self.u16()
        return [self.fr() for _ in range(n)]

    def u16(self):
        return struct.unpack("<H", self.take(2))[0]

    def u64(self):
        return struct.unpack("<Q", self.take(8))[0]

    def u128(self):
        return int.from_bytes(self.take(16), "little")

    def pt(self):
        return te_point_from_bytes(self.take(32))

    def raw(self):
        return self.take(self.u16())

    def done(self):
        if self.o != len(self.d):
            raise DeserializationError("trailing bytes")


def _w_policy(w: _W, pol: AssetPolicy):
    w.pt(pol.viewer_pk)
    w.pt(pol.cred_pk)
    w.pt(pol.freezer_pk)
    w.u16(pol.reveal_map.to_scalar())
    w.u128(pol.reveal_threshold)


def _r_policy(r: _R) -> AssetPolicy:
    viewer, cred, freezer = r.pt(), r.pt(), r.pt()
    rm = r.u16()
    bits = tuple(
        bool((rm >> (VIEWABLE_DATA_LEN - 1 - i)) & 1) for i in range(VIEWABLE_DATA_LEN)
    )
    return AssetPolicy(viewer, cred, freezer, RevealMap(bits), r.u128())


def _w_memo(w: _W, memo: ViewableMemo):
    w.pt(memo.memo.ephemeral)
    w.frs(list(memo.memo.symm_ctxts))


def _r_memo(r: _R) -> ViewableMemo:
    eph = r.pt()
    cts = r.frs()
    return ViewableMemo(ElGamalCiphertext(eph, tuple(cts)))


def transaction_note_to_bytes(tn) -> bytes:
    from cap_tpu.freeze import FreezeNote
    from cap_tpu.lib import TransactionNote
    from cap_tpu.mint import MintNote
    from cap_tpu.transfer import TransferNote

    note = tn.note if isinstance(tn, TransactionNote) else tn
    w = _W()
    if isinstance(note, TransferNote):
        w.parts.append(b"\x00")
        w.frs([n.value for n in note.inputs_nullifiers])
        w.frs([c.value for c in note.output_commitments])
        w.raw(note.proof.to_bytes())
        _w_memo(w, note.viewing_memo)
        w.fr(note.aux_info.merkle_root)
        w.u128(note.aux_info.fee)
        w.u64(note.aux_info.valid_until)
        w.pt(note.aux_info.txn_memo_ver_key)
        w.raw(note.aux_info.extra_proof_bound_data)
    elif isinstance(note, MintNote):
        w.parts.append(b"\x01")
        w.fr(note.input_nullifier.value)
        w.fr(note.chg_comm.value)
        w.fr(note.mint_comm.value)
        w.u128(note.mint_amount)
        w.fr(note.mint_asset_def.code.value)
        _w_policy(w, note.mint_asset_def.policy)
        w.fr(note.mint_internal_asset_code.value)
        w.raw(note.proof.to_bytes())
        _w_memo(w, note.viewing_memo)
        w.fr(note.aux_info.merkle_root)
        w.u128(note.aux_info.fee)
        w.pt(note.aux_info.txn_memo_ver_key)
    elif isinstance(note, FreezeNote):
        w.parts.append(b"\x02")
        w.frs([n.value for n in note.input_nullifiers])
        w.frs([c.value for c in note.output_commitments])
        w.raw(note.proof.to_bytes())
        w.fr(note.aux_info.merkle_root)
        w.u128(note.aux_info.fee)
        w.pt(note.aux_info.txn_memo_ver_key)
    else:
        raise DeserializationError("unknown note type")
    return w.out()


def transaction_note_from_bytes(data: bytes):
    from cap_tpu.freeze import FreezeAuxInfo, FreezeNote
    from cap_tpu.lib import TransactionNote
    from cap_tpu.mint import MintAuxInfo, MintNote
    from cap_tpu.transfer import AuxInfo, TransferNote

    if not data:
        raise DeserializationError("empty note")
    r = _R(data[1:])
    flag = data[0]
    if flag == 0:
        nulls = [Nullifier(v) for v in r.frs()]
        comms = [RecordCommitment(v) for v in r.frs()]
        proof = PlonkProof.from_bytes(r.raw())
        memo = _r_memo(r)
        note = TransferNote(
            inputs_nullifiers=nulls,
            output_commitments=comms,
            proof=proof,
            viewing_memo=memo,
            aux_info=AuxInfo(
                merkle_root=r.fr(), fee=r.u128(), valid_until=r.u64(),
                txn_memo_ver_key=r.pt(), extra_proof_bound_data=r.raw(),
            ),
        )
    elif flag == 1:
        null = Nullifier(r.fr())
        chg = RecordCommitment(r.fr())
        mint = RecordCommitment(r.fr())
        amount = r.u128()
        code = AssetCode(r.fr())
        pol = _r_policy(r)
        internal = InternalAssetCode(r.fr())
        proof = PlonkProof.from_bytes(r.raw())
        memo = _r_memo(r)
        note = MintNote(
            input_nullifier=null, chg_comm=chg, mint_comm=mint,
            mint_amount=amount,
            mint_asset_def=AssetDefinition(code, pol),
            mint_internal_asset_code=internal,
            proof=proof, viewing_memo=memo,
            aux_info=MintAuxInfo(
                merkle_root=r.fr(), fee=r.u128(), txn_memo_ver_key=r.pt()
            ),
        )
    elif flag == 2:
        nulls = [Nullifier(v) for v in r.frs()]
        comms = [RecordCommitment(v) for v in r.frs()]
        proof = PlonkProof.from_bytes(r.raw())
        note = FreezeNote(
            input_nullifiers=nulls, output_commitments=comms, proof=proof,
            aux_info=FreezeAuxInfo(
                merkle_root=r.fr(), fee=r.u128(), txn_memo_ver_key=r.pt()
            ),
        )
    else:
        raise DeserializationError(f"bad note flag {flag}")
    r.done()
    return TransactionNote(note)
