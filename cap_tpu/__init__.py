"""cap_tpu — a TPU-native Configurable Asset Privacy (CAP) framework.

A from-scratch re-design of EspressoSystems/cap (reference mounted read-only
at /root/reference; see SURVEY.md) for TPU hardware:

* **Compute path** (``cap_tpu.ops``): BN254 field arithmetic in fixed-limb
  form vectorized for the VPU (JAX + Pallas), radix-2 NTT, Pippenger-style
  MSM, and batched Rescue — shardable over a `jax.sharding.Mesh`.
* **Proving system** (``cap_tpu.plonk``): TurboPlonk (5 wires, x^5 hash
  gates) with KZG commitments and a Keccak-256 Fiat–Shamir transcript.
* **Application layer** (``cap_tpu.structs/keys/transfer/mint/freeze``):
  asset records, policies, viewing/freezing, the three note types, batch
  verification and parameter persistence — the full reference API surface.
* **Host crypto** (``cap_tpu.crypto``): Rescue, Keccak, Baby Jubjub,
  Schnorr, hybrid ElGamal, AEAD, 3-ary Rescue Merkle accumulator, and the
  BN254 pairing for verification.

Layer map and build plan: SURVEY.md §1/§7 at the repository root.
"""

__version__ = "0.1.0"
