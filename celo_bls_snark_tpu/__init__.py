"""celo_bls_snark_tpu — TPU-native BLS12-377 BLS signatures + BW6-761 epoch SNARK.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
celo-org/celo-bls-snark-rs (see SURVEY.md for the layer map).

Package layout (mirrors the reference's crate layers; see SURVEY.md §2):
  hostmath/       pure-Python bigint oracle (fields, curves, pairing) — the
                  "native" reference the TPU kernels are validated against
  hashers/        Blake2s/Blake2Xs + Bowe-Hopwood Pedersen CRH  (layer 1)
  hash_to_curve/  try-and-increment (+CIP22, compat)            (layer 1)
  bls/            keys, signatures, aggregation, batch, cache   (layer 1)
  ops/            batched TPU kernels: limb arithmetic, Montgomery fields,
                  towers, curve ops, pairing, MSM, NTT (jnp + Pallas)
  parallel/       device-mesh sharding (pjit/shard_map) for MSM/NTT/prover
  gadgets/        R1CS gadget library                            (layer 2)
  snark/          Groth16 + epoch-snark circuit and API          (layer 3)
  ffi/            C-ABI boundary layer                           (layer 4)
  utils/          serialization, bit utils, RNG replicas
"""

__version__ = "0.1.0"
