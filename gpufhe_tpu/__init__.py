"""gpufhe_tpu — a TPU-native RNS-FHE primitive framework (CKKS / BGV / BFV).

A from-scratch JAX/XLA/Pallas re-design of the capability envelope sketched by
the reference repo Kelly-Zhe/GPU-FHE (see SURVEY.md). The reference's three
layers map onto this package as:

  reference arithmetic.py  ->  gpufhe_tpu.ops        (modular kernels + NTT)
  reference primitive.py   ->  gpufhe_tpu.primitives (RNS / key-switch cores)
  reference  polynomial.py ->  gpufhe_tpu.ciphertext (ciphertext-level ops)

plus the subsystems the reference implies but does not contain: params,
encoding, keys, parallel (mesh sharding), models (pipeline workloads), and a
pure-numpy golden model that defines the bit-exact parity contract.

Design stance (TPU-first):
  * planar RNS layout: uint32[num_components, L, N] limb planes, HBM resident
  * Montgomery multiplication on uint32 lanes built from 16-bit partial
    products (the VPU path), with fixed operands (twiddles, keys) stored in
    Montgomery form
  * negacyclic NTT as a four-step transform whose n1/n2-point sub-transforms
    are signed-8-bit digit-decomposed matmuls on the MXU (signed digits:
    the Mosaic uint8 dot_general path misreads operands as signed)
  * scaling via a ('limb', 'coeff') jax.sharding.Mesh: limb-parallel ops are
    embarrassingly parallel, the coeff axis uses an all_to_all four-step NTT,
    key-switch inner products psum over the limb axis
"""

__version__ = "0.1.0"

from gpufhe_tpu.params.params import CKKSParams, make_context  # noqa: F401
from gpufhe_tpu.api import Session  # noqa: F401
