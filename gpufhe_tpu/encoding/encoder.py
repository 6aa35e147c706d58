"""CKKS encoder: canonical-embedding encode/decode + plaintext device upload.

The reference has no encoder (SURVEY.md §2.4 "CKKS encoder: none"). Encoding
runs on the **host** (numpy double-precision FFT) by deliberate design:

* it sits at the API boundary (user data enters/leaves here), so it is not
  on the homomorphic hot path;
* bit-exact parity with the golden model requires identical float rounding,
  which only sharing the exact same FFT code guarantees — TPU float32 FFTs
  would round differently and break the limb-trace contract
  (BASELINE.json:5);
* TPUs have no native float64, so a device FFT would be emulated and slower
  than the host one for this purpose.

Device-side helpers produce NTT-domain Montgomery-form plaintexts for
ciphertext-plaintext multiplies (ciphertext/ct.py ct_mul_plain).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.ops.context import Context
from gpufhe_tpu.ops.ntt import ntt_fwd
from gpufhe_tpu.ops.modops import to_mont
from gpufhe_tpu.params.params import CKKSParams


def encode(z: np.ndarray, params: CKKSParams, scale: float | None = None) -> np.ndarray:
    """complex[slots] -> coefficient-domain plaintext int64[L, N]."""
    scale = scale if scale is not None else params.scale
    return gckks.encode(z, scale, params.q_primes, params.n)


def decode(pt_coeff: np.ndarray, params: CKKSParams, scale: float, level: int) -> np.ndarray:
    """Coefficient-domain plaintext int64[K, N] -> complex[slots]."""
    return gckks.decode(pt_coeff, scale, params.q_primes[:level], params.n)


def plaintext_to_device(
    pt_coeff: np.ndarray, params: CKKSParams, ctx: Context
) -> jnp.ndarray:
    """Host coeff-domain plaintext -> device NTT-domain Montgomery u32[L, N].

    The returned array multiplies ciphertexts with a single mont_mul per
    element (ct_mul_plain); slice [:level] selects the active limbs.
    """
    lvl = pt_coeff.shape[0]
    x = jnp.asarray(np.asarray(pt_coeff, dtype=np.uint32))
    x_ntt = ntt_fwd(x, ctx, limbs=list(range(lvl)))
    q = ctx.q[:lvl][:, None]
    return to_mont(x_ntt, q, ctx.qinv_neg[:lvl][:, None], ctx.r2[:lvl][:, None])


def encode_to_device(
    z: np.ndarray, params: CKKSParams, ctx: Context, scale: float | None = None
) -> jnp.ndarray:
    return plaintext_to_device(encode(z, params, scale), params, ctx)
