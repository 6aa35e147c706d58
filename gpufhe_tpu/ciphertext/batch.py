"""Batched ciphertext operations — the DP axis (SURVEY.md §2.3 row 3).

Independent ciphertexts batch over a leading axis with `jax.vmap` of the
same jitted cores; no communication is involved (the FHE analogue of data
parallelism). Combine with the mesh path by sharding the batch axis over
spare mesh capacity (`NamedSharding(mesh, P('batch', None, 'coeff'))`).

A batch is stored struct-of-arrays: u32[B, K, N] per component.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ops.context import Context
from gpufhe_tpu.params.params import CKKSParams
from gpufhe_tpu.primitives.rns import make_ks_context


@dataclasses.dataclass
class CiphertextBatch:
    c: list  # each u32[B, K, N]
    level: int
    scale: float

    @property
    def batch(self) -> int:
        return self.c[0].shape[0]


def stack(cts: list[dct.Ciphertext]) -> CiphertextBatch:
    import jax.numpy as jnp

    lvl, scale = cts[0].level, cts[0].scale
    assert all(c.level == lvl and c.scale == scale for c in cts)
    return CiphertextBatch(
        [jnp.stack([ct.c[i] for ct in cts]) for i in range(len(cts[0].c))], lvl, scale
    )


def unstack(cb: CiphertextBatch) -> list[dct.Ciphertext]:
    return [
        dct.Ciphertext([comp[i] for comp in cb.c], cb.level, cb.scale)
        for i in range(cb.batch)
    ]


@functools.lru_cache(maxsize=None)
def _batched_mul_core(params: CKKSParams, level: int):
    def one(ca, cb, ctx, ksc, rlk):
        cs = dct._tensor_core.__wrapped__(ca, cb, ctx, level)
        c0, c1 = dct._relin_core.__wrapped__(cs, ctx, ksc, rlk, params, level)
        return dct._rescale_core.__wrapped__((c0, c1), ctx, ksc, params, level)

    return jax.jit(jax.vmap(one, in_axes=(0, 0, None, None, None)))


def ct_mul_batched(
    a: CiphertextBatch, b: CiphertextBatch, params: CKKSParams, ctx: Context, rlk
) -> CiphertextBatch:
    """Homomorphic multiply of B independent ciphertext pairs in one launch."""
    assert a.level == b.level
    ksc = make_ks_context(params, a.level)
    c0, c1 = _batched_mul_core(params, a.level)(
        tuple(a.c), tuple(b.c), ctx, ksc, rlk
    )
    return CiphertextBatch([c0, c1], a.level - 1, a.scale * b.scale / params.q_primes[a.level - 1])
