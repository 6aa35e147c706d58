"""Pallas-fused four-step NTT: the hot kernel of the whole framework.

The XLA formulation (ops/ntt.py) materializes the 16 int8-digit-pair matmul
partials as int32[L, 4, a, 4, b] in HBM — 64x the polynomial's bytes per
stage, which makes the transform HBM-bound at a few percent of roofline.
This kernel runs one limb's whole transform per grid step with everything
resident in VMEM:

    load X[n1, n2] (u32, ~256 KB at N=2^16)
      stage 1: signed digits -> 16 s8xs8->s32 MXU dots, recombined on the
               fly (only one [n1, n2] i32 accumulator live at a time)
      twiddle: one Montgomery multiply (VPU)
      stage 2: same digit dance against WR
    write C^T (the natural-order output block)

HBM traffic per limb-transform drops to x + tables + output ~= 5 reads/writes
of [n1, n2] u32 instead of ~70. Bit-exact with the XLA path by construction:
identical digit recoding, dot contractions, recombine order, and Montgomery
ops (tests/test_ops.py::test_pallas_matches_xla).

Used automatically on TPU backends; the jnp path remains the CPU/test
fallback (ops/ntt.py dispatches).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpufhe_tpu.ops.modops import add_mod, mont_mul

import numpy as np

_BYTE = np.uint32(0xFF)


def _staged_kernel_trace():
    """Neutralize jax.ensure_compile_time_eval() around Pallas kernel tracing.

    FusedPipeline (ciphertext/backend.py) traces backend compositions under
    ensure_compile_time_eval(), which is config.eager_constant_folding(True):
    primitives with no tracer operands get EVALUATED instead of staged. The
    Pallas kernel body contains `pl.program_id(0)` — zero operands, no eval
    rule — so kernel tracing dies with NotImplementedError unless constant
    folding is switched back off for the duration of the pallas_call
    (tests/test_pipeline.py::test_fused_pipeline_pallas_trace)."""
    try:
        from jax._src import config as _cfg

        return _cfg.eager_constant_folding(False)
    except Exception:  # pragma: no cover - future jax refactor
        return contextlib.nullcontext()


def _sdigits(x: jnp.ndarray) -> list[jnp.ndarray]:
    """uint32[a, b] -> four int8[a, b] signed digit planes (ntt.py _to_digits)."""
    planes = []
    c = jnp.zeros_like(x)
    for t in range(4):
        v = ((x >> np.uint32(8 * t)) & _BYTE) + c
        c = (v > np.uint32(127)).astype(jnp.uint32)
        planes.append(
            (v.astype(jnp.int32) - (c << np.uint32(8)).astype(jnp.int32)).astype(
                jnp.int8
            )
        )
    return planes


def _mod_matmul(xd: list, w_digits, q, qinv, dm, left: bool) -> jnp.ndarray:
    """Exact mod-q matmul from digit planes, partials never leaving registers/VMEM.

    left=True:  out[i, b] = sum_j W[i, j] X[j, b]   (W digits on the left)
    left=False: out[a, k] = sum_j X[a, j] W[j, k]
    """
    qi32 = q.astype(jnp.int32)
    acc = None
    for t in range(7):
        tt = None
        for e in range(4):
            d = t - e
            if not 0 <= d < 4:
                continue
            if left:
                prod = jax.lax.dot_general(
                    w_digits[e], xd[d], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            else:
                prod = jax.lax.dot_general(
                    xd[d], w_digits[e], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            tt = prod if tt is None else tt + prod
        contrib = mont_mul((tt + qi32).astype(jnp.uint32), dm[t], q, qinv)
        acc = contrib if acc is None else add_mod(acc, contrib, q)
    return acc


def _fourstep_kernel(q_ref, qinv_ref, dm_ref, x_ref, wl_ref, tw_ref, wr_ref, o_ref):
    l = pl.program_id(0)
    q = q_ref[l]
    qinv = qinv_ref[l]
    dm = [dm_ref[l, t] for t in range(7)]
    x = x_ref[0]  # u32[a, b]
    wl = [wl_ref[0, e] for e in range(4)]  # i8[a, a]
    wr = [wr_ref[0, e] for e in range(4)]  # i8[b, b]

    a_mat = _mod_matmul(_sdigits(x), wl, q, qinv, dm, left=True)
    b_mat = mont_mul(a_mat, tw_ref[0], q, qinv)
    c_mat = _mod_matmul(_sdigits(b_mat), wr, q, qinv, dm, left=False)
    o_ref[0] = c_mat.T  # natural-order output block [b, a]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fourstep_pallas(
    x: jnp.ndarray,
    wl_digits: jnp.ndarray,
    tw_mont: jnp.ndarray,
    wr_digits: jnp.ndarray,
    q: jnp.ndarray,
    qinv_neg: jnp.ndarray,
    digit_mont: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused four-step core.

    x: u32[L, a, b]; tables stacked per limb (ops/context.py NTTTables rows).
    Returns u32[L, b, a] — the transposed (natural-order) result, matching
    ops/ntt.py _fourstep.
    """
    L, a, b = x.shape
    grid = (L,)
    vm = pltpu.VMEM
    sm = pltpu.SMEM
    with _staged_kernel_trace():
        return pl.pallas_call(
            _fourstep_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=sm),  # q (full [L], indexed by program_id)
                pl.BlockSpec(memory_space=sm),  # qinv
                pl.BlockSpec(memory_space=sm),  # digit_mont [L, 7]
                pl.BlockSpec((1, a, b), lambda l: (l, 0, 0), memory_space=vm),  # x
                pl.BlockSpec((1, 4, a, a), lambda l: (l, 0, 0, 0), memory_space=vm),
                pl.BlockSpec((1, a, b), lambda l: (l, 0, 0), memory_space=vm),  # tw
                pl.BlockSpec((1, 4, b, b), lambda l: (l, 0, 0, 0), memory_space=vm),
            ],
            out_specs=pl.BlockSpec((1, b, a), lambda l: (l, 0, 0), memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((L, b, a), jnp.uint32),
            interpret=interpret,
        )(
            q,
            qinv_neg,
            digit_mont,
            x,
            wl_digits,
            tw_mont,
            wr_digits,
        )
