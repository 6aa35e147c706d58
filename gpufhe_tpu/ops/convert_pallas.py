"""MXU-based RNS base conversion: the BFV mult's hot primitive.

The approximate base conversion computes, per destination limb t,
    out[t] = sum_i v_i * conv[t, i]   (mod q_t),  v_i = x_i * qhatinv_i mod q_i
— an (T x S) constant matrix times S runtime limb-planes. For the small
source counts of CKKS ModUp/ModDown (S <= alpha) the unrolled Shoup loop
(primitives/rns.py _base_convert_shoup, ~22 VPU ops/term) is right; the BFV
aux-basis conversions contract over S ~ 30 limbs, where the same
signed-digit MXU treatment as the NTT (ops/ntt_pallas.py v2) wins: offset
(carry-free) runtime digits, ONE stacked i8 dot per constant digit plane,
host-precomputed offset corrections, Shoup tap recombine with lazy [0, 2q)
accumulation. Bit-exact with the per-term-reduced formulation: per-term
mod-q then modular sums equal the integer sum mod q, and the output is
canonicalized (tests/test_ops.py::test_digit_convert_matches_base_convert).

Tap bounds: |digit dot| <= S * 128 * 128 and taps sum <= 4 of them, so S up
to ~32k stays inside int32; offset corrections sized accordingly
(make_digit_convert asserts).

Cited reference gap: the reference has no RNS machinery at all (SURVEY.md
§2.4; reference arithmetic.py:3 keeps a bare `MOD` argument).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpufhe_tpu.golden import rns as grns
from gpufhe_tpu.ops.context import _digits_i8
from gpufhe_tpu.ops.modops import mont_mul, mulhi32
from gpufhe_tpu.ops.ntt_pallas import _staged_kernel_trace

_BYTE = np.uint32(0xFF)


class DigitConvertTables(NamedTuple):
    """Precomputed device tables for one (src, dst) basis pair — a pytree, so
    it rides through jit/pytree boundaries as program ARGUMENTS (never HLO
    literals; see CLAUDE.md on closure consts)."""

    sq: jnp.ndarray  # u32[S, 1] source primes
    sqinv: jnp.ndarray  # u32[S, 1] -q^{-1} mod 2^32
    qhat: jnp.ndarray  # u32[S, 1] [Qhat_i^{-1}]_{q_i}, Montgomery form
    conv_cat: jnp.ndarray  # i8[4T, S] signed digits of conv % dst, row-stacked
    corr: jnp.ndarray  # u32[7, T] offset-digit corrections (+q to stay >= 0)
    dmp: jnp.ndarray  # u32[7, T] 2^(8t) mod q_t
    dms: jnp.ndarray  # u32[7, T] Shoup companions of dmp
    dq: jnp.ndarray  # u32[T, 1] destination primes


def make_digit_convert(
    src_primes, dst_primes, qhatinv_mont: np.ndarray, conv: np.ndarray | None = None
) -> DigitConvertTables:
    """conv: optional [T, S] int64 matrix overriding conv_matrix(src, dst) —
    for variants that fold extra factors in (e.g. the BGV t-corrected
    ModDown, primitives/rns.py make_ks_context p2q_plain)."""
    src = np.asarray(src_primes, dtype=np.int64)
    dst = np.asarray(dst_primes, dtype=np.int64)
    s_dim, t_dim = len(src), len(dst)
    assert s_dim * 128 * 128 * 4 < 2**31, "tap bound outgrows int32"
    assert (dst > (1 << 26)).all(), "corrections sized for 27+-bit primes"
    if conv is None:
        conv = grns.conv_matrix(
            tuple(int(q) for q in src), tuple(int(q) for q in dst)
        )  # [T, S]
    digits = _digits_i8(np.asarray(conv % dst[:, None], dtype=np.uint32))
    # runtime digits are offset by -128, so tap t measures
    #   sum_i conv_digit[e] * (v_digit[d] - 128),  t = e + d
    # => add back 128 * rowsum(conv_digit[e]) per contributing plane, plus one
    # q_t so the pre-reduction value stays nonnegative (q*2^(8t) == 0 mod q).
    rowsum = digits.astype(np.int64).sum(axis=2)  # [4, T]
    corr = np.zeros((7, t_dim), dtype=np.int64)
    for t in range(7):
        for e in range(4):
            if 0 <= t - e < 4:
                corr[t] += rowsum[e]
    corr = corr * 128 + dst[None, :]
    assert (corr >= 0).all() and (
        corr + 4 * s_dim * 128 * 128 < (1 << 32)
    ).all()
    dmp = np.stack([(1 << (8 * t)) % dst for t in range(7)])
    sqinv = np.array(
        [(-pow(int(q), -1, 1 << 32)) % (1 << 32) for q in src], dtype=np.uint32
    )
    return DigitConvertTables(
        sq=jnp.asarray(src.astype(np.uint32)[:, None]),
        sqinv=jnp.asarray(sqinv[:, None]),
        qhat=jnp.asarray(np.asarray(qhatinv_mont).reshape(s_dim, 1)),
        conv_cat=jnp.asarray(digits.reshape(4 * t_dim, s_dim)),
        corr=jnp.asarray(corr.astype(np.uint32)),
        dmp=jnp.asarray(dmp.astype(np.uint32)),
        dms=jnp.asarray(
            ((dmp.astype(np.uint64) << np.uint64(32)) // dst).astype(np.uint32)
        ),
        dq=jnp.asarray(dst.astype(np.uint32)[:, None]),
    )


def _shoup2(a, w, w_sh, q):
    """a * w mod q in [0, 2q) (ops/modops.shoup_mul, kernel-local)."""
    return a * w - mulhi32(a, w_sh) * q


def _convert_kernel(
    sq_ref, sqinv_ref, qhat_ref, conv_ref, corr_ref, dmp_ref, dms_ref,
    dq_ref, x_ref, o_ref,
):
    x = x_ref[...]  # u32[S, Nb]
    s_dim, nb = x.shape
    t_dim = dq_ref.shape[0]
    sq = sq_ref[...]  # [S, 1]
    # v_i = x_i * qhatinv_i mod q_i (qhatinv in Montgomery form)
    v = mont_mul(x, qhat_ref[...], sq, sqinv_ref[...])
    # offset digits, column-concatenated: i8[S, 4*Nb]
    planes = [
        (((v >> np.uint32(8 * e)) & _BYTE).astype(jnp.int32) - 128).astype(
            jnp.int8
        )
        for e in range(4)
    ]
    dcat = jnp.concatenate(planes, axis=1)
    taps = [None] * 7
    for e in range(4):
        s_e = jax.lax.dot_general(
            conv_ref[e * t_dim:(e + 1) * t_dim, :], dcat,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )  # [T, 4*Nb]
        for d in range(4):
            t = e + d
            blk = s_e[:, d * nb:(d + 1) * nb]
            taps[t] = blk if taps[t] is None else taps[t] + blk
    dq = dq_ref[...]  # [T, 1]
    two_q = dq + dq
    acc = None
    for t in range(7):
        u = taps[t].astype(jnp.uint32) + corr_ref[t][:, None]
        c = _shoup2(u, dmp_ref[t][:, None], dms_ref[t][:, None], dq)
        if acc is None:
            acc = c
        else:
            s = acc + c  # < 4q < 2^32
            acc = jnp.where(s >= two_q, s - two_q, s)
    o_ref[...] = jnp.where(acc >= dq, acc - dq, acc)


def digit_convert(
    x: jnp.ndarray, tabs: DigitConvertTables, interpret: bool = False
) -> jnp.ndarray:
    """u32[S, N] canonical -> u32[T, N] canonical, == _base_convert_shoup."""
    s_dim, n = x.shape
    t_dim = tabs.dq.shape[0]
    nb = min(n, 2048)
    assert n % nb == 0
    vm = pltpu.VMEM
    with _staged_kernel_trace():
        return pl.pallas_call(
            _convert_kernel,
            grid=(n // nb,),
            in_specs=[
                pl.BlockSpec(memory_space=vm),  # sq [S,1]
                pl.BlockSpec(memory_space=vm),  # sqinv
                pl.BlockSpec(memory_space=vm),  # qhatinv (Montgomery)
                pl.BlockSpec(memory_space=vm),  # conv_cat [4T, S]
                pl.BlockSpec(memory_space=vm),  # corr [7, T]
                pl.BlockSpec(memory_space=vm),  # dmp [7, T]
                pl.BlockSpec(memory_space=vm),  # dms [7, T]
                pl.BlockSpec(memory_space=vm),  # dq [T,1]
                pl.BlockSpec((s_dim, nb), lambda j: (0, j), memory_space=vm),
            ],
            out_specs=pl.BlockSpec((t_dim, nb), lambda j: (0, j),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((t_dim, n), jnp.uint32),
            interpret=interpret,
        )(*tabs, x)
