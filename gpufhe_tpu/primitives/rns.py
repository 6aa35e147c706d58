"""Device RNS primitives: fast basis conversion, ModUp, ModDown, rescale.

The reference contains no RNS machinery at all (SURVEY.md §2.4; its only
modulus handling is a bare `MOD` argument, reference arithmetic.py:3). This
module is the TPU realization of the golden algorithms in
gpufhe_tpu.golden.rns — **bit-exact**: every approximate-base-conversion term
is reduced per-term exactly as the golden model does, so ciphertext limbs
compare with `==` through the whole pipeline (BASELINE.json:5 limb-trace
contract).

Precomputed per-(params, level) constants live in `KSContext`, a pytree of
uint32 device arrays built host-side once and cached. Fixed factors
(conversion matrices, qhat inverses, P^-1, q_last^-1) are stored in
Montgomery form so each use is a single mont_mul on the VPU.

Shapes: polynomials are uint32[K, N] canonical residues; the source axis of a
base conversion is tiny (alpha = 1-5 limbs) so the per-source-limb Python
loop unrolls into a handful of fused VPU ops — no MXU needed here.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gpufhe_tpu.golden import rns as grns
from gpufhe_tpu.ops.context import Context
from gpufhe_tpu.ops.modops import (
    add_mod,
    barrett_reduce_u32,
    mont_mul,
    shoup_mul,
    sub_mod,
)
from gpufhe_tpu.params.params import CKKSParams

R = 1 << 32


def _mont_np(x, q) -> np.ndarray:
    """Host: canonical -> Montgomery form (element-wise, exact)."""
    x = np.asarray(x, dtype=np.uint64)
    q = np.asarray(q, dtype=np.uint64)
    return (x * (np.uint64(R) % q) % q).astype(np.uint32)


def _use_mxu_convert(s_dim: int) -> bool:
    """Route a base conversion to the MXU digit kernel (convert_pallas.py)?

    Per-output-element VPU cost: Shoup loop ~19*S ops vs digit recombine
    ~125 + digit prep — the crossover is S ~ 8 (the kernel's stacked i8
    dots are effectively free next to the recombine). CPU keeps the Shoup
    path (bit-identical; test_digit_convert_matches_base_convert)."""
    if s_dim < 8:
        return False
    from gpufhe_tpu.ops.ntt import _use_pallas

    return _use_pallas()


def ks_groups(params: CKKSParams, level: int) -> list[tuple[int, int]]:
    """(start, stop) limb ranges of the active key-switch decomposition groups."""
    alpha = params.alpha
    return [(d, min(d + alpha, level)) for d in range(0, level, alpha)]


class KSContext(NamedTuple):
    """Per-(params, level) device tables for key-switching and rescale.

    All conversion factors in Montgomery form; tuple fields are per-group
    (groups may have unequal sizes so they stay separate pytree leaves).
    """

    # ModUp (per decomposition group g with src limbs qs[d0:d1]):
    modup_qhatinv: tuple  # u32[S_g]          [Qhat_g_i^{-1}]_{q_i}, Montgomery
    modup_conv: tuple  # u32[K+alpha, S_g]  [Qhat_g_i]_{t} over the FULL active
    #   QP chain, Montgomery. Rows for the group's own limbs act as the
    #   identity: q_j | Qhat_g_i for i != j inside the group, so the MAC
    #   reduces to v_j * [Qhat_g_j]_{q_j} = x_j exactly — no concatenation
    #   assembly needed, and every group runs the same uniform program
    #   (required by the SPMD sharded path, parallel/).
    # ModDown by P (p-basis -> active q-basis):
    p2q_qhatinv: jnp.ndarray  # u32[alpha]
    p2q_conv: jnp.ndarray  # u32[K, alpha]
    pinv_mont: jnp.ndarray  # u32[K]     [P^{-1}]_{q_i}, Montgomery
    # Rescale by q_last (level K -> K-1):
    qlast_mod: jnp.ndarray  # u32[K-1]   q_last mod q_i (canonical)
    qlast_inv_mont: jnp.ndarray  # u32[K-1]   [q_last^{-1}]_{q_i}, Montgomery
    # BGV-only (zeros for CKKS params): t-corrected ModSwitch constants.
    # The BGV ModDown correction needs no extra fields — it folds t^{-1} into
    # p2q_qhatinv and t into p2q_conv (golden/bgv.py mod_down_coeff_bgv).
    bgv_negtinv_mont: jnp.ndarray  # u32[1]    [-t^{-1}]_{q_last}, Montgomery
    bgv_t_mont: jnp.ndarray  # u32[K-1]  t mod q_i, Montgomery
    # Shoup companions of the conversion matrices (canonical w + floor(w *
    # 2^32 / q)): the single-chip base conversions multiply by these instead
    # of the Montgomery forms — 19 VPU ops/term vs 35 (ops/modops.shoup_mul).
    # The Montgomery fields above remain for the sharded bodies (parallel/).
    modup_conv_plain: tuple  # u32[K+alpha, S_g] canonical
    modup_conv_shoup: tuple  # u32[K+alpha, S_g]
    p2q_conv_plain: jnp.ndarray  # u32[K, alpha] canonical (t-folded for BGV)
    p2q_conv_shoup: jnp.ndarray  # u32[K, alpha]
    # MXU digit-dot tables (ops/convert_pallas.py): the TPU path contracts
    # WIDE conversions (S >= _DC_MIN_SRC source limbs, e.g. alpha=15 chains)
    # on the MXU; narrow ones and the CPU path keep the Shoup VPU loop.
    modup_dc: tuple  # DigitConvertTables per group
    p2q_dc: object  # DigitConvertTables (t-folded conv for BGV)


@functools.lru_cache(maxsize=None)
def make_ks_context(params: CKKSParams, level: int) -> KSContext:
    """Host-side table build (exact python-int arithmetic)."""
    qs = params.q_primes[:level]
    ps = params.p_primes

    from gpufhe_tpu.ops.modops import shoup_np

    modup_qhatinv, modup_conv = [], []
    modup_conv_plain, modup_conv_shoup = [], []
    qp = qs + ps
    qp_col = np.array(qp, dtype=np.int64)[:, None]
    from gpufhe_tpu.ops.convert_pallas import make_digit_convert

    modup_dc = []
    for d0, d1 in ks_groups(params, level):
        src = qs[d0:d1]
        qhatinv_m = _mont_np(grns.qhat_inv(src), np.array(src))
        modup_qhatinv.append(jnp.asarray(qhatinv_m))
        # extended matrix over the FULL active chain (identity rows included)
        conv = grns.conv_matrix(src, qp)  # int64[K+alpha, S]
        modup_conv.append(jnp.asarray(_mont_np(conv, qp_col)))
        modup_conv_plain.append(jnp.asarray(np.asarray(conv, dtype=np.uint32)))
        modup_conv_shoup.append(jnp.asarray(shoup_np(conv, qp_col)))
        modup_dc.append(make_digit_convert(src, qp, qhatinv_m, conv=conv))

    t = params.plain_modulus
    q_col = np.array(qs, dtype=np.int64)[:, None]
    if t:
        # BGV: fold t^{-1} into the P-side factors and t into the conv rows so
        # the SAME mod_down kernel computes the t-corrected division by P
        p_arr = np.array(ps, dtype=np.int64)
        tinv_p = np.array([pow(t, -1, p) for p in ps], dtype=np.int64)
        p2q_qhatinv = _mont_np(grns.qhat_inv(ps) * tinv_p % p_arr, p_arr)
        p2q_plain = grns.conv_matrix(ps, qs) * t % q_col
    else:
        p2q_qhatinv = _mont_np(grns.qhat_inv(ps), np.array(ps))
        p2q_plain = grns.conv_matrix(ps, qs) % q_col
    p2q_conv = _mont_np(p2q_plain, q_col)
    import math

    big_p = math.prod(ps)
    pinv = [pow(big_p, -1, q) for q in qs]
    q_last = qs[-1]
    qlast_mod = [q_last % q for q in qs[:-1]]
    qlast_inv = [pow(q_last, -1, q) for q in qs[:-1]]
    if t:
        bgv_negtinv = _mont_np([(-pow(t, -1, q_last)) % q_last], np.array([q_last]))
        bgv_t = _mont_np([t % q for q in qs[:-1]], np.array(qs[:-1]))
    else:
        bgv_negtinv = np.zeros(1, dtype=np.uint32)
        bgv_t = np.zeros(len(qs) - 1, dtype=np.uint32)

    u32 = lambda v: jnp.asarray(np.asarray(v, dtype=np.uint32))
    return KSContext(
        modup_qhatinv=tuple(modup_qhatinv),
        modup_conv=tuple(modup_conv),
        p2q_qhatinv=jnp.asarray(p2q_qhatinv),
        p2q_conv=jnp.asarray(p2q_conv),
        pinv_mont=jnp.asarray(_mont_np(pinv, np.array(qs))),
        qlast_mod=u32(qlast_mod),
        qlast_inv_mont=jnp.asarray(_mont_np(qlast_inv, np.array(qs[:-1]))),
        bgv_negtinv_mont=jnp.asarray(bgv_negtinv),
        bgv_t_mont=jnp.asarray(bgv_t),
        modup_conv_plain=tuple(modup_conv_plain),
        modup_conv_shoup=tuple(modup_conv_shoup),
        p2q_conv_plain=jnp.asarray(np.asarray(p2q_plain, dtype=np.uint32)),
        p2q_conv_shoup=jnp.asarray(shoup_np(p2q_plain, q_col)),
        modup_dc=tuple(modup_dc),
        p2q_dc=make_digit_convert(ps, qs, p2q_qhatinv, conv=p2q_plain),
    )


def base_convert(
    x: jnp.ndarray,
    src_q: jnp.ndarray,
    src_qinv: jnp.ndarray,
    qhatinv_mont: jnp.ndarray,
    conv_mont: jnp.ndarray,
    dst_q: jnp.ndarray,
    dst_qinv: jnp.ndarray,
) -> jnp.ndarray:
    """Approximate fast base conversion, bit-exact vs golden base_convert.

    x: u32[S, N] residues mod src primes -> u32[T, N] residues mod dst primes,
    congruent to x + u * prod(src) for small |u| (golden rns.py base_convert).
    """
    v = mont_mul(x, qhatinv_mont[:, None], src_q[:, None], src_qinv[:, None])
    acc = None
    for i in range(x.shape[0]):  # S is tiny (<= alpha): unrolled VPU ops
        term = mont_mul(
            v[i][None, :], conv_mont[:, i, None], dst_q[:, None], dst_qinv[:, None]
        )
        acc = term if acc is None else add_mod(acc, term, dst_q[:, None])
    return acc


def _base_convert_shoup(
    x: jnp.ndarray,
    src_q: jnp.ndarray,
    src_qinv: jnp.ndarray,
    qhatinv_mont: jnp.ndarray,
    conv_plain: jnp.ndarray,
    conv_shoup: jnp.ndarray,
    dst_q: jnp.ndarray,
) -> jnp.ndarray:
    """base_convert with Shoup constant-multiplies on the conversion matrix.

    Identical (canonical) result: each v_i * conv[t, i] term lands in
    [0, 2q_t) and is lazily accumulated with one conditional subtract per
    add, then canonicalized once — ~19 VPU ops per term vs mont_mul's ~35.
    The S*T term grid is the dominant VPU cost of ModUp/ModDown."""
    v = mont_mul(x, qhatinv_mont[:, None], src_q[:, None], src_qinv[:, None])
    dst_col = dst_q[:, None]
    two_q = dst_col + dst_col
    acc = None
    for i in range(x.shape[0]):
        term = shoup_mul(
            v[i][None, :], conv_plain[:, i, None], conv_shoup[:, i, None], dst_col
        )
        if acc is None:
            acc = term
        else:
            s = acc + term  # < 4q < 2^32 (primes < 2^30)
            acc = jnp.where(s >= two_q, s - two_q, s)
    return jnp.where(acc >= dst_col, acc - dst_col, acc)


def mod_up(
    x_coeff: jnp.ndarray, params: CKKSParams, level: int, ctx: Context, ksc: KSContext
) -> list[jnp.ndarray]:
    """ModUp every decomposition group of u32[K, N] to the full active QP basis.

    Returns one u32[K + alpha, N] coefficient-domain array per group, limb
    order = active q-chain then p-chain (mirrors golden key_switch_core's
    `raised` assembly, golden/ckks.py key_switch_core).
    """
    k = level
    alpha = len(params.p_primes)
    qp_idx = np.asarray(
        list(range(k)) + list(range(params.num_limbs, params.num_limbs + alpha))
    )
    qp_q, qp_qinv = ctx.q[qp_idx], ctx.qinv_neg[qp_idx]
    out = []
    for g, (d0, d1) in enumerate(ks_groups(params, level)):
        if _use_mxu_convert(d1 - d0):
            from gpufhe_tpu.ops.convert_pallas import digit_convert

            out.append(digit_convert(x_coeff[d0:d1], ksc.modup_dc[g]))
            continue
        src_idx = np.arange(d0, d1)
        out.append(
            _base_convert_shoup(
                x_coeff[d0:d1],
                ctx.q[src_idx],
                ctx.qinv_neg[src_idx],
                ksc.modup_qhatinv[g],
                ksc.modup_conv_plain[g],
                ksc.modup_conv_shoup[g],
                qp_q,
            )
        )
    return out


def mod_down(
    x_coeff: jnp.ndarray, params: CKKSParams, level: int, ctx: Context, ksc: KSContext
) -> jnp.ndarray:
    """Exact-up-to-noise division by P: u32[K+alpha, N] -> u32[K, N] (coeff dom).

    Mirrors golden rns.mod_down_coeff bit-exactly.
    """
    k = level
    alpha = len(params.p_primes)
    p_idx = list(range(params.num_limbs, params.num_limbs + alpha))
    q_b, qinv_b = ctx.q[:k][:, None], ctx.qinv_neg[:k][:, None]
    if _use_mxu_convert(alpha):
        from gpufhe_tpu.ops.convert_pallas import digit_convert

        p_part = digit_convert(x_coeff[k:], ksc.p2q_dc)
    else:
        p_part = _base_convert_shoup(
            x_coeff[k:],
            ctx.q[np.asarray(p_idx)],
            ctx.qinv_neg[np.asarray(p_idx)],
            ksc.p2q_qhatinv,
            ksc.p2q_conv_plain,
            ksc.p2q_conv_shoup,
            ctx.q[:k],
        )
    diff = sub_mod(x_coeff[:k], p_part, q_b)
    return mont_mul(diff, ksc.pinv_mont[:, None], q_b, qinv_b)


def rescale(
    x_coeff: jnp.ndarray, params: CKKSParams, level: int, ctx: Context, ksc: KSContext
) -> jnp.ndarray:
    """Drop the last active limb: u32[K, N] -> u32[K-1, N] (coefficient domain).

    (x - centered([x]_{q_last})) / q_last per remaining limb; centered lift
    mirrors golden rns.rescale_coeff / center_reduce bit-exactly.
    """
    k = level
    q_last = int(params.q_primes[k - 1])
    last = x_coeff[k - 1]
    q_b, qinv_b = ctx.q[: k - 1][:, None], ctx.qinv_neg[: k - 1][:, None]
    r = barrett_reduce_u32(last[None, :], q_b)  # [x]_{q_last} mod q_i
    lifted = jnp.where(
        last[None, :] > jnp.uint32(q_last // 2),
        sub_mod(r, ksc.qlast_mod[:, None], q_b),
        r,
    )
    diff = sub_mod(x_coeff[: k - 1], lifted, q_b)
    return mont_mul(diff, ksc.qlast_inv_mont[:, None], q_b, qinv_b)


def bgv_modswitch(
    x_coeff: jnp.ndarray, params: CKKSParams, level: int, ctx: Context, ksc: KSContext
) -> jnp.ndarray:
    """BGV ModSwitch: drop q_last with a correction delta == 0 (mod t).

    out = (x + t * centered([-x * t^{-1}]_{q_last})) / q_last per remaining
    limb; mirrors golden/bgv.py modswitch_coeff bit-exactly.
    """
    k = level
    q_last_int = int(params.q_primes[k - 1])
    q_last = ctx.q[k - 1]
    qinv_last = ctx.qinv_neg[k - 1]
    last = x_coeff[k - 1]
    u = mont_mul(last, ksc.bgv_negtinv_mont[0], q_last, qinv_last)
    q_b, qinv_b = ctx.q[: k - 1][:, None], ctx.qinv_neg[: k - 1][:, None]
    r = barrett_reduce_u32(u[None, :], q_b)
    lifted = jnp.where(
        u[None, :] > jnp.uint32(q_last_int // 2),
        sub_mod(r, ksc.qlast_mod[:, None], q_b),
        r,
    )
    term = mont_mul(lifted, ksc.bgv_t_mont[:, None], q_b, qinv_b)
    summed = add_mod(x_coeff[: k - 1], term, q_b)
    return mont_mul(summed, ksc.qlast_inv_mont[:, None], q_b, qinv_b)
