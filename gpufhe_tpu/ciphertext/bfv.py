"""Device RNS-BFV ciphertext operations (jitted), bit-exact vs golden/bfv.py.

BFV keys ARE CKKS keys (golden/bfv.py), so key material comes straight from
keys/keys.py uploads; relinearization and rotations run the existing CKKS
device key-switch cores against a plain-modulus-cleared KSContext (BFV
key-switch noise is additive — no BGV t-correction).

The scheme-specific device machinery is the scale-invariant multiply
(`_bfv_tensor_core`): the whole BEHZ-style pipeline — iNTT over Q,
approximate conversion to the auxiliary basis B ∪ {m_sk}, NTT + tensor over
both bases, t/Q scaling as an exact division over aux, Shenoy-Kumaresan
exact conversion back to Q, NTT — is ONE jitted program. Every conversion
term is reduced per-term with the same Montgomery constants the golden
model's `%` arithmetic implies, so limbs compare with `==` end to end.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.keys.keys import (
    DeviceKSKey,
    upload_ks_key,
    upload_public_key,
    upload_secret_key,
)
from gpufhe_tpu.ops.context import Context, make_context
from gpufhe_tpu.primitives.keyswitch import key_switch_core
from gpufhe_tpu.ops.modops import (
    add_mod,
    barrett_reduce_u32,
    mont_mul,
    mul_mod,
    shoup_np,
    sub_mod,
)
from gpufhe_tpu.ops.convert_pallas import digit_convert, make_digit_convert
from gpufhe_tpu.ops.ntt import _use_pallas, ntt_fwd, ntt_inv
from gpufhe_tpu.params.params import CKKSParams
from gpufhe_tpu.primitives.rns import (
    _base_convert_shoup,
    _mont_np,
    base_convert,
    make_ks_context,
)


@dataclasses.dataclass
class BFVCiphertext:
    c: list  # u32[K, N] components, NTT domain
    level: int

    def primes(self, params):
        return params.q_primes[: self.level]


@dataclasses.dataclass
class BFVKeyChest:
    params: CKKSParams
    sk: gckks.SecretKey
    pk: gckks.PublicKey
    rlk: gckks.KSKey
    device_sk: object
    device_pk: object
    device_rlk: DeviceKSKey
    galois: dict


def keygen(params, rng, rotations: tuple[int, ...] = ()) -> BFVKeyChest:
    sk, pk = gbfv.keygen(params, rng)  # = CKKS keygen
    rlk = gbfv.make_relin_key(params, sk, rng)
    galois = {}
    for steps in rotations:
        gk = gbfv.make_galois_key(params, steps, sk, rng)
        galois[steps] = (gk, upload_ks_key(gk, params))
    return BFVKeyChest(
        params=params, sk=sk, pk=pk, rlk=rlk,
        device_sk=upload_secret_key(sk, params),
        device_pk=upload_public_key(pk, params),
        device_rlk=upload_ks_key(rlk, params),
        galois=galois,
    )


def _ckks_ksc(params: CKKSParams, level: int):
    """KSContext with the plain (non-t-corrected) ModDown — BFV key switching
    is the ordinary CKKS hybrid switch (golden/bfv.py ct_relinearize)."""
    return make_ks_context(gbfv._ckks_view(params), level)


# ---------------------------------------------------------------------------
# Aux-basis device tables for the scale-invariant multiply
# ---------------------------------------------------------------------------


class BFVMulTables(NamedTuple):
    """Per-(params, level) constants for _bfv_tensor_core (Montgomery form
    unless noted). A = len(aux) includes the trailing redundant m_sk."""

    q2aux_qhatinv: jnp.ndarray  # u32[K]       [Qhat_i^{-1}]_{q_i}
    q2aux_conv: jnp.ndarray  # u32[A, K]    [Qhat_i]_{p}
    t_mont_q: jnp.ndarray  # u32[K]       t
    t_mont_aux: jnp.ndarray  # u32[A]
    qinv_mont_aux: jnp.ndarray  # u32[A]       [Q^{-1}]_{p}
    b_qhatinv: jnp.ndarray  # u32[A-1]     [Bhat_i^{-1}]_{b_i}
    b2msk_conv: jnp.ndarray  # u32[1, A-1]  [Bhat_i]_{m_sk}
    b2q_conv: jnp.ndarray  # u32[K, A-1]  [Bhat_i]_{q}
    binv_mont_msk: jnp.ndarray  # u32[1]       [B^{-1}]_{m_sk}
    msk_mod_q: jnp.ndarray  # u32[K]       m_sk mod q (canonical)
    b_mont_q: jnp.ndarray  # u32[K]       [B]_{q}
    # Shoup companions (canonical w + floor(w*2^32/q)) of the conversion
    # matrices: the S*T term grids dominate the BFV mult's VPU time, and
    # shoup_mul is ~19 ops/term vs mont_mul's ~35. Montgomery forms above
    # stay for the sharded body (parallel/bfv_sharded.py).
    q2aux_conv_plain: jnp.ndarray  # u32[A, K]
    q2aux_conv_shoup: jnp.ndarray  # u32[A, K]
    b2msk_conv_plain: jnp.ndarray  # u32[1, A-1]
    b2msk_conv_shoup: jnp.ndarray  # u32[1, A-1]
    b2q_conv_plain: jnp.ndarray  # u32[K, A-1]
    b2q_conv_shoup: jnp.ndarray  # u32[K, A-1]
    # MXU digit-dot tables (ops/convert_pallas.py) for the two WIDE
    # conversions (S ~ 30 source limbs); the TPU path contracts them on the
    # MXU, the CPU path keeps the Shoup forms above. b2msk (T=1) stays VPU.
    q2aux_dc: object  # DigitConvertTables, Q -> aux
    b2q_dc: object  # DigitConvertTables, B -> Q


@functools.lru_cache(maxsize=None)
def make_bfv_mul_context(params: CKKSParams, level: int):
    """(aux_params, aux Context, BFVMulTables) for one (params, level)."""
    auxp = gbfv.bfv_aux_params(params, level)
    aux = auxp.q_primes
    aux_ctx = make_context(auxp)
    qs = params.q_primes[:level]
    t = params.plain_modulus
    big_q = math.prod(qs)
    b_primes = aux[:-1]
    m_sk = aux[-1]
    big_b = math.prod(b_primes)

    from gpufhe_tpu.golden import rns as grns

    q_arr = np.array(qs, dtype=np.int64)
    aux_arr = np.array(aux, dtype=np.int64)
    b_arr = np.array(b_primes, dtype=np.int64)
    tables = BFVMulTables(
        q2aux_qhatinv=jnp.asarray(_mont_np(grns.qhat_inv(qs), q_arr)),
        q2aux_conv=jnp.asarray(
            _mont_np(grns.conv_matrix(qs, aux), aux_arr[:, None])
        ),
        t_mont_q=jnp.asarray(_mont_np([t % q for q in qs], q_arr)),
        t_mont_aux=jnp.asarray(_mont_np([t % p for p in aux], aux_arr)),
        qinv_mont_aux=jnp.asarray(
            _mont_np([pow(big_q % p, -1, p) for p in aux], aux_arr)
        ),
        b_qhatinv=jnp.asarray(_mont_np(grns.qhat_inv(b_primes), b_arr)),
        b2msk_conv=jnp.asarray(
            _mont_np(grns.conv_matrix(b_primes, (m_sk,)), np.array([[m_sk]]))
        ),
        b2q_conv=jnp.asarray(
            _mont_np(grns.conv_matrix(b_primes, qs), q_arr[:, None])
        ),
        binv_mont_msk=jnp.asarray(
            _mont_np([pow(big_b % m_sk, -1, m_sk)], np.array([m_sk]))
        ),
        msk_mod_q=jnp.asarray(np.array([m_sk % q for q in qs], dtype=np.uint32)),
        b_mont_q=jnp.asarray(_mont_np([big_b % q for q in qs], q_arr)),
        q2aux_conv_plain=jnp.asarray(
            np.asarray(grns.conv_matrix(qs, aux), dtype=np.uint32)
        ),
        q2aux_conv_shoup=jnp.asarray(
            shoup_np(grns.conv_matrix(qs, aux), aux_arr[:, None])
        ),
        b2msk_conv_plain=jnp.asarray(
            np.asarray(grns.conv_matrix(b_primes, (m_sk,)), dtype=np.uint32)
        ),
        b2msk_conv_shoup=jnp.asarray(
            shoup_np(grns.conv_matrix(b_primes, (m_sk,)), np.array([[m_sk]]))
        ),
        b2q_conv_plain=jnp.asarray(
            np.asarray(grns.conv_matrix(b_primes, qs), dtype=np.uint32)
        ),
        b2q_conv_shoup=jnp.asarray(
            shoup_np(grns.conv_matrix(b_primes, qs), q_arr[:, None])
        ),
        q2aux_dc=make_digit_convert(qs, aux, _mont_np(grns.qhat_inv(qs), q_arr)),
        b2q_dc=make_digit_convert(
            b_primes, qs, _mont_np(grns.qhat_inv(b_primes), b_arr)
        ),
    )
    return auxp, aux_ctx, tables


# ---------------------------------------------------------------------------
# Encrypt / decrypt
# ---------------------------------------------------------------------------


def encrypt(
    pt_coeff: np.ndarray, params: CKKSParams, pk, ctx: Context,
    rng: np.random.Generator, level: int | None = None,
) -> BFVCiphertext:
    """Mirror of golden/bfv.py encrypt (same draw order, Delta*m embedding)."""
    t = params.plain_modulus
    level = level if level is not None else params.num_limbs
    primes = params.q_primes[:level]
    n = params.n
    v = gckks.small_to_rns(gckks.sample_ternary(rng, n), primes)
    e0 = gckks.small_to_rns(gckks.sample_gauss(rng, n, params.sigma), primes)
    e1 = gckks.small_to_rns(gckks.sample_gauss(rng, n, params.sigma), primes)
    m = np.asarray(pt_coeff, dtype=np.int64) % t
    dm = gbfv.delta_rns(params, level) * m[None, :] % np.array(primes, np.int64)[:, None]
    pt_pe0 = gckks.poly_add(dm, e0, primes)
    u32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.uint32))
    c0, c1 = dct._encrypt_core(u32(pt_pe0), u32(v), u32(e1), pk, ctx, params, level)
    return BFVCiphertext([c0, c1], level)


def decrypt(
    ct: BFVCiphertext, params: CKKSParams, sk, ctx: Context
) -> np.ndarray:
    coeff = dct._decrypt_core(tuple(ct.c), sk.s_mont, ctx, params, ct.level)
    coeff = np.asarray(coeff).astype(np.int64)
    primes = params.q_primes[: ct.level]
    centered = gckks.crt_compose_centered(coeff, primes)
    return gbfv.round_decode_coeff(
        centered, params.plain_modulus, math.prod(primes)
    )


def decrypt_decode(ct, params, sk, ctx):
    return gbfv.decode(decrypt(ct, params, sk, ctx), params)


# ---------------------------------------------------------------------------
# Linear ops
# ---------------------------------------------------------------------------


def ct_add(a: BFVCiphertext, b: BFVCiphertext, ctx: Context) -> BFVCiphertext:
    assert a.level == b.level
    return BFVCiphertext(
        list(dct._add_core(tuple(a.c), tuple(b.c), ctx, a.level)), a.level
    )


def ct_sub(a: BFVCiphertext, b: BFVCiphertext, ctx: Context) -> BFVCiphertext:
    assert a.level == b.level
    return BFVCiphertext(
        list(dct._sub_core(tuple(a.c), tuple(b.c), ctx, a.level)), a.level
    )


def plaintext_to_device(pt_coeff: np.ndarray, params, ctx, level: int):
    """Integer plaintext coeffs -> NTT-domain Montgomery u32[level, N]
    (identical packing to the BGV device path)."""
    from gpufhe_tpu.ciphertext.bgv import plaintext_to_device as _p2d

    return _p2d(pt_coeff, params, ctx, level)


def ct_mul_plain(ct: BFVCiphertext, pt_mont, ctx: Context) -> BFVCiphertext:
    return BFVCiphertext(
        list(dct._mul_plain_core(tuple(ct.c), pt_mont, ctx, ct.level)), ct.level
    )


def ct_add_plain(
    ct: BFVCiphertext, pt_coeff: np.ndarray, params, ctx: Context
) -> BFVCiphertext:
    """c0 += NTT(Delta * m2) — mirrors golden ct_add_plain."""
    t = params.plain_modulus
    primes = params.q_primes[: ct.level]
    m = np.asarray(pt_coeff, dtype=np.int64) % t
    dm = gbfv.delta_rns(params, ct.level) * m[None, :] % np.array(
        primes, np.int64
    )[:, None]
    dm_dev = jnp.asarray(dm.astype(np.uint32))
    c0 = _add_plain_core(ct.c[0], dm_dev, ctx, ct.level)
    return BFVCiphertext([c0] + list(ct.c[1:]), ct.level)


@functools.partial(jax.jit, static_argnums=(3,))
def _add_plain_core(c0, dm_coeff, ctx, level):
    q = ctx.q[:level][:, None]
    return add_mod(c0, ntt_fwd(dm_coeff, ctx, limbs=list(range(level))), q)


# ---------------------------------------------------------------------------
# Scale-invariant multiply
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _bfv_tensor_core(ca, cb, ctx, aux_ctx, tabs, params, auxp, level,
                     out_mode: str = "eval"):
    """Whole BEHZ-style tensor as one program (golden/bfv.py ct_tensor).

    out_mode:
      "eval"     — all three components NTT domain (ct_tensor's contract)
      "d2_coeff" — d2 stays in coefficient domain: relinearization's
                   key_switch opens with an iNTT of d2, so feeding
                   _relin_core(..., d2_coeff=True) cancels that NTT+iNTT
                   round trip exactly (2*level limb-transforms per mult)
      "coeff"    — ALL components coefficient domain: _bfv_relin_coeff
                   then also adds the key-switch product in coefficient
                   domain and transforms each output component ONCE
                   (another 2*level transforms saved; NTT is linear mod q,
                   so NTT(a+b) == NTT(a)+NTT(b) limb-bit-exact)."""
    d2_coeff = out_mode in ("d2_coeff", "coeff")
    all_coeff = out_mode == "coeff"
    q_idx = list(range(level))
    a_idx = list(range(len(auxp.q_primes)))
    q, qinv = ctx.q[:level][:, None], ctx.qinv_neg[:level][:, None]
    r2 = ctx.r2[:level][:, None]
    aq, aqinv = aux_ctx.q[:, None], aux_ctx.qinv_neg[:, None]
    ar2 = aux_ctx.r2[:, None]

    # the two WIDE conversions (S ~ level source limbs) ride the MXU digit
    # kernel on TPU; CPU keeps the per-term Shoup path (bit-identical —
    # tests/test_ops.py::test_digit_convert_matches_base_convert)
    if _use_pallas():
        conv_q2aux = lambda x: digit_convert(x, tabs.q2aux_dc)
        conv_b2q = lambda y: digit_convert(y, tabs.b2q_dc)
    else:
        conv_q2aux = lambda x: _base_convert_shoup(
            x, ctx.q[:level], ctx.qinv_neg[:level], tabs.q2aux_qhatinv,
            tabs.q2aux_conv_plain, tabs.q2aux_conv_shoup, aux_ctx.q,
        )
        conv_b2q = lambda y: _base_convert_shoup(
            y, aux_ctx.q[:-1], aux_ctx.qinv_neg[:-1], tabs.b_qhatinv,
            tabs.b2q_conv_plain, tabs.b2q_conv_shoup, ctx.q[:level],
        )

    def to_aux_ntt(comp):
        coeff = ntt_inv(comp, ctx, limbs=q_idx)
        return ntt_fwd(conv_q2aux(coeff), aux_ctx, limbs=a_idx)

    a_aux = [to_aux_ntt(comp) for comp in ca]
    b_aux = [to_aux_ntt(comp) for comp in cb]

    def tensor(x, y, qq, qqinv, rr2):
        # one-sided Montgomery lift (see ct.py _tensor_core): 6 elementwise
        # passes instead of 8, canonical and bit-identical
        y0m = mont_mul(y[0], rr2, qq, qqinv)
        y1m = mont_mul(y[1], rr2, qq, qqinv)
        d0 = mont_mul(x[0], y0m, qq, qqinv)
        d1 = add_mod(
            mont_mul(x[0], y1m, qq, qqinv), mont_mul(x[1], y0m, qq, qqinv), qq
        )
        d2 = mont_mul(x[1], y1m, qq, qqinv)
        return d0, d1, d2

    d_q = tensor(ca, cb, q, qinv, r2)
    d_aux = tensor(a_aux, b_aux, aq, aqinv, ar2)

    m_sk = int(auxp.q_primes[-1])
    out = []
    for ci, (dq_ntt, daux_ntt) in enumerate(zip(d_q, d_aux)):
        dq = ntt_inv(dq_ntt, ctx, limbs=q_idx)
        daux = ntt_inv(daux_ntt, aux_ctx, limbs=a_idx)
        # r = [t*d]_Q (canonical, Q basis) -> aux basis (approximate)
        r = mont_mul(dq, tabs.t_mont_q[:, None], q, qinv)
        r_aux = conv_q2aux(r)
        # y = (t*d - r) / Q over aux — exact integer division
        td = mont_mul(daux, tabs.t_mont_aux[:, None], aq, aqinv)
        y = mont_mul(sub_mod(td, r_aux, aq), tabs.qinv_mont_aux[:, None], aq, aqinv)
        # Shenoy-Kumaresan exact conversion B ∪ {m_sk} -> Q
        conv_sk = _base_convert_shoup(
            y[:-1], aux_ctx.q[:-1], aux_ctx.qinv_neg[:-1], tabs.b_qhatinv,
            tabs.b2msk_conv_plain, tabs.b2msk_conv_shoup, aux_ctx.q[-1:],
        )[0]
        alpha = mont_mul(
            sub_mod(conv_sk, y[-1], aux_ctx.q[-1]),
            tabs.binv_mont_msk[0], aux_ctx.q[-1], aux_ctx.qinv_neg[-1],
        )
        conv_q = conv_b2q(y[:-1])
        # centered lift of alpha into each q (golden: alpha possibly negative)
        ra = barrett_reduce_u32(alpha[None, :], q)
        lifted = jnp.where(
            alpha[None, :] > jnp.uint32(m_sk // 2),
            sub_mod(ra, tabs.msk_mod_q[:, None], q),
            ra,
        )
        back = sub_mod(conv_q, mont_mul(lifted, tabs.b_mont_q[:, None], q, qinv), q)
        skip_ntt = all_coeff or (d2_coeff and ci == 2)
        out.append(back if skip_ntt else ntt_fwd(back, ctx, limbs=q_idx))
    return tuple(out)


def ct_tensor(a: BFVCiphertext, b: BFVCiphertext, params, ctx) -> BFVCiphertext:
    assert a.level == b.level
    auxp, aux_ctx, tabs = make_bfv_mul_context(params, a.level)
    out = _bfv_tensor_core(
        tuple(a.c), tuple(b.c), ctx, aux_ctx, tabs, params, auxp, a.level
    )
    return BFVCiphertext(list(out), a.level)


def ct_relinearize(ct: BFVCiphertext, params, ctx, rlk: DeviceKSKey) -> BFVCiphertext:
    assert len(ct.c) == 3
    ksc = _ckks_ksc(params, ct.level)
    out = dct._relin_core(tuple(ct.c), ctx, ksc, rlk, params, ct.level)
    return BFVCiphertext(list(out), ct.level)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _bfv_relin_coeff(cs, ctx, ksc, rlk, params, level):
    """Relinearize a COEFFICIENT-domain BEHZ tensor output: key-switch d2
    with both boundary transforms elided (eval_in=False skips the opening
    iNTT; eval_out=False returns the pair in coefficient domain), add in
    coefficient domain, and transform each output component ONCE. Saves
    4*level limb-transforms per mult vs tensor(eval) + _relin_core;
    limb-bit-exact (NTT(iNTT(x)) == x and NTT(a+b) == NTT(a)+NTT(b) mod q)."""
    from gpufhe_tpu.ops.ntt import ntt_fwd

    d0, d1, d2 = cs
    q = ctx.q[:level][:, None]
    ks0, ks1 = key_switch_core(d2, params, level, ctx, ksc, rlk,
                               eval_out=False, eval_in=False)
    q_idx = list(range(level))
    return (ntt_fwd(add_mod(d0, ks0, q), ctx, limbs=q_idx),
            ntt_fwd(add_mod(d1, ks1, q), ctx, limbs=q_idx))


def ct_mul(a, b, params, ctx, rlk) -> BFVCiphertext:
    """Tensor + relinearize with all four boundary NTTs cancelled: the
    tensor hands ALL components over in coefficient domain, the key switch
    runs coeff-in/coeff-out, the relin add happens in coefficient domain,
    and each output component is transformed once — 4*level fewer
    limb-transforms per mult than tensor+relin composed at the eval-domain
    boundary. Bit-identical output (NTT linearity + NTT(iNTT(x)) == x;
    tests/test_bfv_device.py, exact decrypt on chip)."""
    assert a.level == b.level
    auxp, aux_ctx, tabs = make_bfv_mul_context(params, a.level)
    d = _bfv_tensor_core(
        tuple(a.c), tuple(b.c), ctx, aux_ctx, tabs, params, auxp, a.level,
        out_mode="coeff",
    )
    ksc = _ckks_ksc(params, a.level)
    out = _bfv_relin_coeff(d, ctx, ksc, rlk, params, a.level)
    return BFVCiphertext(list(out), a.level)


def ct_mod_reduce(ct: BFVCiphertext, params, ctx) -> BFVCiphertext:
    """Drop q_last by rounded division (golden ct_mod_reduce — the plain
    CKKS rescale core IS the centered exact division)."""
    ksc = _ckks_ksc(params, ct.level)
    new = list(dct._rescale_core(tuple(ct.c), ctx, ksc, params, ct.level))
    return BFVCiphertext(new, ct.level - 1)


# ---------------------------------------------------------------------------
# Scheme switching BGV <-> BFV (golden/bfv.py bgv_to_bfv/bfv_to_bgv)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3,))
def _scalar_mul_core(cs, const_mont, ctx, level):
    q, qinv = ctx.q[:level][:, None], ctx.qinv_neg[:level][:, None]
    return tuple(mont_mul(c, const_mont[:, None], q, qinv) for c in cs)


@functools.lru_cache(maxsize=None)
def _switch_constants(params: CKKSParams, level: int):
    """(tinv_mont u32[K], t_mont u32[K], k, neg_r_inv) for one level."""
    t = params.plain_modulus
    primes = params.q_primes[:level]
    big_q = math.prod(primes)
    tinv = pow(t, -1, big_q)
    k = (t * tinv - 1) // big_q % t
    q_arr = np.array(primes, dtype=np.int64)
    tinv_mont = jnp.asarray(_mont_np([tinv % q for q in primes], q_arr))
    t_mont = jnp.asarray(_mont_np([t % q for q in primes], q_arr))
    return tinv_mont, t_mont, k, pow(-(big_q % t) % t, -1, t)


def bgv_to_bfv(ct, params: CKKSParams, ctx: Context) -> tuple[BFVCiphertext, int]:
    """Device BGV -> BFV: one scalar multiply per limb (bit-exact vs golden).

    decrypt(out) == factor * (true BGV message) mod t."""
    t = params.plain_modulus
    tinv_mont, _, k, _ = _switch_constants(params, ct.level)
    out = _scalar_mul_core(tuple(ct.c), tinv_mont, ctx, ct.level)
    return (
        BFVCiphertext(list(out), ct.level),
        k * pow(int(ct.pt_factor), -1, t) % t,
    )


def bfv_to_bgv(ct: BFVCiphertext, params: CKKSParams, ctx: Context):
    """Device BFV -> BGV (message factor folded into pt_factor)."""
    from gpufhe_tpu.ciphertext.bgv import BGVCiphertext

    _, t_mont, _, neg_r_inv = _switch_constants(params, ct.level)
    out = _scalar_mul_core(tuple(ct.c), t_mont, ctx, ct.level)
    return BGVCiphertext(list(out), ct.level, neg_r_inv)


# ---------------------------------------------------------------------------
# Rotations (CKKS Galois machinery, plain ModDown)
# ---------------------------------------------------------------------------


def ct_rotate(ct: BFVCiphertext, steps: int, params, ctx, gk: DeviceKSKey):
    assert len(ct.c) == 2
    g = gckks.galois_exponent(steps, params.n)
    ksc = _ckks_ksc(params, ct.level)
    out = dct._galois_core(
        tuple(ct.c), dct._perm_dev(g, params.n), ctx, ksc, gk, params, ct.level
    )
    return BFVCiphertext(list(out), ct.level)


def ct_rotate_hoisted(ct: BFVCiphertext, steps_list, params, ctx, gks: dict) -> list:
    """Many rotations sharing ONE gadget decomposition (CKKS hoist cores)."""
    assert len(ct.c) == 2
    ksc = _ckks_ksc(params, ct.level)
    raised = dct._hoist_core(ct.c[1], ctx, ksc, params, ct.level)
    out = []
    for steps in steps_list:
        g = gckks.galois_exponent(steps, params.n)
        c0, c1 = dct._hoisted_galois_core(
            raised, ct.c[0], dct._perm_dev(g, params.n), ctx, ksc, gks[steps],
            params, ct.level,
        )
        out.append(BFVCiphertext([c0, c1], ct.level))
    return out
