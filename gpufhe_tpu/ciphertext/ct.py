"""Ciphertext-level operations (device, jitted): the top layer of the stack.

This is the layer the reference sketches as ` polynomial.py` — a single
`poly_add` that computes both component sums and then drops them (reference
 polynomial.py:3-5 returns None; SURVEY.md §2.1 item 8). Here the full
ciphertext algebra is real and jitted end-to-end: add/sub, ct-ct tensor +
relinearize, rescale, plaintext multiply, Galois rotation and conjugation —
each bit-exact against the golden pipeline (golden/ckks.py) per the
BASELINE.json:5 limb-trace contract.

Representation: NTT (evaluation) domain at rest, uint32[K, N] canonical
residues per component, K = current level's active q-primes. `level` and the
frozen CKKSParams are *static* jit arguments — each level compiles its own
specialized executable (standard for leveled FHE; shapes stay static inside
each trace, as XLA requires).

Randomness for encryption is sampled host-side from an explicit numpy
Generator so golden and device runs share identical samples (keys/keys.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.keys.keys import DeviceKSKey, DevicePublicKey, DeviceSecretKey
from gpufhe_tpu.ops.context import Context
from gpufhe_tpu.ops.modops import add_mod, mont_mul, mul_mod, sub_mod
from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from gpufhe_tpu.params.params import CKKSParams
from gpufhe_tpu.primitives.keyswitch import key_switch_core
from gpufhe_tpu.primitives.rns import KSContext, make_ks_context, rescale


@dataclasses.dataclass
class Ciphertext:
    """Device ciphertext: list of u32[K, N] components, NTT domain."""

    c: list  # [c0, c1] (or [d0, d1, d2] post-tensor)
    level: int
    scale: float

    def primes(self, params: CKKSParams) -> tuple[int, ...]:
        return params.q_primes[: self.level]


def _qb(ctx: Context, level: int):
    return ctx.q[:level][:, None], ctx.qinv_neg[:level][:, None]


# ---------------------------------------------------------------------------
# jitted cores (params, level static)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3,))
def _add_core(ca, cb, ctx, level):
    q = ctx.q[:level][:, None]
    return tuple(add_mod(x, y, q) for x, y in zip(ca, cb))


@functools.partial(jax.jit, static_argnums=(3,))
def _sub_core(ca, cb, ctx, level):
    q = ctx.q[:level][:, None]
    return tuple(sub_mod(x, y, q) for x, y in zip(ca, cb))


@functools.partial(jax.jit, static_argnums=(3,))
def _tensor_core(ca, cb, ctx, level):
    """(a0,a1) x (b0,b1) -> (d0,d1,d2), NTT-domain pointwise (golden ct_tensor)."""
    q, qinv = _qb(ctx, level)
    r2 = ctx.r2[:level][:, None]
    a0, a1 = ca
    b0, b1 = cb
    d0 = mul_mod(a0, b0, q, qinv, r2)
    d1 = add_mod(mul_mod(a0, b1, q, qinv, r2), mul_mod(a1, b0, q, qinv, r2), q)
    d2 = mul_mod(a1, b1, q, qinv, r2)
    return d0, d1, d2


@functools.partial(jax.jit, static_argnums=(4, 5))
def _relin_core(cs, ctx, ksc, rlk, params, level):
    d0, d1, d2 = cs
    q = ctx.q[:level][:, None]
    ks0, ks1 = key_switch_core(d2, params, level, ctx, ksc, rlk)
    return add_mod(d0, ks0, q), add_mod(d1, ks1, q)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _rescale_core(cs, ctx, ksc, params, level):
    q_idx = list(range(level))
    out = []
    for comp in cs:
        coeff = ntt_inv(comp, ctx, limbs=q_idx)
        down = rescale(coeff, params, level, ctx, ksc)
        out.append(ntt_fwd(down, ctx, limbs=q_idx[:-1]))
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _galois_core(cs, perm, ctx, ksc, gk, params, level):
    """Automorphism permutation in eval domain + key switch of c1 (golden
    ct_rotate / ct_conjugate)."""
    c0, c1 = cs
    q = ctx.q[:level][:, None]
    c0g = jnp.take(c0, perm, axis=1)
    c1g = jnp.take(c1, perm, axis=1)
    ks0, ks1 = key_switch_core(c1g, params, level, ctx, ksc, gk)
    return add_mod(c0g, ks0, q), ks1


@functools.partial(jax.jit, static_argnums=(3,))
def _mul_plain_core(cs, pt_mont, ctx, level):
    q, qinv = _qb(ctx, level)
    return tuple(mont_mul(x, pt_mont[:level], q, qinv) for x in cs)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _encrypt_core(pt_pe0, v_rns, e1_rns, pk, ctx, params, level):
    """c0 = pk.b*v + NTT(pt + e0), c1 = pk.a*v + NTT(e1) (golden encrypt)."""
    q_idx = list(range(level))
    q, qinv = _qb(ctx, level)
    v_ntt = ntt_fwd(v_rns, ctx, limbs=q_idx)
    m_ntt = ntt_fwd(pt_pe0, ctx, limbs=q_idx)
    e1_ntt = ntt_fwd(e1_rns, ctx, limbs=q_idx)
    c0 = add_mod(mont_mul(v_ntt, pk.b_mont[:level], q, qinv), m_ntt, q)
    c1 = add_mod(mont_mul(v_ntt, pk.a_mont[:level], q, qinv), e1_ntt, q)
    return c0, c1


@functools.partial(jax.jit, static_argnums=(3, 4))
def _decrypt_core(cs, s_mont, ctx, params, level):
    """iNTT( sum_k c_k * s^k ) — works for 2- and 3-component ciphertexts."""
    q, qinv = _qb(ctx, level)
    acc = cs[0]
    s_pow = s_mont[:level]  # s * R: mont_mul by it multiplies by s exactly
    for comp in cs[1:]:
        acc = add_mod(acc, mont_mul(comp, s_pow, q, qinv), q)
        s_pow = mont_mul(s_pow, s_mont[:level], q, qinv)  # stays in Montgomery form
    return ntt_inv(acc, ctx, limbs=list(range(level)))


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def ct_add(a: Ciphertext, b: Ciphertext, ctx: Context) -> Ciphertext:
    assert a.level == b.level and a.scale == b.scale and len(a.c) == len(b.c)
    return Ciphertext(list(_add_core(tuple(a.c), tuple(b.c), ctx, a.level)), a.level, a.scale)


def ct_sub(a: Ciphertext, b: Ciphertext, ctx: Context) -> Ciphertext:
    assert a.level == b.level and a.scale == b.scale and len(a.c) == len(b.c)
    return Ciphertext(list(_sub_core(tuple(a.c), tuple(b.c), ctx, a.level)), a.level, a.scale)


def ct_tensor(a: Ciphertext, b: Ciphertext, ctx: Context) -> Ciphertext:
    assert a.level == b.level and len(a.c) == 2 and len(b.c) == 2
    return Ciphertext(
        list(_tensor_core(tuple(a.c), tuple(b.c), ctx, a.level)),
        a.level,
        a.scale * b.scale,
    )


def ct_relinearize(
    ct: Ciphertext, params: CKKSParams, ctx: Context, rlk: DeviceKSKey
) -> Ciphertext:
    assert len(ct.c) == 3
    ksc = make_ks_context(params, ct.level)
    return Ciphertext(
        list(_relin_core(tuple(ct.c), ctx, ksc, rlk, params, ct.level)),
        ct.level,
        ct.scale,
    )


def ct_rescale(ct: Ciphertext, params: CKKSParams, ctx: Context) -> Ciphertext:
    ksc = make_ks_context(params, ct.level)
    new = list(_rescale_core(tuple(ct.c), ctx, ksc, params, ct.level))
    return Ciphertext(new, ct.level - 1, ct.scale / params.q_primes[ct.level - 1])


def ct_mul(
    a: Ciphertext, b: Ciphertext, params: CKKSParams, ctx: Context, rlk: DeviceKSKey
) -> Ciphertext:
    """Full homomorphic multiply: tensor -> relinearize -> rescale."""
    return ct_rescale(ct_relinearize(ct_tensor(a, b, ctx), params, ctx, rlk), params, ctx)


@functools.lru_cache(maxsize=None)
def _perm_dev(g: int, n: int) -> jnp.ndarray:
    return jnp.asarray(gckks.automorphism_perm_eval(g, n).astype(np.int32))


def ct_rotate(
    ct: Ciphertext, steps: int, params: CKKSParams, ctx: Context, gk: DeviceKSKey
) -> Ciphertext:
    """Rotate slots left by `steps`: Galois automorphism + key switch."""
    assert len(ct.c) == 2
    g = gckks.galois_exponent(steps, params.n)
    ksc = make_ks_context(params, ct.level)
    out = _galois_core(
        tuple(ct.c), _perm_dev(g, params.n), ctx, ksc, gk, params, ct.level
    )
    return Ciphertext(list(out), ct.level, ct.scale)


def ct_conjugate(
    ct: Ciphertext, params: CKKSParams, ctx: Context, ck: DeviceKSKey
) -> Ciphertext:
    assert len(ct.c) == 2
    g = 2 * params.n - 1
    ksc = make_ks_context(params, ct.level)
    out = _galois_core(
        tuple(ct.c), _perm_dev(g, params.n), ctx, ksc, ck, params, ct.level
    )
    return Ciphertext(list(out), ct.level, ct.scale)


def ct_mul_plain(
    ct: Ciphertext, pt_mont: jnp.ndarray, pt_scale: float, ctx: Context
) -> Ciphertext:
    """Multiply by an NTT-domain Montgomery-form plaintext (encoding/encoder.py)."""
    return Ciphertext(
        list(_mul_plain_core(tuple(ct.c), pt_mont, ctx, ct.level)),
        ct.level,
        ct.scale * pt_scale,
    )


def encrypt(
    pt_coeff: np.ndarray,
    params: CKKSParams,
    pk: DevicePublicKey,
    ctx: Context,
    rng: np.random.Generator,
    scale: float,
    level: int | None = None,
) -> Ciphertext:
    """Public-key encrypt a coefficient-domain plaintext int64[L, N].

    Host samples (identical to golden encrypt's draw order), device computes.
    """
    level = level if level is not None else params.num_limbs
    primes = params.q_primes[:level]
    n = params.n
    v = gckks.small_to_rns(gckks.sample_ternary(rng, n), primes)
    e0 = gckks.small_to_rns(gckks.sample_gauss(rng, n, params.sigma), primes)
    e1 = gckks.small_to_rns(gckks.sample_gauss(rng, n, params.sigma), primes)
    pt_pe0 = gckks.poly_add(pt_coeff[:level], e0, primes)
    u32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.uint32))
    c0, c1 = _encrypt_core(
        u32(pt_pe0), u32(v), u32(e1), pk, ctx, params, level
    )
    return Ciphertext([c0, c1], level, scale)


def decrypt_to_coeff(
    ct: Ciphertext, params: CKKSParams, sk: DeviceSecretKey, ctx: Context
) -> np.ndarray:
    """Decrypt to canonical coefficient-domain residues int64[K, N] (host)."""
    out = _decrypt_core(tuple(ct.c), sk.s_mont, ctx, params, ct.level)
    return np.asarray(out).astype(np.int64)


def decrypt_decode(
    ct: Ciphertext, params: CKKSParams, sk: DeviceSecretKey, ctx: Context
) -> np.ndarray:
    coeff = decrypt_to_coeff(ct, params, sk, ctx)
    return gckks.decode(coeff, ct.scale, ct.primes(params), params.n)


# ---------------------------------------------------------------------------
# Hoisted rotations (BASELINE.json:10 config 4) — device mirror of
# golden ct_rotate_hoisted: ONE decompose+ModUp+NTT, many automorphisms.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3, 4))
def _hoist_core(c1, ctx, ksc, params, level):
    """Raised gadget polys of c1 in NTT domain over the active QP basis."""
    from gpufhe_tpu.primitives.keyswitch import qp_indices
    from gpufhe_tpu.primitives.rns import mod_up

    q_idx = list(range(level))
    qp_idx = qp_indices(params, level)
    c1_coeff = ntt_inv(c1, ctx, limbs=q_idx)
    raised = mod_up(c1_coeff, params, level, ctx, ksc)
    return tuple(ntt_fwd(r, ctx, limbs=qp_idx) for r in raised)


@functools.partial(jax.jit, static_argnums=(6, 7))
def _hoisted_galois_core(raised, c0, perm, ctx, ksc, gk, params, level):
    from gpufhe_tpu.primitives.keyswitch import qp_indices
    from gpufhe_tpu.primitives.rns import mod_down

    qp_idx = np.asarray(qp_indices(params, level))
    q_idx = list(range(level))
    qp_q = ctx.q[qp_idx][:, None]
    qp_qinv = ctx.qinv_neg[qp_idx][:, None]
    q = ctx.q[:level][:, None]

    acc0 = acc1 = None
    for d, r in enumerate(raised):
        rg = jnp.take(r, perm, axis=1)
        t0 = mont_mul(rg, gk.b_mont[d][qp_idx], qp_q, qp_qinv)
        t1 = mont_mul(rg, gk.a_mont[d][qp_idx], qp_q, qp_qinv)
        acc0 = t0 if acc0 is None else add_mod(acc0, t0, qp_q)
        acc1 = t1 if acc1 is None else add_mod(acc1, t1, qp_q)

    out = []
    for acc in (acc0, acc1):
        coeff = ntt_inv(acc, ctx, limbs=qp_idx)
        down = mod_down(coeff, params, level, ctx, ksc)
        out.append(ntt_fwd(down, ctx, limbs=q_idx))
    ks0, ks1 = out
    c0g = jnp.take(c0, perm, axis=1)
    return add_mod(c0g, ks0, q), ks1


def ct_rotate_hoisted(
    ct: Ciphertext,
    steps_list,
    params: CKKSParams,
    ctx: Context,
    gks: dict,
) -> list:
    """Rotate by many step counts sharing one decomposition (device).

    gks maps steps -> DeviceKSKey. Bit-exact vs golden ct_rotate_hoisted.
    """
    assert len(ct.c) == 2
    ksc = make_ks_context(params, ct.level)
    raised = _hoist_core(ct.c[1], ctx, ksc, params, ct.level)
    out = []
    for steps in steps_list:
        g = gckks.galois_exponent(steps, params.n)
        c0, c1 = _hoisted_galois_core(
            raised, ct.c[0], _perm_dev(g, params.n), ctx, ksc, gks[steps],
            params, ct.level,
        )
        out.append(Ciphertext([c0, c1], ct.level, ct.scale))
    return out


# ---------------------------------------------------------------------------
# ModRaise (bootstrapping step 0) — device mirror of golden ct_mod_raise
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2,))
def _mod_raise_core(cs, ctx, params):
    """Centered lift of single-limb coeffs mod q0 into the full chain."""
    from gpufhe_tpu.ops.modops import barrett_reduce_u32

    level = params.num_limbs
    q0 = int(params.q_primes[0])
    q = ctx.q[:level][:, None]
    qlift = barrett_reduce_u32(jnp.full((level, 1), jnp.uint32(q0 % (1 << 32))), q)
    # q0 mod q_i for each target limb (q0 itself may exceed some q_i)
    out = []
    for comp in cs:
        coeff = ntt_inv(comp, ctx, limbs=[0])  # u32[1, N] mod q0
        r = barrett_reduce_u32(coeff, q)  # broadcast to [level, N]
        lifted = jnp.where(
            coeff > jnp.uint32(q0 // 2), sub_mod(r, qlift, q), r
        )
        out.append(ntt_fwd(lifted, ctx, limbs=list(range(level))))
    return tuple(out)


def ct_mod_raise(ct: Ciphertext, params: CKKSParams, ctx: Context) -> Ciphertext:
    """Re-embed an exhausted (level-1) ciphertext into the full chain.

    Output encrypts m + q0*I for a small integer polynomial I (golden
    ct_mod_raise); the bootstrap pipeline removes the q0*I term.
    """
    assert ct.level == 1 and len(ct.c) == 2
    new = list(_mod_raise_core(tuple(ct.c), ctx, params))
    return Ciphertext(new, params.num_limbs, ct.scale)


# ---------------------------------------------------------------------------
# Double-word ModRaise: composite base modulus Q0 = q0*q1 (scale_words == 2)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dw_modraise_consts(params: CKKSParams):
    import math as _math

    from gpufhe_tpu.primitives.rns import _mont_np

    q0, q1 = params.q_primes[0], params.q_primes[1]
    big = q0 * q1
    primes = np.asarray(params.q_primes, dtype=np.uint64)
    return (
        jnp.asarray(_mont_np([pow(q0, -1, q1)], np.asarray([q1]))),  # q0^-1 (mont, mod q1)
        jnp.uint32((big // 2) // q0),  # half1
        jnp.uint32((big // 2) % q0),  # rem
        jnp.asarray(
            _mont_np(np.asarray([q0 % int(p) for p in primes]), primes)
        ),  # q0 mod q_i (mont)
        jnp.asarray(np.asarray([big % int(p) for p in primes], dtype=np.uint32)),  # Q0 mod q_i
    )


@functools.partial(jax.jit, static_argnums=(2,))
def _mod_raise2_core(cs, ctx, params):
    """Centered CRT lift from (q0, q1) into the full chain, bit-exact vs
    golden ct_mod_raise (same centering rule: v > Q0//2 <-> t > half1 or
    (t == half1 and x0 > rem), all in exact uint32 comparisons)."""
    from gpufhe_tpu.ops.modops import barrett_reduce_u32

    level = params.num_limbs
    q0inv_m, half1, rem, q0_mod_m, big_mod = _dw_modraise_consts(params)
    q = ctx.q[:level][:, None]
    qinv = ctx.qinv_neg[:level][:, None]
    q1_s = ctx.q[1]
    q1inv_s = ctx.qinv_neg[1]
    out = []
    for comp in cs:
        coeff = ntt_inv(comp, ctx, limbs=[0, 1])  # u32[2, N]
        x0, x1 = coeff[0], coeff[1]
        x0m1 = barrett_reduce_u32(x0, q1_s)
        diff = sub_mod(x1, x0m1, q1_s)
        t = mont_mul(diff, q0inv_m[0], q1_s, q1inv_s)  # canonical mod q1
        cond = (t > half1) | ((t == half1) & (x0 > rem))
        a = barrett_reduce_u32(x0[None, :], q)
        b = barrett_reduce_u32(t[None, :], q)
        v0 = add_mod(a, mont_mul(b, q0_mod_m[:, None], q, qinv), q)
        v = jnp.where(cond[None, :], sub_mod(v0, big_mod[:, None], q), v0)
        out.append(ntt_fwd(v, ctx, limbs=list(range(level))))
    return tuple(out)


def ct_mod_raise2(ct: Ciphertext, params: CKKSParams, ctx: Context) -> Ciphertext:
    assert ct.level == 2 and len(ct.c) == 2
    new = list(_mod_raise2_core(tuple(ct.c), ctx, params))
    return Ciphertext(new, params.num_limbs, ct.scale)
