"""Device RNS-BGV ciphertext operations (jitted), bit-exact vs golden/bgv.py.

Reuses the CKKS device machinery wholesale: the NTT (ops/ntt.py), the
tensor/encrypt/decrypt/automorphism cores (ciphertext/ct.py), and the hybrid
key-switch core (primitives/keyswitch.py) — for BGV parameters the
t-corrections of ModDown are folded into the KSContext tables
(primitives/rns.py make_ks_context), so the identical kernel computes the
BGV-correct division by P. Only ModSwitch needs its own core.

Exact integer plaintexts: slots are vectors mod t packed via the negacyclic
NTT mod t (host, golden/bgv.py encode — exact integer transform).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.golden import bgv as gbgv
from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.keys.keys import (
    DeviceKSKey,
    DevicePublicKey,
    DeviceSecretKey,
    upload_ks_key,
    upload_public_key,
    upload_secret_key,
)
from gpufhe_tpu.ops.context import Context
from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from gpufhe_tpu.params.params import CKKSParams
from gpufhe_tpu.primitives.rns import bgv_modswitch, make_ks_context


@dataclasses.dataclass
class BGVCiphertext:
    c: list  # u32[K, N] components, NTT domain
    level: int
    pt_factor: int

    def primes(self, params):
        return params.q_primes[: self.level]


@dataclasses.dataclass
class BGVKeyChest:
    params: CKKSParams
    sk: gckks.SecretKey
    pk: gckks.PublicKey
    rlk: gckks.KSKey
    device_sk: DeviceSecretKey
    device_pk: DevicePublicKey
    device_rlk: DeviceKSKey
    galois: dict


def keygen(params, rng, rotations: tuple[int, ...] = ()) -> BGVKeyChest:
    sk, pk = gbgv.keygen(params, rng)
    rlk = gbgv.make_relin_key(params, sk, rng)
    galois = {}
    for steps in rotations:
        gk = gbgv.make_galois_key(params, steps, sk, rng)
        galois[steps] = (gk, upload_ks_key(gk, params))
    return BGVKeyChest(
        params=params, sk=sk, pk=pk, rlk=rlk,
        device_sk=upload_secret_key(sk, params),
        device_pk=upload_public_key(pk, params),
        device_rlk=upload_ks_key(rlk, params),
        galois=galois,
    )


def encrypt(
    pt_coeff: np.ndarray, params: CKKSParams, pk: DevicePublicKey, ctx: Context,
    rng: np.random.Generator, level: int | None = None,
) -> BGVCiphertext:
    """Mirror of golden/bgv.py encrypt: errors scaled by t, same draw order."""
    t = params.plain_modulus
    level = level if level is not None else params.num_limbs
    primes = params.q_primes[:level]
    n = params.n
    v = gckks.small_to_rns(gckks.sample_ternary(rng, n), primes)
    e0 = gckks.small_to_rns(t * gckks.sample_gauss(rng, n, params.sigma), primes)
    e1 = gckks.small_to_rns(t * gckks.sample_gauss(rng, n, params.sigma), primes)
    m_rns = np.stack([np.asarray(pt_coeff, dtype=np.int64) % q for q in primes])
    pt_pe0 = gckks.poly_add(m_rns, e0, primes)
    u32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.uint32))
    c0, c1 = dct._encrypt_core(u32(pt_pe0), u32(v), u32(e1), pk, ctx, params, level)
    return BGVCiphertext([c0, c1], level, 1)


def decrypt(
    ct: BGVCiphertext, params: CKKSParams, sk: DeviceSecretKey, ctx: Context
) -> np.ndarray:
    t = params.plain_modulus
    coeff = dct._decrypt_core(tuple(ct.c), sk.s_mont, ctx, params, ct.level)
    coeff = np.asarray(coeff).astype(np.int64)
    centered = gckks.crt_compose_centered(coeff, params.q_primes[: ct.level])
    return (centered % t * ct.pt_factor % t).astype(np.int64)


def decrypt_decode(ct, params, sk, ctx):
    return gbgv.decode(decrypt(ct, params, sk, ctx), params)


def ct_add(a: BGVCiphertext, b: BGVCiphertext, ctx: Context) -> BGVCiphertext:
    assert a.level == b.level and a.pt_factor == b.pt_factor
    return BGVCiphertext(
        list(dct._add_core(tuple(a.c), tuple(b.c), ctx, a.level)), a.level, a.pt_factor
    )


def ct_sub(a: BGVCiphertext, b: BGVCiphertext, ctx: Context) -> BGVCiphertext:
    assert a.level == b.level and a.pt_factor == b.pt_factor
    return BGVCiphertext(
        list(dct._sub_core(tuple(a.c), tuple(b.c), ctx, a.level)), a.level, a.pt_factor
    )


def plaintext_to_device(pt_coeff: np.ndarray, params, ctx, level: int):
    """Integer plaintext coeffs -> NTT-domain Montgomery u32[level, N]."""
    from gpufhe_tpu.ops.modops import to_mont

    m_rns = np.stack(
        [np.asarray(pt_coeff, dtype=np.int64) % q for q in params.q_primes[:level]]
    )
    x = jnp.asarray(m_rns.astype(np.uint32))
    x_ntt = ntt_fwd(x, ctx, limbs=list(range(level)))
    q = ctx.q[:level][:, None]
    return to_mont(x_ntt, q, ctx.qinv_neg[:level][:, None], ctx.r2[:level][:, None])


def ct_mul_plain(ct: BGVCiphertext, pt_mont, ctx: Context) -> BGVCiphertext:
    return BGVCiphertext(
        list(dct._mul_plain_core(tuple(ct.c), pt_mont, ctx, ct.level)),
        ct.level, ct.pt_factor,
    )


def ct_tensor(a: BGVCiphertext, b: BGVCiphertext, params, ctx) -> BGVCiphertext:
    assert a.level == b.level
    return BGVCiphertext(
        list(dct._tensor_core(tuple(a.c), tuple(b.c), ctx, a.level)),
        a.level, a.pt_factor * b.pt_factor % params.plain_modulus,
    )


def ct_relinearize(ct: BGVCiphertext, params, ctx, rlk: DeviceKSKey) -> BGVCiphertext:
    assert len(ct.c) == 3
    ksc = make_ks_context(params, ct.level)  # BGV tables via params.plain_modulus
    out = dct._relin_core(tuple(ct.c), ctx, ksc, rlk, params, ct.level)
    return BGVCiphertext(list(out), ct.level, ct.pt_factor)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _modswitch_core(cs, ctx, ksc, params, level):
    q_idx = list(range(level))
    out = []
    for comp in cs:
        coeff = ntt_inv(comp, ctx, limbs=q_idx)
        down = bgv_modswitch(coeff, params, level, ctx, ksc)
        out.append(ntt_fwd(down, ctx, limbs=q_idx[:-1]))
    return tuple(out)


def ct_modswitch(ct: BGVCiphertext, params, ctx) -> BGVCiphertext:
    t = params.plain_modulus
    ksc = make_ks_context(params, ct.level)
    new = list(_modswitch_core(tuple(ct.c), ctx, ksc, params, ct.level))
    return BGVCiphertext(
        new, ct.level - 1, ct.pt_factor * (params.q_primes[ct.level - 1] % t) % t
    )


@functools.partial(jax.jit, static_argnums=(5,))
def _bgv_mul_full_core(ca, cb, ctx, ksc, rlk, params):
    """Tensor + relinearize + t-corrected ModSwitch as ONE program (the
    BGV mirror of ct.py _mul_full_core): the key-switch pair stays in
    COEFFICIENT domain (eval_out=False), d0/d1 are iNTT'd and added there,
    ModSwitch runs in coeff, and each output component is NTT'd ONCE —
    cancelling the relin-output NTT + ModSwitch iNTT round trip (2*level
    limb-transforms per mult), limb-bit-exact by modular linearity
    (tests/test_bgv.py)."""
    from gpufhe_tpu.ops.modops import add_mod, mont_mul
    from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
    from gpufhe_tpu.primitives.keyswitch import fence_enabled, key_switch_core

    level = ca[0].shape[0]
    q = ctx.q[:level][:, None]
    qinv = ctx.qinv_neg[:level][:, None]
    r2 = ctx.r2[:level][:, None]
    a0, a1 = ca
    b0, b1 = cb
    b0m = mont_mul(b0, r2, q, qinv)
    b1m = mont_mul(b1, r2, q, qinv)
    d0 = mont_mul(a0, b0m, q, qinv)
    d1 = add_mod(mont_mul(a0, b1m, q, qinv), mont_mul(a1, b0m, q, qinv), q)
    d2 = mont_mul(a1, b1m, q, qinv)
    if fence_enabled(params.dnum):
        d0, d1, d2 = jax.lax.optimization_barrier((d0, d1, d2))
    ks0, ks1 = key_switch_core(d2, params, level, ctx, ksc, rlk,
                               eval_out=False)
    q_idx = list(range(level))
    out = []
    for d, ks in ((d0, ks0), (d1, ks1)):
        cc = add_mod(ntt_inv(d, ctx, limbs=q_idx), ks, q)
        down = bgv_modswitch(cc, params, level, ctx, ksc)
        out.append(ntt_fwd(down, ctx, limbs=q_idx[:-1]))
    return tuple(out)


def ct_mul(a, b, params, ctx, rlk) -> BGVCiphertext:
    """Fused BGV multiply: one jitted program, the relin->ModSwitch NTT
    round trip cancelled (see _bgv_mul_full_core). Output at level-1 with
    the t-corrected pt_factor tracking of ct_modswitch."""
    assert a.level == b.level and len(a.c) == 2 and len(b.c) == 2
    ksc = make_ks_context(params, a.level)
    out = _bgv_mul_full_core(
        tuple(a.c), tuple(b.c), ctx, ksc, rlk, params)
    t = int(params.plain_modulus)
    # tensor multiplies the factors; ModSwitch scales the message by q_last
    # (exactly ct_modswitch's bookkeeping — decrypt folds pt_factor out)
    pt_factor = (a.pt_factor * b.pt_factor % t
                 ) * (int(params.q_primes[a.level - 1]) % t) % t
    return BGVCiphertext(list(out), a.level - 1, pt_factor)


def ct_rotate(ct: BGVCiphertext, steps: int, params, ctx, gk: DeviceKSKey):
    assert len(ct.c) == 2
    g = gckks.galois_exponent(steps, params.n)
    ksc = make_ks_context(params, ct.level)
    out = dct._galois_core(
        tuple(ct.c), dct._perm_dev(g, params.n), ctx, ksc, gk, params, ct.level
    )
    return BGVCiphertext(list(out), ct.level, ct.pt_factor)


def ct_rotate_hoisted(ct: BGVCiphertext, steps_list, params, ctx, gks: dict) -> list:
    """Rotate by many step counts sharing ONE decomposition (device).

    Reuses the CKKS hoist/galois cores unchanged — the BGV t-corrected
    ModDown lives in the KSContext tables (primitives/rns.py
    make_ks_context). Bit-exact vs golden/bgv.py ct_rotate_hoisted.
    gks maps steps -> DeviceKSKey."""
    assert len(ct.c) == 2
    ksc = make_ks_context(params, ct.level)
    raised = dct._hoist_core(ct.c[1], ctx, ksc, params, ct.level)
    out = []
    for steps in steps_list:
        g = gckks.galois_exponent(steps, params.n)
        c0, c1 = dct._hoisted_galois_core(
            raised, ct.c[0], dct._perm_dev(g, params.n), ctx, ksc, gks[steps],
            params, ct.level,
        )
        out.append(BGVCiphertext([c0, c1], ct.level, ct.pt_factor))
    return out
