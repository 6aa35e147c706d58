"""Device-side key generation: production-scale keys in seconds, not hours.

The golden keygen (golden/ckks.py) runs every NTT in recursive numpy — exact,
but O(hours) at N=2^16 with dozens of Galois keys. This generator samples on
the host (explicit numpy Generator, so keys are reproducible from the seed —
the checkpoint/recovery story) and runs all transforms/MACs on device.

Keys made here are *valid* CKKS keys but are NOT bit-identical to golden
keygen's (different construction path); parity tests keep using the golden
generator. Relation per gadget row d (same semantics as golden make_kskey):

    b_d = -(a_d * s) + e_d + g_d * s_target     (NTT domain, over Q*P)

All outputs are Montgomery-form device arrays (keys/keys.py conventions).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.keys.keys import (
    DeviceKSKey,
    DevicePublicKey,
    DeviceSecretKey,
)
from gpufhe_tpu.ops.context import Context
from gpufhe_tpu.ops.modops import add_mod, mont_mul, sub_mod, to_mont
from gpufhe_tpu.ops.ntt import ntt_fwd
from gpufhe_tpu.params.params import CKKSParams


@dataclasses.dataclass
class DeviceKeyChest:
    """Duck-type compatible with keys.KeyChest for the device-side fields."""

    params: CKKSParams
    sk: gckks.SecretKey  # host secret (decrypt/checkpoint)
    device_sk: DeviceSecretKey
    device_pk: DevicePublicKey
    device_rlk: DeviceKSKey
    galois: dict  # steps -> (None, DeviceKSKey)
    conj: tuple | None

    def galois_key(self, steps: int) -> DeviceKSKey:
        return self.galois[steps][1]

    def conj_key(self) -> DeviceKSKey:
        assert self.conj is not None
        return self.conj[1]


def _consts(ctx: Context, idx: np.ndarray):
    q = ctx.q[idx][:, None]
    return q, ctx.qinv_neg[idx][:, None], ctx.r2[idx][:, None]


def _ntt_mont(small: np.ndarray, params, ctx, primes, idx) -> jnp.ndarray:
    """Signed small poly -> NTT domain, Montgomery form, device."""
    rns = np.stack([small % q for q in primes]).astype(np.uint32)
    x = ntt_fwd(jnp.asarray(rns), ctx, limbs=np.asarray(idx))
    q, qinv, r2 = _consts(ctx, np.asarray(idx))
    return to_mont(x, q, qinv, r2)


def _make_ks_key(
    params: CKKSParams,
    ctx: Context,
    s_mont: jnp.ndarray,
    target_mont: jnp.ndarray,
    rng: np.random.Generator,
) -> DeviceKSKey:
    """Gadget rows over the full Q+P chain (device arithmetic)."""
    qp = params.q_primes + params.p_primes
    idx = np.arange(len(qp))
    q, qinv, r2 = _consts(ctx, idx)
    factors = gckks.gadget_factors(params)
    qp_u32 = np.asarray(qp, dtype=np.uint32)

    bs, as_ = [], []
    for g in factors:
        a = jnp.asarray(
            rng.integers(0, qp_u32[:, None], size=(len(qp), params.n), dtype=np.uint32)
        )
        e_small = gckks.sample_gauss(rng, params.n, params.sigma)
        e_ntt = ntt_fwd(
            jnp.asarray(np.stack([e_small % p for p in qp]).astype(np.uint32)),
            ctx, limbs=idx,
        )
        g_rns = jnp.asarray(
            np.asarray([g % p for p in qp], dtype=np.uint32)[:, None]
        )
        a_s = mont_mul(a, s_mont, q, qinv)  # a*s canonical
        g_t = mont_mul(g_rns, target_mont, q, qinv)  # g * s_target canonical
        b = add_mod(sub_mod(g_t, a_s, q), e_ntt, q)
        bs.append(to_mont(b, q, qinv, r2))
        as_.append(to_mont(a, q, qinv, r2))
    return DeviceKSKey(b_mont=jnp.stack(bs), a_mont=jnp.stack(as_))


def device_keygen(
    params: CKKSParams,
    rng: np.random.Generator,
    rotations: tuple[int, ...] = (),
    conjugation: bool = False,
) -> DeviceKeyChest:
    from gpufhe_tpu.ops.context import make_context

    n = params.n
    qp = params.q_primes + params.p_primes
    qp_idx = np.arange(len(qp))
    q_idx = np.arange(params.num_limbs)
    ctx = make_context(params)
    qL, qinvL, r2L = _consts(ctx, q_idx)

    if params.hamming_weight:
        s = gckks.sample_sparse_ternary(rng, n, params.hamming_weight)
    else:
        s = gckks.sample_ternary(rng, n)
    s_mont_full = _ntt_mont(s, params, ctx, qp, qp_idx)
    s2_mont_full = mont_mul(
        s_mont_full, s_mont_full, ctx.q[qp_idx][:, None], ctx.qinv_neg[qp_idx][:, None]
    )

    # public key over the q-chain
    q_primes = params.q_primes
    a = jnp.asarray(
        rng.integers(
            0, np.asarray(q_primes, dtype=np.uint32)[:, None],
            size=(len(q_primes), n), dtype=np.uint32,
        )
    )
    e_small = gckks.sample_gauss(rng, n, params.sigma)
    e_ntt = ntt_fwd(
        jnp.asarray(np.stack([e_small % p for p in q_primes]).astype(np.uint32)),
        ctx, limbs=q_idx,
    )
    s_mont_q = s_mont_full[: len(q_primes)]
    b = sub_mod(e_ntt, mont_mul(a, s_mont_q, qL, qinvL), qL)
    pk = DevicePublicKey(
        b_mont=to_mont(b, qL, qinvL, r2L), a_mont=to_mont(a, qL, qinvL, r2L)
    )

    rlk = _make_ks_key(params, ctx, s_mont_full, s2_mont_full, rng)

    galois = {}
    for steps in rotations:
        g = gckks.galois_exponent(steps, n)
        sg = gckks.apply_automorphism_coeff(s, g)
        sg_mont = _ntt_mont(sg, params, ctx, qp, qp_idx)
        galois[steps] = (None, _make_ks_key(params, ctx, s_mont_full, sg_mont, rng))

    conj = None
    if conjugation:
        g = 2 * n - 1
        sg = gckks.apply_automorphism_coeff(s, g)
        sg_mont = _ntt_mont(sg, params, ctx, qp, qp_idx)
        conj = (None, _make_ks_key(params, ctx, s_mont_full, sg_mont, rng))

    return DeviceKeyChest(
        params=params,
        sk=gckks.SecretKey(s),
        device_sk=DeviceSecretKey(s_mont=s_mont_full),
        device_pk=pk,
        device_rlk=rlk,
        galois=galois,
        conj=conj,
    )
