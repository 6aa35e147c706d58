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
from gpufhe_tpu.ops.modops import add_mod, barrett_reduce_u32, mont_mul, sub_mod, to_mont
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
    eph: dict | None = None  # {"s_eph", "to_eph": (None, key), "from_eph": ...}
    # name -> uint32 PRNG key_data from which that key's uniform `a` rows are
    # re-derivable ("pk", "rlk", "gk<steps>", "conj", "to_eph", "from_eph").
    # Enables seeded serialization: store b + 64-bit seed, regenerate a on
    # load (utils/serialization.py save_device_keychest) — halves key storage.
    seeds: dict | None = None

    def galois_key(self, steps: int) -> DeviceKSKey:
        key = self.galois[steps][1]
        assert key.a_mont is not None, (
            f"galois key {steps} has its `a` dropped (drop_galois_a) — call "
            "regen_galois_a(ctx) before use")
        return key

    def conj_key(self) -> DeviceKSKey:
        assert self.conj is not None
        key = self.conj[1]
        assert key.a_mont is not None, "conj key `a` dropped — regen first"
        return key

    # -- lean-key cycling -----------------------------------------------------
    # The Galois `a` components are uniform polynomials fully determined by
    # the recorded PRNG seeds (regen_ks_a) — dropping them halves the chest's
    # resident HBM (e.g. ~5 GiB of the N=2^16 dw flagship's 10.6 GiB), buying
    # the headroom the fused EvalMod trace needs (ciphertext/bootstrap.py
    # lean_keys), and regenerating is a device-side threefry replay that is
    # BIT-EXACT with the original draws (test_seeded_device_keychest_roundtrip).

    def drop_galois_a(self) -> int:
        """Release every Galois (and conj) key's a_mont. Returns #dropped.
        In-flight programs holding references keep their buffers alive —
        only the chest's reference is released."""
        n = 0
        for steps, (g, key) in list(self.galois.items()):
            if key.a_mont is not None:
                self.galois[steps] = (g, DeviceKSKey(key.b_mont, None))
                n += 1
        if self.conj is not None and self.conj[1].a_mont is not None:
            self.conj = (self.conj[0], DeviceKSKey(self.conj[1].b_mont, None))
            n += 1
        return n

    def regen_galois_a(self, ctx: Context) -> int:
        """Regenerate dropped a_mont components from the stored seeds,
        truncated to each key's stored level (keys.truncate_galois_device
        row selection — bit-identical to the original truncation)."""
        alpha = len(self.params.p_primes)
        full = self.params.num_limbs

        regen = _regen_full_jit(self.params)  # ONE compiled program, reused

        def _regen(key: DeviceKSKey, seed_name: str) -> DeviceKSKey:
            a = regen(ctx, jnp.asarray(self.seeds[seed_name]))
            stored_l = key.b_mont.shape[1] - alpha
            if stored_l < full:
                idx = np.concatenate(
                    [np.arange(stored_l), np.arange(full, full + alpha)]
                )
                a = a[:, idx]  # eager row slice: 1 dispatch per key
            return DeviceKSKey(key.b_mont, a)

        n = 0
        for steps, (g, key) in list(self.galois.items()):
            if key.a_mont is None:
                self.galois[steps] = (g, _regen(key, f"gk{steps}"))
                n += 1
        if self.conj is not None and self.conj[1].a_mont is None:
            self.conj = (self.conj[0], _regen(self.conj[1], "conj"))
            n += 1
        return n


import functools


@functools.lru_cache(maxsize=None)
def _regen_full_jit(params: CKKSParams):
    """Jitted full-chain KS-key `a` regeneration (lean-key cycling): one
    compiled program per params, reused across all 63+ Galois keys."""
    import jax

    def fn(ctx, key_data):
        return regen_ks_a(params, ctx, key_data)

    return jax.jit(fn)


def _consts(ctx: Context, idx: np.ndarray):
    q = ctx.q[idx][:, None]
    return q, ctx.qinv_neg[idx][:, None], ctx.r2[idx][:, None]


def _uniform_mod_q(key, ctx: Context, idx: np.ndarray, n: int) -> jnp.ndarray:
    """Device-side uniform residues: 64 random bits reduced mod q per limb.

    (hi*2^32 + lo) mod q via hi*2^32 = mont_mul(hi, R^2 mod q); statistical
    distance from uniform is < q/2^64 < 2^-34 — fine for benchmark keys; use
    rejection sampling for certification-grade key material.
    """
    import jax

    q, qinv, r2 = _consts(ctx, idx)
    k1, k2 = jax.random.split(key)
    shape = (len(idx), n)
    hi = jax.random.bits(k1, shape, dtype=jnp.uint32)
    lo = jax.random.bits(k2, shape, dtype=jnp.uint32)
    return add_mod(mont_mul(hi, r2, q, qinv), barrett_reduce_u32(lo, q), q)


def _lift_signed(small: np.ndarray, ctx: Context, idx: np.ndarray) -> jnp.ndarray:
    """Small signed int32[N] -> canonical residues u32[L, N] on device."""
    v = jnp.asarray(np.asarray(small, dtype=np.int32))[None, :]
    q = ctx.q[idx][:, None]
    return jnp.where(v < 0, q + v.astype(jnp.uint32), v.astype(jnp.uint32))


def _ntt_mont(small: np.ndarray, params, ctx, primes, idx) -> jnp.ndarray:
    """Signed small poly -> NTT domain, Montgomery form, device."""
    idx = np.asarray(idx)
    x = ntt_fwd(_lift_signed(small, ctx, idx), ctx, limbs=idx)
    q, qinv, r2 = _consts(ctx, idx)
    return to_mont(x, q, qinv, r2)


def _a_rows(ctx: Context, idx: np.ndarray, n: int, jkey, rows: int) -> list:
    """The uniform `a` polynomials a KS key draws from jkey, in draw order.

    This split sequence IS the seeded-key contract: regen_ks_a replays it
    from the recorded key_data, so changing it invalidates saved seeded
    chests (threefry is backend-deterministic, so CPU/TPU regenerate
    identical rows)."""
    import jax

    out = []
    for _ in range(rows):
        jkey, sub = jax.random.split(jkey)
        out.append(_uniform_mod_q(sub, ctx, idx, n))
    return out


def regen_ks_a(params: CKKSParams, ctx: Context, key_data: np.ndarray) -> jnp.ndarray:
    """Montgomery-form a_mont[dnum, K, N] of a KS key from its stored seed."""
    import jax

    qp = params.q_primes + params.p_primes
    idx = np.arange(len(qp))
    q, qinv, r2 = _consts(ctx, idx)
    jkey = jax.random.wrap_key_data(jnp.asarray(key_data))
    rows = _a_rows(ctx, idx, params.n, jkey, len(gckks.gadget_factors(params)))
    return jnp.stack([to_mont(a, q, qinv, r2) for a in rows])


def regen_pk_a(params: CKKSParams, ctx: Context, key_data: np.ndarray) -> jnp.ndarray:
    """Montgomery-form a_mont[L, N] of the public key from its stored seed."""
    import jax

    q_idx = np.arange(params.num_limbs)
    q, qinv, r2 = _consts(ctx, q_idx)
    jkey = jax.random.wrap_key_data(jnp.asarray(key_data))
    (a,) = _a_rows(ctx, q_idx, params.n, jkey, 1)
    return to_mont(a, q, qinv, r2)


def _make_ks_key(
    params: CKKSParams,
    ctx: Context,
    s_mont: jnp.ndarray,
    target_mont: jnp.ndarray,
    rng: np.random.Generator,
    jkey,
) -> DeviceKSKey:
    """Gadget rows over the full Q+P chain (device arithmetic)."""
    qp = params.q_primes + params.p_primes
    idx = np.arange(len(qp))
    q, qinv, r2 = _consts(ctx, idx)
    factors = gckks.gadget_factors(params)
    a_list = _a_rows(ctx, idx, params.n, jkey, len(factors))

    bs, as_ = [], []
    for g, a in zip(factors, a_list):
        e_small = gckks.sample_gauss(rng, params.n, params.sigma)
        e_ntt = ntt_fwd(_lift_signed(e_small, ctx, idx), ctx, limbs=idx)
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

    # public key over the q-chain (device PRNG for the uniform poly)
    import jax

    seeds: dict = {}

    def _kd(k):
        return np.asarray(jax.random.key_data(k))

    jkey = jax.random.key(int(rng.integers(0, 2**63)))
    jkey, sub = jax.random.split(jkey)
    seeds["pk"] = _kd(sub)
    q_primes = params.q_primes
    (a,) = _a_rows(ctx, q_idx, n, sub, 1)
    e_small = gckks.sample_gauss(rng, n, params.sigma)
    e_ntt = ntt_fwd(_lift_signed(e_small, ctx, q_idx), ctx, limbs=q_idx)
    s_mont_q = s_mont_full[: len(q_primes)]
    b = sub_mod(e_ntt, mont_mul(a, s_mont_q, qL, qinvL), qL)
    pk = DevicePublicKey(
        b_mont=to_mont(b, qL, qinvL, r2L), a_mont=to_mont(a, qL, qinvL, r2L)
    )

    jkey, sub = jax.random.split(jkey)
    seeds["rlk"] = _kd(sub)
    rlk = _make_ks_key(params, ctx, s_mont_full, s2_mont_full, rng, sub)

    galois = {}
    for steps in rotations:
        g = gckks.galois_exponent(steps, n)
        sg = gckks.apply_automorphism_coeff(s, g)
        sg_mont = _ntt_mont(sg, params, ctx, qp, qp_idx)
        jkey, sub = jax.random.split(jkey)
        seeds[f"gk{steps}"] = _kd(sub)
        galois[steps] = (None, _make_ks_key(params, ctx, s_mont_full, sg_mont, rng, sub))

    conj = None
    if conjugation:
        g = 2 * n - 1
        sg = gckks.apply_automorphism_coeff(s, g)
        sg_mont = _ntt_mont(sg, params, ctx, qp, qp_idx)
        jkey, sub = jax.random.split(jkey)
        seeds["conj"] = _kd(sub)
        conj = (None, _make_ks_key(params, ctx, s_mont_full, sg_mont, rng, sub))

    eph = None
    if params.eph_hamming_weight:
        s_eph = gckks.sample_sparse_ternary(rng, n, params.eph_hamming_weight)
        eph_mont = _ntt_mont(s_eph, params, ctx, qp, qp_idx)
        jkey, k1 = jax.random.split(jkey)
        jkey, k2 = jax.random.split(jkey)
        seeds["to_eph"] = _kd(k1)
        seeds["from_eph"] = _kd(k2)
        to_eph = _make_ks_key(params, ctx, eph_mont, s_mont_full, rng, k1)
        from_eph = _make_ks_key(params, ctx, s_mont_full, eph_mont, rng, k2)
        eph = {
            "s_eph": s_eph,
            "to_eph": (None, to_eph),
            "from_eph": (None, from_eph),
        }

    return DeviceKeyChest(
        params=params,
        sk=gckks.SecretKey(s),
        device_sk=DeviceSecretKey(s_mont=s_mont_full),
        device_pk=pk,
        device_rlk=rlk,
        galois=galois,
        conj=conj,
        eph=eph,
        seeds=seeds,
    )
