"""Key infrastructure: generation (host, deterministic) + device key material.

The reference has no key machinery of any kind (SURVEY.md §2.4 "Key
infrastructure: none"). Design:

* **Generation happens on the host** via the golden model
  (gpufhe_tpu.golden.ckks.keygen / make_*_key) with an explicit
  numpy Generator, so device and golden runs consume *identical* randomness —
  the precondition for the bit-exact limb-trace contract (BASELINE.json:5).
  Keys + the PRNG seed fully determine all downstream state, which is also
  the checkpoint/resume story (SURVEY.md §5).
* **Device keys are stored in Montgomery form** (x * 2^32 mod q), NTT domain,
  so every use inside key-switch / encrypt / decrypt inner products is a
  single mont_mul instead of two (ops/modops.py conventions).

A KeyChest bundles everything a workload needs (public, relin, galois,
conjugation keys) plus the rotation-step -> key index map.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.params.params import CKKSParams

R = 1 << 32


def _mont_np(x: np.ndarray, primes, lead_axes: int = 0) -> jnp.ndarray:
    """Host canonical int64[..., L, N] -> Montgomery uint32 device array."""
    q = np.asarray(primes, dtype=np.uint64).reshape(
        (1,) * lead_axes + (-1, 1)
    )
    x = np.asarray(x, dtype=np.uint64)
    return jnp.asarray((x * (np.uint64(R) % q) % q).astype(np.uint32))


class DevicePublicKey(NamedTuple):
    b_mont: jnp.ndarray  # u32[L, N] NTT domain, Montgomery
    a_mont: jnp.ndarray  # u32[L, N]


class DeviceKSKey(NamedTuple):
    """Hybrid key-switch key: dnum gadget rows over the full Q+P chain."""

    b_mont: jnp.ndarray  # u32[dnum, L+alpha, N] NTT domain, Montgomery
    a_mont: jnp.ndarray  # u32[dnum, L+alpha, N]


class DeviceSecretKey(NamedTuple):
    s_mont: jnp.ndarray  # u32[L+alpha, N] NTT domain over full chain, Montgomery


def upload_public_key(pk: gckks.PublicKey, params: CKKSParams) -> DevicePublicKey:
    return DevicePublicKey(
        b_mont=_mont_np(pk.b, params.q_primes),
        a_mont=_mont_np(pk.a, params.q_primes),
    )


def upload_ks_key(ksk: gckks.KSKey, params: CKKSParams) -> DeviceKSKey:
    qp = params.q_primes + params.p_primes
    return DeviceKSKey(
        b_mont=_mont_np(ksk.b, qp, lead_axes=1),
        a_mont=_mont_np(ksk.a, qp, lead_axes=1),
    )


def upload_secret_key(sk: gckks.SecretKey, params: CKKSParams) -> DeviceSecretKey:
    qp = params.q_primes + params.p_primes
    s_rns = gckks.small_to_rns(sk.s, qp)
    s_ntt = gckks.ntt_limbs(s_rns, params, qp)
    return DeviceSecretKey(s_mont=_mont_np(s_ntt, qp))


@dataclasses.dataclass
class KeyChest:
    """All key material for a workload, host golden + device mirrors."""

    params: CKKSParams
    sk: gckks.SecretKey  # host-only (never shipped in production flows)
    pk: gckks.PublicKey
    rlk: gckks.KSKey
    device_sk: DeviceSecretKey
    device_pk: DevicePublicKey
    device_rlk: DeviceKSKey
    galois: dict  # steps -> (golden KSKey, DeviceKSKey)
    conj: tuple | None  # (golden KSKey, DeviceKSKey)
    # sparse-secret encapsulation material (params.eph_hamming_weight > 0):
    # {"s_eph": int64[N], "to_eph": (golden, device), "from_eph": (...)}
    eph: dict | None = None

    def galois_key(self, steps: int) -> DeviceKSKey:
        return self.galois[steps][1]

    def golden_galois_key(self, steps: int) -> gckks.KSKey:
        return self.galois[steps][0]

    def conj_key(self) -> DeviceKSKey:
        assert self.conj is not None, "no conjugation key generated"
        return self.conj[1]


def truncate_galois_device(
    chest, step_levels: dict, conj_level: int | None, params: CKKSParams
) -> None:
    """Shrink device Galois keys to the highest level each step is used at.

    A gadget key stored over the full chain carries num_limbs + alpha rows;
    a rotation only ever used at level L needs L + alpha. Pure row selection
    — every program reads identical values (primitives/keyswitch.py
    key_rows), so results stay bit-exact — but the resident HBM footprint of
    e.g. the SlotToCoeff key set drops by (num_limbs - L)/num_limbs. Frees
    ~2.5 GB of the N=2^16 bootstrap chest (the full-chain set rides the
    16 GB HBM limit).
    """
    import jax

    alpha = len(params.p_primes)
    full = params.num_limbs

    def trunc(key: DeviceKSKey, lvl: int) -> DeviceKSKey:
        idx = np.concatenate([np.arange(lvl), np.arange(full, full + alpha)])
        nk = DeviceKSKey(
            b_mont=jnp.asarray(key.b_mont[:, idx]),
            a_mont=jnp.asarray(key.a_mont[:, idx]),
        )
        jax.block_until_ready(nk.b_mont)
        return nk

    for step, lvl in step_levels.items():
        if step not in chest.galois or lvl >= full:
            continue
        golden, key = chest.galois[step]
        if key.b_mont.shape[1] <= lvl + alpha:
            continue
        chest.galois[step] = (golden, trunc(key, lvl))
    if conj_level is not None and chest.conj is not None and conj_level < full:
        golden, key = chest.conj
        if key.b_mont.shape[1] > conj_level + alpha:
            chest.conj = (golden, trunc(key, conj_level))


def keygen(
    params: CKKSParams,
    rng: np.random.Generator,
    rotations: tuple[int, ...] = (),
    conjugation: bool = False,
) -> KeyChest:
    """Generate the full key chest (deterministic in rng)."""
    sk, pk = gckks.keygen(params, rng)
    rlk = gckks.make_relin_key(params, sk, rng)
    galois = {}
    for steps in rotations:
        gk = gckks.make_galois_key(params, steps, sk, rng)
        galois[steps] = (gk, upload_ks_key(gk, params))
    conj = None
    if conjugation:
        ck = gckks.make_conj_key(params, sk, rng)
        conj = (ck, upload_ks_key(ck, params))
    eph = None
    if params.eph_hamming_weight:
        s_eph = gckks.sample_sparse_ternary(rng, params.n, params.eph_hamming_weight)
        sk_eph = gckks.SecretKey(s_eph)

        def s_fn(primes):
            return gckks.ntt_limbs(gckks.small_to_rns(sk.s, primes), params, primes)

        def eph_fn(primes):
            return gckks.ntt_limbs(gckks.small_to_rns(s_eph, primes), params, primes)

        to_eph = gckks.make_kskey(params, s_fn, sk_eph, rng)  # decrypts under eph
        from_eph = gckks.make_kskey(params, eph_fn, sk, rng)  # decrypts under s
        eph = {
            "s_eph": s_eph,
            "to_eph": (to_eph, upload_ks_key(to_eph, params)),
            "from_eph": (from_eph, upload_ks_key(from_eph, params)),
        }
    return KeyChest(
        params=params,
        sk=sk,
        pk=pk,
        rlk=rlk,
        device_sk=upload_secret_key(sk, params),
        device_pk=upload_public_key(pk, params),
        device_rlk=upload_ks_key(rlk, params),
        galois=galois,
        conj=conj,
        eph=eph,
    )
