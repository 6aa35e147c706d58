"""Golden RNS-BGV pipeline (pure numpy): exact integer arithmetic mod t.

The second scheme of the BASELINE "RNS-CKKS/BGV pipeline" (BASELINE.json:5).
Reuses the CKKS golden machinery (NTT limbs, RNS conversions, hybrid
key-switch structure); the scheme-specific parts are:

  * encode/decode: slots are integers mod the plaintext modulus t (prime,
    t = 1 mod 2N) packed via the negacyclic NTT mod t — exact, no floats.
  * errors enter multiplied by t (c0 + c1 s = m + t*e mod Q), so decryption
    is centered-reduce mod t.
  * ModSwitch (the rescale analogue) and the key-switch ModDown divide by
    q_last / P with a correction delta == 0 (mod t), keeping the plaintext
    slot values intact up to the tracked factor q_last^{-1} mod t.

Ciphertexts track `pt_factor` (the product of dropped q_last mod t);
decryption multiplies by it to undo the modswitch scaling.

Device mirror: gpufhe_tpu/ciphertext/bgv.py (bit-exact limb parity).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.golden import ntt as gn
from gpufhe_tpu.golden import rns as grns
from gpufhe_tpu.params.params import CKKSParams


# ---------------------------------------------------------------------------
# Plaintext packing: negacyclic NTT mod t
# ---------------------------------------------------------------------------


def _psi_t(params: CKKSParams) -> int:
    t = params.plain_modulus
    assert t and (t - 1) % (2 * params.n) == 0, "need prime t = 1 mod 2N"
    return gn.find_primitive_root_2n(t, 2 * params.n)


def encode(slots: np.ndarray, params: CKKSParams) -> np.ndarray:
    """int slots[N] mod t -> plaintext coefficients int64[N] mod t."""
    t = params.plain_modulus
    slots = np.asarray(slots, dtype=np.int64) % t
    assert slots.shape == (params.n,)
    return gn.ntt_inv(slots, t, _psi_t(params))


def decode(pt_coeff: np.ndarray, params: CKKSParams) -> np.ndarray:
    t = params.plain_modulus
    return gn.ntt_fwd(np.asarray(pt_coeff, dtype=np.int64) % t, t, _psi_t(params))


def slot_rotation_perm(params: CKKSParams, steps: int) -> np.ndarray:
    """Slot permutation realized by the 5^steps automorphism (for tests)."""
    t = params.plain_modulus
    n = params.n
    g = gckks.galois_exponent(steps, n)
    e = encode(np.arange(n) % t, params)
    rotated = gckks.apply_automorphism_coeff(e, g) % t
    return decode(rotated, params)


# ---------------------------------------------------------------------------
# Ciphertexts and keys
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BGVCiphertext:
    c: list  # NTT-domain int64[K, N] components
    level: int
    pt_factor: int  # product of dropped q_last mod t (undone at decrypt)

    def primes(self, params):
        return params.q_primes[: self.level]


def keygen(params: CKKSParams, rng: np.random.Generator):
    """BGV secret/public keys: b = -(a s) + t*e (NTT domain)."""
    t = params.plain_modulus
    primes = params.q_primes
    s = gckks.sample_ternary(rng, params.n)
    s_ntt = gckks.ntt_limbs(gckks.small_to_rns(s, primes), params, primes)
    a = gckks.sample_uniform(rng, primes, params.n)
    e = gckks.ntt_limbs(
        gckks.small_to_rns(t * gckks.sample_gauss(rng, params.n, params.sigma), primes),
        params, primes,
    )
    b = gckks.poly_add(
        gckks.poly_mul(gckks.poly_sub(np.zeros_like(a), a, primes), s_ntt, primes),
        e, primes,
    )
    return gckks.SecretKey(s), gckks.PublicKey(b=b, a=a)


def make_relin_key(params: CKKSParams, sk, rng) -> gckks.KSKey:
    """Gadget rows b_d = -(a s) + t*e + g_d * s^2 over the full QP chain."""
    t = params.plain_modulus
    qp = params.q_primes + params.p_primes
    s_ntt = gckks.ntt_limbs(gckks.small_to_rns(sk.s, qp), params, qp)
    s2 = gckks.poly_mul(s_ntt, s_ntt, qp)
    factors = gckks.gadget_factors(params)
    bs, as_ = [], []
    for g in factors:
        a = gckks.sample_uniform(rng, qp, params.n)
        e = gckks.ntt_limbs(
            gckks.small_to_rns(
                t * gckks.sample_gauss(rng, params.n, params.sigma), qp
            ),
            params, qp,
        )
        g_rns = np.array([g % q for q in qp], dtype=np.int64)[:, None]
        b = (-(a.astype(object)) * s_ntt + e + g_rns * s2) % np.array(
            qp, dtype=object
        )[:, None]
        bs.append(b.astype(np.int64))
        as_.append(a)
    return gckks.KSKey(b=np.stack(bs), a=np.stack(as_))


def make_galois_key(params: CKKSParams, steps: int, sk, rng) -> gckks.KSKey:
    t = params.plain_modulus
    g = gckks.galois_exponent(steps, params.n)
    qp = params.q_primes + params.p_primes
    s_ntt = gckks.ntt_limbs(gckks.small_to_rns(sk.s, qp), params, qp)
    sg = gckks.apply_automorphism_coeff(sk.s, g)
    sg_ntt = gckks.ntt_limbs(gckks.small_to_rns(sg, qp), params, qp)
    factors = gckks.gadget_factors(params)
    bs, as_ = [], []
    for gf in factors:
        a = gckks.sample_uniform(rng, qp, params.n)
        e = gckks.ntt_limbs(
            gckks.small_to_rns(
                t * gckks.sample_gauss(rng, params.n, params.sigma), qp
            ),
            params, qp,
        )
        g_rns = np.array([gf % q for q in qp], dtype=np.int64)[:, None]
        b = (-(a.astype(object)) * s_ntt + e + g_rns * sg_ntt) % np.array(
            qp, dtype=object
        )[:, None]
        bs.append(b.astype(np.int64))
        as_.append(a)
    return gckks.KSKey(b=np.stack(bs), a=np.stack(as_))


# ---------------------------------------------------------------------------
# Encrypt / decrypt
# ---------------------------------------------------------------------------


def encrypt(
    pt_coeff: np.ndarray, params: CKKSParams, pk, rng, level: int | None = None
) -> BGVCiphertext:
    t = params.plain_modulus
    level = level if level is not None else params.num_limbs
    primes = params.q_primes[:level]
    n = params.n
    v = gckks.ntt_limbs(
        gckks.small_to_rns(gckks.sample_ternary(rng, n), primes), params, primes
    )
    e0 = gckks.small_to_rns(t * gckks.sample_gauss(rng, n, params.sigma), primes)
    e1 = gckks.ntt_limbs(
        gckks.small_to_rns(t * gckks.sample_gauss(rng, n, params.sigma), primes),
        params, primes,
    )
    m_rns = np.stack([np.asarray(pt_coeff, dtype=np.int64) % q for q in primes])
    m_ntt = gckks.ntt_limbs(gckks.poly_add(m_rns, e0, primes), params, primes)
    c0 = gckks.poly_add(gckks.poly_mul(pk.b[:level], v, primes), m_ntt, primes)
    c1 = gckks.poly_add(gckks.poly_mul(pk.a[:level], v, primes), e1, primes)
    return BGVCiphertext(c=[c0, c1], level=level, pt_factor=1)


def decrypt(ct: BGVCiphertext, params: CKKSParams, sk) -> np.ndarray:
    """-> int64[N] plaintext coefficients mod t (pt_factor undone)."""
    t = params.plain_modulus
    primes = ct.primes(params)
    s_ntt = gckks.ntt_limbs(gckks.small_to_rns(sk.s, primes), params, primes)
    acc = ct.c[0]
    s_pow = s_ntt
    for comp in ct.c[1:]:
        acc = gckks.poly_add(acc, gckks.poly_mul(comp, s_pow, primes), primes)
        s_pow = gckks.poly_mul(s_pow, s_ntt, primes)
    coeff = gckks.intt_limbs(acc, params, primes)
    centered = gckks.crt_compose_centered(coeff, primes)
    return (centered % t * ct.pt_factor % t).astype(np.int64)


def decrypt_decode(ct, params, sk):
    return decode(decrypt(ct, params, sk), params)


def noise_budget_bits(ct: BGVCiphertext, params: CKKSParams, sk) -> float:
    """log2(Q / (2*|m + t*e|_inf)) — bits of headroom before t*e wraps Q.

    The BGV analogue of golden/bfv.py noise_budget_bits: decryption fails
    once the centered inner product |m + t*e| reaches Q/2."""
    primes = ct.primes(params)
    s_ntt = gckks.ntt_limbs(gckks.small_to_rns(sk.s, primes), params, primes)
    acc = ct.c[0]
    s_pow = s_ntt
    for comp in ct.c[1:]:
        acc = gckks.poly_add(acc, gckks.poly_mul(comp, s_pow, primes), primes)
        s_pow = gckks.poly_mul(s_pow, s_ntt, primes)
    coeff = gckks.intt_limbs(acc, params, primes)
    centered = gckks.crt_compose_centered(coeff, primes)
    big_q = math.prod(primes)
    worst = max(abs(int(x)) for x in centered)
    return math.log2(big_q / (2 * worst)) if worst else float("inf")


# ---------------------------------------------------------------------------
# Homomorphic ops
# ---------------------------------------------------------------------------


def ct_add(a: BGVCiphertext, b: BGVCiphertext, params) -> BGVCiphertext:
    assert a.level == b.level and a.pt_factor == b.pt_factor
    primes = a.primes(params)
    return BGVCiphertext(
        [gckks.poly_add(x, y, primes) for x, y in zip(a.c, b.c)], a.level, a.pt_factor
    )


def ct_sub(a: BGVCiphertext, b: BGVCiphertext, params) -> BGVCiphertext:
    assert a.level == b.level and a.pt_factor == b.pt_factor
    primes = a.primes(params)
    return BGVCiphertext(
        [gckks.poly_sub(x, y, primes) for x, y in zip(a.c, b.c)], a.level, a.pt_factor
    )


def ct_mul_plain(ct: BGVCiphertext, pt_coeff: np.ndarray, params) -> BGVCiphertext:
    primes = ct.primes(params)
    m_rns = np.stack([np.asarray(pt_coeff, dtype=np.int64) % q for q in primes])
    pt_ntt = gckks.ntt_limbs(m_rns, params, primes)
    return BGVCiphertext(
        [gckks.poly_mul(x, pt_ntt, primes) for x in ct.c], ct.level, ct.pt_factor
    )


def ct_tensor(a: BGVCiphertext, b: BGVCiphertext, params) -> BGVCiphertext:
    assert a.level == b.level
    primes = a.primes(params)
    d0 = gckks.poly_mul(a.c[0], b.c[0], primes)
    d1 = gckks.poly_add(
        gckks.poly_mul(a.c[0], b.c[1], primes),
        gckks.poly_mul(a.c[1], b.c[0], primes), primes,
    )
    d2 = gckks.poly_mul(a.c[1], b.c[1], primes)
    return BGVCiphertext(
        [d0, d1, d2], a.level, a.pt_factor * b.pt_factor % params.plain_modulus
    )


def mod_down_coeff_bgv(
    x: np.ndarray, params: CKKSParams, q_primes: tuple[int, ...]
) -> np.ndarray:
    """t-corrected division by P: delta = t*[x t^{-1}]_P, out = (x-delta)/P."""
    t = params.plain_modulus
    p_primes = params.p_primes
    k = len(q_primes)
    big_p = math.prod(p_primes)
    p_arr = np.array(p_primes, dtype=np.int64)[:, None]
    tinv = np.array([pow(t, -1, p) for p in p_primes], dtype=np.int64)[:, None]
    xp = x[k:] * tinv % p_arr  # [x t^{-1}]_P per p-limb
    conv = grns.base_convert(xp, p_primes, q_primes)
    out = np.empty((k, x.shape[1]), dtype=np.int64)
    for i, q in enumerate(q_primes):
        pinv = pow(big_p, -1, q)
        out[i] = (x[i] - t * conv[i]) % q * pinv % q
    return out


def key_switch_core_bgv(d2, params, level, ksk):
    """CKKS key_switch_core with the BGV t-corrected ModDown."""
    q_primes = params.q_primes[:level]
    p_primes = params.p_primes
    qp_active = q_primes + p_primes
    k = level
    alpha = len(p_primes)
    d2_coeff = gckks.intt_limbs(d2, params, q_primes)
    groups = gckks.ks_groups(params, level)
    raised = []
    for d0, d1 in groups:
        src = q_primes[d0:d1]
        others = q_primes[:d0] + q_primes[d1:] + p_primes
        conv = grns.base_convert(d2_coeff[d0:d1], src, others)
        full = np.empty((k + alpha, params.n), dtype=np.int64)
        full[d0:d1] = d2_coeff[d0:d1]
        full[:d0] = conv[:d0]
        full[d1:k] = conv[d0 : k - (d1 - d0)]
        full[k:] = conv[k - (d1 - d0) :]
        raised.append(gckks.ntt_limbs(full, params, qp_active))
    acc0 = np.zeros((k + alpha, params.n), dtype=np.int64)
    acc1 = np.zeros_like(acc0)
    qp_idx = list(range(k)) + list(range(params.num_limbs, params.num_limbs + alpha))
    for d, r in enumerate(raised):
        kb = ksk.b[d][qp_idx]
        ka = ksk.a[d][qp_idx]
        acc0 = gckks.poly_add(acc0, gckks.poly_mul(r, kb, qp_active), qp_active)
        acc1 = gckks.poly_add(acc1, gckks.poly_mul(r, ka, qp_active), qp_active)
    out = []
    for acc in (acc0, acc1):
        coeff = gckks.intt_limbs(acc, params, qp_active)
        down = mod_down_coeff_bgv(coeff, params, q_primes)
        out.append(gckks.ntt_limbs(down, params, q_primes))
    return out[0], out[1]


def ct_relinearize(ct: BGVCiphertext, params, rlk) -> BGVCiphertext:
    assert len(ct.c) == 3
    primes = ct.primes(params)
    ks0, ks1 = key_switch_core_bgv(ct.c[2], params, ct.level, rlk)
    return BGVCiphertext(
        [gckks.poly_add(ct.c[0], ks0, primes), gckks.poly_add(ct.c[1], ks1, primes)],
        ct.level, ct.pt_factor,
    )


def modswitch_coeff(x: np.ndarray, params, primes: tuple[int, ...]) -> np.ndarray:
    """Drop q_last with delta == 0 mod t: out = (x + t*[-x t^{-1}]_qlast)/qlast."""
    t = params.plain_modulus
    q_last = primes[-1]
    last = x[-1]
    u = (-last) % q_last * pow(t, -1, q_last) % q_last
    lifted = grns.center_reduce(u, q_last, primes[:-1])
    out = np.empty((len(primes) - 1, x.shape[1]), dtype=np.int64)
    for i, q in enumerate(primes[:-1]):
        qinv = pow(q_last, -1, q)
        out[i] = (x[i] + t * lifted[i]) % q * qinv % q
    return out


def ct_modswitch(ct: BGVCiphertext, params) -> BGVCiphertext:
    t = params.plain_modulus
    primes = ct.primes(params)
    new = []
    for comp in ct.c:
        coeff = gckks.intt_limbs(comp, params, primes)
        down = modswitch_coeff(coeff, params, primes)
        new.append(gckks.ntt_limbs(down, params, primes[:-1]))
    return BGVCiphertext(
        new, ct.level - 1, ct.pt_factor * (primes[-1] % t) % t
    )


def ct_mul(a: BGVCiphertext, b: BGVCiphertext, params, rlk) -> BGVCiphertext:
    return ct_modswitch(ct_relinearize(ct_tensor(a, b, params), params, rlk), params)


def ct_rotate(ct: BGVCiphertext, steps: int, params, gk) -> BGVCiphertext:
    assert len(ct.c) == 2
    primes = ct.primes(params)
    g = gckks.galois_exponent(steps, params.n)
    perm = gckks.automorphism_perm_eval(g, params.n)
    c0g = ct.c[0][:, perm]
    c1g = ct.c[1][:, perm]
    ks0, ks1 = key_switch_core_bgv(c1g, params, ct.level, gk)
    return BGVCiphertext(
        [gckks.poly_add(c0g, ks0, primes), ks1], ct.level, ct.pt_factor
    )


def _hoisted_key_switch_bgv(raised, perm, params, level, ksk):
    """gckks._hoisted_key_switch with the BGV t-corrected ModDown."""
    q_primes = params.q_primes[:level]
    p_primes = params.p_primes
    qp_active = q_primes + p_primes
    k = level
    alpha = len(p_primes)
    acc0 = np.zeros((k + alpha, params.n), dtype=np.int64)
    acc1 = np.zeros_like(acc0)
    qp_idx = list(range(k)) + list(range(params.num_limbs, params.num_limbs + alpha))
    for d, r in enumerate(raised):
        rg = r[:, perm]
        kb = ksk.b[d][qp_idx]
        ka = ksk.a[d][qp_idx]
        acc0 = gckks.poly_add(acc0, gckks.poly_mul(rg, kb, qp_active), qp_active)
        acc1 = gckks.poly_add(acc1, gckks.poly_mul(rg, ka, qp_active), qp_active)
    out = []
    for acc in (acc0, acc1):
        coeff = gckks.intt_limbs(acc, params, qp_active)
        down = mod_down_coeff_bgv(coeff, params, q_primes)
        out.append(gckks.ntt_limbs(down, params, q_primes))
    return out[0], out[1]


def ct_rotate_hoisted(ct: BGVCiphertext, steps_list, params, gks: dict) -> list:
    """Rotate by many step counts sharing ONE gadget decomposition.

    BGV mirror of gckks.ct_rotate_hoisted (hoist_decompose is scheme-
    agnostic — it only touches c1 over the Q basis; the scheme enters at
    ModDown, t-corrected here). gks maps steps -> KSKey."""
    assert len(ct.c) == 2
    primes = ct.primes(params)
    raised = gckks.hoist_decompose(ct, params)
    out = []
    for steps in steps_list:
        g = gckks.galois_exponent(steps, params.n)
        perm = gckks.automorphism_perm_eval(g, params.n)
        ks0, ks1 = _hoisted_key_switch_bgv(raised, perm, params, ct.level, gks[steps])
        c0g = ct.c[0][:, perm]
        out.append(BGVCiphertext(
            [gckks.poly_add(c0g, ks0, primes), ks1], ct.level, ct.pt_factor
        ))
    return out


def slot_orbit_rings(params: CKKSParams) -> np.ndarray:
    """Orbit (hypercube) ordering of the N integer slots: int[2, N/2].

    rings[r, k] is the raw slot index at position k of ring r; rotation by
    one step (the 5^1 automorphism) maps position k -> k-1 cyclically WITHIN
    each ring, so in orbit order `ct_rotate(ct, s)` is a plain left-rotation
    by s of both rings — the semantics the BSGS linear-algebra layer
    (ciphertext/linalg.py) assumes. Derived empirically from
    slot_rotation_perm so it is robust to NTT ordering conventions."""
    n = params.n
    perm = slot_rotation_perm(params, 1)  # rotated[j] = orig[perm[j]]
    # follow the two cycles of the permutation j -> perm[j]
    seen = np.zeros(n, dtype=bool)
    rings = []
    for start in range(n):
        if seen[start]:
            continue
        cyc = []
        j = start
        while not seen[j]:
            seen[j] = True
            cyc.append(j)
            j = int(perm[j])
        rings.append(cyc)
    assert len(rings) == 2 and all(len(r) == n // 2 for r in rings), (
        f"expected two N/2 slot orbits, got {[len(r) for r in rings]}"
    )
    return np.array(rings, dtype=np.int64)
