"""Golden CKKS pipeline (pure numpy): the end-to-end parity oracle.

Implements the full RNS-CKKS pipeline the reference only gestures at
(SURVEY.md §2.4, BASELINE.json:5): canonical-embedding encoder, public-key
encryption, ciphertext add/sub, ct-ct multiply with hybrid-key-switch
relinearization, rescale, Galois rotations, and decryption. Every algorithmic
choice here (approximate base conversion, centered rescale lift, gadget
definition, NTT-domain-at-rest representation) is mirrored exactly by the
device path, so ciphertext limbs compare with `==` at every pipeline stage
(the limb-trace contract of BASELINE.json:5).

Representation: a polynomial is int64[K, N] canonical residues; ciphertexts
are kept in NTT (evaluation) domain at rest. K tracks the current level
(number of active q-primes). Randomness comes from an explicit
numpy.random.Generator so device and golden runs share identical samples.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np

from gpufhe_tpu.golden import ntt as gn
from gpufhe_tpu.golden import rns as grns
from gpufhe_tpu.params.params import CKKSParams


# ---------------------------------------------------------------------------
# Encoder: canonical embedding via FFT over the odd powers of zeta = e^(i*pi/N)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _slot_positions(n: int) -> np.ndarray:
    """j-th slot evaluates m at zeta^(5^j); position (5^j - 1)/2 in the odd grid."""
    two_n = 2 * n
    idx = np.empty(n // 2, dtype=np.int64)
    g = 1
    for j in range(n // 2):
        idx[j] = (g - 1) // 2
        g = g * 5 % two_n
    return idx


def encode(z: np.ndarray, scale: float, primes: tuple[int, ...], n: int) -> np.ndarray:
    """complex[n//2] -> int64[K, n] coefficient-domain plaintext at scale."""
    slots = n // 2
    z = np.asarray(z, dtype=np.complex128)
    assert z.shape == (slots,)
    pos = _slot_positions(n)
    ev = np.zeros(n, dtype=np.complex128)
    ev[pos] = z
    ev[(n - 1) - pos] = np.conj(z)  # zeta^(2n - t) = conj(zeta^t); grid index n-1-j
    # m_k * zeta^k = FFT(ev)/n  (inverse of ev = ifft(m * zeta^k) * n)
    k = np.arange(n)
    tw = np.exp(1j * np.pi * k / n)
    m = np.real(np.fft.fft(ev) / n / tw)
    scaled = np.rint(m * scale)
    if np.abs(scaled).max() < 2**62:  # int64 fast path (same residues)
        coeffs = scaled.astype(np.int64)
        return np.remainder(
            coeffs[None, :], np.asarray(primes, dtype=np.int64)[:, None]
        )
    coeffs = scaled.astype(object)
    return np.stack([(coeffs % q).astype(np.int64) for q in primes])


def decode(pt: np.ndarray, scale: float, primes: tuple[int, ...], n: int) -> np.ndarray:
    """int64[K, n] coefficient-domain plaintext -> complex[n//2] slot values."""
    coeffs = crt_compose_centered(pt, primes).astype(np.float64) / scale
    k = np.arange(n)
    tw = np.exp(1j * np.pi * k / n)
    ev = np.fft.ifft(coeffs * tw) * n
    return ev[_slot_positions(n)]


def crt_compose_centered(x: np.ndarray, primes: tuple[int, ...]) -> np.ndarray:
    """int64[K, N] RNS residues -> object[N] centered integers in (-Q/2, Q/2]."""
    big_q = math.prod(primes)
    acc = np.zeros(x.shape[1], dtype=object)
    for i, q in enumerate(primes):
        qhat = big_q // q
        acc += x[i].astype(object) * (pow(qhat, -1, q) * qhat % big_q)
    acc %= big_q
    return np.where(acc > big_q // 2, acc - big_q, acc)


# ---------------------------------------------------------------------------
# Sampling (explicit rng so device/golden share identical randomness)
# ---------------------------------------------------------------------------


def sample_uniform(rng: np.random.Generator, primes: tuple[int, ...], n: int) -> np.ndarray:
    return np.stack([rng.integers(0, q, size=n, dtype=np.int64) for q in primes])


def sample_ternary(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(-1, 2, size=n, dtype=np.int64)


def sample_gauss(rng: np.random.Generator, n: int, sigma: float) -> np.ndarray:
    return np.rint(rng.normal(0.0, sigma, size=n)).astype(np.int64)


def small_to_rns(small: np.ndarray, primes: tuple[int, ...]) -> np.ndarray:
    """Signed small poly int64[N] -> canonical residues int64[K, N]."""
    return np.stack([small % q for q in primes])


# ---------------------------------------------------------------------------
# NTT helpers over limb stacks
# ---------------------------------------------------------------------------


def _psis(params: CKKSParams, primes: tuple[int, ...]) -> tuple[int, ...]:
    all_primes = params.q_primes + params.p_primes
    lookup = dict(zip(all_primes, params.psi))
    return tuple(lookup[q] for q in primes)


def ntt_limbs(x: np.ndarray, params: CKKSParams, primes: tuple[int, ...]) -> np.ndarray:
    psis = _psis(params, primes)
    return np.stack([gn.ntt_fwd(x[i], primes[i], psis[i]) for i in range(len(primes))])


def intt_limbs(x: np.ndarray, params: CKKSParams, primes: tuple[int, ...]) -> np.ndarray:
    psis = _psis(params, primes)
    return np.stack([gn.ntt_inv(x[i], primes[i], psis[i]) for i in range(len(primes))])


def _pointwise(op, a: np.ndarray, b: np.ndarray, primes: tuple[int, ...]) -> np.ndarray:
    q = np.array(primes, dtype=np.int64)[:, None]
    return op(a, b) % q


def poly_add(a, b, primes):
    return _pointwise(lambda x, y: x + y, a, b, primes)


def poly_sub(a, b, primes):
    return _pointwise(lambda x, y: x - y, a, b, primes)


def poly_mul(a, b, primes):
    return _pointwise(lambda x, y: x * y, a, b, primes)  # eval-domain pointwise


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SecretKey:
    s: np.ndarray  # signed ternary int64[N]


@dataclasses.dataclass
class PublicKey:
    b: np.ndarray  # int64[L, N], NTT domain: -a*s + e
    a: np.ndarray  # int64[L, N], NTT domain


@dataclasses.dataclass
class KSKey:
    """Hybrid key-switch key: dnum gadget rows over the full Q*P basis."""

    b: np.ndarray  # int64[dnum, L+alpha, N] NTT domain
    a: np.ndarray  # int64[dnum, L+alpha, N] NTT domain


@dataclasses.dataclass
class Ciphertext:
    """NTT-domain ciphertext; c[k] holds int64[K, N] for component k."""

    c: list  # list of int64[K, N]
    level: int  # number of active q-primes
    scale: float

    def primes(self, params: CKKSParams) -> tuple[int, ...]:
        return params.q_primes[: self.level]


def ks_groups(params: CKKSParams, level: int) -> list[tuple[int, int]]:
    """(start, stop) limb index ranges of the active decomposition groups."""
    alpha = params.alpha
    return [(d, min(d + alpha, level)) for d in range(0, level, alpha)]


def gadget_factors(params: CKKSParams) -> list[int]:
    """g_d = P * Qhat_d * [Qhat_d^{-1}]_{Q_d} over the full-level basis."""
    alpha = params.alpha
    qs = params.q_primes
    big_q, big_p = params.big_q, params.big_p
    out = []
    for d0 in range(0, len(qs), alpha):
        group = qs[d0 : d0 + alpha]
        q_d = math.prod(group)
        qhat_d = big_q // q_d
        out.append(big_p * qhat_d * pow(qhat_d, -1, q_d) % (big_q * big_p))
    return out


def keygen(params: CKKSParams, rng: np.random.Generator):
    """Secret + public keys. All key material lives in NTT domain."""
    primes = params.q_primes
    if params.hamming_weight:
        s = sample_sparse_ternary(rng, params.n, params.hamming_weight)
    else:
        s = sample_ternary(rng, params.n)
    s_ntt = ntt_limbs(small_to_rns(s, primes), params, primes)
    a = sample_uniform(rng, primes, params.n)  # sampled directly in NTT domain
    e = ntt_limbs(small_to_rns(sample_gauss(rng, params.n, params.sigma), primes), params, primes)
    b = poly_add(poly_mul(poly_sub(np.zeros_like(a), a, primes), s_ntt, primes), e, primes)
    return SecretKey(s), PublicKey(b=b, a=a)


def make_kskey(
    params: CKKSParams, s_target_ntt_fn, sk: SecretKey, rng: np.random.Generator
) -> KSKey:
    """Key switching key from s' to s, where s_target_ntt_fn(primes) gives
    s' in NTT domain over an arbitrary prime subset."""
    qp = params.q_primes + params.p_primes
    s_ntt = ntt_limbs(small_to_rns(sk.s, qp), params, qp)
    factors = gadget_factors(params)
    bs, as_ = [], []
    for g in factors:
        a = sample_uniform(rng, qp, params.n)
        e = ntt_limbs(small_to_rns(sample_gauss(rng, params.n, params.sigma), qp), params, qp)
        g_rns = np.array([g % q for q in qp], dtype=np.int64)[:, None]
        sp = s_target_ntt_fn(qp)
        b = (-(a.astype(object)) * s_ntt + e + g_rns * sp) % np.array(qp, dtype=object)[:, None]
        bs.append(b.astype(np.int64))
        as_.append(a)
    return KSKey(b=np.stack(bs), a=np.stack(as_))


def make_relin_key(params: CKKSParams, sk: SecretKey, rng: np.random.Generator) -> KSKey:
    def s2_ntt(primes):
        s_ntt = ntt_limbs(small_to_rns(sk.s, primes), params, primes)
        return poly_mul(s_ntt, s_ntt, primes)

    return make_kskey(params, s2_ntt, sk, rng)


def galois_exponent(steps: int, n: int) -> int:
    """Automorphism X -> X^g rotating slots left by `steps`: g = 5^steps mod 2N."""
    return pow(5, steps, 2 * n)


def make_galois_key(params: CKKSParams, steps: int, sk: SecretKey, rng) -> KSKey:
    g = galois_exponent(steps, params.n)

    def sg_ntt(primes):
        sg = apply_automorphism_coeff(sk.s, g)
        return ntt_limbs(small_to_rns(sg, primes), params, primes)

    return make_kskey(params, sg_ntt, sk, rng)


def make_conj_key(params: CKKSParams, sk: SecretKey, rng) -> KSKey:
    g = 2 * params.n - 1  # complex conjugation automorphism

    def sg_ntt(primes):
        sg = apply_automorphism_coeff(sk.s, g)
        return ntt_limbs(small_to_rns(sg, primes), params, primes)

    return make_kskey(params, sg_ntt, sk, rng)


def apply_automorphism_coeff(x: np.ndarray, g: int) -> np.ndarray:
    """m(X) -> m(X^g) on signed/canonical coefficient vectors (last axis)."""
    n = x.shape[-1]
    out = np.zeros_like(x)
    idx = np.arange(n) * g % (2 * n)
    sign = np.where(idx >= n, -1, 1)
    out[..., idx % n] = x * sign
    return out


def automorphism_perm_eval(g: int, n: int) -> np.ndarray:
    """Permutation p with (sigma_g x)_eval[k] = x_eval[p[k]] in natural NTT order.

    Point k holds m(psi^(2k+1)); sigma_g m at that point is m(psi^((2k+1)g)),
    i.e. the input's point k' with 2k'+1 = (2k+1)g mod 2N.
    """
    two_n = 2 * n
    kk = (np.arange(n) * 2 + 1) * g % two_n
    return (kk - 1) // 2


# ---------------------------------------------------------------------------
# Encrypt / decrypt
# ---------------------------------------------------------------------------


def encrypt(
    pt_coeff: np.ndarray, params: CKKSParams, pk: PublicKey, rng: np.random.Generator,
    scale: float, level: int | None = None,
) -> Ciphertext:
    level = level if level is not None else params.num_limbs
    primes = params.q_primes[:level]
    n = params.n
    v = ntt_limbs(small_to_rns(sample_ternary(rng, n), primes), params, primes)
    e0 = small_to_rns(sample_gauss(rng, n, params.sigma), primes)
    e1 = ntt_limbs(small_to_rns(sample_gauss(rng, n, params.sigma), primes), params, primes)
    m_ntt = ntt_limbs(poly_add(pt_coeff[:level], e0, primes), params, primes)
    c0 = poly_add(poly_mul(pk.b[:level], v, primes), m_ntt, primes)
    c1 = poly_add(poly_mul(pk.a[:level], v, primes), e1, primes)
    return Ciphertext(c=[c0, c1], level=level, scale=scale)


def decrypt_to_coeff(ct: Ciphertext, params: CKKSParams, sk: SecretKey) -> np.ndarray:
    primes = ct.primes(params)
    s_ntt = ntt_limbs(small_to_rns(sk.s, primes), params, primes)
    acc = ct.c[0]
    s_pow = s_ntt
    for comp in ct.c[1:]:
        acc = poly_add(acc, poly_mul(comp, s_pow, primes), primes)
        s_pow = poly_mul(s_pow, s_ntt, primes)
    return intt_limbs(acc, params, primes)


def decrypt_decode(ct: Ciphertext, params: CKKSParams, sk: SecretKey) -> np.ndarray:
    return decode(decrypt_to_coeff(ct, params, sk), ct.scale, ct.primes(params), params.n)


# ---------------------------------------------------------------------------
# Ciphertext ops
# ---------------------------------------------------------------------------


def ct_add(a: Ciphertext, b: Ciphertext, params: CKKSParams) -> Ciphertext:
    assert a.level == b.level and a.scale == b.scale
    primes = a.primes(params)
    return Ciphertext(
        c=[poly_add(x, y, primes) for x, y in zip(a.c, b.c)], level=a.level, scale=a.scale
    )


def ct_sub(a: Ciphertext, b: Ciphertext, params: CKKSParams) -> Ciphertext:
    assert a.level == b.level and a.scale == b.scale
    primes = a.primes(params)
    return Ciphertext(
        c=[poly_sub(x, y, primes) for x, y in zip(a.c, b.c)], level=a.level, scale=a.scale
    )


def ct_mul_plain(ct: Ciphertext, pt_ntt: np.ndarray, pt_scale: float, params) -> Ciphertext:
    primes = ct.primes(params)
    return Ciphertext(
        c=[poly_mul(x, pt_ntt[: ct.level], primes) for x in ct.c],
        level=ct.level,
        scale=ct.scale * pt_scale,
    )


def ct_tensor(a: Ciphertext, b: Ciphertext, params: CKKSParams) -> Ciphertext:
    """(a0,a1) x (b0,b1) -> (d0,d1,d2), NTT-domain pointwise."""
    assert a.level == b.level
    primes = a.primes(params)
    d0 = poly_mul(a.c[0], b.c[0], primes)
    d1 = poly_add(
        poly_mul(a.c[0], b.c[1], primes), poly_mul(a.c[1], b.c[0], primes), primes
    )
    d2 = poly_mul(a.c[1], b.c[1], primes)
    return Ciphertext(c=[d0, d1, d2], level=a.level, scale=a.scale * b.scale)


def key_switch_core(
    d2: np.ndarray, params: CKKSParams, level: int, ksk: KSKey
) -> tuple[np.ndarray, np.ndarray]:
    """Hybrid key switch of one NTT-domain poly int64[K, N].

    Returns (ks0, ks1) int64[K, N] NTT domain — the P-scaled-and-mod-downed
    inner products <ModUp(decomp(d2)), ksk>.
    """
    q_primes = params.q_primes[:level]
    p_primes = params.p_primes
    qp_active = q_primes + p_primes
    k = level
    alpha = len(p_primes)

    d2_coeff = intt_limbs(d2, params, q_primes)

    # ModUp: each group -> full active QP basis (identity on its own limbs)
    groups = ks_groups(params, level)
    raised = []
    for d0, d1 in groups:
        src = q_primes[d0:d1]
        others = q_primes[:d0] + q_primes[d1:] + p_primes
        conv = grns.base_convert(d2_coeff[d0:d1], src, others)
        full = np.empty((k + alpha, params.n), dtype=np.int64)
        full[d0:d1] = d2_coeff[d0:d1]
        full[: d0] = conv[: d0]
        full[d1 : k] = conv[d0 : k - (d1 - d0)]
        full[k:] = conv[k - (d1 - d0) :]
        raised.append(ntt_limbs(full, params, qp_active))

    # Inner product with the key over QP (NTT-domain MAC)
    acc0 = np.zeros((k + alpha, params.n), dtype=np.int64)
    acc1 = np.zeros_like(acc0)
    qp_idx = list(range(k)) + list(
        range(params.num_limbs, params.num_limbs + alpha)
    )  # key rows: q-chain prefix + p-chain block
    for d, r in enumerate(raised):
        kb = ksk.b[d][qp_idx]
        ka = ksk.a[d][qp_idx]
        acc0 = poly_add(acc0, poly_mul(r, kb, qp_active), qp_active)
        acc1 = poly_add(acc1, poly_mul(r, ka, qp_active), qp_active)

    # ModDown by P (coefficient domain), back to NTT domain
    out = []
    for acc in (acc0, acc1):
        coeff = intt_limbs(acc, params, qp_active)
        down = grns.mod_down_coeff(coeff, q_primes, p_primes)
        out.append(ntt_limbs(down, params, q_primes))
    return out[0], out[1]


def ct_relinearize(ct: Ciphertext, params: CKKSParams, rlk: KSKey) -> Ciphertext:
    assert len(ct.c) == 3
    primes = ct.primes(params)
    ks0, ks1 = key_switch_core(ct.c[2], params, ct.level, rlk)
    return Ciphertext(
        c=[poly_add(ct.c[0], ks0, primes), poly_add(ct.c[1], ks1, primes)],
        level=ct.level,
        scale=ct.scale,
    )


def ct_rescale(ct: Ciphertext, params: CKKSParams) -> Ciphertext:
    primes = ct.primes(params)
    new = []
    for comp in ct.c:
        coeff = intt_limbs(comp, params, primes)
        down = grns.rescale_coeff(coeff, primes)
        new.append(ntt_limbs(down, params, primes[:-1]))
    return Ciphertext(c=new, level=ct.level - 1, scale=ct.scale / primes[-1])


def ct_mul(a: Ciphertext, b: Ciphertext, params: CKKSParams, rlk: KSKey) -> Ciphertext:
    return ct_rescale(ct_relinearize(ct_tensor(a, b, params), params, rlk), params)


def ct_key_switch(ct: Ciphertext, params: CKKSParams, ksk: KSKey) -> Ciphertext:
    """Re-encrypt under the key ksk was generated for (message unchanged).

    Used by sparse-secret encapsulation (Bossuat et al., EUROCRYPT'21
    pattern): bootstrap ModRaise runs under an ephemeral sparse key that
    only ever exists at the base modulus, so the security of the full chain
    is governed by the DENSE base secret (utils/security.py)."""
    assert len(ct.c) == 2
    primes = ct.primes(params)
    ks0, ks1 = key_switch_core(ct.c[1], params, ct.level, ksk)
    return Ciphertext(
        [poly_add(ct.c[0], ks0, primes), ks1], ct.level, ct.scale
    )


def ct_rotate(ct: Ciphertext, steps: int, params: CKKSParams, gk: KSKey) -> Ciphertext:
    """Rotate slots left by `steps` (Galois automorphism + key switch)."""
    assert len(ct.c) == 2
    primes = ct.primes(params)
    g = galois_exponent(steps, params.n)
    perm = automorphism_perm_eval(g, params.n)
    c0g = ct.c[0][:, perm]
    c1g = ct.c[1][:, perm]
    ks0, ks1 = key_switch_core(c1g, params, ct.level, gk)
    return Ciphertext(
        c=[poly_add(c0g, ks0, primes), ks1], level=ct.level, scale=ct.scale
    )


def ct_conjugate(ct: Ciphertext, params: CKKSParams, ck: KSKey) -> Ciphertext:
    primes = ct.primes(params)
    g = 2 * params.n - 1
    perm = automorphism_perm_eval(g, params.n)
    c0g = ct.c[0][:, perm]
    c1g = ct.c[1][:, perm]
    ks0, ks1 = key_switch_core(c1g, params, ct.level, ck)
    return Ciphertext(
        c=[poly_add(c0g, ks0, primes), ks1], level=ct.level, scale=ct.scale
    )


# ---------------------------------------------------------------------------
# Hoisted rotations (BASELINE.json:10 config 4)
# ---------------------------------------------------------------------------


def hoist_decompose(ct: Ciphertext, params: CKKSParams):
    """The shared (hoisted) part of rotation key-switching: decompose +
    ModUp + NTT the c1 component ONCE for any number of rotations.

    Returns the raised gadget polys in NTT domain over the active QP basis.
    Hoisting applies the automorphism to these *after* ModUp (it commutes up
    to the approximate-base-conversion error term, which ModDown absorbs as
    noise); results therefore differ bit-wise from unhoisted ct_rotate but
    decrypt identically up to noise.
    """
    level = ct.level
    q_primes = params.q_primes[:level]
    p_primes = params.p_primes
    qp_active = q_primes + p_primes
    k = level
    alpha = len(p_primes)
    c1_coeff = intt_limbs(ct.c[1], params, q_primes)
    groups = ks_groups(params, level)
    raised = []
    for d0, d1 in groups:
        src = q_primes[d0:d1]
        others = q_primes[:d0] + q_primes[d1:] + p_primes
        conv = grns.base_convert(c1_coeff[d0:d1], src, others)
        full = np.empty((k + alpha, params.n), dtype=np.int64)
        full[d0:d1] = c1_coeff[d0:d1]
        full[:d0] = conv[:d0]
        full[d1:k] = conv[d0 : k - (d1 - d0)]
        full[k:] = conv[k - (d1 - d0) :]
        raised.append(ntt_limbs(full, params, qp_active))
    return raised


def _hoisted_key_switch(raised, perm, params: CKKSParams, level: int, ksk: KSKey):
    """Inner product of permuted raised polys with the key + ModDown."""
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
        acc0 = poly_add(acc0, poly_mul(rg, kb, qp_active), qp_active)
        acc1 = poly_add(acc1, poly_mul(rg, ka, qp_active), qp_active)
    out = []
    for acc in (acc0, acc1):
        coeff = intt_limbs(acc, params, qp_active)
        down = grns.mod_down_coeff(coeff, q_primes, p_primes)
        out.append(ntt_limbs(down, params, q_primes))
    return out[0], out[1]


def ct_rotate_hoisted(
    ct: Ciphertext, steps_list, params: CKKSParams, gks: dict
) -> list:
    """Rotate one ciphertext by many step counts, sharing one decomposition.

    gks maps steps -> KSKey (Galois key). Returns one Ciphertext per step.
    """
    assert len(ct.c) == 2
    primes = ct.primes(params)
    raised = hoist_decompose(ct, params)
    out = []
    for steps in steps_list:
        g = galois_exponent(steps, params.n)
        perm = automorphism_perm_eval(g, params.n)
        ks0, ks1 = _hoisted_key_switch(raised, perm, params, ct.level, gks[steps])
        c0g = ct.c[0][:, perm]
        out.append(
            Ciphertext(
                c=[poly_add(c0g, ks0, primes), ks1], level=ct.level, scale=ct.scale
            )
        )
    return out


def ct_diag_fan(
    ct: Ciphertext, pt_sets: list, pt_scale: float, params: CKKSParams, gks: dict
) -> list:
    """Fused rotation-fan linear combination ("double hoisting").

    For each dict D in pt_sets computes

        rescale^scale_words( sum_r D[r] * rot_r(ct) )

    with ONE hoisted decomposition shared by every rotation and ONE delayed
    ModDown per output: each rotation's gadget inner product stays in the
    extended QP basis, is multiplied there by the plaintext diagonal and
    accumulated, and a single ModDown lands the whole fan back in Q. Only
    rounding-error terms differ vs per-rotation key switching (the single
    ModDown rounds the accumulated sum once instead of |fan| times — equal or
    better noise); this is the exact contract the device kernel
    (ciphertext/ct.py ct_diag_fan) mirrors limb-for-limb.

    pt_sets: dicts offset -> int64[K+alpha, N] NTT-domain plaintext residues
    over the ACTIVE QP basis (rows = active q-chain then p-chain; the
    q-prefix rows double as the Q-basis plaintext for the c0 / zero-offset
    terms). All plaintexts share scale pt_scale. The r=0 entry (no key
    switch) is optional per set; every set needs >= 1 nonzero offset.
    """
    assert len(ct.c) == 2
    level = ct.level
    k = level
    alpha = len(params.p_primes)
    q_primes = params.q_primes[:level]
    p_primes = params.p_primes
    qp_active = q_primes + p_primes
    n = params.n

    offsets = sorted({r for dset in pt_sets for r in dset if r != 0})
    raised = hoist_decompose(ct, params)
    qp_idx = list(range(k)) + list(range(params.num_limbs, params.num_limbs + alpha))

    nsets = len(pt_sets)
    acc0 = [None] * nsets
    acc1 = [None] * nsets
    c0_acc = [None] * nsets
    for r in offsets:
        g = galois_exponent(r, n)
        perm = automorphism_perm_eval(g, n)
        gk = gks[r]
        t0 = t1 = None
        for d, rr in enumerate(raised):
            rg = rr[:, perm]
            u0 = poly_mul(rg, gk.b[d][qp_idx], qp_active)
            u1 = poly_mul(rg, gk.a[d][qp_idx], qp_active)
            t0 = u0 if t0 is None else poly_add(t0, u0, qp_active)
            t1 = u1 if t1 is None else poly_add(t1, u1, qp_active)
        c0g = ct.c[0][:, perm]
        for s, dset in enumerate(pt_sets):
            if r not in dset:
                continue
            pt = dset[r]
            v0 = poly_mul(t0, pt, qp_active)
            v1 = poly_mul(t1, pt, qp_active)
            acc0[s] = v0 if acc0[s] is None else poly_add(acc0[s], v0, qp_active)
            acc1[s] = v1 if acc1[s] is None else poly_add(acc1[s], v1, qp_active)
            w0 = poly_mul(c0g, pt[:k], q_primes)
            c0_acc[s] = (
                w0 if c0_acc[s] is None else poly_add(c0_acc[s], w0, q_primes)
            )

    outs = []
    for s, dset in enumerate(pt_sets):
        assert acc0[s] is not None, "each set needs a nonzero offset"
        ks0 = grns.mod_down_coeff(
            intt_limbs(acc0[s], params, qp_active), q_primes, p_primes
        )
        ks1 = grns.mod_down_coeff(
            intt_limbs(acc1[s], params, qp_active), q_primes, p_primes
        )
        e0 = c0_acc[s]
        e1 = None
        if 0 in dset:
            pt0 = dset[0][:k]
            t = poly_mul(ct.c[0], pt0, q_primes)
            e0 = t if e0 is None else poly_add(e0, t, q_primes)
            e1 = poly_mul(ct.c[1], pt0, q_primes)
        out0 = poly_add(ntt_limbs(ks0, params, q_primes), e0, q_primes)
        out1 = ntt_limbs(ks1, params, q_primes)
        if e1 is not None:
            out1 = poly_add(out1, e1, q_primes)
        out = Ciphertext([out0, out1], level, ct.scale * pt_scale)
        for _ in range(params.scale_words):
            out = ct_rescale(out, params)
        outs.append(out)
    return outs


# ---------------------------------------------------------------------------
# ModRaise (bootstrapping step 0): re-embed an exhausted ciphertext mod q0
# into the full modulus chain. Output encrypts m + q0*I for small I.
# ---------------------------------------------------------------------------


def ct_mod_raise(ct: Ciphertext, params: CKKSParams) -> Ciphertext:
    """Re-embed a base-modulus ciphertext into the full chain.

    Supports a composite base of `scale_words` limbs (double-word scale):
    the centered CRT value v in (-Q0/2, Q0/2] is reduced into every prime.
    """
    w = params.scale_words
    assert ct.level == w and len(ct.c) == 2
    base = params.q_primes[:w]
    primes = params.q_primes
    q0_prod = math.prod(base)
    new = []
    for comp in ct.c:
        coeff = intt_limbs(comp, params, base)
        v = crt_compose_centered(coeff, base)  # object ints, centered
        lifted = np.stack([(v % q).astype(np.int64) for q in primes])
        new.append(ntt_limbs(lifted, params, primes))
    return Ciphertext(c=new, level=params.num_limbs, scale=ct.scale)


def sample_sparse_ternary(rng: np.random.Generator, n: int, h: int) -> np.ndarray:
    """Ternary secret with exactly h nonzero (+-1) coefficients."""
    s = np.zeros(n, dtype=np.int64)
    idx = rng.choice(n, size=h, replace=False)
    s[idx] = rng.integers(0, 2, size=h, dtype=np.int64) * 2 - 1
    return s
