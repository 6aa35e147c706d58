"""Golden RNS-BFV pipeline (pure numpy): scale-invariant exact integers mod t.

Third scheme of the framework (CKKS: golden/ckks.py, BGV: golden/bgv.py);
the reference contains no scheme at all (SURVEY.md §2.4), so like the others
this is target-driven. BFV shares almost everything with the CKKS golden
machinery:

  * keys ARE the CKKS keys (b = -a s + e, gadget rows g_d s' + e — the
    error is NOT multiplied by t as in BGV), so keygen / make_relin_key /
    make_galois_key are reused from golden/ckks.py verbatim.
  * the message rides the TOP bits: c0 + c1 s = Delta*m + e (mod Q) with
    Delta = floor(Q/t); decryption is m = round(t * x / Q) mod t.
  * plaintext packing is the exact negacyclic NTT mod t of golden/bgv.py
    (slots are integers mod t; t prime, t = 1 mod 2N).

The scheme-specific machinery is the scale-invariant multiply
(BEHZ/HPS-family, simplified):

  1. extend both ciphertexts from Q to an auxiliary basis B ∪ {m_sk} by the
     APPROXIMATE fast base conversion (golden/rns.py base_convert) — the
     +u*Q conversion error (0 <= u < L) survives the t/Q scaling as an
     exact integer multiple of t and therefore VANISHES mod t; only the
     aux basis must be sized for the larger intermediate (bfv_aux_params).
  2. tensor the pair in NTT domain over Q and over B ∪ {m_sk}.
  3. scale by t/Q: y = (t*d - conv_{Q->aux}([t*d]_Q)) * Q^{-1} over the aux
     basis — an exact integer division giving floor(t*d/Q) - v with the
     small conversion error |v| <= L/2 absorbed as noise.
  4. convert back aux -> Q EXACTLY via Shenoy-Kumaresan: the redundant
     modulus m_sk recovers the centered overflow count alpha of the
     approximate B -> q conversion, which is then subtracted.
  5. relinearize with the ordinary CKKS hybrid key switch (plain P mod-down
     — BFV key-switch noise is additive, golden/ckks.py key_switch_core).

Device mirror: gpufhe_tpu/ciphertext/bfv.py (bit-exact limb parity); every
approximation choice above (canonical-residue conversions, per-term
reduction order, centered S-K count) is part of the bit-exact contract.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np

from gpufhe_tpu.golden import bgv as gbgv
from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.golden import rns as grns
from gpufhe_tpu.params.params import CKKSParams, gen_ntt_primes

# plaintext packing: exact negacyclic NTT mod t (shared with BGV)
encode = gbgv.encode
decode = gbgv.decode
slot_rotation_perm = gbgv.slot_rotation_perm
slot_orbit_rings = gbgv.slot_orbit_rings

# keys: identical to CKKS (errors NOT scaled by t)
keygen = gckks.keygen
make_relin_key = gckks.make_relin_key
make_galois_key = gckks.make_galois_key


# ---------------------------------------------------------------------------
# Auxiliary basis for the scale-invariant multiply
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def bfv_aux_params(params: CKKSParams, level: int | None = None) -> CKKSParams:
    """Aux-basis parameter clone: q_primes = B ∪ {m_sk} (m_sk LAST).

    Sized so prod(B) > 2 * t * N * L^2 * Q — the bound on both the scaled
    tensor magnitude (S-K validity needs |y| < prod(B)/2) and the t*d
    intermediate (Q * prod(B) * m_sk must hold t * N * (L*Q)^2).
    Primes are drawn from the 28-bit NTT class, skipping any prime already
    used by the Q or P chain, so all bases stay pairwise coprime.
    """
    lvl = level if level is not None else params.num_limbs
    t = params.plain_modulus
    assert t > 1, "BFV needs plain_modulus set"
    big_q = math.prod(params.q_primes[:lvl])
    # |y| <= t*N*L^2*Q (see module docstring); prod(B) > 2*|y| with margin
    bits_needed = (
        math.log2(t) + math.log2(params.n) + 2.0 * math.log2(max(lvl, 2))
        + math.log2(big_q) + 4.0
    )
    used = set(params.q_primes + params.p_primes) | {t}
    # at production N the 2N | q-1 classes are sparse (CLAUDE.md); sweep the
    # 28..30-bit classes until the basis is big enough, skipping collisions
    cands: list[int] = []
    for bits_class in (28, 29, 30):
        try:
            got = gen_ntt_primes(bits_class, 2 * params.n, 4 * lvl + 40)
        except ValueError:
            # class exhausted — rescan counting only what it actually holds
            got, p = [], ((1 << bits_class) - 1) // (2 * params.n) * (2 * params.n) + 1
            from gpufhe_tpu.golden.ntt import is_prime

            while p >= (1 << (bits_class - 1)):
                if is_prime(p):
                    got.append(p)
                p -= 2 * params.n
        cands.extend(q for q in got if q not in used)
        if sum(math.log2(q) for q in cands) >= bits_needed + 31:
            break
    k, bits = 0, 0.0
    while bits < bits_needed:
        assert k < len(cands), (
            f"NTT-prime classes exhausted sizing the BFV aux basis: have "
            f"{bits:.0f}/{bits_needed:.0f} bits from {len(cands)} candidates "
            f"(N={params.n}, level={lvl})"
        )
        bits += math.log2(cands[k])
        k += 1
    assert k < len(cands), "no candidate left for the redundant modulus m_sk"
    aux = tuple(cands[: k + 1])  # k conversion primes + m_sk (last)
    return CKKSParams(
        n=params.n, q_primes=aux, p_primes=(), scale_bits=params.scale_bits,
        sigma=params.sigma, plain_modulus=t,
    )


def _ckks_view(params: CKKSParams) -> CKKSParams:
    """params with plain_modulus cleared — BFV key switching uses the plain
    CKKS P mod-down (additive noise), not the BGV t-corrected one."""
    return dataclasses.replace(params, plain_modulus=0)


# ---------------------------------------------------------------------------
# Ciphertexts
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BFVCiphertext:
    c: list  # NTT-domain int64[K, N] components
    level: int

    def primes(self, params):
        return params.q_primes[: self.level]


def delta_rns(params: CKKSParams, level: int) -> np.ndarray:
    """Delta = floor(Q_level / t) reduced into each q_i; int64[level, 1]."""
    t = params.plain_modulus
    primes = params.q_primes[:level]
    d = math.prod(primes) // t
    return np.array([d % q for q in primes], dtype=np.int64)[:, None]


# ---------------------------------------------------------------------------
# Encrypt / decrypt
# ---------------------------------------------------------------------------


def encrypt(
    pt_coeff: np.ndarray, params: CKKSParams, pk, rng, level: int | None = None
) -> BFVCiphertext:
    """pt_coeff: int64[N] plaintext coefficients mod t (from encode)."""
    level = level if level is not None else params.num_limbs
    primes = params.q_primes[:level]
    n = params.n
    v = gckks.ntt_limbs(
        gckks.small_to_rns(gckks.sample_ternary(rng, n), primes), params, primes
    )
    e0 = gckks.small_to_rns(gckks.sample_gauss(rng, n, params.sigma), primes)
    e1 = gckks.ntt_limbs(
        gckks.small_to_rns(gckks.sample_gauss(rng, n, params.sigma), primes),
        params, primes,
    )
    t = params.plain_modulus
    m = np.asarray(pt_coeff, dtype=np.int64) % t
    dm = delta_rns(params, level) * m[None, :] % np.array(primes, np.int64)[:, None]
    m_ntt = gckks.ntt_limbs(
        gckks.poly_add(dm, e0, primes), params, primes
    )
    c0 = gckks.poly_add(gckks.poly_mul(pk.b[:level], v, primes), m_ntt, primes)
    c1 = gckks.poly_add(gckks.poly_mul(pk.a[:level], v, primes), e1, primes)
    return BFVCiphertext(c=[c0, c1], level=level)


def round_decode_coeff(centered, t: int, big_q: int) -> np.ndarray:
    """round(t * x / Q) mod t over centered bigint coefficients — the ONE
    copy of the BFV rounding formula (shared by the device decrypt,
    ciphertext/bfv.py, and threshold decryption, ciphertext/threshold.py).
    Round-half-up works for negative x under Python floor division."""
    return np.array(
        [((int(x) * t * 2 + big_q) // (2 * big_q)) % t for x in centered],
        dtype=np.int64,
    )


def _inner_product_centered(ct: BFVCiphertext, params: CKKSParams, sk):
    """(centered bigint coefficients of c0 + sum c_i s^i, big_q)."""
    primes = ct.primes(params)
    s_ntt = gckks.ntt_limbs(gckks.small_to_rns(sk.s, primes), params, primes)
    acc = ct.c[0]
    s_pow = s_ntt
    for comp in ct.c[1:]:
        acc = gckks.poly_add(acc, gckks.poly_mul(comp, s_pow, primes), primes)
        s_pow = gckks.poly_mul(s_pow, s_ntt, primes)
    coeff = gckks.intt_limbs(acc, params, primes)
    return gckks.crt_compose_centered(coeff, primes), math.prod(primes)


def decrypt(ct: BFVCiphertext, params: CKKSParams, sk) -> np.ndarray:
    """-> int64[N] plaintext coefficients mod t: round(t * x / Q) mod t."""
    centered, big_q = _inner_product_centered(ct, params, sk)
    return round_decode_coeff(centered, params.plain_modulus, big_q)


def decrypt_decode(ct, params, sk):
    return decode(decrypt(ct, params, sk), params)


def noise_budget_bits(ct: BFVCiphertext, params: CKKSParams, sk) -> float:
    """log2(Delta / (2*|e|_inf)) — bits of rounding margin left."""
    t = params.plain_modulus
    centered, big_q = _inner_product_centered(ct, params, sk)
    m = round_decode_coeff(centered, t, big_q)
    delta = big_q // t
    worst = 0
    for x, mm in zip(centered, m):
        e = int(x) - delta * int(mm)
        e = ((e + big_q // 2) % big_q) - big_q // 2  # center mod Q
        worst = max(worst, abs(e))
    return math.log2(delta / (2 * worst)) if worst else float("inf")


# ---------------------------------------------------------------------------
# Linear homomorphic ops
# ---------------------------------------------------------------------------


def ct_add(a: BFVCiphertext, b: BFVCiphertext, params) -> BFVCiphertext:
    assert a.level == b.level
    primes = a.primes(params)
    return BFVCiphertext(
        [gckks.poly_add(x, y, primes) for x, y in zip(a.c, b.c)], a.level
    )


def ct_sub(a: BFVCiphertext, b: BFVCiphertext, params) -> BFVCiphertext:
    assert a.level == b.level
    primes = a.primes(params)
    return BFVCiphertext(
        [gckks.poly_sub(x, y, primes) for x, y in zip(a.c, b.c)], a.level
    )


def ct_mul_plain(ct: BFVCiphertext, pt_coeff: np.ndarray, params) -> BFVCiphertext:
    """Multiply by an (unscaled) integer plaintext: Delta*m*m2 stays on Delta."""
    primes = ct.primes(params)
    m_rns = np.stack([np.asarray(pt_coeff, dtype=np.int64) % q for q in primes])
    pt_ntt = gckks.ntt_limbs(m_rns, params, primes)
    return BFVCiphertext(
        [gckks.poly_mul(x, pt_ntt, primes) for x in ct.c], ct.level
    )


def ct_add_plain(ct: BFVCiphertext, pt_coeff: np.ndarray, params) -> BFVCiphertext:
    """Add a plaintext: c0 += Delta * m2 (NTT domain)."""
    primes = ct.primes(params)
    t = params.plain_modulus
    m = np.asarray(pt_coeff, dtype=np.int64) % t
    dm = delta_rns(params, ct.level) * m[None, :] % np.array(primes, np.int64)[:, None]
    dm_ntt = gckks.ntt_limbs(dm, params, primes)
    return BFVCiphertext(
        [gckks.poly_add(ct.c[0], dm_ntt, primes)] + list(ct.c[1:]), ct.level
    )


# ---------------------------------------------------------------------------
# Scale-invariant multiply
# ---------------------------------------------------------------------------


def _sk_convert_to_q(
    y_aux: np.ndarray, aux: tuple[int, ...], q_primes: tuple[int, ...]
) -> np.ndarray:
    """Shenoy-Kumaresan EXACT conversion B ∪ {m_sk} -> Q.

    y_aux: int64[k+1, N] canonical residues over B = aux[:-1] plus the
    redundant modulus m_sk = aux[-1]. Valid for |y| < prod(B)/2.
    """
    b_primes = aux[:-1]
    m_sk = aux[-1]
    big_b = math.prod(b_primes)
    # overflow count alpha of the approximate conversion, recovered mod m_sk
    conv_sk = grns.base_convert(y_aux[:-1], b_primes, (m_sk,))[0]
    alpha = (conv_sk - y_aux[-1]) % m_sk * pow(big_b, -1, m_sk) % m_sk
    alpha = np.where(alpha > m_sk // 2, alpha - m_sk, alpha)  # centered
    conv_q = grns.base_convert(y_aux[:-1], b_primes, q_primes)
    out = np.empty((len(q_primes), y_aux.shape[1]), dtype=np.int64)
    for i, q in enumerate(q_primes):
        out[i] = (conv_q[i] - alpha * (big_b % q)) % q
    return out


def ct_tensor(a: BFVCiphertext, b: BFVCiphertext, params) -> BFVCiphertext:
    """(d0, d1, d2) = round(t/Q * (a ⊗ b)) over Q — the BEHZ-style multiply
    (module docstring steps 1-4). Output is a 3-component ciphertext."""
    assert a.level == b.level
    level = a.level
    t = params.plain_modulus
    q_primes = a.primes(params)
    auxp = bfv_aux_params(params, level)
    aux = auxp.q_primes
    big_q = math.prod(q_primes)
    q_arr = np.array(q_primes, dtype=np.int64)[:, None]

    # 1. extend a, b to the aux basis (coeff domain, approximate conversion)
    def to_aux_ntt(comp):
        coeff = gckks.intt_limbs(comp, params, q_primes)
        conv = grns.base_convert(coeff, q_primes, aux)
        return gckks.ntt_limbs(conv, auxp, aux)

    a_aux = [to_aux_ntt(comp) for comp in a.c]
    b_aux = [to_aux_ntt(comp) for comp in b.c]

    # 2. tensor over both bases (NTT-domain pointwise)
    def tensor(x, y, primes):
        d0 = gckks.poly_mul(x[0], y[0], primes)
        d1 = gckks.poly_add(
            gckks.poly_mul(x[0], y[1], primes),
            gckks.poly_mul(x[1], y[0], primes), primes,
        )
        d2 = gckks.poly_mul(x[1], y[1], primes)
        return [d0, d1, d2]

    d_q = tensor(a.c, b.c, q_primes)
    d_aux = tensor(a_aux, b_aux, aux)

    # 3. + 4. per component: scale by t/Q over aux, then S-K back to Q
    out = []
    for dq_ntt, daux_ntt in zip(d_q, d_aux):
        dq = gckks.intt_limbs(dq_ntt, params, q_primes)
        daux = gckks.intt_limbs(daux_ntt, auxp, aux)
        r = dq * t % q_arr  # [t*d]_Q in the Q basis (canonical)
        r_aux = grns.base_convert(r, q_primes, aux)
        y = np.empty_like(daux)
        for i, p in enumerate(aux):
            qinv = pow(big_q % p, -1, p)
            y[i] = (daux[i] * t - r_aux[i]) % p * qinv % p
        back = _sk_convert_to_q(y, aux, q_primes)
        out.append(gckks.ntt_limbs(back, params, q_primes))
    return BFVCiphertext(out, level)


def ct_relinearize(ct: BFVCiphertext, params, rlk) -> BFVCiphertext:
    """CKKS hybrid key switch (plain P mod-down) of the d2 component."""
    assert len(ct.c) == 3
    primes = ct.primes(params)
    ks0, ks1 = gckks.key_switch_core(ct.c[2], _ckks_view(params), ct.level, rlk)
    return BFVCiphertext(
        [gckks.poly_add(ct.c[0], ks0, primes), gckks.poly_add(ct.c[1], ks1, primes)],
        ct.level,
    )


def ct_mul(a: BFVCiphertext, b: BFVCiphertext, params, rlk) -> BFVCiphertext:
    return ct_relinearize(ct_tensor(a, b, params), params, rlk)


def ct_mod_reduce(ct: BFVCiphertext, params) -> BFVCiphertext:
    """Drop q_last: c' = round-ish(c / q_last) (grns.rescale_coeff's exact
    centered division). Delta shrinks to floor(Q'/t); the plaintext picks up
    at most |m| * 1 of extra noise (standard BFV modulus switching)."""
    primes = ct.primes(params)
    new = []
    for comp in ct.c:
        coeff = gckks.intt_limbs(comp, params, primes)
        down = grns.rescale_coeff(coeff, primes)
        new.append(gckks.ntt_limbs(down, params, primes[:-1]))
    return BFVCiphertext(new, ct.level - 1)


# ---------------------------------------------------------------------------
# Rotations (CKKS Galois keys, BGV slot semantics)
# ---------------------------------------------------------------------------


def ct_rotate(ct: BFVCiphertext, steps: int, params, gk) -> BFVCiphertext:
    assert len(ct.c) == 2
    primes = ct.primes(params)
    g = gckks.galois_exponent(steps, params.n)
    perm = gckks.automorphism_perm_eval(g, params.n)
    c0g = ct.c[0][:, perm]
    c1g = ct.c[1][:, perm]
    ks0, ks1 = gckks.key_switch_core(c1g, _ckks_view(params), ct.level, gk)
    return BFVCiphertext(
        [gckks.poly_add(c0g, ks0, primes), ks1], ct.level
    )


"""Scheme switching BGV <-> BFV (exact, noise-preserving scalar maps).

Both schemes share keys and the NTT-mod-t plaintext packing, and their
invariant forms differ only by a scalar: BGV holds m + t*e, BFV holds
Delta*m + e. Multiplying every component by [t^{-1}]_Q maps the former to
(1+kQ)/t * m + e — a valid BFV ciphertext whose message is k*m with
k = t*t^{-1} div Q == -Q^{-1} (mod t); multiplying by t maps BFV to
-r*m + t*e with r = Q mod t — a valid BGV ciphertext. The known k / -r
message factors are tracked (BGV's pt_factor field; a returned factor for
BFV) rather than corrected in-ciphertext, which would scale the noise by
up to t/2. (The equivalence is the standard BGV/BFV scaling isomorphism.)
"""


def _scalar_mul_rns(c, value: int, primes) -> np.ndarray:
    v = np.array([value % q for q in primes], dtype=np.int64)[:, None]
    return c * v % np.array(primes, dtype=np.int64)[:, None]


def bgv_to_bfv(ct, params: CKKSParams) -> tuple[BFVCiphertext, int]:
    """BGV ciphertext -> (BFV ciphertext, message factor).

    decrypt(out) == factor * (true BGV message) mod t; fold factor^{-1}
    into the next plaintext multiply, or multiply the decryption by
    pow(factor, -1, t)."""
    t = params.plain_modulus
    primes = params.q_primes[: ct.level]
    big_q = math.prod(primes)
    tinv = pow(t, -1, big_q)
    k = (t * tinv - 1) // big_q % t
    out = BFVCiphertext(
        [_scalar_mul_rns(c, tinv, primes) for c in ct.c], ct.level
    )
    # BGV true message m = m_raw * pt_factor; out decrypts to k * m_raw
    return out, k * pow(int(ct.pt_factor), -1, t) % t


def bfv_to_bgv(ct: BFVCiphertext, params: CKKSParams):
    """BFV ciphertext -> BGV ciphertext (message factor folded into
    pt_factor, so BGV decrypt returns the true message directly)."""
    from gpufhe_tpu.golden.bgv import BGVCiphertext

    t = params.plain_modulus
    primes = params.q_primes[: ct.level]
    big_q = math.prod(primes)
    r = big_q % t
    return BGVCiphertext(
        [_scalar_mul_rns(c, t, primes) for c in ct.c],
        ct.level,
        pow(-r % t, -1, t),
    )


def ct_rotate_hoisted(ct: BFVCiphertext, steps_list, params, gks: dict) -> list:
    """Many rotations sharing ONE gadget decomposition (CKKS hoisting)."""
    assert len(ct.c) == 2
    primes = ct.primes(params)
    cv = _ckks_view(params)
    raised = gckks.hoist_decompose(ct, cv)
    out = []
    for steps in steps_list:
        g = gckks.galois_exponent(steps, params.n)
        perm = gckks.automorphism_perm_eval(g, params.n)
        ks0, ks1 = gckks._hoisted_key_switch(raised, perm, cv, ct.level, gks[steps])
        c0g = ct.c[0][:, perm]
        out.append(BFVCiphertext(
            [gckks.poly_add(c0g, ks0, primes), ks1], ct.level
        ))
    return out
