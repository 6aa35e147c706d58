"""Elementwise modular arithmetic on uint32 lanes (the VPU kernel layer).

This is the TPU-native realization of the reference's kernel layer
(reference arithmetic.py:3-13): elementwise add/sub/mul on canonical residues
in [0, q). The reference's naive `(a * b) % MOD` cannot work on TPU (no
64-bit integer path, and it overflows anyway — SURVEY.md §2.1 item 3);
instead every product goes through Montgomery REDC with R = 2^32, built from
16-bit partial products (`mulhi32`) because the VPU has no 32x32->64 widening
multiply.

Conventions
-----------
* all residues are uint32 in [0, q); all primes are odd, < 2^31
* `q`, `qinv_neg` (= -q^{-1} mod 2^32) and `r2` (= 2^64 mod q) broadcast
  against the data (shape [L, 1] against [L, N] limb planes)
* fixed operands (twiddles, key material) are stored in Montgomery form so a
  variable x constant multiply is ONE mont_mul; variable x variable multiply
  costs two (a mont_mul by r2 converts one operand)

These functions are plain jnp so XLA fuses them into surrounding kernels; the
hot fused paths additionally exist as Pallas kernels in ops/pallas_kernels.py.
Bit-exact golden mirror: gpufhe_tpu.golden.arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars (not jnp) so Pallas kernels see literals, not captured consts
_U16 = np.uint32(0xFFFF)
_S16 = np.uint32(16)


def mulhi32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """High 32 bits of the 64-bit product of two uint32 arrays.

    Four 16x16->32 partial products with explicit carry propagation; the
    `cross` term is at most 2*(2^16-1) + (2^16-1) < 2^18 so it cannot
    overflow uint32.
    """
    al, ah = a & _U16, a >> _S16
    bl, bh = b & _U16, b >> _S16
    ll = al * bl
    hl = ah * bl
    lh = al * bh
    hh = ah * bh
    cross = (ll >> _S16) + (hl & _U16) + (lh & _U16)
    return hh + (hl >> _S16) + (lh >> _S16) + (cross >> _S16)


def add_mod(a, b, q):
    """(a + b) mod q for a, b in [0, q); q < 2^31 so the sum never wraps."""
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    """(a - b) mod q for a, b in [0, q)."""
    d = a + q - b  # in (0, 2q) — no uint32 wrap since q < 2^31
    return jnp.where(d >= q, d - q, d)


def neg_mod(a, q):
    """(-a) mod q for a in [0, q)."""
    return jnp.where(a == 0, a, q - a)


def mont_mul(a, b, q, qinv_neg):
    """Montgomery product a * b * 2^-32 mod q, result in [0, q).

    Valid for any a in [0, 2^32) provided b in [0, q) (REDC needs a*b < R*q).
    If b is stored in Montgomery form (b' = b * 2^32 mod q) this computes the
    plain product a * b mod q.
    """
    t_lo = a * b  # low 32 bits (uint32 wraparound is the point)
    t_hi = mulhi32(a, b)
    m = t_lo * qinv_neg
    mq_hi = mulhi32(m, q)
    # low halves satisfy t_lo + (m*q mod 2^32) == 2^32 * carry, carry = (t_lo != 0)
    t = t_hi + mq_hi + (t_lo != 0).astype(jnp.uint32)
    return jnp.where(t >= q, t - q, t)


def mont_mac(pairs, q, qinv_neg):
    """Montgomery multiply-accumulate: sum_i a_i * b_i * 2^-32 mod q,
    CANONICAL result in [0, q) — the key-switch / diagonal-fan inner
    product (round 5, device-trace finding: these MAC fusions, not the
    NTTs, dominate the bootstrap's fan programs).

    Pairs of 64-bit products are accumulated BEFORE reduction (lo with
    explicit carry, hi exact since each mulhi < q), then ONE REDC serves
    the pair — 1 REDC per 2 terms instead of per term, and intermediates
    stay LAZY in [0, 2q) with a single conditional subtract per pair/add
    ([0,4q) sums never wrap for q < 2^30, the framework's word-size
    discipline). Each intermediate is congruent to the canonical chain's;
    the final canonicalization makes the RESULT bit-identical to the
    per-term mont_mul + add_mod composition, so callers and tests see the
    exact same values. (The output is canonical rather than lazy because
    the jnp NTT path's carry digit recoding is only total for inputs
    < ~2^31 with no top-byte carry — ops/ntt.py _to_digits; the 2 extra
    ops are noise next to the ~20% the pairing saves.)

    Requirements: every a_i in [0, 2^32), every b_i in [0, q), q < 2^30.
    """
    two_q = q + q

    def redc(hi, lo):
        m = lo * qinv_neg
        return hi + mulhi32(m, q) + (lo != 0).astype(jnp.uint32)

    groups = []
    for i in range(0, len(pairs), 2):
        a1, b1 = pairs[i]
        lo1 = a1 * b1
        hi1 = mulhi32(a1, b1)
        if i + 1 < len(pairs):
            a2, b2 = pairs[i + 1]
            lo2 = a2 * b2
            lo = lo1 + lo2
            hi = hi1 + mulhi32(a2, b2) + (lo < lo1).astype(jnp.uint32)
            t = redc(hi, lo)  # [0, 3q + 2): hi < 2q + 1, + q + 1
            t = jnp.where(t >= two_q, t - two_q, t)  # [0, 2q)
        else:
            t = redc(hi1, lo1)  # [0, 2q)
        groups.append(t)
    s = groups[0]
    for t in groups[1:]:
        u = s + t  # [0, 4q): no u32 wrap for q < 2^30
        s = jnp.where(u >= two_q, u - two_q, u)
    return jnp.where(s >= q, s - q, s)  # canonical [0, q)


def shoup_mul(a, w, w_shoup, q):
    """a * w mod q in [0, 2q) for ANY uint32 a and canonical w < q (Shoup).

    w_shoup = floor(w * 2^32 / q) precomputed host-side. The quotient
    estimate mulhi32(a, w_shoup) undershoots floor(a*w/q) by at most 1
    (error < a/2^32 < 1), so r = a*w - quot*q lands in [0, 2q); uint32
    wraparound of both low products is exact because the true r fits in 32
    bits. ~19 VPU ops vs mont_mul's ~35 — use for multiplies by constants
    whose Shoup companion is precomputed; callers must either tolerate the
    lazy [0, 2q) range or spend one conditional subtract to canonicalize."""
    quot = mulhi32(a, w_shoup)
    return a * w - quot * q


def shoup_np(w: np.ndarray, q) -> np.ndarray:
    """Host: Shoup companions floor(w * 2^32 / q) for canonical w < q."""
    w = np.asarray(w, dtype=np.uint64)
    q = np.asarray(q, dtype=np.uint64)
    return ((w << np.uint64(32)) // q).astype(np.uint32)


def mul_mod(a, b, q, qinv_neg, r2):
    """General a * b mod q for canonical a, b (two Montgomery passes)."""
    return mont_mul(mont_mul(a, b, q, qinv_neg), r2, q, qinv_neg)


def to_mont(x, q, qinv_neg, r2):
    """Canonical -> Montgomery form: x * 2^32 mod q."""
    return mont_mul(x, r2, q, qinv_neg)


def from_mont(x, q, qinv_neg):
    """Montgomery -> canonical form: x * 2^-32 mod q."""
    return mont_mul(x, jnp.uint32(1), q, qinv_neg)


def barrett_reduce_u32(x, q):
    """Reduce an arbitrary uint32 to [0, q) for q < 2^31.

    Uses floor(x/q) ~ mulhi(x, m) with m = floor(2^32 / q); the estimate is
    off by at most one so a single correction step suffices.
    """
    m = (np.uint32(0xFFFFFFFF) // q).astype(jnp.uint32)  # floor((2^32-1)/q)
    quot = mulhi32(x, m)
    r = x - quot * q
    r = jnp.where(r >= q, r - q, r)
    return jnp.where(r >= q, r - q, r)
