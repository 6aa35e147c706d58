"""Golden modular vector arithmetic (pure numpy).

This module is the bit-exact oracle for the TPU kernel layer. Its first three
functions reproduce, exactly, the semantics of the reference's kernel layer
(/root/reference/arithmetic.py:3-13): canonical residues in [0, MOD) under
elementwise add/sub/mul, including the negative-operand behaviour of
numpy's `%`. Unlike the reference, products are computed in a width-safe way
(the reference's naive `(a * b) % MOD` silently overflows int64 for moduli
>= 32 bits; see SURVEY.md §2.1 item 3).

Everything here is intentionally boring numpy: no JAX, no device code. The
TPU kernels in gpufhe_tpu.ops are tested element-exact (integer `==`, never
allclose) against these functions.
"""

from __future__ import annotations

import numpy as np

_INT64_SAFE_MOD = 1 << 31  # a*b < 2**62 fits int64 iff MOD < 2**31


def _as_mod_array(x, MOD: int) -> np.ndarray:
    """Return x as an ndarray with a dtype wide enough for exact math mod MOD."""
    if MOD < _INT64_SAFE_MOD:
        return np.asarray(x, dtype=np.int64)
    return np.asarray(x, dtype=object)  # python bigints: exact for any modulus


def vec_add(a, b, MOD: int) -> np.ndarray:
    """Elementwise (a + b) % MOD, canonical residues in [0, MOD).

    Semantics of reference arithmetic.py:3-5 (shape assert + numpy `%`).
    """
    a = _as_mod_array(a, MOD)
    b = _as_mod_array(b, MOD)
    assert a.shape == b.shape
    return (a + b) % MOD


def vec_sub(a, b, MOD: int) -> np.ndarray:
    """Elementwise (a - b) % MOD; non-negative result even when a < b.

    Semantics of reference arithmetic.py:7-9 (verified in SURVEY.md §2.1
    item 2: the centered-to-canonical reduction is part of the contract).
    """
    a = _as_mod_array(a, MOD)
    b = _as_mod_array(b, MOD)
    assert a.shape == b.shape
    return (a - b) % MOD


def vec_mul(a, b, MOD: int) -> np.ndarray:
    """Elementwise (a * b) % MOD, computed overflow-free.

    Semantics of reference arithmetic.py:11-13, minus its silent int64
    overflow for >=32-bit moduli (SURVEY.md §2.1 item 3): for MOD >= 2**31
    we switch to python-int (object dtype) products so the result is exact
    for any modulus size.
    """
    a = _as_mod_array(a, MOD)
    b = _as_mod_array(b, MOD)
    assert a.shape == b.shape
    return (a * b) % MOD


def poly_add(a, b, MOD: int):
    """Component-wise ciphertext addition on (c0, c1) pairs.

    Realizes the *intent* of reference  polynomial.py:3-5, whose body calls
    vec_add on both components but returns None (a WIP bug, SURVEY.md §2.1
    item 8). Divergence by design: we return the resulting pair.
    """
    return (vec_add(a[0], b[0], MOD), vec_add(a[1], b[1], MOD))


def poly_sub(a, b, MOD: int):
    """Component-wise ciphertext subtraction (natural companion of poly_add)."""
    return (vec_sub(a[0], b[0], MOD), vec_sub(a[1], b[1], MOD))


# ---------------------------------------------------------------------------
# Montgomery arithmetic golden model (mirrors gpufhe_tpu.ops.modops exactly).
# ---------------------------------------------------------------------------

R_BITS = 32
R = 1 << R_BITS
R_MASK = R - 1


def mont_constants(q: int) -> tuple[int, int]:
    """Return (qinv_neg, r2) for modulus q: -q^{-1} mod 2^32 and 2^64 mod q."""
    assert q % 2 == 1 and 1 < q < (1 << 31)
    qinv = pow(q, -1, R)
    return (R - qinv) % R, (R * R) % q


def mont_mul(a, b, q: int, qinv_neg: int) -> np.ndarray:
    """Golden Montgomery product: a*b*2^-32 mod q, result in [0, q).

    Accepts any a in [0, 2^32) and b in [0, q) — the same relaxed domain the
    TPU kernel admits (REDC is valid for T < R*q). Vectorized int64 numpy.
    """
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    t = a * b  # < 2^63, exact in uint64
    m = (t & R_MASK) * np.uint64(qinv_neg) & np.uint64(R_MASK)
    u = (t + m * np.uint64(q)) >> np.uint64(R_BITS)
    u = np.where(u >= q, u - np.uint64(q), u)
    return u.astype(np.int64)


def to_mont(x, q: int) -> np.ndarray:
    qinv_neg, r2 = mont_constants(q)
    return mont_mul(x, r2, q, qinv_neg)


def from_mont(x, q: int) -> np.ndarray:
    qinv_neg, _ = mont_constants(q)
    return mont_mul(x, 1, q, qinv_neg)
