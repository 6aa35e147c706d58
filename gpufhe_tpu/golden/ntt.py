"""Golden negacyclic NTT (pure numpy, any word size).

The reference's NTT/iNTT are identity stubs (reference arithmetic.py:15-19,
SURVEY.md §2.1 items 4-5), so this module *defines* the transform the whole
framework is tested against:

    fwd:  X_k = sum_j x_j * psi^j * omega^(j*k)   mod q,   omega = psi^2
    inv:  x_j = N^-1 * psi^-j * sum_k X_k * omega^(-j*k) mod q

with psi a primitive 2N-th root of unity mod q (negacyclic wrap: multiply in
the transform domain == multiply mod X^N + 1). Output is in natural order k =
0..N-1; the TPU four-step implementation must match this bit-exactly.

Implementation: vectorized radix-2 recursion over a precomputed root-power
table. dtype is int64 when q < 2^31 (products < 2^62 are exact) and python
bigints (object dtype) otherwise, so 60-bit-prime vectors (BASELINE.json:7,
config 1) are exact too.
"""

from __future__ import annotations

import functools

import numpy as np


def is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 3.3e24."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def find_primitive_root_2n(q: int, two_n: int) -> int:
    """Smallest-found psi with multiplicative order exactly two_n mod q."""
    assert (q - 1) % two_n == 0, "q must be NTT-friendly: q = 1 mod 2N"
    for g in range(2, 10_000):
        psi = pow(g, (q - 1) // two_n, q)
        if pow(psi, two_n // 2, q) == q - 1:  # psi^N == -1 -> order is 2N
            return psi
    raise ValueError(f"no primitive {two_n}-th root found mod {q}")


def _dtype_for(q: int):
    return np.int64 if q < (1 << 31) else object


@functools.lru_cache(maxsize=None)
def _power_table(root: int, n: int, q: int) -> np.ndarray:
    """[root^0, root^1, ..., root^(n-1)] mod q."""
    out = np.empty(n, dtype=_dtype_for(q))
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * root % q
    return out


def _cyclic_ntt(x: np.ndarray, pw: np.ndarray, stride: int, q: int) -> np.ndarray:
    """Recursive radix-2 cyclic NTT along the last axis, natural in/out order.

    pw is the full power table of the length-n primitive root; at recursion
    depth d the root is pw[stride] with stride = 2^d.
    """
    n = x.shape[-1]
    if n == 1:
        return x
    even = _cyclic_ntt(x[..., 0::2], pw, stride * 2, q)
    odd = _cyclic_ntt(x[..., 1::2], pw, stride * 2, q)
    tw = pw[np.arange(n // 2) * stride]
    t = (tw * odd) % q
    return np.concatenate([(even + t) % q, (even - t) % q], axis=-1)


def ntt_fwd(x, q: int, psi: int) -> np.ndarray:
    """Negacyclic forward NTT along the last axis (natural order in and out).

    Dispatches to the native C path (golden/native.py) for word sizes < 2^62
    when a toolchain is available; results are bit-identical (the transform
    is exact integer arithmetic with a unique answer).
    """
    if q < (1 << 62):
        from gpufhe_tpu.golden.native import ntt_u64

        out = ntt_u64(np.asarray(x, dtype=np.int64) % q, q, psi, inverse=False)
        if out is not None:
            return out.astype(np.int64)
    x = np.asarray(x, dtype=_dtype_for(q)) % q
    n = x.shape[-1]
    psi_pows = _power_table(psi, n, q)
    y = (x * psi_pows) % q
    omega = psi * psi % q
    return _cyclic_ntt(y, _power_table(omega, n, q), 1, q)


def ntt_inv(X, q: int, psi: int) -> np.ndarray:
    """Negacyclic inverse NTT along the last axis; exact inverse of ntt_fwd."""
    if q < (1 << 62):
        from gpufhe_tpu.golden.native import ntt_u64

        out = ntt_u64(np.asarray(X, dtype=np.int64) % q, q, psi, inverse=True)
        if out is not None:
            return out.astype(np.int64)
    X = np.asarray(X, dtype=_dtype_for(q)) % q
    n = X.shape[-1]
    omega_inv = pow(int(psi) * int(psi) % q, -1, q)
    y = _cyclic_ntt(X, _power_table(omega_inv, n, q), 1, q)
    n_inv = pow(n, -1, q)
    psi_inv_pows = _power_table(pow(psi, -1, q), n, q)
    return (y * psi_inv_pows) % q * n_inv % q


def ntt_naive(x, q: int, psi: int) -> np.ndarray:
    """O(N^2) literal definition, for small-N validation of ntt_fwd."""
    x = np.asarray(x, dtype=object) % q
    n = x.shape[-1]
    exps = np.arange(n)
    out = np.empty(n, dtype=object)
    for k in range(n):
        terms = [int(x[j]) * pow(psi, int(j * (2 * k + 1)), q) % q for j in exps]
        out[k] = sum(terms) % q
    return out.astype(_dtype_for(q)) if q < (1 << 31) else out


def negacyclic_mul(a, b, q: int) -> np.ndarray:
    """Schoolbook polynomial product mod (X^N + 1, q) — NTT-free oracle."""
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    n = a.shape[-1]
    out = np.zeros(n, dtype=object)
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            term = ai * int(b[j])
            if k >= n:
                out[k - n] = (out[k - n] - term) % q
            else:
                out[k] = (out[k] + term) % q
    return out.astype(_dtype_for(q)) if q < (1 << 31) else out
