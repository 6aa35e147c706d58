"""Golden-model self-consistency: the oracle must be right before it judges.

Covers: reference-semantics arithmetic (SURVEY.md §2.1), the negacyclic NTT
definition vs the O(N^2) literal transform, roundtrips, the convolution
homomorphism, and 60-bit-prime support (BASELINE.json config 1).
"""

import numpy as np
import pytest

from gpufhe_tpu.golden import arithmetic as ga
from gpufhe_tpu.golden import ntt as gn

RNG = np.random.default_rng(0)


def test_vec_ops_reference_semantics():
    # Mirrors the verified behaviors in SURVEY.md §2.1 items 1-3, including
    # canonical (non-negative) residues for negative differences.
    a = np.array([5, 1], dtype=np.int64)
    b = np.array([11, 5], dtype=np.int64)
    assert (ga.vec_sub(a, b, 7) == np.array([1, 3])).all()
    assert (ga.vec_add(a, b, 7) == np.array([2, 6])).all()
    assert (ga.vec_mul(a, b, 7) == np.array([6, 5])).all()


def test_vec_mul_no_overflow_for_big_moduli():
    # The reference's naive int64 (a*b) % MOD overflows for >=32-bit moduli
    # (SURVEY.md §2.1 item 3); the golden model must not.
    q = (1 << 60) - 93  # 60-bit odd number
    a = np.array([q - 1], dtype=object)
    b = np.array([q - 2], dtype=object)
    assert ga.vec_mul(a, b, q)[0] == (q - 1) * (q - 2) % q


def test_poly_add_returns_pair():
    # Reference  polynomial.py:3-5 computes both halves then returns None
    # (SURVEY.md §2.1 item 8); intent is component-wise ct addition.
    a = (np.array([1, 2]), np.array([3, 4]))
    b = (np.array([6, 6]), np.array([6, 6]))
    c0, c1 = ga.poly_add(a, b, 7)
    assert (c0 == np.array([0, 1])).all() and (c1 == np.array([2, 3])).all()


def test_mont_mul_matches_direct():
    q = 2013265921  # 15 * 2^27 + 1, < 2^31
    qinv_neg, r2 = ga.mont_constants(q)
    a = RNG.integers(0, 1 << 32, size=1000, dtype=np.uint64)
    b = RNG.integers(0, q, size=1000, dtype=np.uint64)
    got = ga.mont_mul(a, b, q, qinv_neg)
    want = (a.astype(object) * b.astype(object) * pow(1 << 32, -1, q)) % q
    assert (got.astype(object) == want).all()
    # to_mont/from_mont roundtrip
    x = RNG.integers(0, q, size=100, dtype=np.int64)
    assert (ga.from_mont(ga.to_mont(x, q), q) == x).all()


@pytest.mark.parametrize("n", [8, 32, 64])
def test_ntt_fwd_matches_naive(n):
    q = gn.__dict__  # keep flake quiet
    from gpufhe_tpu.params.params import gen_ntt_primes

    q = gen_ntt_primes(28, 2 * n, 1)[0]
    psi = gn.find_primitive_root_2n(q, 2 * n)
    x = RNG.integers(0, q, size=n, dtype=np.int64)
    fast = gn.ntt_fwd(x, q, psi)
    naive = gn.ntt_naive(x, q, psi)
    assert (fast.astype(object) == naive.astype(object)).all()


@pytest.mark.parametrize("n,bits", [(64, 28), (256, 30), (4096, 28)])
def test_ntt_roundtrip(n, bits):
    from gpufhe_tpu.params.params import gen_ntt_primes

    q = gen_ntt_primes(bits, 2 * n, 1)[0]
    psi = gn.find_primitive_root_2n(q, 2 * n)
    x = RNG.integers(0, q, size=n, dtype=np.int64)
    assert (gn.ntt_inv(gn.ntt_fwd(x, q, psi), q, psi) == x).all()


def test_ntt_convolution_homomorphism():
    # NTT(a) . NTT(b) == NTT(a * b mod X^n + 1): the property that makes the
    # whole eval-domain representation work.
    n = 64
    from gpufhe_tpu.params.params import gen_ntt_primes

    q = gen_ntt_primes(28, 2 * n, 1)[0]
    psi = gn.find_primitive_root_2n(q, 2 * n)
    a = RNG.integers(0, q, size=n, dtype=np.int64)
    b = RNG.integers(0, q, size=n, dtype=np.int64)
    lhs = gn.ntt_fwd(a, q, psi).astype(object) * gn.ntt_fwd(b, q, psi).astype(object) % q
    rhs = gn.ntt_fwd(gn.negacyclic_mul(a, b, q), q, psi).astype(object)
    assert (lhs == rhs).all()


def test_ntt_60bit_prime():
    # BASELINE.json config 1: N=2^12 single 60-bit prime — golden must be
    # exact on bigint (object) dtype.
    n = 4096
    q = 0xFFFFFFFFFFC0001  # 2^60 - 2^18 + 1, classic NTT prime, 1 mod 2^19
    assert gn.is_prime(q) and (q - 1) % (2 * n) == 0
    psi = gn.find_primitive_root_2n(q, 2 * n)
    x = np.array([int(v) for v in RNG.integers(0, 1 << 60, size=n)], dtype=object) % q
    X = gn.ntt_fwd(x, q, psi)
    back = gn.ntt_inv(X, q, psi)
    assert (back == x).all()


def test_ntt_batched_axes():
    n = 32
    from gpufhe_tpu.params.params import gen_ntt_primes

    q = gen_ntt_primes(28, 2 * n, 1)[0]
    psi = gn.find_primitive_root_2n(q, 2 * n)
    x = RNG.integers(0, q, size=(3, n), dtype=np.int64)
    batched = gn.ntt_fwd(x, q, psi)
    rows = np.stack([gn.ntt_fwd(r, q, psi) for r in x])
    assert (batched == rows).all()


def test_native_ntt_matches_numpy_path():
    """C golden NTT (csrc/golden_ntt.c) is bit-identical to the numpy path."""
    from gpufhe_tpu.golden import ntt as gn
    from gpufhe_tpu.golden.native import get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("no C toolchain")
    for n, bits in [(64, 28), (256, 30), (1024, 60)]:
        two_n = 2 * n
        p = ((1 << bits) - 1) // two_n * two_n + 1
        while not gn.is_prime(p):
            p -= two_n
        psi = gn.find_primitive_root_2n(p, two_n)
        rng = np.random.default_rng(1)
        x = rng.integers(0, min(p, 1 << 62), size=n, dtype=np.int64) % p
        got = gn.ntt_fwd(x, p, psi)  # native dispatch
        y = np.asarray(x, dtype=gn._dtype_for(p)) % p
        pp = gn._power_table(psi, n, p)
        want = gn._cyclic_ntt((y * pp) % p, gn._power_table(psi * psi % p, n, p), 1, p)
        assert all(int(a) == int(b) for a, b in zip(got, want))
        assert (gn.ntt_inv(got, p, psi) == x).all()


def test_circuit_aware_prime_ordering_bounds_drift():
    """order_primes_for_circuit keeps scale drift tiny through a deep mixed
    circuit (the failure mode that broke N=2^16 bootstrapping)."""
    import math

    from gpufhe_tpu.params.params import (
        balanced_prime_candidates,
        order_primes_for_circuit,
    )

    two_n = 2**17
    cands = balanced_prime_candidates(28, two_n)
    ops = ["lin"] * 8 + ["sq_z", "lin", "h", "h"] + ["sq"] * 8 + ["lin"] * 8
    chain = order_primes_for_circuit(cands, 28, ops, 29)
    es = {q: math.log2(q / 2.0**28) for q in chain}
    d = dz = 0.0
    worst = 0.0
    for op, q in zip(ops, reversed(chain)):
        e = es[q]
        if op == "lin":
            d = d - e
        elif op in ("sq", "sq_z"):
            d = 2 * d - e
        else:
            d = d + dz - e
        if op == "sq_z":
            dz = d
        worst = max(worst, abs(d))
    assert worst < 0.3, worst
    # naive descending chain blows up instead
    from gpufhe_tpu.params.params import gen_ntt_primes

    naive = gen_ntt_primes(28, two_n, 29)
    d = dz = 0.0
    worst_naive = 0.0
    for op, q in zip(ops, reversed(naive)):
        e = math.log2(q / 2.0**28)
        if op == "lin":
            d = d - e
        elif op in ("sq", "sq_z"):
            d = 2 * d - e
        else:
            d = d + dz - e
        if op == "sq_z":
            dz = d
        worst_naive = max(worst_naive, abs(d))
    assert worst_naive > 5.0  # the observed catastrophic drift
