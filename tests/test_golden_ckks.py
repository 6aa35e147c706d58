"""End-to-end golden CKKS pipeline: the oracle must be semantically correct
(decrypt(encrypt(m)) ~ m etc., SURVEY.md §4 item 3) before it can serve as
the bit-exact reference for the device path.
"""

import numpy as np
import pytest

from gpufhe_tpu.golden import ckks as gc
from gpufhe_tpu.golden import rns as grns
from gpufhe_tpu.params.params import preset

PARAMS = preset("ci_small")  # N=2^10, 6 q-primes, 2 p-primes
RNG_SEED = 1234


def _setup():
    rng = np.random.default_rng(RNG_SEED)
    sk, pk = gc.keygen(PARAMS, rng)
    return rng, sk, pk


def _random_msg(rng, slots):
    return rng.uniform(-1, 1, slots) + 1j * rng.uniform(-1, 1, slots)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    z = _random_msg(rng, PARAMS.slots)
    pt = gc.encode(z, PARAMS.scale, PARAMS.q_primes, PARAMS.n)
    back = gc.decode(pt, PARAMS.scale, PARAMS.q_primes, PARAMS.n)
    assert np.abs(back - z).max() < 1e-5


def test_encrypt_decrypt():
    rng, sk, pk = _setup()
    z = _random_msg(rng, PARAMS.slots)
    pt = gc.encode(z, PARAMS.scale, PARAMS.q_primes, PARAMS.n)
    ct = gc.encrypt(pt, PARAMS, pk, rng, PARAMS.scale)
    out = gc.decrypt_decode(ct, PARAMS, sk)
    assert np.abs(out - z).max() < 1e-4


def test_homomorphic_add_sub():
    rng, sk, pk = _setup()
    z1, z2 = _random_msg(rng, PARAMS.slots), _random_msg(rng, PARAMS.slots)
    ct1 = gc.encrypt(gc.encode(z1, PARAMS.scale, PARAMS.q_primes, PARAMS.n), PARAMS, pk, rng, PARAMS.scale)
    ct2 = gc.encrypt(gc.encode(z2, PARAMS.scale, PARAMS.q_primes, PARAMS.n), PARAMS, pk, rng, PARAMS.scale)
    assert np.abs(gc.decrypt_decode(gc.ct_add(ct1, ct2, PARAMS), PARAMS, sk) - (z1 + z2)).max() < 2e-4
    assert np.abs(gc.decrypt_decode(gc.ct_sub(ct1, ct2, PARAMS), PARAMS, sk) - (z1 - z2)).max() < 2e-4


def test_homomorphic_mult_relin_rescale():
    rng, sk, pk = _setup()
    rlk = gc.make_relin_key(PARAMS, sk, rng)
    z1, z2 = _random_msg(rng, PARAMS.slots), _random_msg(rng, PARAMS.slots)
    ct1 = gc.encrypt(gc.encode(z1, PARAMS.scale, PARAMS.q_primes, PARAMS.n), PARAMS, pk, rng, PARAMS.scale)
    ct2 = gc.encrypt(gc.encode(z2, PARAMS.scale, PARAMS.q_primes, PARAMS.n), PARAMS, pk, rng, PARAMS.scale)
    prod = gc.ct_mul(ct1, ct2, PARAMS, rlk)
    assert prod.level == PARAMS.num_limbs - 1
    out = gc.decrypt_decode(prod, PARAMS, sk)
    assert np.abs(out - z1 * z2).max() < 5e-3


def test_mult_chain_two_levels():
    rng, sk, pk = _setup()
    rlk = gc.make_relin_key(PARAMS, sk, rng)
    z = _random_msg(rng, PARAMS.slots) * 0.5
    pt = gc.encode(z, PARAMS.scale, PARAMS.q_primes, PARAMS.n)
    ct = gc.encrypt(pt, PARAMS, pk, rng, PARAMS.scale)
    sq = gc.ct_mul(ct, ct, PARAMS, rlk)
    quad = gc.ct_mul(sq, sq, PARAMS, rlk)
    out = gc.decrypt_decode(quad, PARAMS, sk)
    assert np.abs(out - z**4).max() < 5e-2


def test_rotation():
    rng, sk, pk = _setup()
    steps = 3
    gk = gc.make_galois_key(PARAMS, steps, sk, rng)
    z = _random_msg(rng, PARAMS.slots)
    ct = gc.encrypt(gc.encode(z, PARAMS.scale, PARAMS.q_primes, PARAMS.n), PARAMS, pk, rng, PARAMS.scale)
    rot = gc.ct_rotate(ct, steps, PARAMS, gk)
    out = gc.decrypt_decode(rot, PARAMS, sk)
    assert np.abs(out - np.roll(z, -steps)).max() < 5e-3


def test_conjugation():
    rng, sk, pk = _setup()
    ck = gc.make_conj_key(PARAMS, sk, rng)
    z = _random_msg(rng, PARAMS.slots)
    ct = gc.encrypt(gc.encode(z, PARAMS.scale, PARAMS.q_primes, PARAMS.n), PARAMS, pk, rng, PARAMS.scale)
    out = gc.decrypt_decode(gc.ct_conjugate(ct, PARAMS, ck), PARAMS, sk)
    assert np.abs(out - np.conj(z)).max() < 5e-3


def test_mul_plain():
    rng, sk, pk = _setup()
    z1, z2 = _random_msg(rng, PARAMS.slots), _random_msg(rng, PARAMS.slots)
    ct = gc.encrypt(gc.encode(z1, PARAMS.scale, PARAMS.q_primes, PARAMS.n), PARAMS, pk, rng, PARAMS.scale)
    pt2 = gc.encode(z2, PARAMS.scale, PARAMS.q_primes, PARAMS.n)
    pt2_ntt = gc.ntt_limbs(pt2, PARAMS, PARAMS.q_primes)
    prod = gc.ct_rescale(gc.ct_mul_plain(ct, pt2_ntt, PARAMS.scale, PARAMS), PARAMS)
    out = gc.decrypt_decode(prod, PARAMS, sk)
    assert np.abs(out - z1 * z2).max() < 5e-3


def test_base_convert_exact_within_error_bound():
    # y = x + u * prod(src) mod t with |u| <= len(src)/2: verify congruence class
    rng = np.random.default_rng(5)
    src = PARAMS.q_primes[:3]
    dst = PARAMS.p_primes
    import math

    big = math.prod(src)
    vals = np.array([int.from_bytes(rng.bytes(16), "little") % big for _ in range(16)], dtype=object)
    x = np.stack([(vals % q).astype(np.int64) for q in src])
    y = grns.base_convert(x, src, dst)
    for t_idx, t in enumerate(dst):
        diff = (y[t_idx].astype(object) - vals) % t
        # must be a small multiple of big mod t
        mults = {(k * big) % t for k in range(len(src) + 1)}
        assert all(d in mults for d in diff)


def test_rescale_coeff_exact():
    rng = np.random.default_rng(6)
    primes = PARAMS.q_primes[:4]
    import math

    big = math.prod(primes)
    vals = np.array([int.from_bytes(rng.bytes(16), "little") % big for _ in range(16)], dtype=object)
    x = np.stack([(vals % q).astype(np.int64) for q in primes])
    got = grns.rescale_coeff(x, primes)
    q_last = primes[-1]
    # floor-with-centered-lift: (v - centered(v mod q_last)) / q_last
    c = vals % q_last
    c = np.where(c > q_last // 2, c - q_last, c)
    want = (vals - c) // q_last
    for i, q in enumerate(primes[:-1]):
        assert (got[i].astype(object) == want % q).all()
