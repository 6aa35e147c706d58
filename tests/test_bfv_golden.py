"""Golden RNS-BFV correctness: exact integer slots mod t (golden/bfv.py).

The reference has no scheme at all (SURVEY.md §2.4); correctness here means
the BFV algebra holds exactly over Z_t — encode/decode round-trips, additive
and multiplicative homomorphism (including a multi-hop multiply chain through
the scale-invariant BEHZ-style tensor + S-K conversion), rotations, and
modulus reduction preserving the plaintext.
"""

import numpy as np
import pytest

from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.params.params import preset


@pytest.fixture(scope="module")
def ctxt():
    params = preset("bfv_ci")
    rng = np.random.default_rng(11)
    sk, pk = gbfv.keygen(params, rng)
    rlk = gbfv.make_relin_key(params, sk, rng)
    return params, rng, sk, pk, rlk


def test_encode_decode_roundtrip():
    params = preset("bfv_ci")
    t = params.plain_modulus
    rng = np.random.default_rng(0)
    m = rng.integers(0, t, size=params.n, dtype=np.int64)
    assert (gbfv.decode(gbfv.encode(m, params), params) == m).all()


def test_encrypt_decrypt(ctxt):
    params, rng, sk, pk, _ = ctxt
    t = params.plain_modulus
    m = np.random.default_rng(1).integers(0, t, size=params.n, dtype=np.int64)
    ct = gbfv.encrypt(gbfv.encode(m, params), params, pk, rng)
    assert (gbfv.decrypt_decode(ct, params, sk) == m).all()
    assert gbfv.noise_budget_bits(ct, params, sk) > 40


def test_add_sub_plain_ops(ctxt):
    params, rng, sk, pk, _ = ctxt
    t = params.plain_modulus
    r = np.random.default_rng(2)
    m1 = r.integers(0, t, size=params.n, dtype=np.int64)
    m2 = r.integers(0, t, size=params.n, dtype=np.int64)
    c1 = gbfv.encrypt(gbfv.encode(m1, params), params, pk, rng)
    c2 = gbfv.encrypt(gbfv.encode(m2, params), params, pk, rng)
    assert (gbfv.decrypt_decode(gbfv.ct_add(c1, c2, params), params, sk)
            == (m1 + m2) % t).all()
    assert (gbfv.decrypt_decode(gbfv.ct_sub(c1, c2, params), params, sk)
            == (m1 - m2) % t).all()
    assert (gbfv.decrypt_decode(
        gbfv.ct_mul_plain(c1, gbfv.encode(m2, params), params), params, sk)
        == m1 * m2 % t).all()
    assert (gbfv.decrypt_decode(
        gbfv.ct_add_plain(c1, gbfv.encode(m2, params), params), params, sk)
        == (m1 + m2) % t).all()


def test_mul_chain(ctxt):
    """Three chained ciphertext multiplies decrypt exactly (mod t)."""
    params, rng, sk, pk, rlk = ctxt
    t = params.plain_modulus
    r = np.random.default_rng(3)
    ms = [r.integers(0, t, size=params.n, dtype=np.int64) for _ in range(4)]
    cts = [gbfv.encrypt(gbfv.encode(m, params), params, pk, rng) for m in ms]
    acc, want = cts[0], ms[0]
    for ct, m in zip(cts[1:], ms[1:]):
        acc = gbfv.ct_mul(acc, ct, params, rlk)
        want = want * m % t
        assert (gbfv.decrypt_decode(acc, params, sk) == want).all()
    assert gbfv.noise_budget_bits(acc, params, sk) > 0


def test_mod_reduce(ctxt):
    params, rng, sk, pk, rlk = ctxt
    t = params.plain_modulus
    r = np.random.default_rng(4)
    m1 = r.integers(0, t, size=params.n, dtype=np.int64)
    m2 = r.integers(0, t, size=params.n, dtype=np.int64)
    c1 = gbfv.encrypt(gbfv.encode(m1, params), params, pk, rng)
    c2 = gbfv.encrypt(gbfv.encode(m2, params), params, pk, rng)
    prod = gbfv.ct_mul(c1, c2, params, rlk)
    red = gbfv.ct_mod_reduce(prod, params)
    assert red.level == prod.level - 1
    assert (gbfv.decrypt_decode(red, params, sk) == m1 * m2 % t).all()
    # a second multiply still works at the reduced level
    c3 = gbfv.encrypt(
        gbfv.encode(m1, params), params, pk, rng, level=red.level
    )
    prod2 = gbfv.ct_mul(red, c3, params, rlk)
    assert (gbfv.decrypt_decode(prod2, params, sk) == m1 * m1 * m2 % t).all()


def test_rotation(ctxt):
    params, rng, sk, pk, _ = ctxt
    t = params.plain_modulus
    for steps in (1, 3):
        gk = gbfv.make_galois_key(params, steps, sk, rng)
        r = np.random.default_rng(5)
        m = r.integers(0, t, size=params.n, dtype=np.int64)
        ct = gbfv.encrypt(gbfv.encode(m, params), params, pk, rng)
        got = gbfv.decrypt_decode(gbfv.ct_rotate(ct, steps, params, gk), params, sk)
        perm = gbfv.slot_rotation_perm(params, steps)
        assert (got == m[perm]).all()


def test_rotation_hoisted(ctxt):
    params, rng, sk, pk, _ = ctxt
    t = params.plain_modulus
    steps_list = [1, 2, 5]
    gks = {s: gbfv.make_galois_key(params, s, sk, rng) for s in steps_list}
    r = np.random.default_rng(6)
    m = r.integers(0, t, size=params.n, dtype=np.int64)
    ct = gbfv.encrypt(gbfv.encode(m, params), params, pk, rng)
    outs = gbfv.ct_rotate_hoisted(ct, steps_list, params, gks)
    for s, out in zip(steps_list, outs):
        perm = gbfv.slot_rotation_perm(params, s)
        assert (gbfv.decrypt_decode(out, params, sk) == m[perm]).all()
        # NOTE: hoisted and one-shot rotations are only SEMANTICALLY equal —
        # the approximate base conversion of the permuted polynomial differs
        # from the permuted conversion by multiples of Q (absorbed as noise),
        # so limbs are not compared here. The limb-exact contract is
        # golden-vs-device (tests/test_bfv_device.py).
