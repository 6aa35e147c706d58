"""RNS-BGV: golden exactness + device limb-trace parity (BASELINE "CKKS/BGV").

BGV plaintexts are exact integers mod t, so correctness checks are equality,
not tolerance. Device ops mirror golden bit-exactly (same contract as CKKS,
tests/test_pipeline.py).
"""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import bgv as dbgv
from gpufhe_tpu.golden import bgv as gbgv
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset


@pytest.fixture(scope="module")
def stack():
    params = preset("bgv_ci")
    ctx = make_context(params)
    chest = dbgv.keygen(params, np.random.default_rng(7), rotations=(1, 2, 5))
    return params, ctx, chest


def _enc_both(params, ctx, chest, z, seed):
    pt = gbgv.encode(z, params)
    ct_dev = dbgv.encrypt(pt, params, chest.device_pk, ctx, np.random.default_rng(seed))
    ct_gold = gbgv.encrypt(pt, params, chest.pk, np.random.default_rng(seed))
    return ct_dev, ct_gold


def _assert_equal(ct_dev, ct_gold):
    assert ct_dev.level == ct_gold.level
    assert ct_dev.pt_factor == ct_gold.pt_factor
    for d, g in zip(ct_dev.c, ct_gold.c):
        assert (np.asarray(d).astype(np.int64) == g).all()


def test_bgv_encrypt_decrypt_exact(stack):
    params, ctx, chest = stack
    t = params.plain_modulus
    z = np.random.default_rng(0).integers(0, t, size=params.n)
    ct_dev, ct_gold = _enc_both(params, ctx, chest, z, seed=11)
    _assert_equal(ct_dev, ct_gold)
    assert (dbgv.decrypt_decode(ct_dev, params, chest.device_sk, ctx) == z % t).all()


def test_bgv_add_mul_plain_exact(stack):
    params, ctx, chest = stack
    t = params.plain_modulus
    rng = np.random.default_rng(1)
    za = rng.integers(0, t, size=params.n)
    zb = rng.integers(0, t, size=params.n)
    a_dev, a_gold = _enc_both(params, ctx, chest, za, seed=21)
    b_dev, b_gold = _enc_both(params, ctx, chest, zb, seed=22)

    s_dev = dbgv.ct_add(a_dev, b_dev, ctx)
    _assert_equal(s_dev, gbgv.ct_add(a_gold, b_gold, params))
    assert (dbgv.decrypt_decode(s_dev, params, chest.device_sk, ctx) == (za + zb) % t).all()

    pt_b = gbgv.encode(zb, params)
    mp_dev = dbgv.ct_mul_plain(
        a_dev, dbgv.plaintext_to_device(pt_b, params, ctx, a_dev.level), ctx
    )
    _assert_equal(mp_dev, gbgv.ct_mul_plain(a_gold, pt_b, params))
    assert (dbgv.decrypt_decode(mp_dev, params, chest.device_sk, ctx) == za * zb % t).all()


def test_bgv_mult_relin_modswitch_limb_trace(stack):
    params, ctx, chest = stack
    t = params.plain_modulus
    rng = np.random.default_rng(2)
    za = rng.integers(0, t, size=params.n)
    zb = rng.integers(0, t, size=params.n)
    a_dev, a_gold = _enc_both(params, ctx, chest, za, seed=31)
    b_dev, b_gold = _enc_both(params, ctx, chest, zb, seed=32)

    t_dev = dbgv.ct_tensor(a_dev, b_dev, params, ctx)
    t_gold = gbgv.ct_tensor(a_gold, b_gold, params)
    _assert_equal(t_dev, t_gold)

    r_dev = dbgv.ct_relinearize(t_dev, params, ctx, chest.device_rlk)
    r_gold = gbgv.ct_relinearize(t_gold, params, chest.rlk)
    _assert_equal(r_dev, r_gold)

    m_dev = dbgv.ct_modswitch(r_dev, params, ctx)
    m_gold = gbgv.ct_modswitch(r_gold, params)
    _assert_equal(m_dev, m_gold)

    assert (dbgv.decrypt_decode(m_dev, params, chest.device_sk, ctx) == za * zb % t).all()

    # chained second multiply stays exact
    m2_dev = dbgv.ct_mul(m_dev, m_dev, params, ctx, chest.device_rlk)
    m2_gold = gbgv.ct_mul(m_gold, m_gold, params, chest.rlk)
    _assert_equal(m2_dev, m2_gold)
    want = (za * zb % t) ** 2 % t
    assert (dbgv.decrypt_decode(m2_dev, params, chest.device_sk, ctx) == want).all()


def test_bgv_rotation_exact(stack):
    params, ctx, chest = stack
    t = params.plain_modulus
    z = np.random.default_rng(3).integers(0, t, size=params.n)
    ct_dev, ct_gold = _enc_both(params, ctx, chest, z, seed=41)

    rot_dev = dbgv.ct_rotate(ct_dev, 1, params, ctx, chest.galois[1][1])
    rot_gold = gbgv.ct_rotate(ct_gold, 1, params, chest.galois[1][0])
    _assert_equal(rot_dev, rot_gold)

    perm = gbgv.slot_rotation_perm(params, 1)
    assert (
        dbgv.decrypt_decode(rot_dev, params, chest.device_sk, ctx) == (z % t)[perm]
    ).all()


def test_bgv_rotate_hoisted_parity(stack):
    """Hoisted fan == per-step rotations, device == golden (bit-exact)."""
    params, ctx, chest = stack
    t = params.plain_modulus
    z = np.random.default_rng(4).integers(0, t, size=params.n)
    ct_dev, ct_gold = _enc_both(params, ctx, chest, z, seed=51)

    steps = [1, 2, 5]
    gks_g = {s: chest.galois[s][0] for s in steps}
    gks_d = {s: chest.galois[s][1] for s in steps}
    outs_g = gbgv.ct_rotate_hoisted(ct_gold, steps, params, gks_g)
    outs_d = dbgv.ct_rotate_hoisted(ct_dev, steps, params, ctx, gks_d)
    for s, og, od in zip(steps, outs_g, outs_d):
        # device mirrors golden bit-exactly; vs the NON-hoisted rotation the
        # limbs differ (the approximate ModUp sees the automorphism on the
        # other side of the base conversion) but decryption is identical.
        _assert_equal(od, og)
        perm = gbgv.slot_rotation_perm(params, s)
        assert (
            dbgv.decrypt_decode(od, params, chest.device_sk, ctx) == (z % t)[perm]
        ).all()


def test_bgv_slot_orbit_rings(stack):
    """In orbit order, rotation by s is a plain left-roll of each ring."""
    params, ctx, chest = stack
    t = params.plain_modulus
    rings = gbgv.slot_orbit_rings(params)
    assert rings.shape == (2, params.n // 2)
    assert sorted(rings.reshape(-1).tolist()) == list(range(params.n))
    z = np.random.default_rng(5).integers(0, t, size=params.n)
    for s in (1, 2, 5):
        perm = gbgv.slot_rotation_perm(params, s)
        rot = (z % t)[perm]
        for r in range(2):
            assert (rot[rings[r]] == np.roll(z[rings[r]] % t, -s)).all()


def test_bgv_backend_matvec_exact():
    """linalg BSGS matmul on BGV backends: exact A @ v mod t, device ==
    golden limb-for-limb (VERDICT round-1 item 10)."""
    from gpufhe_tpu.ciphertext import linalg
    from gpufhe_tpu.ciphertext.bgv_backend import (
        BGVDeviceBackend,
        BGVGoldenBackend,
    )

    params = preset("bgv_tiny")
    ctx = make_context(params)
    n_s = params.slots
    rots = tuple(linalg.bsgs_rotations(n_s))
    chest = dbgv.keygen(params, np.random.default_rng(9), rotations=rots)
    t = params.plain_modulus

    rng = np.random.default_rng(6)
    a_mat = rng.integers(0, t, size=(n_s, n_s))
    v = rng.integers(0, t, size=(2, n_s))  # independent vector per ring

    g_be = BGVGoldenBackend(params, chest)
    d_be = BGVDeviceBackend(params, ctx, chest)
    rings = g_be.rings
    raw = np.empty(params.n, dtype=np.int64)
    raw[rings[0]], raw[rings[1]] = v[0], v[1]
    pt = gbgv.encode(raw, params)
    ct_g = gbgv.encrypt(pt, params, chest.pk, np.random.default_rng(61))
    ct_d = dbgv.encrypt(pt, params, chest.device_pk, ctx, np.random.default_rng(61))
    _assert_equal(ct_d, ct_g)

    out_g = linalg.matmul_plain(g_be, ct_g, a_mat)
    out_d = linalg.matmul_plain(d_be, ct_d, a_mat)
    _assert_equal(out_d, out_g)

    want = a_mat.astype(object) @ v.T.astype(object) % t  # [n_s, 2]
    got = d_be.decrypt_decode(out_d)  # [2, n_s]
    assert (got == want.T.astype(np.int64)).all()

    # add_plain: exact slot addition on both backends
    d = rng.integers(0, t, size=(2, n_s))
    s_g = g_be.add_plain(ct_g, d)
    s_d = d_be.add_plain(ct_d, d)
    _assert_equal(s_d, s_g)
    assert (d_be.decrypt_decode(s_d) == (v + d) % t).all()


def test_bgv_noise_budget():
    """noise_budget_bits decreases through the pipeline and stays positive
    through a full mul (decryption still exact)."""
    params = preset("bgv_tiny")
    rng = np.random.default_rng(91)
    sk, pk = gbgv.keygen(params, rng)
    rlk = gbgv.make_relin_key(params, sk, rng)
    t = params.plain_modulus
    m = np.random.default_rng(92).integers(0, t, size=params.n, dtype=np.int64)
    ct = gbgv.encrypt(gbgv.encode(m, params), params, pk, rng)
    fresh = gbgv.noise_budget_bits(ct, params, sk)
    prod = gbgv.ct_mul(ct, ct, params, rlk)
    after = gbgv.noise_budget_bits(prod, params, sk)
    assert fresh > after > 0, (fresh, after)
    assert (gbgv.decrypt_decode(prod, params, sk) == m * m % t).all()
