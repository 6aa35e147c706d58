"""Device RNS-BFV vs golden: bit-exact ciphertext-limb parity.

Every device op mirrors golden/bfv.py operation-for-operation (same
approximate-conversion choices, same reduction order), so limbs compare with
`==` — including through the whole scale-invariant multiply
(iNTT -> aux extension -> tensor -> t/Q scaling -> S-K return -> relin).
"""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import bfv as dbfv
from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.params.params import preset, make_context


@pytest.fixture(scope="module")
def ctxt():
    params = preset("bfv_tiny")
    ctx = make_context(params)
    chest = dbfv.keygen(params, np.random.default_rng(21), rotations=(1, 3))
    return params, ctx, chest


def _pair(params, ctx, chest, seed):
    """(golden ct, device ct) encrypting the same message with the same rng."""
    t = params.plain_modulus
    m = np.random.default_rng(seed).integers(0, t, size=params.n, dtype=np.int64)
    pt = gbfv.encode(m, params)
    g = gbfv.encrypt(pt, params, chest.pk, np.random.default_rng(seed + 100))
    d = dbfv.encrypt(pt, params, chest.device_pk, ctx, np.random.default_rng(seed + 100))
    return m, g, d


def _assert_limbs(g, d):
    assert g.level == d.level
    assert len(g.c) == len(d.c)
    for gc, dc in zip(g.c, d.c):
        assert (gc.astype(np.uint32) == np.asarray(dc)).all()


def test_encrypt_decrypt_parity(ctxt):
    params, ctx, chest = ctxt
    m, g, d = _pair(params, ctx, chest, 0)
    _assert_limbs(g, d)
    assert (dbfv.decrypt_decode(d, params, chest.device_sk, ctx)
            == gbfv.decrypt_decode(g, params, chest.sk)).all()
    assert (dbfv.decrypt_decode(d, params, chest.device_sk, ctx) == m).all()


def test_linear_ops_parity(ctxt):
    params, ctx, chest = ctxt
    t = params.plain_modulus
    m1, g1, d1 = _pair(params, ctx, chest, 1)
    m2, g2, d2 = _pair(params, ctx, chest, 2)
    _assert_limbs(gbfv.ct_add(g1, g2, params), dbfv.ct_add(d1, d2, ctx))
    _assert_limbs(gbfv.ct_sub(g1, g2, params), dbfv.ct_sub(d1, d2, ctx))
    pt2 = gbfv.encode(m2, params)
    _assert_limbs(
        gbfv.ct_mul_plain(g1, pt2, params),
        dbfv.ct_mul_plain(
            d1, dbfv.plaintext_to_device(pt2, params, ctx, d1.level), ctx
        ),
    )
    ga = gbfv.ct_add_plain(g1, pt2, params)
    da = dbfv.ct_add_plain(d1, pt2, params, ctx)
    _assert_limbs(ga, da)
    assert (dbfv.decrypt_decode(da, params, chest.device_sk, ctx)
            == (m1 + m2) % t).all()


def test_mul_parity(ctxt):
    """The full scale-invariant multiply + relinearization, limb-exact."""
    params, ctx, chest = ctxt
    t = params.plain_modulus
    m1, g1, d1 = _pair(params, ctx, chest, 3)
    m2, g2, d2 = _pair(params, ctx, chest, 4)
    gt = gbfv.ct_tensor(g1, g2, params)
    dt = dbfv.ct_tensor(d1, d2, params, ctx)
    _assert_limbs(gt, dt)
    gr = gbfv.ct_relinearize(gt, params, chest.rlk)
    dr = dbfv.ct_relinearize(dt, params, ctx, chest.device_rlk)
    _assert_limbs(gr, dr)
    assert (dbfv.decrypt_decode(dr, params, chest.device_sk, ctx)
            == m1 * m2 % t).all()
    # second hop on the product (3-mult chains are the golden-suite depth)
    m3, g3, d3 = _pair(params, ctx, chest, 5)
    gr2 = gbfv.ct_mul(gr, g3, params, chest.rlk)
    dr2 = dbfv.ct_mul(dr, d3, params, ctx, chest.device_rlk)
    _assert_limbs(gr2, dr2)
    assert (dbfv.decrypt_decode(dr2, params, chest.device_sk, ctx)
            == m1 * m2 * m3 % t).all()


def test_mod_reduce_parity(ctxt):
    params, ctx, chest = ctxt
    t = params.plain_modulus
    m1, g1, d1 = _pair(params, ctx, chest, 6)
    m2, g2, d2 = _pair(params, ctx, chest, 7)
    gp = gbfv.ct_mul(g1, g2, params, chest.rlk)
    dp = dbfv.ct_mul(d1, d2, params, ctx, chest.device_rlk)
    gm = gbfv.ct_mod_reduce(gp, params)
    dm = dbfv.ct_mod_reduce(dp, params, ctx)
    _assert_limbs(gm, dm)
    assert (dbfv.decrypt_decode(dm, params, chest.device_sk, ctx)
            == m1 * m2 % t).all()


def test_rotation_parity(ctxt):
    params, ctx, chest = ctxt
    m, g, d = _pair(params, ctx, chest, 8)
    for steps in (1, 3):
        gk, dgk = chest.galois[steps]
        gr = gbfv.ct_rotate(g, steps, params, gk)
        dr = dbfv.ct_rotate(d, steps, params, ctx, dgk)
        _assert_limbs(gr, dr)
        perm = gbfv.slot_rotation_perm(params, steps)
        assert (dbfv.decrypt_decode(dr, params, chest.device_sk, ctx)
                == m[perm]).all()


def test_rotation_hoisted_parity(ctxt):
    params, ctx, chest = ctxt
    m, g, d = _pair(params, ctx, chest, 9)
    steps_list = [1, 3]
    g_outs = gbfv.ct_rotate_hoisted(
        g, steps_list, params, {s: chest.galois[s][0] for s in steps_list}
    )
    d_outs = dbfv.ct_rotate_hoisted(
        d, steps_list, params, ctx, {s: chest.galois[s][1] for s in steps_list}
    )
    for go, do in zip(g_outs, d_outs):
        _assert_limbs(go, do)


def test_bfv_backend_matvec_exact():
    """linalg BSGS matmul on BFV backends: exact A @ v mod t, device ==
    golden limb-for-limb (scale-invariant counterpart of the BGV test)."""
    from gpufhe_tpu.ciphertext import linalg
    from gpufhe_tpu.ciphertext.bfv_backend import (
        BFVDeviceBackend,
        BFVGoldenBackend,
    )

    params = preset("bfv_tiny")
    ctx = make_context(params)
    n_s = params.slots
    rots = tuple(linalg.bsgs_rotations(n_s))
    chest = dbfv.keygen(params, np.random.default_rng(9), rotations=rots)
    t = params.plain_modulus

    rng = np.random.default_rng(6)
    a_mat = rng.integers(0, t, size=(n_s, n_s))
    v = rng.integers(0, t, size=(2, n_s))  # independent vector per ring

    g_be = BFVGoldenBackend(params, chest)
    d_be = BFVDeviceBackend(params, ctx, chest)
    rings = g_be.rings
    raw = np.empty(params.n, dtype=np.int64)
    raw[rings[0]], raw[rings[1]] = v[0], v[1]
    pt = gbfv.encode(raw, params)
    ct_g = gbfv.encrypt(pt, params, chest.pk, np.random.default_rng(61))
    ct_d = dbfv.encrypt(pt, params, chest.device_pk, ctx, np.random.default_rng(61))
    _assert_limbs(ct_g, ct_d)

    out_g = linalg.matmul_plain(g_be, ct_g, a_mat)
    out_d = linalg.matmul_plain(d_be, ct_d, a_mat)
    _assert_limbs(out_g, out_d)

    want = a_mat.astype(object) @ v.T.astype(object) % t  # [n_s, 2]
    got = d_be.decrypt_decode(out_d)  # [2, n_s]
    assert (got == want.T.astype(np.int64)).all()

    # add_plain: exact slot addition on both backends
    d = rng.integers(0, t, size=(2, n_s))
    s_g = g_be.add_plain(ct_g, d)
    s_d = d_be.add_plain(ct_d, d)
    _assert_limbs(s_g, s_d)
    assert (d_be.decrypt_decode(s_d) == (v + d) % t).all()

    # ct-ct multiply through the backend surface, then a modulus reduction
    prod_g = g_be.rescale(g_be.mul(ct_g, ct_g))
    prod_d = d_be.rescale(d_be.mul(ct_d, ct_d))
    _assert_limbs(prod_g, prod_d)
    assert (d_be.decrypt_decode(prod_d) == v * v % t).all()
