"""BGV <-> BFV scheme switching: exact scalar conversions, golden == device.

The two integer schemes share keys and packing; switching is one scalar
multiply per limb with a tracked message factor (golden/bfv.py docstring).
Pipelines may cross schemes mid-circuit: BGV linear algebra -> BFV
scale-invariant multiply -> decrypt, all exact mod t.
"""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import bfv as dbfv
from gpufhe_tpu.ciphertext import bgv as dbgv
from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.golden import bgv as gbgv
from gpufhe_tpu.params.params import preset, make_context


@pytest.fixture(scope="module")
def ctxt():
    params = preset("bgv_tiny")
    ctx = make_context(params)
    chest = dbgv.keygen(params, np.random.default_rng(31))
    return params, ctx, chest


def test_bgv_to_bfv_golden(ctxt):
    params, _, chest = ctxt
    t = params.plain_modulus
    m = np.random.default_rng(0).integers(0, t, size=params.n, dtype=np.int64)
    ct = gbgv.encrypt(gbgv.encode(m, params), params, chest.pk,
                      np.random.default_rng(1))
    out, factor = gbfv.bgv_to_bfv(ct, params)
    got = gbfv.decrypt(out, params, chest.sk) * pow(int(factor), -1, t) % t
    assert (gbfv.decode(got, params) == m).all()


def test_bgv_to_bfv_after_modswitch_golden(ctxt):
    """pt_factor != 1 (post-ModSwitch BGV) is folded into the factor."""
    params, _, chest = ctxt
    t = params.plain_modulus
    r = np.random.default_rng(2)
    m1 = r.integers(0, t, size=params.n, dtype=np.int64)
    m2 = r.integers(0, t, size=params.n, dtype=np.int64)
    c1 = gbgv.encrypt(gbgv.encode(m1, params), params, chest.pk,
                      np.random.default_rng(3))
    c2 = gbgv.encrypt(gbgv.encode(m2, params), params, chest.pk,
                      np.random.default_rng(4))
    prod = gbgv.ct_mul(c1, c2, params, chest.rlk)  # modswitched: pt_factor != 1
    assert prod.pt_factor != 1
    out, factor = gbfv.bgv_to_bfv(prod, params)
    got = gbfv.decrypt(out, params, chest.sk) * pow(int(factor), -1, t) % t
    assert (gbfv.decode(got, params) == m1 * m2 % t).all()


def test_bfv_to_bgv_golden(ctxt):
    params, _, chest = ctxt
    t = params.plain_modulus
    m = np.random.default_rng(5).integers(0, t, size=params.n, dtype=np.int64)
    ct = gbfv.encrypt(gbfv.encode(m, params), params, chest.pk,
                      np.random.default_rng(6))
    out = gbfv.bfv_to_bgv(ct, params)
    assert (gbgv.decrypt_decode(out, params, chest.sk) == m).all()
    # roundtrip back to BFV
    back, factor = gbfv.bgv_to_bfv(out, params)
    got = gbfv.decrypt(back, params, chest.sk) * pow(int(factor), -1, t) % t
    assert (gbfv.decode(got, params) == m).all()


def test_switch_device_parity(ctxt):
    params, ctx, chest = ctxt
    t = params.plain_modulus
    m = np.random.default_rng(7).integers(0, t, size=params.n, dtype=np.int64)
    pt = gbgv.encode(m, params)
    g = gbgv.encrypt(pt, params, chest.pk, np.random.default_rng(8))
    d = dbgv.encrypt(pt, params, chest.device_pk, ctx, np.random.default_rng(8))

    g_out, g_f = gbfv.bgv_to_bfv(g, params)
    d_out, d_f = dbfv.bgv_to_bfv(d, params, ctx)
    assert g_f == d_f
    for gc, dc in zip(g_out.c, d_out.c):
        assert (gc.astype(np.uint32) == np.asarray(dc)).all()

    g_back = gbfv.bfv_to_bgv(g_out, params)
    d_back = dbfv.bfv_to_bgv(d_out, params, ctx)
    assert g_back.pt_factor == d_back.pt_factor
    for gc, dc in zip(g_back.c, d_back.c):
        assert (gc.astype(np.uint32) == np.asarray(dc)).all()


def test_cross_scheme_pipeline_device(ctxt):
    """BGV plaintext matvec -> switch -> BFV ct-ct multiply, exact mod t.

    The BGV relin key works for the BFV multiply too (same secret; its t-
    scaled key error is still far below Delta), so ONE chest drives both."""
    from gpufhe_tpu.ciphertext import linalg
    from gpufhe_tpu.ciphertext.bgv_backend import BGVDeviceBackend

    params, ctx, _ = ctxt
    t = params.plain_modulus
    n_s = params.slots
    rots = tuple(linalg.bsgs_rotations(n_s))
    chest = dbgv.keygen(params, np.random.default_rng(40), rotations=rots)
    be = BGVDeviceBackend(params, ctx, chest)

    rng = np.random.default_rng(41)
    a_mat = rng.integers(0, t, size=(n_s, n_s))
    v = rng.integers(0, t, size=n_s)
    raw = np.empty(params.n, dtype=np.int64)
    raw[be.rings[0]] = v
    raw[be.rings[1]] = v
    ct = dbgv.encrypt(gbgv.encode(raw, params), params, chest.device_pk, ctx,
                      np.random.default_rng(42))
    av = linalg.matmul_plain(be, ct, a_mat)  # BGV BSGS matvec

    bfv_ct, factor = dbfv.bgv_to_bfv(av, params, ctx)
    # square it under BFV (scale-invariant; BGV rlk shares the secret)
    sq = dbfv.ct_mul(bfv_ct, bfv_ct, params, ctx, chest.device_rlk)
    got_raw = dbfv.decrypt(sq, params, chest.device_sk, ctx)
    corr = pow(int(factor), -2, t)  # squaring squares the message factor
    got = gbfv.decode(got_raw * corr % t, params)[be.rings]
    want_av = a_mat.astype(object) @ v.astype(object) % t
    want = (want_av * want_av % t).astype(np.int64)
    assert (got[0] == want).all() and (got[1] == want).all()
