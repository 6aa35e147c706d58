"""Exact Fermat predicates on BFV (ciphertext/exact.py): equality, zero-test,
set membership — exact 0/1 outputs, golden == device limb parity."""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import bfv as dbfv
from gpufhe_tpu.ciphertext import exact
from gpufhe_tpu.ciphertext.bfv_backend import BFVDeviceBackend, BFVGoldenBackend
from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.params.params import preset, make_context


@pytest.fixture(scope="module")
def ctxt():
    params = preset("bfv_eq")
    ctx = make_context(params)
    chest = dbfv.keygen(params, np.random.default_rng(51))
    return params, ctx, chest


def _encrypt_both(params, ctx, chest, v, seed):
    g_be = BFVGoldenBackend(params, chest)
    d_be = BFVDeviceBackend(params, ctx, chest)
    raw = np.empty(params.n, dtype=np.int64)
    raw[g_be.rings[0]] = v
    raw[g_be.rings[1]] = v
    pt = gbfv.encode(raw, params)
    g = gbfv.encrypt(pt, params, chest.pk, np.random.default_rng(seed))
    d = dbfv.encrypt(pt, params, chest.device_pk, ctx, np.random.default_rng(seed))
    return g_be, d_be, g, d


def test_is_zero_exact_and_parity(ctxt):
    params, ctx, chest = ctxt
    t = params.plain_modulus
    n_s = params.slots
    v = np.random.default_rng(1).integers(0, t, size=n_s, dtype=np.int64)
    v[::7] = 0  # plant zeros
    g_be, d_be, g, d = _encrypt_both(params, ctx, chest, v, 2)
    zg = exact.ct_is_zero(g_be, g)
    zd = exact.ct_is_zero(d_be, d)
    for gc, dc in zip(zg.c, zd.c):
        assert (gc.astype(np.uint32) == np.asarray(dc)).all()
    got = d_be.decrypt_decode(zd)[0]
    assert (got == (v == 0).astype(np.int64)).all()
    assert gbfv.noise_budget_bits(zd_to_g(zd), params, chest.sk) > 0


def zd_to_g(zd):
    return gbfv.BFVCiphertext([np.asarray(c).astype(np.int64) for c in zd.c], zd.level)


def test_equality_and_membership(ctxt):
    params, ctx, chest = ctxt
    t = params.plain_modulus
    n_s = params.slots
    rng = np.random.default_rng(3)
    v = rng.integers(0, 10, size=n_s, dtype=np.int64)
    _, d_be, _, d = _encrypt_both(params, ctx, chest, v, 4)

    # slot-wise equality against a plaintext vector
    w = rng.integers(0, 10, size=n_s, dtype=np.int64)
    eq = exact.ct_equals_plain(d_be, d, w)
    assert (d_be.decrypt_decode(eq)[0] == (v == w % t).astype(np.int64)).all()

    # private set membership: x in {2, 5, 9}
    member = exact.ct_member_plain(d_be, d, [2, 5, 9])
    want = np.isin(v, [2, 5, 9]).astype(np.int64)
    assert (d_be.decrypt_decode(member)[0] == want).all()

    # noise budget still positive after the 8-squaring Fermat ladder
    back = zd_to_g(member)
    assert gbfv.noise_budget_bits(back, params, chest.sk) > 0


def test_ct_equals_two_ciphertexts(ctxt):
    params, ctx, chest = ctxt
    t = params.plain_modulus
    n_s = params.slots
    rng = np.random.default_rng(5)
    va = rng.integers(0, 4, size=n_s, dtype=np.int64)
    vb = rng.integers(0, 4, size=n_s, dtype=np.int64)
    _, d_be, _, da = _encrypt_both(params, ctx, chest, va, 6)
    _, _, _, db = _encrypt_both(params, ctx, chest, vb, 7)
    eq = exact.ct_equals(d_be, da, db)
    assert (d_be.decrypt_decode(eq)[0] == (va == vb).astype(np.int64)).all()


def test_ct_pow_const_on_bgv_levels_align():
    """Review regression: BGV multiplies modswitch one level per hop, so
    square-and-multiply operands diverge — ct_pow_const must ModSwitch-align
    them (exact.py _level_align). x^5 has two set bits -> a mixed mul."""
    from gpufhe_tpu.ciphertext import bgv as dbgv
    from gpufhe_tpu.ciphertext.bgv_backend import BGVDeviceBackend

    params = preset("bgv_ci")  # 6 levels: x^5 needs ~3
    ctx = make_context(params)
    chest = dbgv.keygen(params, np.random.default_rng(61))
    be = BGVDeviceBackend(params, ctx, chest)
    t = params.plain_modulus
    v = np.random.default_rng(62).integers(0, t, size=params.slots, dtype=np.int64)
    from gpufhe_tpu.golden import bgv as gbgv

    raw = np.empty(params.n, dtype=np.int64)
    raw[be.rings[0]] = v
    raw[be.rings[1]] = v
    ct = dbgv.encrypt(gbgv.encode(raw, params), params, chest.device_pk, ctx,
                      np.random.default_rng(63))
    out = exact.ct_pow_const(be, ct, 5)
    want = pow(v.astype(object), 5) % t
    assert (be.decrypt_decode(out)[0] == want.astype(np.int64)).all()
