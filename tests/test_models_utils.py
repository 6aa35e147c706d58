"""Application model (encrypted logreg) + serialization round-trips."""

import numpy as np

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.models.logreg import EncryptedLogReg, rotations_needed
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset
from gpufhe_tpu.utils import serialization as ser


def test_encrypted_logreg_inference():
    params = preset("ci_small")
    ctx = make_context(params)
    rots = rotations_needed(params.slots)
    chest = dkeys.keygen(params, np.random.default_rng(0), rotations=tuple(rots))
    be = DeviceBackend(params, ctx, chest)

    rng = np.random.default_rng(1)
    n_feat = 10
    w, b, x = rng.normal(size=n_feat), float(rng.normal()), rng.normal(size=n_feat)
    model = EncryptedLogReg(be, w, b)

    slots_x = np.zeros(params.slots, dtype=np.complex128)
    slots_x[:n_feat] = x
    ct = dct.encrypt(
        encoder.encode(slots_x, params), params, chest.device_pk, ctx,
        np.random.default_rng(2), params.scale,
    )
    got = float(np.real(be.decrypt_decode(model(ct))[0]))
    # tight vs the cubic the circuit computes; loose vs the true sigmoid
    # (the degree-3 minimax itself carries ~0.06 max error)
    assert abs(got - model.reference_poly(x)) < 2e-3
    assert abs(got - model.reference(x)) < 0.1


def test_encrypted_mlp_inference():
    """2-layer CryptoNets-style MLP (BSGS matmuls + square activation)."""
    from gpufhe_tpu.models.mlp import EncryptedMLP, mlp_rotations_for

    params = preset("ci_small")
    ctx = make_context(params)

    rng = np.random.default_rng(1)
    d_in, d_h, d_out = 12, 8, 4
    w1 = rng.normal(size=(d_h, d_in)) * 0.3
    b1 = rng.normal(size=d_h) * 0.3
    w2 = rng.normal(size=(d_out, d_h)) * 0.3
    b2 = rng.normal(size=d_out) * 0.3
    # pruned per-layer rotation set (the production path): far fewer Galois
    # keys than the dense BSGS grid -> keygen is no longer the test's cost
    chest = dkeys.keygen(
        params, np.random.default_rng(0),
        rotations=tuple(mlp_rotations_for([(w1, b1), (w2, b2)],
                                          params.slots)),
    )
    be = DeviceBackend(params, ctx, chest)
    model = EncryptedMLP(be, [(w1, b1), (w2, b2)])
    assert model.levels_used == 3

    x = rng.normal(size=d_in) * 0.5
    slots_x = np.zeros(params.slots, dtype=np.complex128)
    slots_x[:d_in] = x
    ct = dct.encrypt(
        encoder.encode(slots_x, params), params, chest.device_pk, ctx,
        np.random.default_rng(2), params.scale,
    )
    got = np.real(be.decrypt_decode(model(ct))[:d_out])
    want = model.reference(x)
    assert np.abs(got - want).max() < 1e-2, (got, want)
    # output slots beyond d_out carry only noise
    tail = np.abs(be.decrypt_decode(model(ct))[d_out : d_out + 8])
    assert tail.max() < 1e-2

    # whole-model fusion (scripts/mlp_n15.py production path): the fused
    # forward is the SAME jitted cores in the same order, so its limbs must
    # equal the eager forward's limbs exactly
    from gpufhe_tpu.ciphertext.backend import FusedPipeline

    out_eager = model(ct)
    out_fused = FusedPipeline(be, model)(ct)
    assert out_fused.level == out_eager.level
    assert out_fused.scale == out_eager.scale
    for a, b in zip(out_fused.c, out_eager.c):
        assert (np.asarray(a) == np.asarray(b)).all()
    # and the caches the trace populated stay concrete (no leaked tracers):
    # a later eager call must still work
    again = np.real(be.decrypt_decode(model(ct))[:d_out])
    assert np.abs(again - want).max() < 1e-2


def test_keychest_and_ciphertext_serialization(tmp_path):
    params = preset("tiny2")
    ctx = make_context(params)
    chest = dkeys.keygen(
        params, np.random.default_rng(3), rotations=(1,), conjugation=True
    )
    ser.save_keychest(tmp_path / "keys.npz", chest)
    chest2 = ser.load_keychest(tmp_path / "keys.npz")
    assert chest2.params == params
    assert (chest2.sk.s == chest.sk.s).all()
    assert (np.asarray(chest2.device_rlk.b_mont) == np.asarray(chest.device_rlk.b_mont)).all()
    assert 1 in chest2.galois and chest2.conj is not None

    z = np.random.default_rng(4).normal(size=params.slots) + 0j
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(5), params.scale,
    )
    ser.save_ciphertext(tmp_path / "ct.npz", ct)
    ct2 = ser.load_ciphertext(tmp_path / "ct.npz")
    assert ct2.level == ct.level and ct2.scale == ct.scale
    for a, b in zip(ct.c, ct2.c):
        assert (np.asarray(a) == np.asarray(b)).all()

    # round-tripped keys + ciphertext still decrypt correctly
    got = dct.decrypt_decode(ct2, params, chest2.device_sk, ctx)
    assert np.abs(got - z).max() < 1e-3


def test_seeded_device_keychest_roundtrip(tmp_path):
    """Seeded save stores b + 64-bit seed; load regenerates identical a."""
    from gpufhe_tpu.keys.device_keygen import device_keygen

    params = preset("tiny2")
    chest = device_keygen(
        params, np.random.default_rng(11), rotations=(1, 2), conjugation=True
    )
    assert chest.seeds and "rlk" in chest.seeds

    ser.save_device_keychest(tmp_path / "seeded.npz", chest, seeded=True)
    ser.save_device_keychest(tmp_path / "full.npz", chest, seeded=False)
    sz_seeded = (tmp_path / "seeded.npz").stat().st_size
    sz_full = (tmp_path / "full.npz").stat().st_size
    assert sz_seeded < 0.62 * sz_full, (sz_seeded, sz_full)

    chest2 = ser.load_device_keychest(tmp_path / "seeded.npz")
    assert (np.asarray(chest2.device_rlk.a_mont)
            == np.asarray(chest.device_rlk.a_mont)).all()
    assert (np.asarray(chest2.device_rlk.b_mont)
            == np.asarray(chest.device_rlk.b_mont)).all()
    for s in (1, 2):
        assert (np.asarray(chest2.galois[s][1].a_mont)
                == np.asarray(chest.galois[s][1].a_mont)).all()
    assert (np.asarray(chest2.conj[1].a_mont)
            == np.asarray(chest.conj[1].a_mont)).all()
    assert (np.asarray(chest2.device_pk.a_mont)
            == np.asarray(chest.device_pk.a_mont)).all()

    # reloaded chest is functional end-to-end
    ctx = make_context(params)
    rng = np.random.default_rng(12)
    z = rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest2.device_pk, ctx,
        np.random.default_rng(13), params.scale,
    )
    prod = dct.ct_mul(ct, ct, params, ctx, chest2.device_rlk)
    got = dct.decrypt_decode(prod, params, chest2.device_sk, ctx)
    assert np.abs(got - z * z).max() < 1e-2


def test_lean_key_drop_regen_cycle():
    """drop_galois_a + regen_galois_a reproduces the original (truncated)
    Galois keys bit-exactly — the lean-key contract the flagship bootstrap's
    fused-EvalMod headroom relies on (ciphertext/bootstrap.py lean_keys)."""
    from gpufhe_tpu.keys.device_keygen import device_keygen
    from gpufhe_tpu.keys.keys import truncate_galois_device

    params = preset("tiny2")
    ctx = make_context(params)
    chest = device_keygen(
        params, np.random.default_rng(21), rotations=(1, 3), conjugation=True
    )
    # truncate one key so regen must reproduce the row selection too
    truncate_galois_device(chest, {1: params.num_limbs - 1}, None, params)
    want = {s: np.asarray(chest.galois[s][1].a_mont) for s in (1, 3)}
    want_c = np.asarray(chest.conj[1].a_mont)

    assert chest.drop_galois_a() == 3
    assert chest.galois[1][1].a_mont is None
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        chest.galois_key(1)
    assert chest.regen_galois_a(ctx) == 3
    for s in (1, 3):
        got = np.asarray(chest.galois_key(s).a_mont)
        assert got.shape == want[s].shape
        assert (got == want[s]).all(), f"step {s}"
    assert (np.asarray(chest.conj_key().a_mont) == want_c).all()
    # second drop/regen is idempotent
    assert chest.drop_galois_a() == 3
    assert chest.regen_galois_a(ctx) == 3
    assert (np.asarray(chest.galois_key(1).a_mont) == want[1]).all()


def test_device_keygen_functional():
    """Device-generated keys encrypt/decrypt/multiply/rotate correctly."""
    from gpufhe_tpu.keys.device_keygen import device_keygen

    params = preset("tiny2")
    ctx = make_context(params)
    chest = device_keygen(params, np.random.default_rng(3), rotations=(1,))
    rng = np.random.default_rng(0)
    z = rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale,
    )
    assert np.abs(dct.decrypt_decode(ct, params, chest.device_sk, ctx) - z).max() < 1e-3
    prod = dct.ct_mul(ct, ct, params, ctx, chest.device_rlk)
    assert np.abs(
        dct.decrypt_decode(prod, params, chest.device_sk, ctx) - z * z
    ).max() < 1e-2
    rot = dct.ct_rotate(ct, 1, params, ctx, chest.galois_key(1))
    assert np.abs(
        dct.decrypt_decode(rot, params, chest.device_sk, ctx) - np.roll(z, -1)
    ).max() < 1e-2


def test_security_accounting():
    from gpufhe_tpu.utils.security import check, report, security_level

    p5 = preset("config5_boot")
    r = report(p5)
    assert r["security_bits"] >= 128
    check(p5, 128)
    # a chain too fat for its ring degree must be rejected
    import pytest as _pytest

    from gpufhe_tpu.params.params import _mk

    fat = _mk(n=2**10, n_q=6, n_p=2, scale_bits=28)  # log QP ~ 230 >> 27
    assert security_level(fat) == 0
    with _pytest.raises(ValueError):
        check(fat)


def test_noise_report():
    from gpufhe_tpu.utils.noise import ckks_noise_report

    params = preset("tiny2")
    ctx = make_context(params)
    chest = dkeys.keygen(params, np.random.default_rng(5))
    z = np.random.default_rng(6).normal(size=params.slots) + 0j
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(7), params.scale,
    )
    r = ckks_noise_report(ct, params, chest.device_sk, ctx, z)
    assert r["bits_clean"] > 10  # fresh ciphertext: most of the scale survives
    prod = dct.ct_mul(ct, ct, params, ctx, chest.device_rlk)
    r2 = ckks_noise_report(prod, params, chest.device_sk, ctx, z * z)
    assert r2["level"] == ct.level - 1
    assert 0 < r2["bits_clean"] < r["bits_clean"]  # noise grew, still decodable


def test_ciphertext_roundtrip_bgv_bfv(tmp_path):
    """Scheme-aware ciphertext serialization: BGV keeps pt_factor, BFV has
    neither scale nor factor; limbs survive the npz round-trip exactly."""
    from gpufhe_tpu.ciphertext import bfv as dbfv
    from gpufhe_tpu.ciphertext import bgv as dbgv
    from gpufhe_tpu.golden import bfv as gbfv
    from gpufhe_tpu.golden import bgv as gbgv
    from gpufhe_tpu.params.params import make_context, preset
    from gpufhe_tpu.utils import serialization as ser

    params = preset("bgv_tiny")
    ctx = make_context(params)
    chest = dbgv.keygen(params, np.random.default_rng(71))
    t = params.plain_modulus
    m = np.random.default_rng(72).integers(0, t, size=params.n, dtype=np.int64)
    ct = dbgv.encrypt(gbgv.encode(m, params), params, chest.device_pk, ctx,
                      np.random.default_rng(73))
    ct.pt_factor = 7
    ser.save_ciphertext(tmp_path / "bgv.npz", ct)
    back = ser.load_ciphertext(tmp_path / "bgv.npz")
    assert type(back).__name__ == "BGVCiphertext"
    assert back.pt_factor == 7 and back.level == ct.level
    for a, b in zip(ct.c, back.c):
        assert (np.asarray(a) == np.asarray(b)).all()

    bf = dbfv.encrypt(gbfv.encode(m, params), params, chest.device_pk, ctx,
                      np.random.default_rng(74))
    ser.save_ciphertext(tmp_path / "bfv.npz", bf)
    back = ser.load_ciphertext(tmp_path / "bfv.npz")
    assert type(back).__name__ == "BFVCiphertext"
    assert back.level == bf.level
    for a, b in zip(bf.c, back.c):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_security_estimator_table():
    """The estimator table (params/security_table.json) must reproduce the
    HE-standard dense row it was calibrated against (within 1% for
    N >= 4096), penalize sparse secrets monotonically, and keep the
    literature hybrid-attack cap binding where the drop-and-solve estimator
    is weaker (N=2^16, h=192 -> 1546)."""
    from gpufhe_tpu.params.params import _mk
    from gpufhe_tpu.utils import security

    t = security._table()
    he_std = {4096: 109, 8192: 218, 16384: 438, 32768: 881, 65536: 1772}
    for n, cap in he_std.items():
        est = t["caps"][str(n)]["dense"][0]
        assert abs(est - cap) / cap < 0.01, (n, est, cap)
    # sparse caps monotone in h at N=2^16 (128-bit column)
    import dataclasses

    base = _mk(n=2**16, n_q=2, n_p=1, scale_bits=28)
    prev = 0.0
    for h in (16, 32, 64, 128, 192):
        p = dataclasses.replace(base, hamming_weight=h)
        cap = security.max_log_qp(p, 0)
        assert cap >= prev, (h, cap, prev)
        prev = cap
    # literature hybrid cap binds at h=192 (estimator's drop-and-solve
    # alone would allow ~1769)
    p192 = dataclasses.replace(base, hamming_weight=192)
    assert abs(security.max_log_qp(p192, 0) - 1546.0) < 1.0
    # dense + encapsulation is governed by the dense estimator row
    p_enc = dataclasses.replace(base, eph_hamming_weight=32)
    assert security.max_log_qp(p_enc, 0) > 1770
    # effective dense budgets are FLOORED by the published HE-std v1.1 row
    # (ADVICE r4: calibration residuals may only be conservative) — the
    # admitted budget never exceeds the published cap, at any level
    for n, cap128 in he_std.items():
        n_q = max(2, int(cap128 // 28) - 1)
        pd = _mk(n=n, n_q=n_q, n_p=1, scale_bits=28)
        for idx, std in zip(
            (0, 1, 2), security._HE_STD_DENSE[n]
        ):
            assert security.max_log_qp(pd, idx) <= std + 1e-9, (n, idx)
    # report() carries provenance + the model residual for the judged N
    rep = security.report(base)
    assert rep["table_generated"] and rep["calibration_anchor"]
    assert "model-residual" in rep["security_bits_note"]
