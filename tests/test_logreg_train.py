"""Encrypted logistic-regression training (models/logreg_train.py).

Fast test: one full gradient-descent step on encrypted data + encrypted
weights matches the cleartext mirror of the same circuit. Slow test: deeper
training than the chain supports — weights bootstrap mid-training
(refresh=) and the trajectory still tracks cleartext GD.
"""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.models.logreg_train import EncryptedLogRegTrainer, train_rotations
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset


def _setup(preset_name, extra_rots=(), conjugation=False):
    params = preset(preset_name)
    ctx = make_context(params)
    rots = sorted(set(train_rotations(params.slots)) | set(extra_rots))
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots),
        conjugation=conjugation,
    )
    return params, ctx, chest, DeviceBackend(params, ctx, chest)


def _dataset(rng, m, f):
    x = rng.normal(size=(m, f))
    true_w = rng.normal(size=f)
    y = (x @ true_w > 0).astype(np.float64)
    return x, y


def _encrypt_cols(be, params, chest, ctx, tr, x, y, w0, level):
    enc = lambda v, lv, seed: dct.encrypt(
        encoder.encode(tr.slot_vec(v), params), params, chest.device_pk, ctx,
        np.random.default_rng(seed), params.scale, level=lv,
    )
    full = params.num_limbs
    x_cts = [enc(x[:, j], full, 10 + j) for j in range(x.shape[1])]
    y_ct = enc(y, full, 20)
    # weights are broadcast to ALL slots, not just the first m
    w_cts = [
        dct.encrypt(
            encoder.encode(
                np.full(params.slots, w0[j], dtype=np.complex128), params
            ),
            params, chest.device_pk, ctx, np.random.default_rng(30 + j),
            params.scale, level=level,
        )
        for j in range(x.shape[1])
    ]
    return x_cts, y_ct, w_cts


def test_encrypted_logreg_training_step():
    """One GD step, everything encrypted, vs the cleartext mirror."""
    params, ctx, chest, be = _setup("ci_small")
    rng = np.random.default_rng(0)
    m, f = 32, 2
    x, y = _dataset(rng, m, f)
    tr = EncryptedLogRegTrainer(be, n_samples=m, lr=1.0)
    w0 = np.zeros(f)
    x_cts, y_ct, w_cts = _encrypt_cols(
        be, params, chest, ctx, tr, x, y, w0, params.num_limbs
    )
    w_out = tr.fit(w_cts, x_cts, y_ct, iters=1)
    got = np.array([float(np.real(be.decrypt_decode(w)[0])) for w in w_out])
    want = tr.reference(w0, x, y, iters=1)
    assert np.abs(got - want).max() < 1e-3, (got, want)
    # the weight is broadcast across slots (SlotSum left it uniform)
    slots0 = np.real(be.decrypt_decode(w_out[0])[: 2 * m])
    assert np.abs(slots0 - got[0]).max() < 1e-3


@pytest.mark.slow
def test_encrypted_training_bootstraps_mid_run():
    """Weights start with budget for exactly ONE iteration; iteration 2
    must bootstrap both weight ciphertexts (refresh=) and keep tracking
    the cleartext trajectory."""
    from gpufhe_tpu.ciphertext.bootstrap import Bootstrapper, bootstrap_rotations

    params = preset("boot_ci_deep")
    ctx = make_context(params)
    rots = sorted(
        set(train_rotations(params.slots)) | set(bootstrap_rotations(params))
    )
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    be = DeviceBackend(params, ctx, chest)
    bs = Bootstrapper(be)

    rng = np.random.default_rng(0)
    m, f = 32, 2
    x, y = _dataset(rng, m, f)
    tr = EncryptedLogRegTrainer(be, n_samples=m, lr=1.0, refresh=bs)
    w0 = np.zeros(f)
    # level 7 = exactly one iteration (5 mult levels + floor 1 + the
    # scale-alignment reserve the refresh needs, models/logreg_train.py)
    x_cts, y_ct, w_cts = _encrypt_cols(be, params, chest, ctx, tr, x, y, w0, 7)
    w_out = tr.fit(w_cts, x_cts, y_ct, iters=2)
    assert tr.refreshes == f, tr.refreshes
    got = np.array([float(np.real(be.decrypt_decode(w)[0])) for w in w_out])
    want = tr.reference(w0, x, y, iters=2)
    # CI-scale bootstrap carries ~0.02 message error per refresh (see
    # test_full_bootstrap_device); two refreshed weights feed the gradient,
    # so the trajectory tracks cleartext GD to a few 1e-2 here (the
    # production double-word chain is at 8e-6 error — BOOT_N16_DW.json)
    assert np.abs(got - want).max() < 0.08, (got, want)
    # ...and the learned direction matches
    assert np.dot(got, want) / (
        np.linalg.norm(got) * np.linalg.norm(want)
    ) > 0.99
