"""Composite-polynomial comparison ops (ciphertext/compare.py) on the device
backend, checked against the cleartext functions they approximate."""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext import compare as cmp
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset


@pytest.fixture(scope="module")
def stack():
    params = preset("ci_deep")
    ctx = make_context(params)
    chest = dkeys.keygen(params, np.random.default_rng(0))
    be = DeviceBackend(params, ctx, chest)
    return params, ctx, chest, be


def _encrypt(params, chest, ctx, x, seed=2):
    z = np.zeros(params.slots, dtype=np.complex128)
    z[: len(x)] = x
    return dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(seed), params.scale,
    )


def test_sign_and_step(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(1)
    # values in [-1, 1], bounded away from 0 by the n_g=1 resolving band
    x = rng.uniform(0.08, 1.0, size=64) * rng.choice([-1.0, 1.0], size=64)
    ct = _encrypt(params, chest, ctx, x)

    s = np.real(be.decrypt_decode(cmp.sign(be, ct))[:64])
    assert np.abs(s - np.sign(x)).max() < 0.02, np.abs(s - np.sign(x)).max()


@pytest.mark.slow
def test_step(stack):
    """step() is its own full composed-sign circuit (fast tier covers the
    shared composition via test_sign_and_step; relu/abs cover the affine
    post-maps)."""
    params, ctx, chest, be = stack
    rng = np.random.default_rng(1)
    x = rng.uniform(0.08, 1.0, size=64) * rng.choice([-1.0, 1.0], size=64)
    ct = _encrypt(params, chest, ctx, x)
    h = np.real(be.decrypt_decode(cmp.step(be, ct))[:64])
    assert np.abs(h - (x > 0)).max() < 0.02


def test_relu_and_abs(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(3)
    x = rng.uniform(0.08, 0.9, size=64) * rng.choice([-1.0, 1.0], size=64)
    ct = _encrypt(params, chest, ctx, x, seed=4)

    r = np.real(be.decrypt_decode(cmp.relu(be, ct))[:64])
    assert np.abs(r - np.maximum(x, 0.0)).max() < 0.02

    a = np.real(be.decrypt_decode(cmp.absval(be, ct))[:64])
    assert np.abs(a - np.abs(x)).max() < 0.02


@pytest.mark.slow
def test_relu_mlp(stack):
    """End-to-end encrypted MLP with the TRUE (composite-sign) ReLU."""
    from gpufhe_tpu.models.mlp import EncryptedMLP, mlp_rotations

    params, ctx, _, _ = stack
    chest = dkeys.keygen(
        params, np.random.default_rng(20),
        rotations=tuple(mlp_rotations(params.slots)),
    )
    be = DeviceBackend(params, ctx, chest)

    rng = np.random.default_rng(21)
    d_in, d_h, d_out = 8, 4, 2
    x = rng.normal(size=d_in)
    w1 = rng.normal(size=(d_h, d_in))
    b1 = rng.normal(size=d_h) * 0.1
    # scale each hidden unit's pre-activation into +-[0.2, 0.8] so values
    # stay inside [-1, 1] and clear of the sign dead band
    v = w1 @ x + b1
    target = rng.uniform(0.2, 0.8, size=d_h) * np.sign(v)
    w1 = w1 * (target / v)[:, None]
    b1 = b1 * (target / v)
    w2 = rng.normal(size=(d_out, d_h)) * 0.4
    b2 = rng.normal(size=d_out) * 0.1

    model = EncryptedMLP(
        be, [(w1, b1), (w2, b2)],
        activation=lambda be, ct: cmp.relu(be, ct), act_levels=13,
    )
    assert model.levels_used == 15

    ct = _encrypt(params, chest, ctx, x, seed=22)
    got = np.real(be.decrypt_decode(model(ct))[:d_out])
    want = model.reference(x, act=lambda h: np.maximum(h, 0.0))
    assert np.abs(got - want).max() < 0.03, (got, want)


@pytest.mark.slow
def test_maximum_minimum(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(5)
    # keep |a-b|/2 out of the undecided band
    a = rng.uniform(-0.8, 0.8, size=64)
    b = a + rng.uniform(0.2, 0.8, size=64) * rng.choice([-1.0, 1.0], size=64)
    ca = _encrypt(params, chest, ctx, a, seed=6)
    cb = _encrypt(params, chest, ctx, b, seed=7)

    mx = np.real(be.decrypt_decode(cmp.maximum(be, ca, cb))[:64])
    assert np.abs(mx - np.maximum(a, b)).max() < 0.02

    mn = np.real(be.decrypt_decode(cmp.minimum(be, ca, cb))[:64])
    assert np.abs(mn - np.minimum(a, b)).max() < 0.02


@pytest.mark.slow
def test_compare_scaled_range(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(8)
    # values in [-4, 4]: compare() rescales the difference into [-1, 1]
    a = rng.uniform(-4.0, 4.0, size=64)
    b = a + rng.uniform(0.9, 4.0, size=64) * rng.choice([-1.0, 1.0], size=64)
    ca = _encrypt(params, chest, ctx, a, seed=9)
    cb = _encrypt(params, chest, ctx, b, seed=10)

    g = np.real(be.decrypt_decode(cmp.compare(be, ca, cb, half_range=4.0))[:64])
    assert np.abs(g - (a > b)).max() < 0.02
