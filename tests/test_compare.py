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
