"""Function-approximation toolkit (ciphertext/approx.py) on the device
backend, checked against the cleartext functions it approximates."""

import numpy as np
import pytest

_SLOW = pytest.mark.slow

from gpufhe_tpu.ciphertext import approx
from gpufhe_tpu.ciphertext import ct as dct
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


def _encrypt(params, chest, ctx, z, seed=2):
    return dct.encrypt(
        encoder.encode(np.asarray(z, dtype=np.complex128), params), params,
        chest.device_pk, ctx, np.random.default_rng(seed), params.scale,
    )


def test_inverse(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(1)
    x = rng.uniform(0.2, 1.0, size=params.slots)
    ct = _encrypt(params, chest, ctx, x)
    got = np.real(be.decrypt_decode(approx.inverse(be, ct, iters=5)))
    rel = np.abs(got - 1.0 / x) * x
    assert rel.max() < 5e-3, rel.max()


def test_inverse_bound_and_out_scale(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(2)
    x = rng.uniform(1.0, 4.0, size=params.slots)
    ct = _encrypt(params, chest, ctx, x, seed=3)
    got = np.real(
        be.decrypt_decode(approx.inverse(be, ct, bound=4.0, iters=5,
                                         out_scale=3.0))
    )
    rel = np.abs(got - 3.0 / x) * x / 3.0
    assert rel.max() < 5e-3, rel.max()


def test_sqrt(stack):
    """Full-iteration Goldschmidt sqrt at tight tolerance — kept in the
    fast tier deliberately (ADVICE r4: at least one tight-tolerance
    approximation convergence test must guard the default run)."""
    params, ctx, chest, be = stack
    rng = np.random.default_rng(4)
    x = rng.uniform(0.1, 1.0, size=params.slots)
    ct = _encrypt(params, chest, ctx, x, seed=5)
    got = np.real(be.decrypt_decode(approx.sqrt(be, ct, iters=6)))
    assert np.abs(got - np.sqrt(x)).max() < 5e-3


@_SLOW
def test_sqrt_bound_fold(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(6)
    x = rng.uniform(1.0, 9.0, size=params.slots)
    ct = _encrypt(params, chest, ctx, x, seed=7)
    got = np.real(be.decrypt_decode(approx.sqrt(be, ct, bound=9.0, iters=6)))
    assert np.abs(got - np.sqrt(x)).max() < 2e-2


def test_exp(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(8)
    x = rng.uniform(-2.0, 2.0, size=params.slots)
    ct = _encrypt(params, chest, ctx, x, seed=9)
    got = np.real(be.decrypt_decode(approx.exp(be, ct, half_range=2.0)))
    rel = np.abs(got - np.exp(x)) / np.exp(x)
    assert rel.max() < 2e-3, rel.max()


@_SLOW
def test_rsqrt(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(20)
    x = rng.uniform(0.15, 1.0, size=params.slots)
    ct = _encrypt(params, chest, ctx, x, seed=21)
    got = np.real(be.decrypt_decode(approx.rsqrt(be, ct, iters=6)))
    assert np.abs(got - 1.0 / np.sqrt(x)).max() < 5e-3


@_SLOW
def test_rsqrt_bound(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(22)
    x = rng.uniform(1.0, 6.0, size=params.slots)
    ct = _encrypt(params, chest, ctx, x, seed=23)
    got = np.real(be.decrypt_decode(approx.rsqrt(be, ct, bound=6.0, iters=6)))
    assert np.abs(got - 1.0 / np.sqrt(x)).max() < 5e-3


@pytest.fixture(scope="module")
def ln_stack():
    params = preset("ci_attn")
    ctx = make_context(params)
    rots = tuple(approx.rotations_for_layernorm(params.slots, 8))
    chest = dkeys.keygen(params, np.random.default_rng(30), rotations=rots)
    be = DeviceBackend(params, ctx, chest)
    return params, ctx, chest, be


def layer_norm_reference(x: np.ndarray, d: int, eps: float,
                         gamma=None, beta=None) -> np.ndarray:
    blocks = x.reshape(-1, d)
    mean = blocks.mean(axis=1, keepdims=True)
    var = ((blocks - mean) ** 2).mean(axis=1, keepdims=True)
    out = (blocks - mean) / np.sqrt(var + eps)
    if gamma is not None:
        out = out * gamma
    if beta is not None:
        out = out + beta
    return out.reshape(-1)


@pytest.mark.slow
def test_layer_norm(ln_stack):
    params, ctx, chest, be = ln_stack
    d = 8
    rng = np.random.default_rng(31)
    x = rng.uniform(-1.0, 1.0, size=params.slots)
    gamma = rng.uniform(0.5, 1.5, size=d)
    beta = rng.uniform(-0.3, 0.3, size=d)
    ct = _encrypt(params, chest, ctx, x, seed=32)
    # iters=4 (not the production 6): halves the per-level compile fan —
    # this is the fast tier's LN coverage; accuracy-at-depth is covered by
    # the slow-tier transformer tests (test_transformer.py)
    got = np.real(be.decrypt_decode(approx.layer_norm(
        be, ct, d, eps=5e-2, gamma=gamma, beta=beta, var_bound=1.0, iters=4)))
    want = layer_norm_reference(x, d, 5e-2, gamma=gamma, beta=beta)
    assert np.abs(got - want).max() < 5e-2, np.abs(got - want).max()


@pytest.fixture(scope="module")
def softmax_stack():
    params = preset("boot_ci_deep")
    ctx = make_context(params)
    rots = tuple(approx.rotations_for_softmax(params.slots))
    chest = dkeys.keygen(params, np.random.default_rng(10), rotations=rots)
    be = DeviceBackend(params, ctx, chest)
    return params, ctx, chest, be


@pytest.mark.slow
def test_softmax(softmax_stack):
    params, ctx, chest, be = softmax_stack
    rng = np.random.default_rng(11)
    x = rng.uniform(-1.0, 1.0, size=params.slots)
    ct = _encrypt(params, chest, ctx, x, seed=12)
    # inv_iters=4 (production uses 6): fast-tier coverage of the softmax
    # composition; full-depth accuracy rides the slow attention/transformer
    # tests
    got = np.real(
        be.decrypt_decode(approx.softmax(be, ct, inv_iters=4, degree=7))
    )
    want = np.exp(x) / np.exp(x).sum()
    assert np.abs(got - want).max() < 2e-2 * want.max(), (
        np.abs(got - want).max(), want.max())


@_SLOW
def test_softmax_replicated(softmax_stack):
    """m logits tiled slots/m times: replicated= fixes the output scale."""
    params, ctx, chest, be = softmax_stack
    m = 8
    rng = np.random.default_rng(13)
    base = rng.uniform(-1.0, 1.0, size=m)
    x = np.tile(base, params.slots // m)
    ct = _encrypt(params, chest, ctx, x, seed=14)
    got = np.real(
        be.decrypt_decode(
            approx.softmax(be, ct, inv_iters=6, degree=7,
                           replicated=params.slots // m)
        )
    )[:m]
    want = np.exp(base) / np.exp(base).sum()
    assert np.abs(got - want).max() < 2e-2 * want.max()
