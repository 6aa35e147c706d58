"""Encrypted x encrypted matrix product (ciphertext/linalg.py CtMatmulPlan,
the JKLS algorithm) vs numpy."""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.ciphertext.linalg import (
    CtMatmulPlan,
    ct_matmul,
    ct_matmul_rotations,
    pack_matrix,
)
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset

D = 8


@pytest.fixture(scope="module")
def stack():
    params = preset("ci_attn")
    ctx = make_context(params)
    chest = dkeys.keygen(
        params, np.random.default_rng(0),
        rotations=tuple(ct_matmul_rotations(params.slots, D)),
    )
    be = DeviceBackend(params, ctx, chest)
    return params, ctx, chest, be


def _encrypt(params, chest, ctx, z, seed):
    return dct.encrypt(
        encoder.encode(np.asarray(z, dtype=np.complex128), params), params,
        chest.device_pk, ctx, np.random.default_rng(seed), params.scale,
    )


def test_ct_matmul(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(1)
    a = rng.uniform(-0.5, 0.5, size=(D, D))
    b = rng.uniform(-0.5, 0.5, size=(D, D))
    ct_a = _encrypt(params, chest, ctx, pack_matrix(a, params.slots), 2)
    ct_b = _encrypt(params, chest, ctx, pack_matrix(b, params.slots), 3)
    got = np.real(be.decrypt_decode(ct_matmul(be, ct_a, ct_b, D)))
    want = pack_matrix(a @ b, params.slots).real
    assert np.abs(got - want).max() < 2e-3, np.abs(got - want).max()


def test_ct_matmul_chained(stack):
    """(A @ B) @ C via two plan applications at descending levels."""
    params, ctx, chest, be = stack
    rng = np.random.default_rng(4)
    a, b, c = (rng.uniform(-0.4, 0.4, size=(D, D)) for _ in range(3))
    ct_a = _encrypt(params, chest, ctx, pack_matrix(a, params.slots), 5)
    ct_b = _encrypt(params, chest, ctx, pack_matrix(b, params.slots), 6)
    ct_c = _encrypt(params, chest, ctx, pack_matrix(c, params.slots), 7)
    ab = ct_matmul(be, ct_a, ct_b, D)
    abc = ct_matmul(be, ab, ct_c, D)
    got = np.real(be.decrypt_decode(abc))[: D * D].reshape(D, D)
    want = a @ b @ c
    assert np.abs(got - want).max() < 5e-3, np.abs(got - want).max()
