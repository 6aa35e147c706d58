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


def test_bsgs_steps_matches_plan_keys():
    """bsgs_steps(a, b) promises to be EXACTLY the rotation steps
    BsgsPlan.apply uses; assert that against the plan's .pt key set so any
    future drift in the plan's pruning fails here, not as a missing Galois
    key after minutes of on-chip keygen (ADVICE r3)."""
    import math

    from gpufhe_tpu.ciphertext.backend import GoldenBackend
    from gpufhe_tpu.ciphertext.linalg import BsgsPlan, bsgs_steps

    params = preset("tiny2")
    chest = dkeys.keygen(params, np.random.default_rng(3))
    be = GoldenBackend(params, chest)
    n_s = params.slots
    rng = np.random.default_rng(11)

    def block(out_d, in_d):
        m = np.zeros((n_s, n_s), dtype=np.complex128)
        m[:out_d, :in_d] = rng.normal(size=(out_d, in_d))
        return m

    cases = [
        (block(3, n_s // 2), None),                 # corner block
        (block(n_s // 4, 5), block(2, 2)),          # block + conj part
        (np.diag(rng.normal(size=n_s)).astype(np.complex128), None),
        (np.zeros((n_s, n_s), dtype=np.complex128), None),  # empty
        (rng.normal(size=(n_s, n_s)) + 0j, None),   # dense
    ]
    g = max(1, math.isqrt(n_s))
    level = params.num_limbs
    for a, b in cases:
        plan = BsgsPlan(be, a, b, level)
        babies = {bi for (_, bi, _) in plan.pt} - {0}
        giants = {gi * g for (gi, _, _) in plan.pt if gi}
        assert bsgs_steps(a, b) == sorted(babies | giants)
