"""Encrypted single-query attention (models/attention.py) vs the cleartext
attention oracle."""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.models.attention import (
    EncryptedAttention,
    attention_reference,
    attention_rotations,
)
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset

D = 8
T = 8


@pytest.fixture(scope="module")
def stack():
    params = preset("ci_attn")
    ctx = make_context(params)
    chest = dkeys.keygen(
        params, np.random.default_rng(0),
        rotations=tuple(attention_rotations(params.slots, D)),
    )
    be = DeviceBackend(params, ctx, chest)
    return params, ctx, chest, be


@pytest.mark.slow
def test_attention_head(stack):
    params, ctx, chest, be = stack
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.5, 0.5, size=(T, D))
    wq, wk, wv, wo = (rng.uniform(-0.4, 0.4, size=(D, D)) for _ in range(4))

    z = np.zeros(params.slots, dtype=np.complex128)
    z[: T * D] = x.reshape(-1)
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(2), params.scale,
    )

    head = EncryptedAttention(be, wq, wk, wv, wo=wo, seq_len=T)
    got = np.real(be.decrypt_decode(head(ct)))[:D]
    want = attention_reference(x, wq, wk, wv, wo=wo)
    assert np.abs(got - want).max() < 2e-2, np.abs(got - want).max()
