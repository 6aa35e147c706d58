"""Encrypted transformer block (models/transformer.py) vs its cleartext
oracle on the deep ci_xf chain."""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.models.transformer import (
    EncryptedTransformerBlock,
    transformer_rotations,
)
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset

D = 8
T = 8
HIDDEN = 16


@pytest.mark.slow
def test_transformer_block():
    params = preset("ci_xf")
    ctx = make_context(params)
    chest = dkeys.keygen(
        params, np.random.default_rng(0),
        rotations=tuple(transformer_rotations(params.slots, D)),
    )
    be = DeviceBackend(params, ctx, chest)

    rng = np.random.default_rng(1)
    x = rng.uniform(-0.5, 0.5, size=(T, D))
    wq, wk, wv, wo = (rng.uniform(-0.4, 0.4, size=(D, D)) for _ in range(4))
    w1 = rng.uniform(-0.3, 0.3, size=(HIDDEN, D))
    w2 = rng.uniform(-0.3, 0.3, size=(D, HIDDEN))
    b1 = rng.uniform(-0.1, 0.1, size=HIDDEN)
    b2 = rng.uniform(-0.1, 0.1, size=D)
    g1, g2 = (rng.uniform(0.8, 1.2, size=D) for _ in range(2))
    be1, be2 = (rng.uniform(-0.2, 0.2, size=D) for _ in range(2))

    z = np.zeros(params.slots, dtype=np.complex128)
    z[: T * D] = x.reshape(-1)
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(2), params.scale,
    )

    block = EncryptedTransformerBlock(
        be, (wq, wk, wv, wo), (w1, b1, w2, b2),
        ln_weights=(g1, be1, g2, be2), seq_len=T, ln_iters=5,
    )
    got = np.real(be.decrypt_decode(block(ct)))[:D]
    want = block.reference(x)
    assert np.abs(got - want).max() < 5e-2, np.abs(got - want).max()
