"""Encrypted CNN inference (models/cnn.py): conv/pool as structured
plaintext matrices fused into the MLP machinery; matches the cleartext
forward pass and a direct scipy-free numpy convolution."""

import numpy as np

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.models.cnn import EncryptedCNN, conv2d_matrix, avgpool_matrix, mlp_rotations
from gpufhe_tpu.params.params import preset, make_context


def _conv_ref(img, kernels):
    """Direct valid conv: img [ic, h, w], kernels [oc, ic, kh, kw]."""
    oc, ic, kh, kw = kernels.shape
    h, w = img.shape[1:]
    out = np.zeros((oc, h - kh + 1, w - kw + 1))
    for o in range(oc):
        for y in range(out.shape[1]):
            for x in range(out.shape[2]):
                out[o, y, x] = (img[:, y:y + kh, x:x + kw] * kernels[o]).sum()
    return out


def test_conv_and_pool_matrices():
    rng = np.random.default_rng(0)
    ic, oc, h, w = 2, 3, 6, 6
    img = rng.normal(size=(ic, h, w))
    k = rng.normal(size=(oc, ic, 3, 3))
    m = conv2d_matrix(k, (h, w))
    got = (m @ img.reshape(-1)).reshape(oc, 4, 4)
    assert np.allclose(got, _conv_ref(img, k))
    p = avgpool_matrix(oc, (4, 4), 2)
    pooled = (p @ got.reshape(-1)).reshape(oc, 2, 2)
    want = got.reshape(oc, 2, 2, 2, 2).mean(axis=(2, 4))
    assert np.allclose(pooled, want)


def test_encrypted_cnn_inference():
    """conv(2ch 3x3) -> avgpool -> square -> dense on an encrypted 8x8
    image, vs the cleartext forward pass."""
    params = preset("ci_small")
    ctx = make_context(params)
    chest = dkeys.keygen(
        params, np.random.default_rng(0),
        rotations=tuple(mlp_rotations(params.slots)),
    )
    be = DeviceBackend(params, ctx, chest)

    rng = np.random.default_rng(1)
    h = w = 8
    oc, ic = 2, 1
    kernels = rng.normal(size=(oc, ic, 3, 3)) * 0.4
    bias = rng.normal(size=oc) * 0.2
    # pooled feature dim: oc * 3 * 3 (6x6 conv out, pool 2)
    d_feat = oc * 3 * 3
    d_out = 4
    dense_w = rng.normal(size=(d_out, d_feat)) * 0.3
    dense_b = rng.normal(size=d_out) * 0.2

    model = EncryptedCNN(be, kernels, bias, (h, w), dense_w, dense_b)

    img = rng.normal(size=(ic, h, w)) * 0.5
    flat = img.reshape(-1)
    slots_x = np.zeros(params.slots, dtype=np.complex128)
    slots_x[: flat.size] = flat
    ct = dct.encrypt(
        encoder.encode(slots_x, params), params, chest.device_pk, ctx,
        np.random.default_rng(2), params.scale,
    )
    got = np.real(be.decrypt_decode(model(ct))[:d_out])
    want = model.reference(flat)

    # cross-check the compiled pipeline against a from-scratch CNN forward
    conv = _conv_ref(img, kernels) + bias[:, None, None]
    pooled = conv.reshape(oc, 3, 2, 3, 2).mean(axis=(2, 4))
    direct = dense_w @ (pooled.reshape(-1) ** 2) + dense_b
    assert np.abs(want - direct).max() < 1e-9
    assert np.abs(got - want).max() < 1e-2, (got, want)
