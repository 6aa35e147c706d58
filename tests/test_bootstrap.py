"""Homomorphic linear algebra + full CKKS bootstrapping.

BSGS matmul is checked numerically AND limb-exact across backends (device vs
golden — since bootstrap is composed solely of backend ops, that parity
extends structurally to the full pipeline). The end-to-end bootstrap test
runs the device pipeline at CI scale (boot_ci preset: N=2^7, L=14, sparse
secret) and checks message recovery.
"""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend, GoldenBackend
from gpufhe_tpu.ciphertext.bootstrap import Bootstrapper, bootstrap_rotations
from gpufhe_tpu.ciphertext.linalg import bsgs_rotations, matmul_plain
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset


def test_bsgs_matmul_backend_parity_and_numerics():
    params = preset("tiny2")
    ctx = make_context(params)
    rots = bsgs_rotations(params.slots)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    dev = DeviceBackend(params, ctx, chest)
    gold = GoldenBackend(params, chest)

    rng = np.random.default_rng(0)
    ns = params.slots
    z = rng.normal(size=ns) + 1j * rng.normal(size=ns)
    pt = encoder.encode(z, params)
    ct_dev = dct.encrypt(
        pt, params, chest.device_pk, ctx, np.random.default_rng(1), params.scale
    )
    ct_gold = gckks.encrypt(pt, params, chest.pk, np.random.default_rng(1), params.scale)

    m = (rng.normal(size=(ns, ns)) + 1j * rng.normal(size=(ns, ns))) / ns
    b = (rng.normal(size=(ns, ns)) + 1j * rng.normal(size=(ns, ns))) / ns

    out_dev = matmul_plain(dev, ct_dev, m, b)
    out_gold = matmul_plain(gold, ct_gold, m, b)

    # limb-exact parity across backends
    assert out_dev.level == out_gold.level
    for cd, cg in zip(out_dev.c, out_gold.c):
        assert (np.asarray(cd).astype(np.int64) == cg).all()

    # numerics
    got = dev.decrypt_decode(out_dev)
    want = m @ z + b @ np.conj(z)
    assert np.abs(got - want).max() < 1e-4


@pytest.mark.slow
def test_full_bootstrap_device():
    params = preset("boot_ci")
    ctx = make_context(params)
    rots = bootstrap_rotations(params)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    be = DeviceBackend(params, ctx, chest)
    bs = Bootstrapper(be)

    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)) * 0.2
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=1,
    )
    out = bs(ct)
    assert out.level >= 2  # levels were restored
    # production invariant (round 4): refreshed ciphertexts land at EXACTLY
    # scale Delta, so they can chain into further encrypted compute
    # (bootstrap.py _normalize; a drifted scale poisons the NEXT refresh's
    # EvalMod)
    assert abs(out.scale / params.scale - 1.0) < 1e-9, out.scale
    got = be.decrypt_decode(out)
    assert np.abs(got - z).max() < 0.02


@pytest.mark.slow
def test_bootstrap_steady_state_no_host_encodes():
    """Second bootstrap iteration must be encode-free: every plaintext
    constant (EvalMod coefficients, alignment scalars, fan diagonals) is
    cached after the first pass (VERDICT r1 item 5)."""
    params = preset("boot_ci")
    ctx = make_context(params)
    rots = bootstrap_rotations(params)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    be = DeviceBackend(params, ctx, chest)
    bs = Bootstrapper(be)
    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)) * 0.2
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=1,
    )
    bs(ct)
    before = be.encode_misses
    out = bs(ct)
    assert be.encode_misses == before, (
        f"{be.encode_misses - before} host encodes in steady state"
    )
    assert np.abs(be.decrypt_decode(out) - z).max() < 0.02

@pytest.mark.slow
def test_deep_mlp_mid_inference_bootstrap():
    """A 3-layer MLP whose input budget (3 levels) cannot fit the network:
    the forward pass must bootstrap between layers 1 and 2 (models/mlp.py
    refresh=), then finish on the refreshed chain — models + bootstrap + the
    backend protocol composed end-to-end."""
    from gpufhe_tpu.models.mlp import EncryptedMLP, mlp_rotations

    params = preset("boot_ci_deep")
    ctx = make_context(params)
    rots = sorted(set(bootstrap_rotations(params)) | set(mlp_rotations(params.slots)))
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    be = DeviceBackend(params, ctx, chest)
    bs = Bootstrapper(be)

    rng = np.random.default_rng(1)
    d = 8
    layers = []
    for i in range(3):
        out_d = 4 if i == 2 else d
        layers.append((rng.normal(size=(out_d, d)) * 0.3,
                       rng.normal(size=out_d) * 0.1))
    model = EncryptedMLP(be, layers, refresh=bs)
    assert model.levels_used == 5

    x = rng.normal(size=d) * 0.3
    slots_x = np.zeros(params.slots, dtype=np.complex128)
    slots_x[:d] = x
    # encrypt with only 3 levels: layer 1 fits, layer 2 forces a refresh
    ct = dct.encrypt(
        encoder.encode(slots_x, params), params, chest.device_pk, ctx,
        np.random.default_rng(2), params.scale, level=3,
    )
    out = model(ct)
    # the forward reserves scale_words limbs per layer so each refresh can
    # align its input scale to exactly Delta (bootstrap.py) — the count
    # depends on that reserve; the invariant is that refreshes HAPPENED and
    # the logits are right
    assert model.refreshes >= 1, model.refreshes
    got = np.real(be.decrypt_decode(out)[:4])
    want = model.reference(x)
    assert np.abs(got - want).max() < 0.05, (got, want)
