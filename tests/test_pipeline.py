"""Device pipeline vs golden model — the limb-trace parity contract.

Every stage of encrypt -> tensor -> relinearize -> rescale -> decrypt (plus
add/sub, plaintext multiply, rotation, conjugation) is compared limb-for-limb
with `==` against the golden pipeline (BASELINE.json:5; SURVEY.md §4 item 5).
Golden and device runs consume identical host randomness.
"""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset

PRESET = "tiny2"


@pytest.fixture(scope="module")
def stack():
    params = preset(PRESET)
    ctx = make_context(params)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=(1, 3), conjugation=True
    )
    return params, ctx, chest


def _encrypt_both(params, ctx, chest, z, seed, scale=None):
    scale = scale if scale is not None else params.scale
    pt = encoder.encode(z, params, scale)
    ct_dev = dct.encrypt(
        pt, params, chest.device_pk, ctx, np.random.default_rng(seed), scale
    )
    ct_gold = gckks.encrypt(
        pt, params, chest.pk, np.random.default_rng(seed), scale
    )
    return ct_dev, ct_gold


def _assert_ct_equal(ct_dev, ct_gold):
    assert ct_dev.level == ct_gold.level
    assert ct_dev.scale == ct_gold.scale
    assert len(ct_dev.c) == len(ct_gold.c)
    for dev, gold in zip(ct_dev.c, ct_gold.c):
        assert (np.asarray(dev).astype(np.int64) == gold).all()


def _rand_slots(params, rng):
    return rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)


def test_encrypt_decrypt_limb_parity(stack):
    params, ctx, chest = stack
    z = _rand_slots(params, np.random.default_rng(0))
    ct_dev, ct_gold = _encrypt_both(params, ctx, chest, z, seed=11)
    _assert_ct_equal(ct_dev, ct_gold)

    coeff_dev = dct.decrypt_to_coeff(ct_dev, params, chest.device_sk, ctx)
    coeff_gold = gckks.decrypt_to_coeff(ct_gold, params, chest.sk)
    assert (coeff_dev == coeff_gold).all()

    got = dct.decrypt_decode(ct_dev, params, chest.device_sk, ctx)
    assert np.abs(got - z).max() < 1e-3


def test_add_sub_mul_plain_parity(stack):
    params, ctx, chest = stack
    rng = np.random.default_rng(1)
    za, zb = _rand_slots(params, rng), _rand_slots(params, rng)
    a_dev, a_gold = _encrypt_both(params, ctx, chest, za, seed=21)
    b_dev, b_gold = _encrypt_both(params, ctx, chest, zb, seed=22)

    _assert_ct_equal(dct.ct_add(a_dev, b_dev, ctx), gckks.ct_add(a_gold, b_gold, params))
    _assert_ct_equal(dct.ct_sub(a_dev, b_dev, ctx), gckks.ct_sub(a_gold, b_gold, params))

    pt = encoder.encode(zb, params)
    pt_dev = encoder.plaintext_to_device(pt, params, ctx)
    pt_ntt_gold = gckks.ntt_limbs(pt, params, params.q_primes)
    _assert_ct_equal(
        dct.ct_mul_plain(a_dev, pt_dev, params.scale, ctx),
        gckks.ct_mul_plain(a_gold, pt_ntt_gold, params.scale, params),
    )


def test_mult_relin_rescale_limb_trace(stack):
    params, ctx, chest = stack
    rng = np.random.default_rng(2)
    za, zb = _rand_slots(params, rng), _rand_slots(params, rng)
    a_dev, a_gold = _encrypt_both(params, ctx, chest, za, seed=31)
    b_dev, b_gold = _encrypt_both(params, ctx, chest, zb, seed=32)

    t_dev = dct.ct_tensor(a_dev, b_dev, ctx)
    t_gold = gckks.ct_tensor(a_gold, b_gold, params)
    _assert_ct_equal(t_dev, t_gold)

    r_dev = dct.ct_relinearize(t_dev, params, ctx, chest.device_rlk)
    r_gold = gckks.ct_relinearize(t_gold, params, chest.rlk)
    _assert_ct_equal(r_dev, r_gold)

    s_dev = dct.ct_rescale(r_dev, params, ctx)
    s_gold = gckks.ct_rescale(r_gold, params)
    _assert_ct_equal(s_dev, s_gold)

    got = dct.decrypt_decode(s_dev, params, chest.device_sk, ctx)
    assert np.abs(got - za * zb).max() < 1e-2

    # second multiply at the truncated level (uneven last decomposition group)
    s2_dev = dct.ct_mul(s_dev, s_dev, params, ctx, chest.device_rlk)
    s2_gold = gckks.ct_mul(s_gold, s_gold, params, chest.rlk)
    _assert_ct_equal(s2_dev, s2_gold)
    got2 = dct.decrypt_decode(s2_dev, params, chest.device_sk, ctx)
    assert np.abs(got2 - (za * zb) ** 2).max() < 1e-1


@pytest.mark.parametrize("steps", [1, 3])
def test_rotation_parity(stack, steps):
    params, ctx, chest = stack
    z = _rand_slots(params, np.random.default_rng(3))
    ct_dev, ct_gold = _encrypt_both(params, ctx, chest, z, seed=41)

    rot_dev = dct.ct_rotate(ct_dev, steps, params, ctx, chest.galois_key(steps))
    rot_gold = gckks.ct_rotate(ct_gold, steps, params, chest.golden_galois_key(steps))
    _assert_ct_equal(rot_dev, rot_gold)

    got = dct.decrypt_decode(rot_dev, params, chest.device_sk, ctx)
    assert np.abs(got - np.roll(z, -steps)).max() < 1e-2


def test_conjugation_parity(stack):
    params, ctx, chest = stack
    z = _rand_slots(params, np.random.default_rng(4))
    ct_dev, ct_gold = _encrypt_both(params, ctx, chest, z, seed=51)

    cj_dev = dct.ct_conjugate(ct_dev, params, ctx, chest.conj_key())
    cj_gold = gckks.ct_conjugate(ct_gold, params, chest.conj[0])
    _assert_ct_equal(cj_dev, cj_gold)

    got = dct.decrypt_decode(cj_dev, params, chest.device_sk, ctx)
    assert np.abs(got - np.conj(z)).max() < 1e-2


def test_hoisted_rotations_parity(stack):
    params, ctx, chest = stack
    z = _rand_slots(params, np.random.default_rng(6))
    ct_dev, ct_gold = _encrypt_both(params, ctx, chest, z, seed=71)

    steps_list = [1, 3]
    dev_gks = {s: chest.galois_key(s) for s in steps_list}
    gold_gks = {s: chest.golden_galois_key(s) for s in steps_list}

    outs_dev = dct.ct_rotate_hoisted(ct_dev, steps_list, params, ctx, dev_gks)
    outs_gold = gckks.ct_rotate_hoisted(ct_gold, steps_list, params, gold_gks)
    for od, og, s in zip(outs_dev, outs_gold, steps_list):
        _assert_ct_equal(od, og)
        got = dct.decrypt_decode(od, params, chest.device_sk, ctx)
        assert np.abs(got - np.roll(z, -s)).max() < 1e-2


def test_batched_mult_matches_per_ciphertext(stack):
    from gpufhe_tpu.ciphertext import batch as cbatch

    params, ctx, chest = stack
    rng = np.random.default_rng(8)
    cts = []
    for seed in (81, 82, 83):
        z = _rand_slots(params, rng)
        ct, _ = _encrypt_both(params, ctx, chest, z, seed=seed)
        cts.append(ct)

    a = cbatch.stack(cts)
    b = cbatch.stack(cts[::-1])
    out = cbatch.ct_mul_batched(a, b, params, ctx, chest.device_rlk)
    singles = [
        dct.ct_mul(x, y, params, ctx, chest.device_rlk)
        for x, y in zip(cts, cts[::-1])
    ]
    for got, want in zip(cbatch.unstack(out), singles):
        assert got.level == want.level
        for gc, wc in zip(got.c, want.c):
            assert (np.asarray(gc) == np.asarray(wc)).all()


def test_fused_pipeline_pallas_trace(stack, monkeypatch):
    """FusedPipeline traces under jax.ensure_compile_time_eval(); with the
    Pallas NTT in the path (the TPU configuration), kernel tracing must not
    fall into the eval trace (`program_id` has no eval rule). Regression for
    the on-chip failure of scripts/verify_fused_pipeline.py: force the Pallas
    interpret path on CPU and trace a mul+rescale composition."""
    import functools

    import jax

    from gpufhe_tpu.ciphertext import backend as cbackend
    from gpufhe_tpu.ops import ntt as nttmod
    from gpufhe_tpu.ops import ntt_pallas as npal

    params, ctx, chest = stack
    monkeypatch.setattr(nttmod, "_use_pallas", lambda: True)
    monkeypatch.setattr(
        nttmod, "fourstep_pallas", functools.partial(npal.fourstep_pallas, interpret=True),
        raising=False,
    )
    monkeypatch.setattr(
        npal, "fourstep_pallas", functools.partial(npal.fourstep_pallas, interpret=True)
    )
    monkeypatch.setattr(
        nttmod, "fourstep_pallas_v2",
        functools.partial(npal.fourstep_pallas_v2, interpret=True),
        raising=False,
    )
    monkeypatch.setattr(
        npal, "fourstep_pallas_v2",
        functools.partial(npal.fourstep_pallas_v2, interpret=True),
    )
    # v3 (the round-4 default): same interpret forcing, both import sites
    monkeypatch.setattr(
        nttmod, "fourstep_pallas_v3",
        functools.partial(npal.fourstep_pallas_v3, interpret=True),
        raising=False,
    )
    monkeypatch.setattr(
        npal, "fourstep_pallas_v3",
        functools.partial(npal.fourstep_pallas_v3, interpret=True),
    )

    be = cbackend.DeviceBackend(params, ctx, chest)
    rng = np.random.default_rng(31)
    z = _rand_slots(params, rng)
    ct, _ = _encrypt_both(params, ctx, chest, z, seed=311)

    fused = cbackend.FusedPipeline(be, lambda x: be.rescale(be.mul(x, x)))
    out_f = fused(ct)
    out_e = dct.ct_rescale(
        dct.ct_mul(ct, ct, params, ctx, chest.device_rlk), params, ctx
    )
    assert out_f.level == out_e.level
    for gc, wc in zip(out_f.c, out_e.c):
        assert (np.asarray(gc) == np.asarray(wc)).all()


def test_key_rows_staged_under_compile_time_eval():
    """key_rows must STAGE its row gather inside a FusedPipeline-style trace
    (ensure_compile_time_eval): eager evaluation materializes a fresh key
    slice per multiply, which OOMed the N=2^16 fused EvalMod on chip."""
    import jax
    import jax.numpy as jnp

    from gpufhe_tpu.params.params import preset as _preset
    from gpufhe_tpu.primitives.keyswitch import key_rows

    params = _preset("tiny2")
    alpha = len(params.p_primes)
    stored = params.num_limbs + alpha
    comp = jnp.arange(stored * 8, dtype=jnp.uint32).reshape(stored, 8)
    seen = {}

    def run(x):
        with jax.ensure_compile_time_eval():
            rows = key_rows(comp, params, 2)
            seen["tracer"] = isinstance(rows, jax.core.Tracer)
            return x + rows.sum()

    jax.make_jaxpr(run)(jnp.uint32(0))
    assert seen["tracer"], "key_rows gather was evaluated eagerly"
    # and the values are still the right rows (eager path)
    got = np.asarray(key_rows(comp, params, 2))
    idx = np.concatenate([np.arange(2), np.arange(stored - alpha, stored)])
    assert (got == np.asarray(comp)[idx]).all()
