"""Factored-FFT CoeffToSlot/SlotToCoeff: math + homomorphic round trip +
full factored bootstrap (the production-scale transform path).
"""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext import fftboot as fb
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.ciphertext.bootstrap import Bootstrapper, bootstrap_rotations
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset


def _apply_diags(d, x):
    out = np.zeros(len(x), dtype=np.complex128)
    for r, dv in d.items():
        out += dv * np.roll(x, -r)
    return out


@pytest.mark.parametrize("n_s", [8, 64, 512])
@pytest.mark.parametrize("radix", [1, 3])
def test_stage_factorization_matches_direct_matrix(n_s, radix):
    m = 4 * n_s
    exps = np.empty(n_s, dtype=np.int64)
    g = 1
    for j in range(n_s):
        exps[j] = g
        g = g * 5 % m
    f = np.exp(2j * np.pi * (exps[:, None] * np.arange(n_s)[None, :] % m) / m)
    br = fb.bit_rev_perm(n_s)
    rng = np.random.default_rng(0)
    u = rng.normal(size=n_s) + 1j * rng.normal(size=n_s)

    fwd = [fb._fwd_stage_diags(n_s, h, w) for h, w in fb._stage_twiddles(n_s)]
    v = u[br]
    for gd in fb.group_stages(fwd, n_s, radix):
        v = _apply_diags(gd, v)
    assert np.abs(v - f @ u).max() < 1e-9

    inv = [
        fb._inv_stage_diags(n_s, h, w)
        for h, w in reversed(fb._stage_twiddles(n_s))
    ]
    w2 = f @ u
    for gd in fb.group_stages(inv, n_s, radix):
        w2 = _apply_diags(gd, w2)
    assert np.abs(w2 - u[br]).max() < 1e-9


@pytest.mark.slow
def test_factored_cts_stc_homomorphic_round_trip():
    params = preset("fft_ci")
    ctx = make_context(params)
    rots = fb.factored_rotations(params.slots, radix_log=4)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    be = DeviceBackend(params, ctx, chest)

    rng = np.random.default_rng(0)
    n_s = params.slots
    z = rng.normal(size=n_s) + 1j * rng.normal(size=n_s)
    pt = encoder.encode(z, params)
    ct = dct.encrypt(
        pt, params, chest.device_pk, ctx, np.random.default_rng(1), params.scale
    )

    cts = fb.FactoredCtS(be, level=params.num_limbs, radix_log=4)
    lo, hi = cts(ct)
    m = np.asarray(
        gckks.crt_compose_centered(pt, params.q_primes), dtype=np.float64
    ) / params.scale
    br = fb.bit_rev_perm(n_s)
    assert np.abs(np.real(be.decrypt_decode(lo)) - m[:n_s][br]).max() < 1e-4
    assert np.abs(np.real(be.decrypt_decode(hi)) - m[n_s:][br]).max() < 1e-4

    stc = fb.FactoredStC(be, level=be.level(lo), radix_log=4)
    out = stc(lo, hi)
    assert np.abs(be.decrypt_decode(out) - z).max() < 1e-3


@pytest.mark.slow
def test_full_bootstrap_factored_transforms():
    params = preset("boot_ci_f")
    ctx = make_context(params)
    rots = bootstrap_rotations(params, transform="factored", radix_log=3)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    be = DeviceBackend(params, ctx, chest)
    bs = Bootstrapper(be, transform="factored", radix_log=3)

    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)) * 0.2
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=1,
    )
    out = bs(ct)
    assert out.level >= 2
    assert np.abs(be.decrypt_decode(out) - z).max() < 0.01


def test_chebyshev_evaluator():
    """polyeval: BSGS Chebyshev sine on ciphertexts (the production EvalMod
    kernel) — moderate degree, exact-scale landing."""
    from gpufhe_tpu.ciphertext.polyeval import ChebyshevEvaluator, sine_coeffs

    params = preset("boot_ci_cheb")
    ctx = make_context(params)
    chest = dkeys.keygen(params, np.random.default_rng(7))
    from gpufhe_tpu.ciphertext.backend import DeviceBackend

    be = DeviceBackend(params, ctx, chest)
    rng = np.random.default_rng(0)
    y = rng.uniform(-1, 1, size=params.slots)
    ct = dct.encrypt(
        encoder.encode(y + 0j, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale,
    )
    k = 1.5  # fast tier: smaller sine degree; production k rides the
    # slow bootstrap tests
    out = ChebyshevEvaluator(be, sine_coeffs(k), baby_log=3)(ct)
    got = np.real(be.decrypt_decode(out))
    assert np.abs(got - np.sin(2 * np.pi * k * y)).max() < 1e-3


@pytest.mark.slow
def test_full_bootstrap_chebyshev_evalmod():
    """Factored transforms + Chebyshev EvalMod: the production bootstrap
    composition (no 2^r noise amplification)."""
    params = preset("boot_ci_cheb")
    ctx = make_context(params)
    rots = bootstrap_rotations(params, transform="factored", radix_log=3)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    be = DeviceBackend(params, ctx, chest)
    bs = Bootstrapper(
        be, transform="factored", radix_log=3, evalmod="cheb", k_bound=5.0
    )
    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)) * 0.2
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=1,
    )
    out = bs(ct)
    assert out.level >= 2
    assert np.abs(be.decrypt_decode(out) - z).max() < 0.01


@pytest.mark.slow
def test_full_bootstrap_double_word_scale():
    """Double-word scale (Delta = 2^56 over limb pairs): composite-base
    ModRaise + scale_words-aware transforms/EvalMod. Precision is ~20x the
    single-word path (the production configuration for N=2^16)."""
    params = preset("boot_dw_ci")
    assert params.scale_words == 2
    ctx = make_context(params)
    rots = bootstrap_rotations(params, transform="factored", radix_log=6)
    # the flagship configuration end to end: seeded device keygen, per-step
    # key truncation, fused EvalMod, lean-key drop/regen cycling around the
    # fused trace (scripts/bootstrap_n16_dw.py runs exactly this on chip)
    from gpufhe_tpu.keys.device_keygen import device_keygen
    from gpufhe_tpu.keys.keys import truncate_galois_device

    chest = device_keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    be = DeviceBackend(params, ctx, chest)
    bs = Bootstrapper(
        be, transform="factored", radix_log=6, evalmod="cheb", k_bound=5.0,
        fuse_evalmod=True, lean_keys=True,
    )
    assert bs._lean_pending
    steps, conj_lvl = bs.galois_step_levels()
    truncate_galois_device(chest, steps, conj_lvl, params)
    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)) * 0.2
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=2,
    )
    out = bs(ct)
    assert out.level >= 4
    assert np.abs(be.decrypt_decode(out) - z).max() < 1e-3


def test_double_word_mod_raise_limb_parity():
    from gpufhe_tpu.golden import ckks as gckks

    params = preset("boot_dw_ci")
    ctx = make_context(params)
    chest = dkeys.keygen(params, np.random.default_rng(3))
    be = DeviceBackend(params, ctx, chest)
    z = np.random.default_rng(4).normal(size=params.slots) * 0.3 + 0j
    pt = encoder.encode(z, params)
    ct2 = dct.encrypt(
        pt, params, chest.device_pk, ctx, np.random.default_rng(5),
        params.scale, level=2,
    )
    ct2_g = gckks.encrypt(pt, params, chest.pk, np.random.default_rng(5),
                          params.scale, level=2)
    r_dev = be.mod_raise(ct2)
    r_gold = gckks.ct_mod_raise(ct2_g, params)
    for d, g in zip(r_dev.c, r_gold.c):
        assert (np.asarray(d).astype(np.int64) == g).all()


def test_fused_diag_fan_backend_parity():
    """ct_diag_fan (double-hoisted fused stage) is limb-exact device vs
    golden, on multiple output sets with differing offset subsets, and
    numerically equals sum_r d_r * rot_r(z)."""
    from gpufhe_tpu.ciphertext.backend import GoldenBackend

    params = preset("tiny2")
    ctx = make_context(params)
    rots = (1, 3, params.slots - 1)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=rots, conjugation=False
    )
    dev = DeviceBackend(params, ctx, chest)
    gold = GoldenBackend(params, chest)
    rng = np.random.default_rng(0)
    ns = params.slots
    z = rng.normal(size=ns) + 1j * rng.normal(size=ns)
    pt = encoder.encode(z, params)
    ct_d = dct.encrypt(
        pt, params, chest.device_pk, ctx, np.random.default_rng(1), params.scale
    )
    ct_g = gckks.encrypt(pt, params, chest.pk, np.random.default_rng(1), params.scale)

    d1 = rng.normal(size=ns) + 1j * rng.normal(size=ns)
    d2 = rng.normal(size=ns) + 1j * rng.normal(size=ns)
    d3 = rng.normal(size=ns) + 1j * rng.normal(size=ns)
    sets = [{0: d1, 1: d2, 3: d3}, {1: d1, params.slots - 1: d2}]
    out_d = dev.apply_fan(ct_d, dev.make_fan_plan(sets, ct_d.level))
    out_g = gold.apply_fan(ct_g, gold.make_fan_plan(sets, ct_g.level))
    for od, og in zip(out_d, out_g):
        assert od.level == og.level
        assert abs(od.scale / og.scale - 1) < 1e-12
        for cd, cg in zip(od.c, og.c):
            assert (np.asarray(cd).astype(np.int64) == cg).all()

    got = dev.decrypt_decode(out_d[0])
    want = d1 * z + d2 * np.roll(z, -1) + d3 * np.roll(z, -3)
    assert np.abs(got - want).max() < 1e-3
    got2 = dev.decrypt_decode(out_d[1])
    want2 = d1 * np.roll(z, -1) + d2 * np.roll(z, -(params.slots - 1))
    assert np.abs(got2 - want2).max() < 1e-3


def test_truncated_galois_keys_bit_exact():
    """Level-truncated Galois keys (keys.truncate_galois_device) produce
    bit-identical rotations and fan stages — truncation is pure row
    selection; key_rows() adapts the kernels to the shrunken storage."""
    from gpufhe_tpu.keys.keys import truncate_galois_device

    params = preset("tiny2")
    ctx = make_context(params)
    rots = (1, 3)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=rots, conjugation=True
    )
    dev = DeviceBackend(params, ctx, chest)
    rng = np.random.default_rng(0)
    ns = params.slots
    z = rng.normal(size=ns) + 1j * rng.normal(size=ns)
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale,
    )
    lvl = params.num_limbs - 1
    ct = dev.drop_to_level(ct, lvl)
    d1 = rng.normal(size=ns) + 1j * rng.normal(size=ns)
    sets = [{0: d1, 1: d1, 3: d1}]
    want_fan = dev.apply_fan(ct, dev.make_fan_plan(sets, lvl))[0]
    want_rot = dev.rotate_hoisted(ct, [1, 3])
    want_conj = dev.conjugate(ct)

    truncate_galois_device(chest, {1: lvl, 3: lvl}, lvl, params)
    assert chest.galois[1][1].b_mont.shape[1] == lvl + len(params.p_primes)
    got_fan = dev.apply_fan(ct, dev.make_fan_plan(sets, lvl))[0]
    got_rot = dev.rotate_hoisted(ct, [1, 3])
    got_conj = dev.conjugate(ct)
    for w, g in [(want_fan, got_fan), (want_conj, got_conj)] + [
        (want_rot[s], got_rot[s]) for s in (1, 3)
    ]:
        for cw, cg in zip(w.c, g.c):
            assert (np.asarray(cw) == np.asarray(cg)).all()


@pytest.mark.slow
def test_full_bootstrap_sparse_encapsulation():
    """Dense base secret + ephemeral sparse key for ModRaise (Bossuat et al.
    pattern): the full chain's security is governed by the dense table while
    the ModRaise overflow stays small. Message must survive the two extra
    key switches."""
    params = preset("boot_ci_enc")
    assert params.hamming_weight == 0 and params.eph_hamming_weight == 16
    ctx = make_context(params)
    rots = bootstrap_rotations(params, transform="factored", radix_log=3)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    assert chest.eph is not None
    be = DeviceBackend(params, ctx, chest)
    bs = Bootstrapper(
        be, transform="factored", radix_log=3, evalmod="cheb", k_bound=5.0
    )
    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)) * 0.2
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=1,
    )
    out = bs(ct)
    assert out.level >= 2
    assert np.abs(be.decrypt_decode(out) - z).max() < 0.01

@pytest.mark.slow
def test_fused_cheb_pipeline_bit_exact():
    """backend.FusedPipeline(cheb) — the whole BSGS evaluation as ONE XLA
    program — must match the eager dispatch-by-dispatch path limb-exactly
    (same jitted cores, same order, just inlined)."""
    from gpufhe_tpu.ciphertext.backend import FusedPipeline
    from gpufhe_tpu.ciphertext.polyeval import ChebyshevEvaluator, sine_coeffs
    from gpufhe_tpu.ciphertext.backend import DeviceBackend

    params = preset("boot_ci_cheb")
    ctx = make_context(params)
    chest = dkeys.keygen(params, np.random.default_rng(7))
    be = DeviceBackend(params, ctx, chest)
    rng = np.random.default_rng(0)
    y = rng.uniform(-1, 1, size=params.slots)
    ct = dct.encrypt(
        encoder.encode(y + 0j, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale,
    )
    # degree 17 with G=4 still exercises recursion (d > G), giant doubling,
    # scale alignment, and the fused leaf MACs — at a fraction of the
    # fast-tier cost of the production degree (~65); the slow-tier cheb
    # bootstrap runs the fused path at full degree
    ev = ChebyshevEvaluator(be, sine_coeffs(1.0, degree=17), baby_log=2)
    eager = ev(ct)
    fused = FusedPipeline(be, ev)(ct)
    assert fused.level == eager.level and fused.scale == eager.scale
    for cf, ce in zip(fused.c, eager.c):
        assert (np.asarray(cf) == np.asarray(ce)).all()
    # the split form the Bootstrapper uses (basis program + eval program,
    # dict-of-Ciphertexts between them), twice: the second call must hit
    # the compiled programs (no re-trace) and stay exact
    basis = FusedPipeline(be, ev._build_basis)
    evalp = FusedPipeline(be, lambda t: ev._eval(ev.c, t))
    for _ in range(2):
        out2 = evalp(basis(ct))
        assert out2.level == eager.level and out2.scale == eager.scale
        for cf, ce in zip(out2.c, eager.c):
            assert (np.asarray(cf) == np.asarray(ce)).all()


def test_fused_pipeline_smoke_tiny():
    """Fast-tier FusedPipeline coverage: a small composition (mul, rescale,
    mul_plain, add_plain) fused into one program, bit-exact vs the eager
    path, twice (second call must reuse the compiled program). Also pins
    the tracer-leak regression: constants lazily cached DURING the fused
    trace (add_plain's _addp_cache) must be concrete, never tracers —
    backend.FusedPipeline traces under jax.ensure_compile_time_eval."""
    import jax

    from gpufhe_tpu.ciphertext.backend import FusedPipeline

    params = preset("tiny2")
    ctx = make_context(params)
    chest = dkeys.keygen(params, np.random.default_rng(7))
    be = DeviceBackend(params, ctx, chest)
    rng = np.random.default_rng(0)
    z = rng.uniform(-1, 1, size=params.slots)
    ct = dct.encrypt(
        encoder.encode(z + 0j, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale,
    )

    def fn(x):
        y = be.rescale(be.mul(x, x))
        pt = be.encode_slots(0.5, y.scale, y.level)
        y = be.rescale(be.mul_plain(y, pt))
        return be.add_plain(y, 0.25)

    fused = FusedPipeline(be, fn)
    out_f = fused(ct)  # first: populates _addp_cache inside the trace
    out_e = fn(ct)
    assert out_f.level == out_e.level and out_f.scale == out_e.scale
    for cf, ce in zip(out_f.c, out_e.c):
        assert (np.asarray(cf) == np.asarray(ce)).all()
    for v in list(be._addp_cache.values()) + [
        h for h, _ in be._const_cache.values()
    ]:
        assert not isinstance(v, jax.core.Tracer)
    out_2 = fused(ct)  # cache-hit path: same program, same limbs
    for cf, ce in zip(out_2.c, out_e.c):
        assert (np.asarray(cf) == np.asarray(ce)).all()
