"""Sharded SPMD path vs single-chip path — element-exact on a 2x4 CPU mesh.

SURVEY.md §4 item 4: the 8-virtual-device CPU mesh is the fake-backend
equivalent; every all_to_all / all_gather actually executes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.ops.context import fourstep_split, make_context
from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from gpufhe_tpu.parallel import sharded as sh
from gpufhe_tpu.params.params import preset

PRESET = "tiny2"  # N=256 -> n1=n2=16; coeff axis 4 divides both


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return sh.make_fhe_mesh(2, 4, devices=jax.devices()[:8])


@pytest.fixture(scope="module")
def stack():
    params = preset(PRESET)
    ctx = make_context(params)
    chest = dkeys.keygen(params, np.random.default_rng(7))
    return params, ctx, chest


def _u32(x):
    return jnp.asarray(np.asarray(x, dtype=np.uint32))


def test_sharded_ntt_roundtrip_matches_single_chip(stack, mesh):
    params, ctx, _ = stack
    n1, n2 = fourstep_split(params.n)
    L = params.num_limbs
    rng = np.random.default_rng(0)
    x = np.stack(
        [rng.integers(0, q, size=params.n, dtype=np.int64) for q in params.q_primes]
    )

    t_q = sh._ntt_tables_for(ctx, np.arange(L))
    from jax.sharding import PartitionSpec as P

    fwd = jax.jit(
        jax.shard_map(
            lambda a, t: sh.ntt_fwd_body(a, t),
            mesh=mesh,
            in_specs=(P(None, "coeff", None), sh.ShardedNTT.spec()),
            out_specs=P(None, "coeff", None),
            check_vma=False,
        )
    )
    inv = jax.jit(
        jax.shard_map(
            lambda a, t: sh.ntt_inv_body(a, t),
            mesh=mesh,
            in_specs=(P(None, "coeff", None), sh.ShardedNTT.spec()),
            out_specs=P(None, "coeff", None),
            check_vma=False,
        )
    )

    x3 = sh.coeff_to_3d(_u32(x), n1, n2)
    e3 = fwd(x3, t_q)
    # compare against the single-chip transform (natural order)
    want = np.asarray(ntt_fwd(_u32(x), ctx, limbs=np.arange(L)))
    got = np.asarray(sh.eval3d_to_natural(e3))
    assert (got == want).all()

    back = inv(e3, t_q)
    assert (np.asarray(back).reshape(L, params.n) == x.astype(np.uint32)).all()

    # inverse on arbitrary eval input also matches single-chip inverse
    y = np.stack(
        [rng.integers(0, q, size=params.n, dtype=np.int64) for q in params.q_primes]
    )
    y3 = sh.natural_to_eval3d(_u32(y), n1, n2)
    got_inv = np.asarray(inv(y3, t_q)).reshape(L, params.n)
    want_inv = np.asarray(ntt_inv(_u32(y), ctx, limbs=np.arange(L)))
    assert (got_inv == want_inv).all()


def test_sharded_mult_matches_single_chip(stack, mesh):
    params, ctx, chest = stack
    rng = np.random.default_rng(5)
    za = rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)
    zb = rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)
    a = dct.encrypt(
        encoder.encode(za, params), params, chest.device_pk, ctx,
        np.random.default_rng(61), params.scale,
    )
    b = dct.encrypt(
        encoder.encode(zb, params), params, chest.device_pk, ctx,
        np.random.default_rng(62), params.scale,
    )

    # single-chip reference
    want = dct.ct_mul(a, b, params, ctx, chest.device_rlk)

    # sharded run
    run, prepare = sh.make_sharded_mult(params, a.level, mesh)
    bundle = prepare(chest.device_rlk)
    blocks = [sh.shard_ct_component(c, params, mesh) for c in (a.c + b.c)]
    c0, c1 = run(*blocks, bundle)

    got0 = sh.unshard_ct_component(c0)
    got1 = sh.unshard_ct_component(c1)
    assert (got0 == np.asarray(want.c[0])).all()
    assert (got1 == np.asarray(want.c[1])).all()


def test_weak_scaling_report_smoke(stack, mesh):
    """The scaling harness runs end-to-end on the CPU mesh."""
    from gpufhe_tpu.parallel.multihost import weak_scaling_report

    params, _, _ = stack
    rows = weak_scaling_report(params, [(1, 2), (2, 2)], iters=1)
    assert len(rows) == 2
    assert all(r["ops_per_s"] > 0 for r in rows)


def test_sharded_rotation_matches_single_chip(stack, mesh):
    params, ctx, _ = stack
    chest = dkeys.keygen(params, np.random.default_rng(9), rotations=(3,))
    rng = np.random.default_rng(6)
    z = rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(63), params.scale,
    )
    want = dct.ct_rotate(ct, 3, params, ctx, chest.galois_key(3))

    run, prepare = sh.make_sharded_rotation(params, ct.level, mesh, 3)
    bundle = prepare(chest.galois_key(3))
    c0 = sh.shard_ct_component(ct.c[0], params, mesh)
    c1 = sh.shard_ct_component(ct.c[1], params, mesh)
    o0, o1 = run(c0, c1, bundle)
    assert (sh.unshard_ct_component(o0) == np.asarray(want.c[0])).all()
    assert (sh.unshard_ct_component(o1) == np.asarray(want.c[1])).all()


@pytest.mark.slow
def test_two_process_distributed_mult():
    """jax.distributed 2-process run on localhost (SURVEY §4: the multi-host
    recipe); limb-axis collectives cross the process boundary."""
    import pathlib
    import subprocess
    import sys

    script = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "multihost_test.py"
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True, timeout=600,
        env={k: v for k, v in __import__("os").environ.items() if k != "XLA_FLAGS"},
    )
    assert "ok=True" in out.stdout, out.stdout + out.stderr


def test_sharded_bgv_mult_matches_single_chip(mesh):
    from gpufhe_tpu.ciphertext import bgv as dbgv
    from gpufhe_tpu.golden import bgv as gbgv

    params = preset("bgv_ci")
    # bgv_ci is N=2^10 -> n1=n2=32; the 2x4 mesh divides both
    ctx = make_context(params)
    chest = dbgv.keygen(params, np.random.default_rng(7))
    t = params.plain_modulus
    rng = np.random.default_rng(2)
    za = rng.integers(0, t, size=params.n)
    zb = rng.integers(0, t, size=params.n)
    a = dbgv.encrypt(gbgv.encode(za, params), params, chest.device_pk, ctx,
                     np.random.default_rng(31))
    b = dbgv.encrypt(gbgv.encode(zb, params), params, chest.device_pk, ctx,
                     np.random.default_rng(32))
    want = dbgv.ct_mul(a, b, params, ctx, chest.device_rlk)

    run, prepare = sh.make_sharded_mult(params, a.level, mesh)
    bundle = prepare(chest.device_rlk)
    blocks = [sh.shard_ct_component(c, params, mesh) for c in (a.c + b.c)]
    c0, c1 = run(*blocks, bundle)
    assert (sh.unshard_ct_component(c0) == np.asarray(want.c[0])).all()
    assert (sh.unshard_ct_component(c1) == np.asarray(want.c[1])).all()


def test_sharded_hoisted_fan_matches_single_chip(stack, mesh):
    """ShardedBackend.rotate_hoisted's shared-hoist fan == single-chip
    ct_rotate_hoisted, limb for limb (one ModUp for the whole fan)."""
    from gpufhe_tpu.parallel.backend import ShardedBackend

    params, ctx, _ = stack
    steps = (1, 2, 5)
    chest = dkeys.keygen(params, np.random.default_rng(11), rotations=steps)
    rng = np.random.default_rng(12)
    z = rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(13), params.scale,
    )
    want = dct.ct_rotate_hoisted(
        ct, list(steps), params, ctx, {s: chest.galois_key(s) for s in steps}
    )

    be = ShardedBackend(params, mesh, chest)
    sct = be.from_single(ct)
    got = be.rotate_hoisted(sct, list(steps))
    for s, w in zip(steps, want):
        g = got[s]
        assert g.level == w.level
        for cw, cg in zip(w.c, g.c):
            assert (sh.unshard_ct_component(cg) == np.asarray(cw)).all()


def test_sharded_bgv_rotation_matches_single_chip(mesh):
    """Sharded BGV rotate: the t-corrected ModDown rides the same galois
    program via the KS tables (VERDICT round-1 item 10)."""
    from gpufhe_tpu.ciphertext import bgv as dbgv
    from gpufhe_tpu.golden import bgv as gbgv

    params = preset("bgv_ci")
    ctx = make_context(params)
    chest = dbgv.keygen(params, np.random.default_rng(7), rotations=(3,))
    t = params.plain_modulus
    z = np.random.default_rng(8).integers(0, t, size=params.n)
    ct = dbgv.encrypt(gbgv.encode(z, params), params, chest.device_pk, ctx,
                      np.random.default_rng(33))
    want = dbgv.ct_rotate(ct, 3, params, ctx, chest.galois[3][1])

    run, prepare = sh.make_sharded_rotation(params, ct.level, mesh, 3)
    bundle = prepare(chest.galois[3][1])
    c0 = sh.shard_ct_component(ct.c[0], params, mesh)
    c1 = sh.shard_ct_component(ct.c[1], params, mesh)
    o0, o1 = run(c0, c1, bundle)
    assert (sh.unshard_ct_component(o0) == np.asarray(want.c[0])).all()
    assert (sh.unshard_ct_component(o1) == np.asarray(want.c[1])).all()
    got = dbgv.decrypt_decode(
        dbgv.BGVCiphertext(
            [jnp.asarray(sh.unshard_ct_component(o0)),
             jnp.asarray(sh.unshard_ct_component(o1))],
            want.level, want.pt_factor,
        ),
        params, chest.device_sk, ctx,
    )
    perm = gbgv.slot_rotation_perm(params, 3)
    assert (got == (z % t)[perm]).all()


@pytest.mark.slow
def test_sharded_backend_factored_transform_round_trip(mesh):
    """fftboot's CtS/StC running entirely on the ShardedBackend: the full
    sharded linear-transform stack (hoisted rotations, conjugation,
    plaintext MACs, rescale) over the mesh."""
    from gpufhe_tpu.ciphertext import fftboot as fb
    from gpufhe_tpu.golden import ckks as gckks
    from gpufhe_tpu.parallel.backend import ShardedBackend

    params = preset("fft_ci_small")
    ctx = make_context(params)
    rots = fb.factored_rotations(params.slots, radix_log=3)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    be = ShardedBackend(params, mesh, chest)

    rng = np.random.default_rng(0)
    n_s = params.slots
    z = rng.normal(size=n_s) + 1j * rng.normal(size=n_s)
    pt = encoder.encode(z, params)
    ct_single = dct.encrypt(
        pt, params, chest.device_pk, ctx, np.random.default_rng(1), params.scale
    )
    ct = be.from_single(ct_single)

    cts = fb.FactoredCtS(be, level=params.num_limbs, radix_log=3)
    lo, hi = cts(ct)
    m = np.asarray(
        gckks.crt_compose_centered(pt, params.q_primes), dtype=np.float64
    ) / params.scale
    br = fb.bit_rev_perm(n_s)
    assert np.abs(np.real(be.decrypt_decode(lo)) - m[:n_s][br]).max() < 1e-4

    stc = fb.FactoredStC(be, level=be.level(lo), radix_log=3)
    out = stc(lo, hi)
    assert np.abs(be.decrypt_decode(out) - z).max() < 1e-3


def test_sharded_fused_fan_matches_golden(mesh):
    """make_sharded_fan is limb-exact vs golden ct_diag_fan: one hoisted
    ModUp for the whole fan, delayed limb-reduce + ModDown, fused rescale
    (VERDICT r1 item 2: the sharded rotation-fan path is actually hoisted)."""
    from gpufhe_tpu.ciphertext.backend import GoldenBackend
    from gpufhe_tpu.golden import ckks as gckks
    from gpufhe_tpu.parallel.backend import ShardedBackend

    params = preset("fft_ci_small")
    ctx = make_context(params)
    rots = (1, 2, 5)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=rots, conjugation=False
    )
    sb = ShardedBackend(params, mesh, chest)
    gb = GoldenBackend(params, chest)
    rng = np.random.default_rng(0)
    ns = params.slots
    z = rng.normal(size=ns) + 1j * rng.normal(size=ns)
    pt = encoder.encode(z, params)
    ct_dev = dct.encrypt(
        pt, params, chest.device_pk, ctx, np.random.default_rng(1), params.scale
    )
    ct_g = gckks.encrypt(pt, params, chest.pk, np.random.default_rng(1), params.scale)

    d1 = rng.normal(size=ns) + 1j * rng.normal(size=ns)
    d2 = rng.normal(size=ns) + 1j * rng.normal(size=ns)
    sets = [{0: d1, 1: d2, 5: d1}, {1: d2, 2: d1}]
    out_s = sb.apply_fan(
        sb.from_single(ct_dev), sb.make_fan_plan(sets, ct_dev.level)
    )
    out_g = gb.apply_fan(ct_g, gb.make_fan_plan(sets, ct_g.level))
    for os_, og in zip(out_s, out_g):
        assert os_.level == og.level
        assert abs(os_.scale / og.scale - 1) < 1e-12
        single = sb.to_single(os_)
        for cd, cg in zip(single.c, og.c):
            assert (np.asarray(cd).astype(np.int64) == cg).all()


def test_sharded_bfv_mult_matches_single_chip(mesh):
    """Sharded BFV scale-invariant multiply (parallel/bfv_sharded.py) ==
    single-chip _bfv_tensor_core + relin, limb for limb. The BEHZ aux
    machinery is per-coefficient, so only the NTT all_to_alls and the
    key-switch allreduce touch the mesh."""
    from gpufhe_tpu.ciphertext import bfv as dbfv
    from gpufhe_tpu.golden import bfv as gbfv
    from gpufhe_tpu.parallel.bfv_sharded import make_sharded_bfv_mult

    params = preset("bfv_ci")  # N=2^10 -> n1=n2=32; the 2x4 mesh divides both
    ctx = make_context(params)
    chest = dbfv.keygen(params, np.random.default_rng(7))
    t = params.plain_modulus
    rng = np.random.default_rng(2)
    za = rng.integers(0, t, size=params.n)
    zb = rng.integers(0, t, size=params.n)
    a = dbfv.encrypt(gbfv.encode(za, params), params, chest.device_pk, ctx,
                     np.random.default_rng(31))
    b = dbfv.encrypt(gbfv.encode(zb, params), params, chest.device_pk, ctx,
                     np.random.default_rng(32))
    want = dbfv.ct_mul(a, b, params, ctx, chest.device_rlk)
    assert want.level == a.level  # BFV mult keeps the chain

    run, prepare = make_sharded_bfv_mult(params, a.level, mesh)
    bundle = prepare(chest.device_rlk)
    blocks = [sh.shard_ct_component(c, params, mesh) for c in (a.c + b.c)]
    c0, c1 = run(*blocks, bundle)
    assert (sh.unshard_ct_component(c0) == np.asarray(want.c[0])).all()
    assert (sh.unshard_ct_component(c1) == np.asarray(want.c[1])).all()


@pytest.mark.slow
def test_sharded_double_word_bootstrap_bit_exact(mesh):
    """The FULL double-word bootstrap composed over ShardedBackend ==
    DeviceBackend limb for limb (BASELINE config 5 "sharded" at the dw CI
    scale), and the second iteration performs ZERO host encodes (the
    sharded const/add_plain caches, VERDICT r2 weak #2)."""
    from gpufhe_tpu.ciphertext.backend import DeviceBackend
    from gpufhe_tpu.ciphertext.bootstrap import Bootstrapper, bootstrap_rotations
    from gpufhe_tpu.parallel.backend import ShardedBackend

    params = preset("boot_dw_ci")
    assert params.scale_words == 2
    ctx = make_context(params)
    rots = bootstrap_rotations(params, transform="factored", radix_log=6)
    chest = dkeys.keygen(
        params, np.random.default_rng(7), rotations=tuple(rots),
        conjugation=True,
    )
    dev = DeviceBackend(params, ctx, chest)
    bs_dev = Bootstrapper(
        dev, transform="factored", radix_log=6, evalmod="cheb", k_bound=5.0,
        fuse_evalmod=False,
    )
    shb = ShardedBackend(params, mesh, chest)
    bs_sh = Bootstrapper(
        shb, transform="factored", radix_log=6, evalmod="cheb", k_bound=5.0
    )

    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots)
         + 1j * rng.normal(size=params.slots)) * 0.2
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=2,
    )
    want = bs_dev(ct)
    got = bs_sh(shb.from_single(ct))
    assert got.level == want.level and got.scale == want.scale
    for cs, cd in zip(got.c, want.c):
        assert (sh.unshard_ct_component(cs) == np.asarray(cd)).all()

    before = shb.encode_misses
    got2 = bs_sh(shb.from_single(ct))
    assert shb.encode_misses == before, (
        f"{shb.encode_misses - before} host encodes in sharded steady state"
    )
    assert np.abs(shb.decrypt_decode(got2) - z).max() < 1e-3


def test_sharded_bfv_rotation_matches_single_chip(mesh):
    """Sharded BFV rotate (non-t-corrected KS view) == single-chip
    ct_rotate limb for limb; slots land where the automorphism sends them
    (VERDICT r2 item 10)."""
    from gpufhe_tpu.ciphertext import bfv as dbfv
    from gpufhe_tpu.golden import bfv as gbfv
    from gpufhe_tpu.parallel.bfv_sharded import (
        make_sharded_bfv_hoisted_fan,
        make_sharded_bfv_rotation,
    )

    params = preset("bfv_ci")
    ctx = make_context(params)
    chest = dbfv.keygen(params, np.random.default_rng(7), rotations=(3, 5))
    t = params.plain_modulus
    z = np.random.default_rng(8).integers(0, t, size=params.n)
    ct = dbfv.encrypt(gbfv.encode(z, params), params, chest.device_pk, ctx,
                      np.random.default_rng(33))
    want = dbfv.ct_rotate(ct, 3, params, ctx, chest.galois[3][1])
    assert want.level == ct.level  # BFV rotation keeps the chain

    run, prepare = make_sharded_bfv_rotation(params, ct.level, mesh, 3)
    bundle = prepare(chest.galois[3][1])
    c0 = sh.shard_ct_component(ct.c[0], params, mesh)
    c1 = sh.shard_ct_component(ct.c[1], params, mesh)
    o0, o1 = run(c0, c1, bundle)
    assert (sh.unshard_ct_component(o0) == np.asarray(want.c[0])).all()
    assert (sh.unshard_ct_component(o1) == np.asarray(want.c[1])).all()

    # hoisted fan: both rotations from ONE decomposition, == ct_rotate_hoisted
    from gpufhe_tpu.golden.ckks import galois_exponent
    from gpufhe_tpu.ops.context import fourstep_split

    n1, n2 = fourstep_split(params.n)
    gks = {s: chest.galois[s][1] for s in (3, 5)}
    want_fan = dbfv.ct_rotate_hoisted(ct, [3, 5], params, ctx, gks)
    fan_run, fan_prep = make_sharded_bfv_hoisted_fan(params, ct.level, mesh, 2)
    lins = jax.device_put(
        np.stack([
            sh._perm_lin_e3(galois_exponent(s, params.n), n1, n2)
            for s in (3, 5)
        ]),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "coeff", None)
        ),
    )
    outs = fan_run(c0, c1, lins, fan_prep([gks[3], gks[5]]))
    for (g0, g1), w in zip(outs, want_fan):
        assert (sh.unshard_ct_component(g0) == np.asarray(w.c[0])).all()
        assert (sh.unshard_ct_component(g1) == np.asarray(w.c[1])).all()


def test_permute_v2_routing_matches_v1_all_gather(mesh):
    """The 1x-traffic all_to_all-routed automorphism (_permute_body_v2) ==
    the all_gather path (_permute_body) element-exactly, for rotations and
    conjugation at several levels (VERDICT r2 item 4)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpufhe_tpu.golden.ckks import galois_exponent

    params = preset("ci_small")
    n1, n2 = fourstep_split(params.n)
    n_coeff = mesh.shape["coeff"]
    rng = np.random.default_rng(3)
    qp = np.asarray(params.q_primes + params.p_primes, dtype=np.uint32)
    x = rng.integers(0, qp[:, None, None], size=(len(qp), n1, n2),
                     dtype=np.uint32)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "coeff", None)))
    for g in [galois_exponent(1, params.n), galois_exponent(5, params.n),
              galois_exponent(params.slots - 1, params.n), 2 * params.n - 1]:
        lin = jnp.asarray(sh._perm_lin_e3(g, n1, n2))
        send_idx, src_of, col_idx = sh._perm_route_tables(g, n1, n2, n_coeff)

        v1 = jax.jit(jax.shard_map(
            sh._permute_body, mesh=mesh,
            in_specs=(P(None, "coeff", None), P("coeff", None)),
            out_specs=P(None, "coeff", None), check_vma=False,
        ))(xs, lin)
        v2 = jax.jit(jax.shard_map(
            lambda a, si, so, ci: sh._permute_body_v2(a, si, so[0], ci),
            mesh=mesh,
            in_specs=(P(None, "coeff", None), P("coeff", None, None),
                      P("coeff", None), P("coeff", None)),
            out_specs=P(None, "coeff", None), check_vma=False,
        ))(xs, jnp.asarray(send_idx), jnp.asarray(src_of),
           jnp.asarray(col_idx))
        assert (np.asarray(v1) == np.asarray(v2)).all(), f"g={g}"
