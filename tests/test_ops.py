"""TPU kernel layer vs golden model — element-exact (integer ==, never allclose).

Runs on the CPU backend (conftest) whose uint32/uint8 semantics match TPU;
the same assertions are exercised on the real chip by bench/smoke scripts.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gpufhe_tpu.golden import arithmetic as ga
from gpufhe_tpu.golden import ntt as gn
from gpufhe_tpu.ops import modops
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import CKKSParams, gen_ntt_primes, preset

RNG = np.random.default_rng(1)
Q = 2013265921  # < 2^31


def _u32(x):
    return jnp.asarray(np.asarray(x, dtype=np.uint32))


def test_mulhi32_exact():
    a = RNG.integers(0, 1 << 32, size=4096, dtype=np.uint64)
    b = RNG.integers(0, 1 << 32, size=4096, dtype=np.uint64)
    got = np.asarray(modops.mulhi32(_u32(a), _u32(b)))
    want = ((a.astype(object) * b.astype(object)) >> 32).astype(np.uint64)
    assert (got.astype(np.uint64) == want).all()


def test_mont_mac_matches_eager_chain():
    """mont_mac (paired-REDC MAC, round 5) == the per-term mont_mul +
    add_mod chain, element-exact, for any u32 a operands and canonical b
    operands, odd and even term counts, q near 2^30."""
    from gpufhe_tpu.golden.arithmetic import mont_constants
    from gpufhe_tpu.ops.modops import mont_mac

    for q in ((1 << 30) - 35, (1 << 28) + 625, 786433):
        qinv_neg, _ = mont_constants(q)
        qj = jnp.uint32(q)
        qi = jnp.uint32(qinv_neg)
        for terms in (1, 2, 3, 5, 6):
            a = [_u32(RNG.integers(0, 1 << 32, size=2048, dtype=np.uint64))
                 for _ in range(terms)]
            b = [_u32(RNG.integers(0, q, size=2048, dtype=np.int64))
                 for _ in range(terms)]
            want = None
            for ai, bi in zip(a, b):
                t = modops.mont_mul(ai, bi, qj, qi)
                want = t if want is None else modops.add_mod(want, t, qj)
            got = mont_mac(list(zip(a, b)), qj, qi)
            assert (np.asarray(got) == np.asarray(want)).all(), (q, terms)


def test_shoup_approx_range_and_congruence():
    """_shoup_approx (ops/ntt_pallas.py): for ANY uint32 a and q just under
    2^30, the result is congruent to a*w mod q and lies in [0, 4q) — the
    bound the v3 recombine's conditional subtract budget is sized for."""
    from gpufhe_tpu.ops.ntt_pallas import _shoup_approx

    for q in (1073741789, (1 << 30) - 35, (1 << 27) + 29, 2013265921 >> 1):
        # adversarial a: extremes + random; w: extremes + random
        a = np.concatenate([
            np.array([0, 1, q - 1, q, 2 * q - 1, (1 << 32) - 1], dtype=np.uint64),
            RNG.integers(0, 1 << 32, size=2048, dtype=np.uint64),
        ])
        w = np.concatenate([
            np.array([1, 2, q - 1, q // 2, 3, (1 << 25) % q], dtype=np.uint64),
            RNG.integers(0, q, size=2048, dtype=np.uint64),
        ])
        wsh = (w << np.uint64(32)) // np.uint64(q)
        got = np.asarray(
            _shoup_approx(
                _u32(a), _u32(w),
                _u32(wsh & np.uint64(0xFFFF)), _u32(wsh >> np.uint64(16)),
                jnp.uint32(q),
            )
        ).astype(np.uint64)
        assert (got < 4 * q).all(), f"range violated for q={q}"
        assert ((got % q) == ((a * w) % q)).all(), f"congruence broken for q={q}"


def test_add_sub_neg_mod_vs_golden():
    a = RNG.integers(0, Q, size=4096, dtype=np.int64)
    b = RNG.integers(0, Q, size=4096, dtype=np.int64)
    q = jnp.uint32(Q)
    assert (np.asarray(modops.add_mod(_u32(a), _u32(b), q)) == ga.vec_add(a, b, Q)).all()
    assert (np.asarray(modops.sub_mod(_u32(a), _u32(b), q)) == ga.vec_sub(a, b, Q)).all()
    assert (np.asarray(modops.neg_mod(_u32(a), q)) == ga.vec_sub(0 * a, a, Q)).all()


def test_mont_and_mul_mod_vs_golden():
    qinv_neg, r2 = ga.mont_constants(Q)
    a = RNG.integers(0, 1 << 32, size=4096, dtype=np.uint64)
    b = RNG.integers(0, Q, size=4096, dtype=np.uint64)
    got = np.asarray(
        modops.mont_mul(_u32(a), _u32(b), jnp.uint32(Q), jnp.uint32(qinv_neg))
    )
    assert (got == ga.mont_mul(a, b, Q, qinv_neg).astype(np.uint32)).all()
    # general mul: canonical x canonical
    a2 = RNG.integers(0, Q, size=4096, dtype=np.int64)
    got2 = np.asarray(
        modops.mul_mod(
            _u32(a2), _u32(b), jnp.uint32(Q), jnp.uint32(qinv_neg), jnp.uint32(r2)
        )
    )
    assert (got2 == np.asarray(ga.vec_mul(a2, b.astype(np.int64), Q), np.uint32)).all()


def test_barrett_reduce_u32():
    x = RNG.integers(0, 1 << 32, size=4096, dtype=np.uint64)
    got = np.asarray(modops.barrett_reduce_u32(_u32(x), jnp.uint32(Q)))
    assert (got.astype(np.uint64) == x % Q).all()


@pytest.mark.parametrize("preset_name", ["tiny", "tiny2"])
def test_mxu_ntt_matches_golden(preset_name):
    params = preset(preset_name)
    ctx = make_context(params)
    primes = params.q_primes + params.p_primes
    L, n = len(primes), params.n
    x = np.stack([RNG.integers(0, q, size=n, dtype=np.int64) for q in primes])

    from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv

    got = np.asarray(ntt_fwd(_u32(x), ctx))
    want = np.stack(
        [gn.ntt_fwd(x[i], primes[i], params.psi[i]) for i in range(L)]
    ).astype(np.uint32)
    assert (got == want).all()

    back = np.asarray(ntt_inv(jnp.asarray(got), ctx))
    assert (back == x.astype(np.uint32)).all()
    # inverse also matches golden inverse on arbitrary eval-domain input
    y = np.stack([RNG.integers(0, q, size=n, dtype=np.int64) for q in primes])
    got_inv = np.asarray(ntt_inv(_u32(y), ctx))
    want_inv = np.stack(
        [gn.ntt_inv(y[i], primes[i], params.psi[i]) for i in range(L)]
    ).astype(np.uint32)
    assert (got_inv == want_inv).all()


def test_mxu_ntt_limb_subset():
    params = preset("tiny2")
    ctx = make_context(params)
    n = params.n
    sub = slice(1, 3)
    primes = (params.q_primes + params.p_primes)[sub]
    psis = params.psi[sub]
    x = np.stack([RNG.integers(0, q, size=n, dtype=np.int64) for q in primes])

    from gpufhe_tpu.ops.ntt import ntt_fwd

    got = np.asarray(ntt_fwd(_u32(x), ctx, limbs=sub))
    want = np.stack(
        [gn.ntt_fwd(x[i], primes[i], psis[i]) for i in range(len(primes))]
    ).astype(np.uint32)
    assert (got == want).all()


def test_mxu_ntt_rectangular_split():
    # N = 2^7 -> n1=16, n2=8 (n1 != n2 path)
    n = 128
    q = gen_ntt_primes(28, 2 * n, 1)[0]
    params = CKKSParams(n=n, q_primes=(q,), p_primes=(), scale_bits=20)
    ctx = make_context(params)
    psi = params.psi[0]
    x = RNG.integers(0, q, size=(1, n), dtype=np.int64)

    from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv

    got = np.asarray(ntt_fwd(_u32(x), ctx))
    assert (got[0] == gn.ntt_fwd(x[0], q, psi).astype(np.uint32)).all()
    assert (np.asarray(ntt_inv(jnp.asarray(got), ctx)) == x.astype(np.uint32)).all()


def test_mxu_ntt_leading_batch_dims():
    params = preset("tiny")
    ctx = make_context(params)
    primes = params.q_primes + params.p_primes
    L, n = len(primes), params.n
    x = np.stack(
        [
            np.stack([RNG.integers(0, q, size=n, dtype=np.int64) for q in primes])
            for _ in range(3)
        ]
    )

    from gpufhe_tpu.ops.ntt import ntt_fwd

    got = np.asarray(ntt_fwd(_u32(x), ctx))
    for c in range(3):
        want = np.stack(
            [gn.ntt_fwd(x[c, i], primes[i], params.psi[i]) for i in range(L)]
        ).astype(np.uint32)
        assert (got[c] == want).all()


def test_pallas_kernel_matches_xla_path():
    """Fused Pallas four-step (interpret mode on CPU) vs the jnp path."""
    from gpufhe_tpu.ops.context import fourstep_split
    from gpufhe_tpu.ops.ntt_pallas import fourstep_pallas

    params = preset("tiny")
    ctx = make_context(params)
    primes = params.q_primes + params.p_primes
    L, n = len(primes), params.n
    n1, n2 = fourstep_split(n)
    x = np.stack([RNG.integers(0, q, size=n, dtype=np.int64) for q in primes])

    from gpufhe_tpu.ops.ntt import ntt_fwd

    want = np.asarray(ntt_fwd(_u32(x), ctx))  # jnp path (CPU backend)
    t = ctx.ntt_fwd
    got = np.asarray(
        fourstep_pallas(
            _u32(x).reshape(L, n1, n2), t.wl_digits, t.tw_mont, t.wr_digits,
            ctx.q, ctx.qinv_neg, ctx.digit_mont, interpret=True,
        )
    ).reshape(L, n)
    assert (got == want).all()


@pytest.mark.parametrize("direction", ["fwd", "inv"])
@pytest.mark.parametrize("approx", [False, True])
def test_pallas_v2_kernel_matches_xla_path(direction, approx):
    """Fused Pallas four-step v2 (stacked dots + offset digits + Shoup
    recombine; interpret mode on CPU) vs the jnp path, both directions."""
    from gpufhe_tpu.ops.context import fourstep_split
    from gpufhe_tpu.ops.ntt_pallas import fourstep_pallas_v2

    params = preset("tiny2")
    ctx = make_context(params)
    primes = params.q_primes + params.p_primes
    L, n = len(primes), params.n
    n1, n2 = fourstep_split(n)
    x = np.stack([RNG.integers(0, q, size=n, dtype=np.int64) for q in primes])

    from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv

    if direction == "fwd":
        want = np.asarray(ntt_fwd(_u32(x), ctx))
        t = ctx.ntt_fwd
        xm = _u32(x).reshape(L, n1, n2)
    else:
        want = np.asarray(ntt_inv(_u32(x), ctx))
        t = ctx.ntt_inv
        xm = _u32(x).reshape(L, n2, n1)
    got = np.asarray(
        fourstep_pallas_v2(
            xm, t.wl_cat, t.tw, t.tw_shoup, t.wr_cat, t.corr_l, t.corr_r,
            ctx.q, ctx.digit_plain, ctx.digit_shoup, interpret=True,
            approx=approx,
        )
    ).reshape(L, n)
    assert (got == want).all()


@pytest.mark.parametrize("direction", ["fwd", "inv"])
def test_pallas_v3_lazy_recombine_matches_xla_path(direction):
    """The q < 2^29 lazy [0, 4q)-accumulation recombine (round 5) is
    bit-exact with the jnp path on a sub-2^29 chain, and make_context's
    pytree-type gate (NTTTablesLazy) fires exactly when the chain
    qualifies."""
    import dataclasses

    from gpufhe_tpu.ops.context import NTTTablesLazy, fourstep_split
    from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
    from gpufhe_tpu.ops.ntt_pallas import fourstep_pallas_v3

    base = preset("tiny2")
    two_n = 2 * base.n
    params = dataclasses.replace(
        base, q_primes=tuple(gen_ntt_primes(28, two_n, 4)),
        p_primes=tuple(gen_ntt_primes(28, two_n, 2, skip=4)),
    )
    assert max(params.q_primes + params.p_primes) < (1 << 29)
    ctx = make_context(params)
    assert isinstance(ctx.ntt_fwd, NTTTablesLazy)  # the static gate
    assert not isinstance(make_context(base).ntt_fwd, NTTTablesLazy)
    primes = params.q_primes + params.p_primes
    n = params.n
    n1, n2 = fourstep_split(n)
    sel = [4, 1, 2]
    x = np.stack([RNG.integers(0, primes[i], size=n, dtype=np.int64)
                  for i in sel])
    if direction == "fwd":
        want = np.asarray(ntt_fwd(_u32(x), ctx, limbs=sel))
        t = ctx.ntt_fwd
        xm = _u32(x).reshape(len(sel), n1, n2)
    else:
        want = np.asarray(ntt_inv(_u32(x), ctx, limbs=sel))
        t = ctx.ntt_inv
        xm = _u32(x).reshape(len(sel), n2, n1)
    got = np.asarray(
        fourstep_pallas_v3(
            xm, jnp.asarray(np.asarray(sel, dtype=np.int32)),
            t.wl_cat, t.tw, t.tw_shoup, t.wr_cat, t.corr_l, t.corr_r,
            ctx.q, ctx.digit_plain, ctx.digit_shoup, interpret=True,
            approx=True, mode="mono", lazy=True,
        )
    ).reshape(len(sel), n)
    assert (got == want).all()


@pytest.mark.parametrize("direction", ["fwd", "inv"])
@pytest.mark.parametrize("mode", ["mono", "zip", "pipe"])
def test_pallas_v3_kernel_matches_xla_path(direction, mode):
    """Scalar-prefetch four-step v3 (interpret mode on CPU) vs the jnp path:
    full tables + a NON-CONTIGUOUS limb index vector, so the prefetch-driven
    block index maps are actually exercised. Covers all three scheduling
    modes (mono is the on-chip default; pipe/zip kept for A/B) and odd L
    (zip's pad-to-even path)."""
    from gpufhe_tpu.ops.context import fourstep_split
    from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
    from gpufhe_tpu.ops.ntt_pallas import fourstep_pallas_v3

    params = preset("tiny2")
    ctx = make_context(params)
    primes = params.q_primes + params.p_primes
    n = params.n
    n1, n2 = fourstep_split(n)
    sel = [1, 3, 0]  # non-contiguous, odd length
    x = np.stack([RNG.integers(0, primes[i], size=n, dtype=np.int64)
                  for i in sel])
    if direction == "fwd":
        want = np.asarray(ntt_fwd(_u32(x), ctx, limbs=sel))
        t = ctx.ntt_fwd
        xm = _u32(x).reshape(len(sel), n1, n2)
    else:
        want = np.asarray(ntt_inv(_u32(x), ctx, limbs=sel))
        t = ctx.ntt_inv
        xm = _u32(x).reshape(len(sel), n2, n1)
    got = np.asarray(
        fourstep_pallas_v3(
            xm, jnp.asarray(np.asarray(sel, dtype=np.int32)),
            t.wl_cat, t.tw, t.tw_shoup, t.wr_cat, t.corr_l, t.corr_r,
            ctx.q, ctx.digit_plain, ctx.digit_shoup, interpret=True,
            approx=True, mode=mode,
        )
    ).reshape(len(sel), n)
    assert (got == want).all()


def test_digit_convert_matches_base_convert():
    """The MXU digit base conversion (ops/convert_pallas.py, interpret mode
    on CPU) == the per-term Shoup formulation, element-exact, at a BFV-like
    wide source basis."""
    from gpufhe_tpu.golden import rns as grns
    from gpufhe_tpu.ops.convert_pallas import digit_convert, make_digit_convert
    from gpufhe_tpu.params.params import gen_ntt_primes
    from gpufhe_tpu.primitives.rns import _base_convert_shoup, _mont_np
    from gpufhe_tpu.ops.modops import shoup_np

    n = 2048
    src = tuple(gen_ntt_primes(28, 2 * 128, 12))
    dst = tuple(gen_ntt_primes(29, 2 * 128, 14))
    qhat_m = _mont_np(grns.qhat_inv(src), np.array(src, dtype=np.int64))
    x = np.stack([
        RNG.integers(0, q, size=n, dtype=np.int64) for q in src
    ]).astype(np.uint32)

    dst_col = np.array(dst, dtype=np.int64)[:, None]
    conv = grns.conv_matrix(src, dst) % dst_col
    import jax.numpy as jnp

    want = np.asarray(_base_convert_shoup(
        jnp.asarray(x),
        jnp.asarray(np.array(src, dtype=np.uint32)),
        jnp.asarray(np.array(
            [(-pow(q, -1, 1 << 32)) % (1 << 32) for q in src], dtype=np.uint32
        )),
        jnp.asarray(qhat_m),
        jnp.asarray(conv.astype(np.uint32)),
        jnp.asarray(shoup_np(conv, dst_col)),
        jnp.asarray(np.array(dst, dtype=np.uint32)),
    ))

    dc = make_digit_convert(src, dst, qhat_m)
    got = np.asarray(digit_convert(jnp.asarray(x), dc, interpret=True))
    assert (got == want).all()


def test_ks_context_digit_tables_match_shoup():
    """The KSContext MXU tables (modup_dc / p2q_dc, incl. the BGV t-folded
    ModDown matrix) reproduce the Shoup path element-exact — the contract the
    TPU dispatch in mod_up/mod_down (primitives/rns.py) relies on."""
    import dataclasses

    import jax.numpy as jnp

    from gpufhe_tpu.ops.context import make_context
    from gpufhe_tpu.ops.convert_pallas import digit_convert
    from gpufhe_tpu.params.params import preset
    from gpufhe_tpu.primitives.rns import (
        _base_convert_shoup,
        ks_groups,
        make_ks_context,
    )

    for t in (0, 786433):  # CKKS and BGV (t-folded p2q) variants
        params = preset("tiny2")
        if t:
            params = dataclasses.replace(params, plain_modulus=t)
        level = params.num_limbs
        ctx = make_context(params)
        ksc = make_ks_context(params, level)
        alpha = len(params.p_primes)
        qp_idx = np.asarray(
            list(range(level))
            + list(range(params.num_limbs, params.num_limbs + alpha))
        )
        n = params.n
        x = np.stack([
            RNG.integers(0, int(q), size=n, dtype=np.int64)
            for q in params.q_primes + params.p_primes
        ]).astype(np.uint32)
        xj = jnp.asarray(x)
        for g, (d0, d1) in enumerate(ks_groups(params, level)):
            src_idx = np.arange(d0, d1)
            want = np.asarray(_base_convert_shoup(
                xj[d0:d1], ctx.q[src_idx], ctx.qinv_neg[src_idx],
                ksc.modup_qhatinv[g], ksc.modup_conv_plain[g],
                ksc.modup_conv_shoup[g], ctx.q[qp_idx],
            ))
            got = np.asarray(digit_convert(xj[d0:d1], ksc.modup_dc[g],
                                           interpret=True))
            assert (got == want).all(), f"modup group {g} t={t}"
        p_rows = jnp.asarray(x[level:level + alpha])
        p_idx = np.asarray(
            list(range(params.num_limbs, params.num_limbs + alpha))
        )
        want = np.asarray(_base_convert_shoup(
            p_rows, ctx.q[p_idx], ctx.qinv_neg[p_idx], ksc.p2q_qhatinv,
            ksc.p2q_conv_plain, ksc.p2q_conv_shoup, ctx.q[:level],
        ))
        got = np.asarray(digit_convert(p_rows, ksc.p2q_dc, interpret=True))
        assert (got == want).all(), f"p2q t={t}"
