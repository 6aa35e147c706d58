"""Pallas-fused four-step NTT: the hot kernel of the whole framework.

The XLA formulation (ops/ntt.py) materializes the 16 int8-digit-pair matmul
partials as int32[L, 4, a, 4, b] in HBM — 64x the polynomial's bytes per
stage, which makes the transform HBM-bound at a few percent of roofline.
This kernel runs one limb's whole transform per grid step with everything
resident in VMEM:

    load X[n1, n2] (u32, ~256 KB at N=2^16)
      stage 1: signed digits -> 16 s8xs8->s32 MXU dots, recombined on the
               fly (only one [n1, n2] i32 accumulator live at a time)
      twiddle: one Montgomery multiply (VPU)
      stage 2: same digit dance against WR
    write C^T (the natural-order output block)

HBM traffic per limb-transform drops to x + tables + output ~= 5 reads/writes
of [n1, n2] u32 instead of ~70. Bit-exact with the XLA path by construction:
identical digit recoding, dot contractions, recombine order, and Montgomery
ops (tests/test_ops.py::test_pallas_matches_xla).

Used automatically on TPU backends; the jnp path remains the CPU/test
fallback (ops/ntt.py dispatches).
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpufhe_tpu.ops.modops import add_mod, mont_mul

import numpy as np

_BYTE = np.uint32(0xFF)


def _staged_kernel_trace():
    """Neutralize jax.ensure_compile_time_eval() around Pallas kernel tracing.

    FusedPipeline (ciphertext/backend.py) traces backend compositions under
    ensure_compile_time_eval(), which is config.eager_constant_folding(True):
    primitives with no tracer operands get EVALUATED instead of staged. The
    Pallas kernel body contains `pl.program_id(0)` — zero operands, no eval
    rule — so kernel tracing dies with NotImplementedError unless constant
    folding is switched back off for the duration of the pallas_call
    (tests/test_pipeline.py::test_fused_pipeline_pallas_trace)."""
    try:
        from jax._src import config as _cfg

        return _cfg.eager_constant_folding(False)
    except Exception:  # pragma: no cover - future jax refactor
        return contextlib.nullcontext()


def _sdigits(x: jnp.ndarray) -> list[jnp.ndarray]:
    """uint32[a, b] -> four int8[a, b] signed digit planes (ntt.py _to_digits)."""
    planes = []
    c = jnp.zeros_like(x)
    for t in range(4):
        v = ((x >> np.uint32(8 * t)) & _BYTE) + c
        c = (v > np.uint32(127)).astype(jnp.uint32)
        planes.append(
            (v.astype(jnp.int32) - (c << np.uint32(8)).astype(jnp.int32)).astype(
                jnp.int8
            )
        )
    return planes


def _mod_matmul(xd: list, w_digits, q, qinv, dm, left: bool) -> jnp.ndarray:
    """Exact mod-q matmul from digit planes, partials never leaving registers/VMEM.

    left=True:  out[i, b] = sum_j W[i, j] X[j, b]   (W digits on the left)
    left=False: out[a, k] = sum_j X[a, j] W[j, k]
    """
    qi32 = q.astype(jnp.int32)
    acc = None
    for t in range(7):
        tt = None
        for e in range(4):
            d = t - e
            if not 0 <= d < 4:
                continue
            if left:
                prod = jax.lax.dot_general(
                    w_digits[e], xd[d], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            else:
                prod = jax.lax.dot_general(
                    xd[d], w_digits[e], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            tt = prod if tt is None else tt + prod
        contrib = mont_mul((tt + qi32).astype(jnp.uint32), dm[t], q, qinv)
        acc = contrib if acc is None else add_mod(acc, contrib, q)
    return acc


def _fourstep_kernel(q_ref, qinv_ref, dm_ref, x_ref, wl_ref, tw_ref, wr_ref, o_ref):
    l = pl.program_id(0)
    q = q_ref[l]
    qinv = qinv_ref[l]
    dm = [dm_ref[l, t] for t in range(7)]
    x = x_ref[0]  # u32[a, b]
    wl = [wl_ref[0, e] for e in range(4)]  # i8[a, a]
    wr = [wr_ref[0, e] for e in range(4)]  # i8[b, b]

    a_mat = _mod_matmul(_sdigits(x), wl, q, qinv, dm, left=True)
    b_mat = mont_mul(a_mat, tw_ref[0], q, qinv)
    c_mat = _mod_matmul(_sdigits(b_mat), wr, q, qinv, dm, left=False)
    o_ref[0] = c_mat.T  # natural-order output block [b, a]


def _shoup(a, w, w_sh, q):
    """a * w mod q in [0, 2q) for ANY uint32 a and canonical w < q (Shoup).

    quot = floor(a * w_sh / 2^32) with w_sh = floor(w * 2^32 / q) under-
    estimates floor(a*w/q) by at most 1 (error < a/2^32 < 1), so
    r = a*w - quot*q lands in [0, 2q); the uint32 wraparound of both
    products is exact because the true r fits in 32 bits. 19 VPU ops vs
    Montgomery's ~35 — the recombine's scalar taps and the twiddle are the
    kernel's hottest elementwise work."""
    from gpufhe_tpu.ops.modops import mulhi32

    quot = mulhi32(a, w_sh)
    return a * w - quot * q


def _lazy_sub(s, two_q):
    return jnp.where(s >= two_q, s - two_q, s)


def _shoup_approx(a, w, b0, b1, q):
    """a * w mod q in [0, 4q) for ANY uint32 a; q < 2^30 (v3 recombine).

    Same contract as _shoup but with the quotient estimated from only the
    three high 16x16 partial products of a * w_shoup (b0/b1 = the 16-bit
    halves of w_shoup, precomputed by the caller — free when w_shoup is a
    per-limb scalar). Dropping the low product and the cross-term carries
    underestimates the exact mulhi by at most 2, on top of Shoup's own
    deficit of 1, so r = a*w - quot*q lies in [0, 4q); 4q < 2^32 is
    guaranteed by the < 2^30 prime discipline (ops/context.py _digits_i8),
    so the uint32 wraparound of every product is exact. 12 VPU ops vs
    _shoup's ~22 — this is the difference that took the recombine off the
    kernel's critical path (round 4)."""
    a0 = a & np.uint32(0xFFFF)
    a1 = a >> np.uint32(16)
    quot = a1 * b1 + ((a0 * b1) >> np.uint32(16)) + ((a1 * b0) >> np.uint32(16))
    return a * w - quot * q


def _recombine_taps_approx(taps, corr, dmp, dms, q, col: bool):
    """v3 recombine: approx-Shoup taps, t=0 multiplier-free. Result [0, 2q).

    The t=0 constant is 2^0 = 1, and u_0 = taps_0 + corr_0 is already in
    [0, q + 2^23) subset [0, 2q) (single digit-pair block, |tap| <= 2^22,
    corr = 128*rowsum + q), so it is its own representative — no multiply.
    Every other tap uses _shoup_approx ([0, 4q)) plus one conditional
    subtract back to [0, 2q) before the lazy accumulation. Bit-exact with
    _recombine_taps: intermediate representatives differ but every term is
    congruent mod q and the caller canonicalizes."""
    two_q = q + q
    s = None
    for t in range(7):
        u = taps[t].astype(jnp.uint32) + (corr[t][None, :] if col else corr[t][:, None])
        if t == 0:
            c = u
        else:
            b0 = dms[t] & np.uint32(0xFFFF)
            b1 = dms[t] >> np.uint32(16)
            c = _lazy_sub(_shoup_approx(u, dmp[t], b0, b1, q), two_q)
        s = c if s is None else _lazy_sub(s + c, two_q)
    return s


def _recombine_taps_approx_lazy(taps, corr, dmp, dms, q, col: bool):
    """Round-5 q < 2^29 recombine: [0, 4q) terms, ONE conditional subtract
    per tap. Result in [0, 4q).

    With every prime under 2^29 the [0, 4q) output of _shoup_approx can be
    accumulated DIRECTLY — s, c in [0, 4q) gives s + c in [0, 8q) < 2^32,
    so a single conditional subtract of 4q per tap replaces the approx
    path's two-step reduce (per-tap subtract back to [0, 2q) plus the
    accumulator's own lazy subtract): 6 fewer VPU ops per tap. Bit-exact
    with _recombine_taps: every term is congruent mod q and the caller
    canonicalizes from [0, 4q) with two conditional subtracts (stage-1
    results skip even that — the twiddle _shoup_approx takes any u32).
    VERDICT r4 item 2 (the identified, previously untried ~10% lever)."""
    four_q = q * np.uint32(4)  # < 2^31: exact for q < 2^29
    s = None
    for t in range(7):
        u = taps[t].astype(jnp.uint32) + (corr[t][None, :] if col else corr[t][:, None])
        if t == 0:
            c = u  # [0, q + 2^23) subset [0, 4q) — multiplier-free
        else:
            b0 = dms[t] & np.uint32(0xFFFF)
            b1 = dms[t] >> np.uint32(16)
            c = _shoup_approx(u, dmp[t], b0, b1, q)  # [0, 4q)
        s = c if s is None else _lazy_sub(s + c, four_q)
    return s


def _offset_digits_cat(x, axis: int):
    """u32[a, b] -> i8 offset digits, concatenated along `axis`.

    d_t = ((x >> 8t) & 0xFF) - 128: carry-free (3 VPU ops/plane, no serial
    chain) and exact for ANY uint32 — the +128 offsets are repaid by the
    host-precomputed corr tables (ops/context.py _offset_corr). This is what
    legalizes the lazy [0, 2q) intermediates from _shoup."""
    planes = [
        (((x >> np.uint32(8 * t)) & _BYTE).astype(jnp.int32) - 128).astype(jnp.int8)
        for t in range(4)
    ]
    return jnp.concatenate(planes, axis=axis)


def _recombine_taps(taps, corr, dmp, dms, q, col: bool):
    """sum_t taps[t] * 2^(8t) mod q from i32 tap accumulators, in [0, 2q).

    corr[t] (+q folded in) makes each tap the nonnegative exact
    representative; Shoup scalar mults + lazy conditional subtracts keep
    everything in uint32."""
    two_q = q + q
    s = None
    for t in range(7):
        u = taps[t].astype(jnp.uint32) + (corr[t][None, :] if col else corr[t][:, None])
        c = _shoup(u, dmp[t], dms[t], q)
        s = c if s is None else _lazy_sub(s + c, two_q)
    return s


def _fourstep_body_v2(i, li, q_ref, dmp_ref, dms_ref, x_ref, wl_ref, tw_ref,
                      twsh_ref, wr_ref, cl_ref, cr_ref, o_ref,
                      approx: bool = False, lazy: bool = False):
    assert approx or not lazy, "lazy recombine builds on the approx taps"
    q = q_ref[li]
    dmp = [dmp_ref[li, t] for t in range(7)]
    dms = [dms_ref[li, t] for t in range(7)]
    recombine = (_recombine_taps_approx_lazy if lazy
                 else _recombine_taps_approx if approx else _recombine_taps)
    x = x_ref[i]  # u32[a, b]
    a = x.shape[0]
    b = x.shape[1]

    # stage 1: A = WL @ X mod q. One i8 digit dot per W-plane against the
    # column-concatenated X digits (a, 4b) — 4 MXU calls of shape
    # (a, a) @ (a, 4b) instead of v1's 16 of (a, a) @ (a, b).
    xcat = _offset_digits_cat(x, axis=1)
    taps = [None] * 7
    for e in range(4):
        s_e = jax.lax.dot_general(
            wl_ref[i, e * a:(e + 1) * a, :], xcat,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        for d in range(4):
            t = e + d
            blk = s_e[:, d * b:(d + 1) * b]
            taps[t] = blk if taps[t] is None else taps[t] + blk
    cl = [cl_ref[i, t] for t in range(7)]
    a_mat = recombine(taps, cl, dmp, dms, q, col=False)  # [0, 2q)

    # twiddle (elementwise Shoup; any-u32 input is fine for offset digits,
    # and the approx variant's [0, 4q) output is too)
    if approx:
        tws = twsh_ref[i]
        b_mat = _shoup_approx(a_mat, tw_ref[i], tws & np.uint32(0xFFFF),
                              tws >> np.uint32(16), q)
    else:
        b_mat = _shoup(a_mat, tw_ref[i], twsh_ref[i], q)

    # stage 2: C = B @ WR mod q, digit planes contracted against the
    # column-concatenated WR (b, 4b)
    taps2 = [None] * 7
    for d in range(4):
        bd = (((b_mat >> np.uint32(8 * d)) & _BYTE).astype(jnp.int32) - 128).astype(
            jnp.int8
        )
        s_d = jax.lax.dot_general(
            bd, wr_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        for e in range(4):
            t = e + d
            blk = s_d[:, e * b:(e + 1) * b]
            taps2[t] = blk if taps2[t] is None else taps2[t] + blk
    cr = [cr_ref[i, t] for t in range(7)]
    c_mat = recombine(taps2, cr, dmp, dms, q, col=True)
    if lazy:
        c_mat = _lazy_sub(c_mat, q + q)  # [0, 4q) -> [0, 2q)
    c_mat = jnp.where(c_mat >= q, c_mat - q, c_mat)  # canonical [0, q)
    o_ref[i] = c_mat.T


def _make_fourstep_kernel_v2(interleave: int, approx: bool = False,
                             lazy: bool = False):
    """interleave > 1 runs that many limbs per grid step: their dot/recombine
    chains are independent, so the VLIW scheduler can overlap one limb's MXU
    dots with another's VPU recombine."""

    def kernel(q_ref, dmp_ref, dms_ref, x_ref, wl_ref, tw_ref, twsh_ref,
               wr_ref, cl_ref, cr_ref, o_ref):
        g = pl.program_id(0)
        for i in range(interleave):
            _fourstep_body_v2(
                i, g * interleave + i, q_ref, dmp_ref, dms_ref, x_ref, wl_ref,
                tw_ref, twsh_ref, wr_ref, cl_ref, cr_ref, o_ref, approx=approx,
                lazy=lazy,
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "approx", "lazy"))
def fourstep_pallas_v2(
    x: jnp.ndarray,
    wl_cat: jnp.ndarray,
    tw: jnp.ndarray,
    tw_shoup: jnp.ndarray,
    wr_cat: jnp.ndarray,
    corr_l: jnp.ndarray,
    corr_r: jnp.ndarray,
    q: jnp.ndarray,
    digit_plain: jnp.ndarray,
    digit_shoup: jnp.ndarray,
    interpret: bool = False,
    approx: bool = False,
    lazy: bool = False,
) -> jnp.ndarray:
    """Fused four-step core v2: one stacked digit dot per W plane, offset
    (carry-free) runtime digits, Shoup tap/twiddle reduction with lazy
    [0, 2q) intermediates. Bit-exact with ops/ntt.py's jnp formulation
    (canonical output; tests/test_ops.py). approx=True swaps in the
    round-4 approximate-mulhi recombine (_shoup_approx) — same output
    bits, ~35% fewer elementwise VPU ops."""
    L, a, b = x.shape
    # measured on chip at N=2^16 L=30: interleave 1/2/3 = 5.76/5.94/6.04 us
    # per limb-transform — cross-limb ILP does not help Mosaic here
    il = int(os.environ.get("GPUFHE_NTT_INTERLEAVE", "1"))
    while L % il:
        il -= 1
    vm = pltpu.VMEM
    sm = pltpu.SMEM
    with _staged_kernel_trace():
        return pl.pallas_call(
            _make_fourstep_kernel_v2(il, approx=approx, lazy=lazy),
            grid=(L // il,),
            in_specs=[
                pl.BlockSpec(memory_space=sm),  # q [L]
                pl.BlockSpec(memory_space=sm),  # digit_plain [L, 7]
                pl.BlockSpec(memory_space=sm),  # digit_shoup [L, 7]
                pl.BlockSpec((il, a, b), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((il, 4 * a, a), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((il, a, b), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((il, a, b), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((il, b, 4 * b), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((il, 7, a), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((il, 7, b), lambda l: (l, 0, 0), memory_space=vm),
            ],
            out_specs=pl.BlockSpec((il, b, a), lambda l: (l, 0, 0), memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((L, b, a), jnp.uint32),
            interpret=interpret,
        )(q, digit_plain, digit_shoup, x, wl_cat, tw, tw_shoup, wr_cat,
          corr_l, corr_r)


def _fourstep_v3_stage_a(par, x_ref, wl_ref, t1_ref):
    """Stage A (limb g): stage-1 digit dots X -> tap accumulators (MXU).

    Writes the 7 i32 tap planes for limb g into t1_ref[par]."""
    x = x_ref[0]
    a = x.shape[0]
    b = x.shape[1]
    xcat = _offset_digits_cat(x, axis=1)
    taps = [None] * 7
    for e in range(4):
        s_e = jax.lax.dot_general(
            wl_ref[0, e * a:(e + 1) * a, :], xcat,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        for d in range(4):
            t = e + d
            blk = s_e[:, d * b:(d + 1) * b]
            taps[t] = blk if taps[t] is None else taps[t] + blk
    for t in range(7):
        t1_ref[par, t] = taps[t]


def _fourstep_v3_stage_b(par, li, q_ref, dmp_ref, dms_ref, tw_ref, twsh_ref,
                         wr_ref, cl_ref, t1_ref, t2_ref, approx: bool):
    """Stage B' (limb g-1): recombine stage-1 taps, twiddle, re-digitize,
    stage-2 dots -> tap accumulators (VPU then MXU)."""
    q = q_ref[li]
    dmp = [dmp_ref[li, t] for t in range(7)]
    dms = [dms_ref[li, t] for t in range(7)]
    recombine = _recombine_taps_approx if approx else _recombine_taps
    taps = [t1_ref[par, t] for t in range(7)]
    cl = [cl_ref[0, t] for t in range(7)]
    a_mat = recombine(taps, cl, dmp, dms, q, col=False)
    if approx:
        tws = twsh_ref[0]
        b_mat = _shoup_approx(a_mat, tw_ref[0], tws & np.uint32(0xFFFF),
                              tws >> np.uint32(16), q)
    else:
        b_mat = _shoup(a_mat, tw_ref[0], twsh_ref[0], q)
    b = b_mat.shape[1]
    taps2 = [None] * 7
    for d in range(4):
        bd = (((b_mat >> np.uint32(8 * d)) & _BYTE).astype(jnp.int32)
              - 128).astype(jnp.int8)
        s_d = jax.lax.dot_general(
            bd, wr_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        for e in range(4):
            t = e + d
            blk = s_d[:, e * b:(e + 1) * b]
            taps2[t] = blk if taps2[t] is None else taps2[t] + blk
    for t in range(7):
        t2_ref[par, t] = taps2[t]


def _fourstep_v3_stage_d(par, li, q_ref, dmp_ref, dms_ref, cr_ref, t2_ref,
                         o_ref, approx: bool):
    """Stage D (limb g-2): recombine stage-2 taps, canonicalize, transpose,
    write the output block (VPU)."""
    q = q_ref[li]
    dmp = [dmp_ref[li, t] for t in range(7)]
    dms = [dms_ref[li, t] for t in range(7)]
    recombine = _recombine_taps_approx if approx else _recombine_taps
    taps2 = [t2_ref[par, t] for t in range(7)]
    cr = [cr_ref[0, t] for t in range(7)]
    c_mat = recombine(taps2, cr, dmp, dms, q, col=True)
    c_mat = jnp.where(c_mat >= q, c_mat - q, c_mat)
    o_ref[0] = c_mat.T


def _make_fourstep_kernel_v3(L: int, approx: bool):
    """Software-pipelined four-step kernel: three stages, two limbs apart.

    Round-4 ablation (scripts/ntt_ablate.py): the monolithic v2 body runs
    MXU dots (~2.6 us/limb) and the VPU recombines (~3.3 us/limb) back to
    back — wall == their SUM, zero overlap, because every dot's result is
    consumed immediately by the tap adds feeding the recombine chain. This
    kernel splits the per-limb chain into three stages that are mutually
    INDEPENDENT within a grid step (they touch different limbs), so the
    scheduler can overlap limb g's MXU dots with limb g-1/g-2's VPU
    recombines:

        step g:  A(limb g)    stage-1 dots          -> t1 scratch [MXU]
                 B'(limb g-1) recombine+twiddle+
                              stage-2 dots          -> t2 scratch [VPU+MXU]
                 D(limb g-2)  final recombine+out              [VPU]

    Scratch: two double-buffered 7-tap i32 planes (2 x 3.5 MB at N=2^16),
    parity-indexed; grid runs L+2 steps (2 fill/drain)."""

    def kernel(idx_ref, q_ref, dmp_ref, dms_ref, x_ref, wl_ref, tw_ref,
               twsh_ref, wr_ref, cl_ref, cr_ref, o_ref, t1_ref, t2_ref):
        g = pl.program_id(0)
        par = jax.lax.rem(g, 2)

        # scratch parity as STATIC indices: each stage is emitted twice
        # under complementary pl.when guards so Mosaic never sees a
        # dynamic leading index into the tap scratch buffers
        for p in (0, 1):
            @pl.when((g < L) & (par == p))
            def _a(p=p):
                _fourstep_v3_stage_a(p, x_ref, wl_ref, t1_ref)

            @pl.when((g >= 1) & (g < L + 1) & (par == p))
            def _b(p=p):
                li = idx_ref[jnp.maximum(g - 1, 0)]
                _fourstep_v3_stage_b(1 - p, li, q_ref, dmp_ref, dms_ref,
                                     tw_ref, twsh_ref, wr_ref, cl_ref,
                                     t1_ref, t2_ref, approx)

            @pl.when((g >= 2) & (par == p))
            def _d(p=p):
                li = idx_ref[jnp.maximum(g - 2, 0)]
                _fourstep_v3_stage_d(p, li, q_ref, dmp_ref, dms_ref, cr_ref,
                                     t2_ref, o_ref, approx)

    return kernel


def _limb_chunks(li, q_ref, dmp_ref, dms_ref, x, wl_ref, tw_ref, twsh_ref,
                 wr_ref, cl_ref, cr_ref, o_ref, oi, approx: bool):
    """One limb's four-step transform as a GENERATOR yielding after each
    schedulable chunk (a dot, a tap recombine, the twiddle...). Zipping two
    limbs' generators round-robin interleaves their ops in TRACE order, so
    an in-order scheduler can run limb A's VPU recombine while limb B's
    independent MXU dot executes — the overlap the stage-split pipeline
    failed to get from Mosaic (round-4 measurement)."""
    q = q_ref[li]
    dmp = [dmp_ref[li, t] for t in range(7)]
    dms = [dms_ref[li, t] for t in range(7)]
    recombine = _recombine_taps_approx if approx else _recombine_taps
    a = x.shape[0]
    b = x.shape[1]
    xcat = _offset_digits_cat(x, axis=1)
    yield
    taps = [None] * 7
    for e in range(4):
        s_e = jax.lax.dot_general(
            wl_ref[0, e * a:(e + 1) * a, :], xcat,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        yield
        for d in range(4):
            t = e + d
            blk = s_e[:, d * b:(d + 1) * b]
            taps[t] = blk if taps[t] is None else taps[t] + blk
        yield
    cl = [cl_ref[0, t] for t in range(7)]
    a_mat = recombine(taps, cl, dmp, dms, q, col=False)
    yield
    if approx:
        tws = twsh_ref[0]
        b_mat = _shoup_approx(a_mat, tw_ref[0], tws & np.uint32(0xFFFF),
                              tws >> np.uint32(16), q)
    else:
        b_mat = _shoup(a_mat, tw_ref[0], twsh_ref[0], q)
    yield
    taps2 = [None] * 7
    for d in range(4):
        bd = (((b_mat >> np.uint32(8 * d)) & _BYTE).astype(jnp.int32)
              - 128).astype(jnp.int8)
        yield
        s_d = jax.lax.dot_general(
            bd, wr_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        yield
        for e in range(4):
            t = e + d
            blk = s_d[:, e * b:(e + 1) * b]
            taps2[t] = blk if taps2[t] is None else taps2[t] + blk
        yield
    cr = [cr_ref[0, t] for t in range(7)]
    c_mat = recombine(taps2, cr, dmp, dms, q, col=True)
    c_mat = jnp.where(c_mat >= q, c_mat - q, c_mat)
    o_ref[oi] = c_mat.T
    yield


def _make_fourstep_kernel_v3_zip(approx: bool):
    """Two limbs per grid step, ops interleaved round-robin in trace order
    (see _limb_chunks). Tables arrive as TWO spec sets (even/odd limb)."""

    def kernel(idx_ref, q_ref, dmp_ref, dms_ref, x_ref,
               wl0, tw0, twsh0, wr0, cl0, cr0,
               wl1, tw1, twsh1, wr1, cl1, cr1, o_ref):
        g = pl.program_id(0)
        gens = [
            _limb_chunks(idx_ref[2 * g], q_ref, dmp_ref, dms_ref, x_ref[0],
                         wl0, tw0, twsh0, wr0, cl0, cr0, o_ref, 0, approx),
            _limb_chunks(idx_ref[2 * g + 1], q_ref, dmp_ref, dms_ref,
                         x_ref[1], wl1, tw1, twsh1, wr1, cl1, cr1, o_ref, 1,
                         approx),
        ]
        # round-robin with a half-phase offset: start limb 0 one chunk
        # early so its dot is in flight when limb 1's first dot issues
        live = list(gens)
        next(live[0])
        while live:
            for gen in list(live):
                try:
                    next(gen)
                except StopIteration:
                    live.remove(gen)

    return kernel


def _make_fourstep_kernel_v3_mono(L: int, approx: bool, lazy: bool = False):
    """Monolithic v3 body: scalar-prefetch table indexing, NO pipeline —
    all stages for limb g run at grid step g (the v2 body with idx-driven
    block maps). A/B baseline isolating the gather elimination from the
    software pipeline (GPUFHE_NTT_PIPELINE=0)."""

    def kernel(idx_ref, q_ref, dmp_ref, dms_ref, x_ref, wl_ref, tw_ref,
               twsh_ref, wr_ref, cl_ref, cr_ref, o_ref):
        g = pl.program_id(0)
        li = idx_ref[g]
        _fourstep_body_v2(0, li, q_ref, dmp_ref, dms_ref, x_ref, wl_ref,
                          tw_ref, twsh_ref, wr_ref, cl_ref, cr_ref, o_ref,
                          approx=approx, lazy=lazy)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("interpret", "approx", "mode", "lazy"))
def fourstep_pallas_v3(
    x: jnp.ndarray,
    limb_idx: jnp.ndarray,
    wl_cat: jnp.ndarray,
    tw: jnp.ndarray,
    tw_shoup: jnp.ndarray,
    wr_cat: jnp.ndarray,
    corr_l: jnp.ndarray,
    corr_r: jnp.ndarray,
    q: jnp.ndarray,
    digit_plain: jnp.ndarray,
    digit_shoup: jnp.ndarray,
    interpret: bool = False,
    approx: bool = True,
    mode: str = "mono",
    lazy: bool = False,
) -> jnp.ndarray:
    """Pipelined four-step core v3: scalar-prefetch limb indexing + MXU/VPU
    software pipeline. Bit-exact with v2 and the jnp path (tests/test_ops).
    lazy=True (mono only) uses the q < 2^29 [0, 4q) accumulation recombine
    (_recombine_taps_approx_lazy) — valid ONLY when every prime the program
    may select satisfies 8q < 2^32 (ops/ntt.py gates on the full table).

    Tables arrive FULL (all T primes); `limb_idx` i32[L] selects each grid
    step's rows via scalar-prefetch-driven BlockSpec index maps — the DMA
    engine fetches exactly the needed row per step, replacing the staged
    host-side gathers that copied ~1 MB/limb of tables per ntt call
    (measured ~1.0 us/limb-transform of the round-3 kernel's 7.5). One
    compiled program now serves EVERY limb selection of a given length."""
    L, a, b = x.shape
    vm = pltpu.VMEM
    sm = pltpu.SMEM
    smem_specs = [
        pl.BlockSpec(memory_space=sm),  # q [T]
        pl.BlockSpec(memory_space=sm),  # digit_plain [T, 7]
        pl.BlockSpec(memory_space=sm),  # digit_shoup [T, 7]
    ]

    assert not (lazy and mode != "mono"), "lazy recombine: mono kernel only"
    if mode == "zip":
        # two limbs per grid step, ops zipped in trace order; odd L pads
        # with a repeat of the last limb (one wasted limb-transform)
        if L % 2:
            x = jnp.concatenate([x, x[-1:]])
            limb_idx = jnp.concatenate(
                [limb_idx, limb_idx[-1:]]).astype(jnp.int32)
        Lp = x.shape[0]

        def _tab(par):
            def index_map(g, idx_ref):
                return (idx_ref[2 * g + par], 0, 0)

            return index_map

        def _tabs(par):
            return [
                pl.BlockSpec((1, 4 * a, a), _tab(par), memory_space=vm),
                pl.BlockSpec((1, a, b), _tab(par), memory_space=vm),
                pl.BlockSpec((1, a, b), _tab(par), memory_space=vm),
                pl.BlockSpec((1, b, 4 * b), _tab(par), memory_space=vm),
                pl.BlockSpec((1, 7, a), _tab(par), memory_space=vm),
                pl.BlockSpec((1, 7, b), _tab(par), memory_space=vm),
            ]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Lp // 2,),
            in_specs=smem_specs + [
                pl.BlockSpec((2, a, b), lambda g, idx_ref: (g, 0, 0),
                             memory_space=vm),  # x pair
            ] + _tabs(0) + _tabs(1),
            out_specs=pl.BlockSpec((2, b, a),
                                   lambda g, idx_ref: (g, 0, 0),
                                   memory_space=vm),
        )
        with _staged_kernel_trace():
            out = pl.pallas_call(
                _make_fourstep_kernel_v3_zip(approx),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((Lp, b, a), jnp.uint32),
                interpret=interpret,
            )(limb_idx.astype(jnp.int32), q, digit_plain, digit_shoup, x,
              wl_cat, tw, tw_shoup, wr_cat, corr_l, corr_r,
              wl_cat, tw, tw_shoup, wr_cat, corr_l, corr_r)
        return out[:L]

    def _at(off):
        # table row for the stage handling limb g-off at grid step g
        def index_map(g, idx_ref):
            return (idx_ref[jnp.clip(g - off, 0, L - 1)], 0, 0)

        return index_map

    # pipeline stage offsets: A=0, B'=1, D=2 (mono: everything at 0)
    pipeline = mode == "pipe"
    o_a, o_b, o_d = (0, 1, 2) if pipeline else (0, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L + o_d,),
        in_specs=smem_specs + [
            pl.BlockSpec((1, a, b),
                         lambda g, idx_ref: (jnp.clip(g, 0, L - 1), 0, 0),
                         memory_space=vm),  # x: block g (stage A)
            pl.BlockSpec((1, 4 * a, a), _at(o_a), memory_space=vm),  # wl: A
            pl.BlockSpec((1, a, b), _at(o_b), memory_space=vm),      # tw: B'
            pl.BlockSpec((1, a, b), _at(o_b), memory_space=vm),      # twsh
            pl.BlockSpec((1, b, 4 * b), _at(o_b), memory_space=vm),  # wr: B'
            pl.BlockSpec((1, 7, a), _at(o_b), memory_space=vm),      # cl: B'
            pl.BlockSpec((1, 7, b), _at(o_d), memory_space=vm),      # cr: D
        ],
        out_specs=pl.BlockSpec(
            (1, b, a),
            lambda g, idx_ref: (jnp.clip(g - o_d, 0, L - 1), 0, 0),
            memory_space=vm),
        scratch_shapes=[
            pltpu.VMEM((2, 7, a, b), jnp.int32),  # t1: stage-1 taps
            pltpu.VMEM((2, 7, a, b), jnp.int32),  # t2: stage-2 taps
        ] if pipeline else [],
    )
    kern = (_make_fourstep_kernel_v3(L, approx) if pipeline
            else _make_fourstep_kernel_v3_mono(L, approx, lazy=lazy))
    with _staged_kernel_trace():
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((L, b, a), jnp.uint32),
            interpret=interpret,
        )(limb_idx.astype(jnp.int32), q, digit_plain, digit_shoup, x,
          wl_cat, tw, tw_shoup, wr_cat, corr_l, corr_r)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fourstep_pallas(
    x: jnp.ndarray,
    wl_digits: jnp.ndarray,
    tw_mont: jnp.ndarray,
    wr_digits: jnp.ndarray,
    q: jnp.ndarray,
    qinv_neg: jnp.ndarray,
    digit_mont: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused four-step core.

    x: u32[L, a, b]; tables stacked per limb (ops/context.py NTTTables rows).
    Returns u32[L, b, a] — the transposed (natural-order) result, matching
    ops/ntt.py _fourstep.
    """
    L, a, b = x.shape
    grid = (L,)
    vm = pltpu.VMEM
    sm = pltpu.SMEM
    with _staged_kernel_trace():
        return pl.pallas_call(
            _fourstep_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=sm),  # q (full [L], indexed by program_id)
                pl.BlockSpec(memory_space=sm),  # qinv
                pl.BlockSpec(memory_space=sm),  # digit_mont [L, 7]
                pl.BlockSpec((1, a, b), lambda l: (l, 0, 0), memory_space=vm),  # x
                pl.BlockSpec((1, 4, a, a), lambda l: (l, 0, 0, 0), memory_space=vm),
                pl.BlockSpec((1, a, b), lambda l: (l, 0, 0), memory_space=vm),  # tw
                pl.BlockSpec((1, 4, b, b), lambda l: (l, 0, 0, 0), memory_space=vm),
            ],
            out_specs=pl.BlockSpec((1, b, a), lambda l: (l, 0, 0), memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((L, b, a), jnp.uint32),
            interpret=interpret,
        )(
            q,
            qinv_neg,
            digit_mont,
            x,
            wl_digits,
            tw_mont,
            wr_digits,
        )
