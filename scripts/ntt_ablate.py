"""Attribute the fused four-step NTT kernel's wall time INSIDE the kernel.

Round-4 finding: the approximate-mulhi recombine cut ~35% of the kernel's
elementwise VPU ops and moved the wall 0% (7.56 -> 7.60 us/limb-tf) — the
round-3 "VPU-bound at ~407 ops/element" story cannot be right. This script
times timing-only VARIANTS of _fourstep_body_v2 (same shapes, same VMEM
residency, pieces swapped for cheap stand-ins) on a genuine chain to find
what the 7.5 us actually buys:

  full        — the production kernel (exact recombine)
  full_approx — production, approx recombine
  no_recomb   — both recombines replaced by a cast of tap 0 (keeps the 8
                MXU dots, digit extraction, twiddle, transpose)
  dots_only   — 8 MXU dots + block adds only (taps cast + xor-folded; no
                recombine, no twiddle, no digit re-extraction for stage 2 —
                stage-2 digits faked from stage-1 output bytes)
  no_dots     — everything BUT the dots (taps fabricated by cheap shifts of
                x; recombine + twiddle + stage-2 digits + transpose intact)
  no_transpo  — production minus the final transpose (output written
                untransposed; timing-only, wrong layout by design)

Each variant is chained output->input inside one jit (CLAUDE.md genuine-
chain rules; all kernels are total on arbitrary u32), floor-subtracted.
Results are NOT bit-checked except `full`/`full_approx` (the others are
deliberately wrong). Writes NTT_ABLATE.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpufhe_tpu.ops import ntt_pallas as npal
from gpufhe_tpu.ops.context import fourstep_split
from gpufhe_tpu.params.params import make_context, preset

assert jax.devices()[0].platform == "tpu", jax.devices()

PRESET = os.environ.get("PRESET", "config5_boot")
CHAIN = int(os.environ.get("CHAIN", "256"))
ITERS = int(os.environ.get("ITERS", "3"))

params = preset(PRESET)
ctx = make_context(params)
k = int(os.environ.get("LIMBS", str(params.num_limbs)))
n = params.n
n1, n2 = fourstep_split(n)
assert n1 == n2, "ablation chain needs square tiles (output feeds input)"
t = ctx.ntt_fwd
rng = np.random.default_rng(0)
x = jnp.asarray(
    rng.integers(0, np.asarray(params.q_primes[:k], dtype=np.uint32)[:, None],
                 size=(k, n), dtype=np.uint32).reshape(k, n1, n2)
)
tables = (t.wl_cat[:k], t.tw[:k], t.tw_shoup[:k], t.wr_cat[:k],
          t.corr_l[:k], t.corr_r[:k], ctx.q[:k], ctx.digit_plain[:k],
          ctx.digit_shoup[:k])
print(f"# {PRESET}: N={n} limbs={k} chain={CHAIN} tile {n1}x{n2}", flush=True)


def _body_variant(variant: str):
    """A timing variant of npal._fourstep_body_v2 (same refs/shapes)."""

    def body(i, li, q_ref, dmp_ref, dms_ref, x_ref, wl_ref, tw_ref,
             twsh_ref, wr_ref, cl_ref, cr_ref, o_ref):
        q = q_ref[li]
        dmp = [dmp_ref[li, t] for t in range(7)]
        dms = [dms_ref[li, t] for t in range(7)]
        x = x_ref[i]
        a = x.shape[0]
        b = x.shape[1]
        recomb = (npal._recombine_taps_approx_lazy if variant == "full_lazy"
                  else npal._recombine_taps_approx if variant == "full_approx"
                  else npal._recombine_taps)
        approx_tw = variant in ("full_approx", "full_lazy")

        # ---- stage 1 taps ----
        if variant == "no_dots":
            # fabricate 7 i32 taps from x with cheap shifts (no MXU)
            taps = [(x >> np.uint32(t % 4)).astype(jnp.int32) for t in range(7)]
        else:
            xcat = npal._offset_digits_cat(x, axis=1)
            taps = [None] * 7
            for e in range(4):
                s_e = jax.lax.dot_general(
                    wl_ref[i, e * a:(e + 1) * a, :], xcat,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
                )
                for d in range(4):
                    tt = e + d
                    blk = s_e[:, d * b:(d + 1) * b]
                    taps[tt] = blk if taps[tt] is None else taps[tt] + blk

        if variant == "dots_only":
            # stage 2 dots straight on faked digits of tap0; no recombine
            a_u = taps[0].astype(jnp.uint32)
            taps2 = [None] * 7
            for d in range(4):
                bd = (((a_u >> np.uint32(8 * d)) & np.uint32(0xFF))
                      .astype(jnp.int32) - 128).astype(jnp.int8)
                s_d = jax.lax.dot_general(
                    bd, wr_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                for e in range(4):
                    tt = e + d
                    blk = s_d[:, e * b:(e + 1) * b]
                    taps2[tt] = blk if taps2[tt] is None else taps2[tt] + blk
            o_ref[i] = functools.reduce(
                lambda p, r: p ^ r, [tp.astype(jnp.uint32) for tp in taps2]
            ).T
            return

        cl = [cl_ref[i, t] for t in range(7)]
        if variant == "no_recomb":
            a_mat = taps[0].astype(jnp.uint32)
        else:
            a_mat = recomb(taps, cl, dmp, dms, q, col=False)

        if approx_tw:
            tws = twsh_ref[i]
            b_mat = npal._shoup_approx(a_mat, tw_ref[i],
                                       tws & np.uint32(0xFFFF),
                                       tws >> np.uint32(16), q)
        else:
            b_mat = npal._shoup(a_mat, tw_ref[i], twsh_ref[i], q)

        # ---- stage 2 ----
        taps2 = [None] * 7
        for d in range(4):
            bd = (((b_mat >> np.uint32(8 * d)) & np.uint32(0xFF))
                  .astype(jnp.int32) - 128).astype(jnp.int8)
            if variant == "no_dots":
                s_d = jnp.tile(bd.astype(jnp.int32), (1, 4))
            else:
                s_d = jax.lax.dot_general(
                    bd, wr_ref[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            for e in range(4):
                tt = e + d
                blk = s_d[:, e * b:(e + 1) * b]
                taps2[tt] = blk if taps2[tt] is None else taps2[tt] + blk
        cr = [cr_ref[i, t] for t in range(7)]
        if variant == "no_recomb":
            c_mat = taps2[0].astype(jnp.uint32)
        else:
            c_mat = recomb(taps2, cr, dmp, dms, q, col=True)
            if variant == "full_lazy":
                c_mat = npal._lazy_sub(c_mat, q + q)  # [0, 4q) -> [0, 2q)
            c_mat = jnp.where(c_mat >= q, c_mat - q, c_mat)
        o_ref[i] = c_mat if variant == "no_transpo" else c_mat.T

    return body


def make_fn(variant: str):
    body = _body_variant(variant)

    def kernel(q_ref, dmp_ref, dms_ref, x_ref, wl_ref, tw_ref, twsh_ref,
               wr_ref, cl_ref, cr_ref, o_ref):
        g = pl.program_id(0)
        body(0, g, q_ref, dmp_ref, dms_ref, x_ref, wl_ref, tw_ref, twsh_ref,
             wr_ref, cl_ref, cr_ref, o_ref)

    vm = pltpu.VMEM
    sm = pltpu.SMEM
    a, b = n1, n2

    def run(xx, tabs):
        (wl, tw, twsh, wr, cl, cr, q, dp, ds) = tabs
        return pl.pallas_call(
            kernel,
            grid=(k,),
            in_specs=[
                pl.BlockSpec(memory_space=sm),
                pl.BlockSpec(memory_space=sm),
                pl.BlockSpec(memory_space=sm),
                pl.BlockSpec((1, a, b), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((1, 4 * a, a), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((1, a, b), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((1, a, b), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((1, b, 4 * b), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((1, 7, a), lambda l: (l, 0, 0), memory_space=vm),
                pl.BlockSpec((1, 7, b), lambda l: (l, 0, 0), memory_space=vm),
            ],
            out_specs=pl.BlockSpec((1, b, a), lambda l: (l, 0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((k, b, a), jnp.uint32),
        )(q, dp, ds, xx, wl, tw, twsh, wr, cl, cr)

    return run


def timed(variant: str):
    fn = make_fn(variant)

    @jax.jit
    def prog(xx, tabs):
        def step(_, xx):
            return fn(xx, tabs)  # output (k, b, a) == input shape (square)

        return jax.lax.fori_loop(0, CHAIN, step, xx)

    @jax.jit
    def floor_prog(xx, tabs):
        def step(_, xx):
            return xx

        return jax.lax.fori_loop(0, CHAIN, step, xx)

    def run(p):
        c = p.lower(x, tables).compile()
        out = c(x, tables)
        jax.block_until_ready(out)
        _ = np.asarray(out.reshape(-1)[:4])
        dts = []
        for _ in range(ITERS):
            t0 = time.time()
            out = c(x, tables)
            _ = np.asarray(out.reshape(-1)[:4])
            dts.append(time.time() - t0)
        return min(dts)

    floor = run(floor_prog)
    wall = run(prog)
    per = max(wall - floor, 0.0) / CHAIN / k
    print(f"# {variant:<12s} {per * 1e6:7.3f} us/limb-transform "
          f"(pass {wall * 1e3:.2f} ms, floor {floor * 1e3:.2f})", flush=True)
    return per


VARIANTS = ["full", "full_approx", "no_recomb", "dots_only", "no_dots",
            "no_transpo"]
if max(params.q_primes[:k]) < (1 << 29):
    # the lazy [0, 4q)-accumulation recombine is only valid (and only
    # interesting) on an all-sub-2^29 chain (config5_boot_s29)
    VARIANTS.insert(2, "full_lazy")
res = {v: round(timed(v) * 1e6, 3) for v in VARIANTS}
out = {
    "metric": "ntt_kernel_ablation_us_per_limb_transform",
    "preset": PRESET, "n": n, "limbs": k, "chain": CHAIN,
    "variants": res,
    "note": "timing-only variants; only full/full_approx (and full_lazy on "
            "sub-2^29 chains) are bit-correct",
}
print(json.dumps(out), flush=True)
name = ("NTT_ABLATE.json" if PRESET == "config5_boot"
        else f"NTT_ABLATE_{PRESET}.json")
with open(name, "w") as f:
    json.dump(out, f, indent=1)
