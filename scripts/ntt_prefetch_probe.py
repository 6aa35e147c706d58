"""Isolate the v3 scalar-prefetch machinery's cost (VERDICT r5 sibling
reconciliation): same chain methodology, three timings at N=2^16 L=30:

  v3_direct  — fourstep_pallas_v3 (prefetch index maps, FULL tables,
               idx=arange) chained kernel-output -> kernel-input
  v3_wrapper — the production ntt_fwd wrapper (adds reshapes only)
  static     — the SAME body with STATIC block index maps on PRE-SLICED
               tables (the ablation kernel's structure, approx recombine)

static vs v3_direct prices the prefetch-driven dynamic index maps (Mosaic
cannot look ahead through idx_ref, so table DMA loses double-buffering);
v3_wrapper vs v3_direct prices the wrapper glue. Writes no artifact —
feeds the NTT_N16.json siblings block.
"""

from __future__ import annotations

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
from gpufhe_tpu.ops.ntt import ntt_fwd
from gpufhe_tpu.params.params import make_context, preset

assert jax.devices()[0].platform == "tpu", jax.devices()

PRESET = os.environ.get("PRESET", "config5_boot")
CHAIN = int(os.environ.get("CHAIN", "1024"))
ITERS = 3

params = preset(PRESET)
ctx = make_context(params)
k = int(os.environ.get("LIMBS", str(params.num_limbs)))
n = params.n
n1, n2 = fourstep_split(n)
t = ctx.ntt_fwd
rng = np.random.default_rng(0)
x = jnp.asarray(
    rng.integers(0, np.asarray(params.q_primes[:k], dtype=np.uint32)[:, None],
                 size=(k, n), dtype=np.uint32).reshape(k, n1, n2))
idx = jnp.arange(k, dtype=jnp.int32)
lazy = bool(int(os.environ.get("LAZY", "0")))
print(f"# {PRESET}: N={n} limbs={k} chain={CHAIN} lazy={lazy}", flush=True)


def timed(step):
    @jax.jit
    def prog(v):
        return jax.lax.fori_loop(0, CHAIN, lambda _, v: step(v), v)

    @jax.jit
    def floor_prog(v):
        return jax.lax.fori_loop(0, CHAIN, lambda _, v: v, v)

    def run(p):
        c = p.lower(x).compile()
        out = c(x)
        jax.block_until_ready(out)
        _ = np.asarray(out.reshape(-1)[:4])
        dts = []
        for _ in range(ITERS):
            t0 = time.time()
            out = c(x)
            _ = np.asarray(out.reshape(-1)[:4])
            dts.append(time.time() - t0)
        return min(dts)

    return max(run(prog) - run(floor_prog), 0.0) / CHAIN / k


def v3_direct(v):
    return npal.fourstep_pallas_v3(
        v, idx, t.wl_cat, t.tw, t.tw_shoup, t.wr_cat, t.corr_l, t.corr_r,
        ctx.q, ctx.digit_plain, ctx.digit_shoup, approx=True, mode="mono",
        lazy=lazy,
    )


def v3_wrapper(v):
    return ntt_fwd(v.reshape(k, n), ctx, limbs=list(range(k))).reshape(
        k, n1, n2)


# static: the v2 kernel body with approx recombine on PRE-SLICED tables
# (sliced ONCE outside the loop: loop-invariant jit consts). NOTE: this
# variant measured 5.93 us on one run and 52 us on a later run of the same
# binary — the table slices are jit-argument device buffers and XLA
# sometimes re-slices per iteration inside the loop; treat `static` as
# indicative only (v3_direct/v3_wrapper are the stable comparisons, and
# the ablation's pre-gathered kernel is the stable static-map baseline)
tabs_sliced = (t.wl_cat[:k], t.tw[:k], t.tw_shoup[:k], t.wr_cat[:k],
               t.corr_l[:k], t.corr_r[:k], ctx.q[:k], ctx.digit_plain[:k],
               ctx.digit_shoup[:k])


def static(v):
    wl, tw, twsh, wr, cl, cr, q, dp, ds = tabs_sliced
    return npal.fourstep_pallas_v2(
        v, wl, tw, twsh, wr, cl, cr, q, dp, ds, approx=True, lazy=lazy)


def timed_2d(step):
    """Same chain but with the fori carry in the bench's [k, n] 2D shape
    (scripts/ntt_bench.py) instead of [k, n1, n2]."""
    x2 = x.reshape(k, n)

    @jax.jit
    def prog(v):
        return jax.lax.fori_loop(0, CHAIN, lambda _, v: step(v), v)

    @jax.jit
    def floor_prog(v):
        return jax.lax.fori_loop(0, CHAIN, lambda _, v: v, v)

    def run(p):
        c = p.lower(x2).compile()
        out = c(x2)
        jax.block_until_ready(out)
        _ = np.asarray(out.reshape(-1)[:4])
        dts = []
        for _ in range(ITERS):
            t0 = time.time()
            out = c(x2)
            _ = np.asarray(out.reshape(-1)[:4])
            dts.append(time.time() - t0)
        return min(dts)

    return max(run(prog) - run(floor_prog), 0.0) / CHAIN / k


res = {}
for name, fn in (("static", static), ("v3_direct", v3_direct),
                 ("v3_wrapper", v3_wrapper)):
    per = timed(fn)
    res[name] = round(per * 1e6, 3)
    print(f"# {name:<11s} {per * 1e6:7.3f} us/limb-transform", flush=True)

per = timed_2d(lambda v: ntt_fwd(v, ctx, limbs=list(range(k))))
res["wrapper_2d_carry"] = round(per * 1e6, 3)
print(f"# {'wrapper_2d':<11s} {per * 1e6:7.3f} us/limb-transform "
      f"(the ntt_bench chain shape)", flush=True)
print(json.dumps({"metric": "ntt_prefetch_probe", "preset": PRESET,
                  "chain": CHAIN, "lazy": lazy, "us_per_limb_transform": res}),
      flush=True)
