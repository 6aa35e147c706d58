"""Attack the dw key_switch's MAC->iNTT boundary residual (~0.5 ms of the
6.1 ms dw mult; round-4/5 seam bisection).

Measured structure at config5_boot_dw (chain methodology, 3D carries):
    mac leaf 0.33 + 2x iNTT[58] 0.63 + 2x mod_down 0.43 = 1.39 ms
    unfenced composite                                  = 2.98 ms
    fenced composite (production key_switch_core)       = ~1.9 ms
The fence recovers ~1.1 ms of the XLA elementwise-fusion <-> Pallas
custom-call boundary cost but leaves ~0.5. This probe tests whether a
PALLAS MAC kernel (grid over QP limb rows, the dnum digit slabs resident
in VMEM, outputs written as ordinary tiled buffers feeding the iNTT custom
call directly) removes the rest: custom-call -> custom-call boundaries are
clean; it is the multi-output elementwise XLA fusion that fights the
Pallas consumer (docs/MEASUREMENT.md section 5).

Variants (each its own chained one-jit program, floor-subtracted):
    leaves        mac alone; 2iNTT+2down alone
    xla_unfenced  mac + 2iNTT + 2down, no barrier
    xla_fenced    + the production joint optimization_barrier
    pallas_mac    the Pallas MAC kernel + 2iNTT + 2down
Bit-exactness of the Pallas MAC vs the XLA mac is asserted on chip first.
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

from gpufhe_tpu.ops.context import fourstep_split
from gpufhe_tpu.ops.modops import add_mod, mont_mul
from gpufhe_tpu.ops.ntt import ntt_inv
from gpufhe_tpu.primitives.keyswitch import qp_indices
from gpufhe_tpu.primitives.rns import make_ks_context, mod_down
from gpufhe_tpu.params.params import make_context, preset

assert jax.devices()[0].platform == "tpu", jax.devices()

PRESET = os.environ.get("PRESET", "config5_boot_dw")
CHAIN = int(os.environ.get("CHAIN", "1024"))
ITERS = 3

params = preset(PRESET)
ctx = make_context(params)
k = params.num_limbs
alpha = params.alpha
dnum = params.dnum
n = params.n
n1, n2 = fourstep_split(n)
qp_idx = np.asarray(qp_indices(params, k))
T = k + alpha
ksc = make_ks_context(params, k)
qp_q = ctx.q[qp_idx]
qp_qinv = ctx.qinv_neg[qp_idx]
rng = np.random.default_rng(0)
qp_np = np.asarray(params.q_primes + params.p_primes, dtype=np.uint32)[qp_idx]
r_stack = jnp.asarray(rng.integers(
    0, qp_np[None, :, None], size=(dnum, T, n), dtype=np.uint32))
kb = jnp.asarray(rng.integers(
    0, qp_np[None, :, None], size=(dnum, T, n), dtype=np.uint32))
ka = jnp.asarray(rng.integers(
    0, qp_np[None, :, None], size=(dnum, T, n), dtype=np.uint32))
print(f"# {PRESET}: N={n} T={T} dnum={dnum} chain={CHAIN}", flush=True)


def xla_mac(r_stack, kb, ka):
    qq = qp_q[:, None]
    qqinv = qp_qinv[:, None]
    acc0 = acc1 = None
    for d in range(dnum):
        t0 = mont_mul(r_stack[d], kb[d], qq, qqinv)
        t1 = mont_mul(r_stack[d], ka[d], qq, qqinv)
        acc0 = t0 if acc0 is None else add_mod(acc0, t0, qq)
        acc1 = t1 if acc1 is None else add_mod(acc1, t1, qq)
    return acc0, acc1


def _mac_kernel(q_ref, qinv_ref, r_ref, kb_ref, ka_ref, o0_ref, o1_ref):
    g = pl.program_id(0)
    q = q_ref[g]
    qinv = qinv_ref[g]
    acc0 = acc1 = None
    for d in range(dnum):
        r = r_ref[d, 0]
        t0 = mont_mul(r, kb_ref[d, 0], q, qinv)
        t1 = mont_mul(r, ka_ref[d, 0], q, qinv)
        acc0 = t0 if acc0 is None else add_mod(acc0, t0, q)
        acc1 = t1 if acc1 is None else add_mod(acc1, t1, q)
    o0_ref[0] = acc0
    o1_ref[0] = acc1


@jax.jit
def pallas_mac(r3, kb3, ka3):
    """r3/kb3/ka3: u32[dnum, T, n1, n2]; returns acc pair u32[T, n1, n2]."""
    vm = pltpu.VMEM
    sm = pltpu.SMEM
    slab = pl.BlockSpec((dnum, 1, n1, n2), lambda g: (0, g, 0, 0),
                        memory_space=vm)
    out = pl.BlockSpec((1, n1, n2), lambda g: (g, 0, 0), memory_space=vm)
    return pl.pallas_call(
        _mac_kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=sm),
                  pl.BlockSpec(memory_space=sm), slab, slab, slab],
        out_specs=(out, out),
        out_shape=(jax.ShapeDtypeStruct((T, n1, n2), jnp.uint32),
                   jax.ShapeDtypeStruct((T, n1, n2), jnp.uint32)),
    )(qp_q, qp_qinv, r3, kb3, ka3)


# bit-exactness of the Pallas MAC vs the XLA mac on chip
r3 = r_stack.reshape(dnum, T, n1, n2)
kb3 = kb.reshape(dnum, T, n1, n2)
ka3 = ka.reshape(dnum, T, n1, n2)
w0, w1 = jax.jit(xla_mac)(r_stack, kb, ka)
g0, g1 = pallas_mac(r3, kb3, ka3)
assert (np.asarray(g0).reshape(T, n) == np.asarray(w0)).all()
assert (np.asarray(g1).reshape(T, n) == np.asarray(w1)).all()
print("# pallas MAC bit-exact vs XLA mac on chip", flush=True)


def tail(acc0, acc1):
    out = []
    for acc in (acc0, acc1):
        coeff = ntt_inv(acc, ctx, limbs=qp_idx)
        out.append(mod_down(coeff, params, k, ctx, ksc))
    return tuple(out)


def timed(name, f, args, chain):
    @jax.jit
    def prog(xs):
        def body(_, xs):
            y = f(*xs)
            s = jnp.zeros((), jnp.uint32)
            for leaf in jax.tree_util.tree_leaves(y):
                s = s ^ jax.lax.reduce(
                    leaf.astype(jnp.uint32), np.uint32(0),
                    jax.lax.bitwise_xor, tuple(range(leaf.ndim)))
            return (xs[0] ^ s,) + tuple(xs[1:])

        return jax.lax.fori_loop(0, chain, body, tuple(xs))

    @jax.jit
    def floor_prog(xs):
        def body(_, xs):
            return (xs[0] ^ jnp.zeros((), jnp.uint32),) + tuple(xs[1:])

        return jax.lax.fori_loop(0, chain, body, tuple(xs))

    def run(p):
        c = p.lower(tuple(args)).compile()
        out = c(tuple(args))
        jax.block_until_ready(out)
        _ = np.asarray(out[0].reshape(-1)[:4])
        dts = []
        for _ in range(ITERS):
            t0 = time.time()
            out = c(tuple(out))
            _ = np.asarray(out[0].reshape(-1)[:4])
            dts.append(time.time() - t0)
        return min(dts)

    per = max(run(prog) - run(floor_prog), 0.0) / chain
    print(f"# {name:<22s} {per * 1e3:7.3f} ms", flush=True)
    return per


res = {}
res["mac_xla"] = timed("mac (XLA leaf)", xla_mac, (r_stack, kb, ka),
                       CHAIN // 2)
res["mac_pallas"] = timed("mac (pallas leaf)", pallas_mac, (r3, kb3, ka3),
                          CHAIN // 2)
# NOTE: the pair must be DISTINCT inputs — tail(a, a) lets XLA CSE the two
# iNTT+down chains into one and under-measures the leaf 2x (first probe
# version's bug)
res["tail"] = timed("2iNTT+2down leaf",
                    lambda a: tail(a.reshape(T, n),
                                   add_mod(a, a, qp_q[:, None, None])
                                   .reshape(T, n)),
                    (jnp.asarray(rng.integers(
                        0, qp_np[:, None], size=(T, n),
                        dtype=np.uint32)).reshape(T, n1, n2),), CHAIN // 2)


def comp_unfenced(r_stack, kb, ka):
    return tail(*xla_mac(r_stack, kb, ka))


def comp_fenced(r_stack, kb, ka):
    acc0, acc1 = xla_mac(r_stack, kb, ka)
    acc0, acc1 = jax.lax.optimization_barrier((acc0, acc1))
    return tail(acc0, acc1)


def comp_pallas(r3, kb3, ka3):
    acc0, acc1 = pallas_mac(r3, kb3, ka3)
    return tail(acc0.reshape(T, n), acc1.reshape(T, n))


def mac_materialized(r_stack, kb, ka):
    # the mac with its outputs FORCED to materialize (the barrier blocks
    # fusion into the xor-tie): prices the 2x[T,N] buffer round trip the
    # bare leaf never pays — the composite's "residual" is leaf-accounting
    # optimism, not lost composite performance
    return jax.lax.optimization_barrier(xla_mac(r_stack, kb, ka))


res["mac_xla_mat"] = timed("mac materialized", mac_materialized,
                           (r_stack, kb, ka), CHAIN // 2)

def comp_trivial_elem(r_stack, kb, ka):
    # a TRIVIAL 2-output elementwise producer (one add each) + the same
    # fenced tail: if this also costs ~leaf-sum + 0.6, the residual is
    # generic to any multi-output elementwise -> Pallas seam, not to the
    # MAC's fan-in
    qq = qp_q[:, None]
    acc0 = add_mod(r_stack[0], kb[0], qq)
    acc1 = add_mod(r_stack[0], ka[0], qq)
    acc0, acc1 = jax.lax.optimization_barrier((acc0, acc1))
    return tail(acc0, acc1)


res["trivial_elem_tail"] = timed("add2+fence+2iNTT+2down", comp_trivial_elem,
                                 (r_stack, kb, ka), CHAIN // 4)

res["xla_unfenced"] = timed("mac+2iNTT+2down unfenced", comp_unfenced,
                            (r_stack, kb, ka), CHAIN // 4)
res["xla_fenced"] = timed("mac+2iNTT+2down fenced", comp_fenced,
                          (r_stack, kb, ka), CHAIN // 4)
res["pallas_comp"] = timed("pallasMAC+2iNTT+2down", comp_pallas,
                           (r3, kb3, ka3), CHAIN // 4)
leaf_sum_x = res["mac_xla"] + res["tail"]
leaf_sum_p = res["mac_pallas"] + res["tail"]
print(f"# leaf sums: xla {leaf_sum_x*1e3:.3f}, pallas {leaf_sum_p*1e3:.3f}",
      flush=True)
print(json.dumps({"metric": "dw_mac_boundary_probe", "preset": PRESET,
                  "ms": {kk: round(v * 1e3, 3) for kk, v in res.items()}}),
      flush=True)
