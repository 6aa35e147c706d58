"""Localize the diagonal-fan MAC cost: arithmetic vs automorphism gather.

Round-5 device trace (trace_summary per_program_ops): the flagship's fan
programs spend 192 ms in elementwise MAC fusions vs 24 ms in NTTs, and BOTH
op-count cuts (paired-REDC commit, fan-wide mont_mac) moved them < 2% —
the fusions are not compute-bound. The remaining suspects are the fused
automorphism gathers (jnp.take along the coefficient axis with the galois
permutation, one per offset per digit) and raw stream bandwidth.

Variants at dw fan shapes (T=k+alpha rows, dnum digit slabs, N=2^16), each
a chained one-jit program with the xor-reduce tie, floor-subtracted
(docs/MEASUREMENT.md):

    mac            digit inner product, NO gather           (lower bound)
    gather_mac     take(r_d, galois_perm) per digit, then MAC   (current
                   fan structure: 2*dnum gathered streams)
    gatherseq_mac  same takes with the IDENTITY permutation (separates
                   "gather at all" from "random access pattern")
    mac_permout    MAC on ungathered digits, then take the TWO
                   accumulators (the permuted-key algebra:
                   phi(a) * k == phi(a * phi^-1(k)), with phi^-1(k)
                   precomputed at keygen — 2 gathers instead of dnum)

If gather_mac >> mac and mac_permout ~ mac + 2 small gathers, pre-permuted
galois keys are the fan lever; if gather_mac ~ mac, the fusions are
bandwidth-bound and layout (not algebra) is the next lever.
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.ops.modops import mont_mac
from gpufhe_tpu.params.params import preset
from gpufhe_tpu.primitives.keyswitch import qp_indices

PRESET = os.environ.get("PRESET", "config5_boot_dw")
CHAIN = int(os.environ.get("CHAIN", "256"))
ITERS = 3

params = preset(PRESET)
ctx = make_context(params)
k = params.num_limbs
dnum = params.dnum
n = params.n
qp_idx = np.asarray(qp_indices(params, k))
T = len(qp_idx)
qp_q = ctx.q[qp_idx][:, None]
qp_qinv = ctx.qinv_neg[qp_idx][:, None]
rng = np.random.default_rng(0)
qp_np = np.asarray(params.q_primes + params.p_primes, dtype=np.uint32)[qp_idx]
r_stack = jnp.asarray(rng.integers(
    0, qp_np[None, :, None], size=(dnum, T, n), dtype=np.uint32))
kb = jnp.asarray(rng.integers(
    0, qp_np[None, :, None], size=(dnum, T, n), dtype=np.uint32))
ka = jnp.asarray(rng.integers(
    0, qp_np[None, :, None], size=(dnum, T, n), dtype=np.uint32))
# a REAL bootstrap-fan automorphism permutation (rotation by 1)
perm = jnp.asarray(gckks.automorphism_perm_eval(
    gckks.galois_exponent(1, n), n).astype(np.int32))
iota = jnp.arange(n, dtype=jnp.int32)
print(f"# {PRESET}: N={n} T={T} dnum={dnum} chain={CHAIN}", flush=True)


def mac(r_stack, kb, ka):
    t0 = mont_mac([(r_stack[d], kb[d]) for d in range(dnum)], qp_q, qp_qinv)
    t1 = mont_mac([(r_stack[d], ka[d]) for d in range(dnum)], qp_q, qp_qinv)
    return t0, t1


def gather_mac(r_stack, kb, ka, p):
    rgs = [jnp.take(r_stack[d], p, axis=1) for d in range(dnum)]
    t0 = mont_mac([(rg, kb[d]) for d, rg in enumerate(rgs)], qp_q, qp_qinv)
    t1 = mont_mac([(rg, ka[d]) for d, rg in enumerate(rgs)], qp_q, qp_qinv)
    return t0, t1


def mac_permout(r_stack, kb, ka, p):
    t0, t1 = mac(r_stack, kb, ka)
    return jnp.take(t0, p, axis=1), jnp.take(t1, p, axis=1)


def timed(name, f, args, chain):
    @jax.jit
    def prog(xs):
        def body(_, xs):
            y = f(*xs)
            s = jnp.zeros((), jnp.uint32)
            for leaf in jax.tree_util.tree_leaves(y):
                if leaf.dtype != jnp.uint32:
                    continue
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
    print(f"# {name:<16s} {per * 1e3:7.3f} ms", flush=True)
    return per


def main():
    # algebraic identity sanity: phi(a)*k == phi(a * phi^-1(k)) elementwise
    inv = np.empty(n, dtype=np.int64)
    pn = np.asarray(perm)
    inv[pn] = np.arange(n)
    kb_p = jnp.take(kb, jnp.asarray(inv.astype(np.int32)), axis=2)
    ka_p = jnp.take(ka, jnp.asarray(inv.astype(np.int32)), axis=2)
    a0, a1 = jax.jit(gather_mac)(r_stack, kb, ka, perm)
    b0, b1 = jax.jit(mac_permout)(r_stack, kb_p, ka_p, perm)
    assert (np.asarray(a0) == np.asarray(b0)).all()
    assert (np.asarray(a1) == np.asarray(b1)).all()
    print("# permuted-key algebra bit-exact on chip", flush=True)

    res = {}
    res["mac_ms"] = timed("mac", mac, (r_stack, kb, ka), CHAIN) * 1e3
    res["gather_mac_ms"] = timed(
        "gather_mac", gather_mac, (r_stack, kb, ka, perm), CHAIN) * 1e3
    res["gatherseq_mac_ms"] = timed(
        "gatherseq_mac", gather_mac, (r_stack, kb, ka, iota), CHAIN) * 1e3
    res["mac_permout_ms"] = timed(
        "mac_permout", mac_permout, (r_stack, kb_p, ka_p, perm), CHAIN) * 1e3
    out = {
        "metric": "fan_gather_probe", "preset": PRESET, "n": n, "T": T,
        "dnum": dnum, "chain": CHAIN,
        **{kk: round(v, 4) for kk, v in res.items()},
        "gather_overhead_ms": round(res["gather_mac_ms"] - res["mac_ms"], 4),
        "permout_overhead_ms": round(
            res["mac_permout_ms"] - res["mac_ms"], 4),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "FAN_GATHER_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
