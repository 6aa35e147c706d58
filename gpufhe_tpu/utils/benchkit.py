"""Per-kernel benchmark + roofline harness (SURVEY.md §5 metrics plan).

Each entry times one jitted kernel on the current default device and reports
achieved throughput against two speed-of-light ceilings:

* HBM roofline — bytes moved at the chip's HBM bandwidth (elementwise ops)
* MXU roofline — int8 MAC throughput (the NTT digit matmuls)

Chip peaks default to TPU v5e (the bench chip) and are overridable via env
(PEAK_HBM_GBPS, PEAK_INT8_TOPS).
"""

from __future__ import annotations

import os
import time

import numpy as np


def _peaks():
    return (
        float(os.environ.get("PEAK_HBM_GBPS", 819e9)),
        float(os.environ.get("PEAK_INT8_TOPS", 394e12)),
    )


def time_it(fn, *args, iters: int = 20, warmup: int = 2) -> float:
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def bench_all(preset_name: str = "config5_boot", iters: int = 20) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from gpufhe_tpu.ops import modops
    from gpufhe_tpu.ops.context import fourstep_split, make_context
    from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
    from gpufhe_tpu.params.params import preset

    hbm_bw, int8_peak = _peaks()
    params = preset(preset_name)
    ctx = make_context(params)
    L, n = params.num_limbs, params.n
    n1, n2 = fourstep_split(n)
    rng = np.random.default_rng(0)
    q = np.asarray(params.q_primes, dtype=np.uint32)
    x = jnp.asarray(rng.integers(0, q[:, None], size=(L, n), dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, q[:, None], size=(L, n), dtype=np.uint32))
    qb = ctx.q[:L][:, None]
    qinvb = ctx.qinv_neg[:L][:, None]
    r2b = ctx.r2[:L][:, None]

    rows = []

    def row(name, dt, bytes_moved=None, macs=None):
        r = {"kernel": name, "ms": round(dt * 1e3, 4)}
        if bytes_moved:
            r["GB/s"] = round(bytes_moved / dt / 1e9, 1)
            r["pct_HBM_SoL"] = round(100 * bytes_moved / dt / hbm_bw, 1)
        if macs:
            r["TOPS"] = round(2 * macs / dt / 1e12, 2)
            r["pct_MXU_SoL"] = round(100 * 2 * macs / dt / int8_peak, 1)
        rows.append(r)
        return r

    # elementwise: add_mod (2 reads + 1 write of 4B)
    f = jax.jit(lambda a, b: modops.add_mod(a, b, qb))
    row("add_mod", time_it(f, x, y, iters=iters), bytes_moved=3 * 4 * L * n)

    # mont_mul (the workhorse): same traffic, ~20 VPU ops/element
    f = jax.jit(lambda a, b: modops.mont_mul(a, b, qb, qinvb))
    row("mont_mul", time_it(f, x, y, iters=iters), bytes_moved=3 * 4 * L * n)

    # general mul_mod (two REDC passes)
    f = jax.jit(lambda a, b: modops.mul_mod(a, b, qb, qinvb, r2b))
    row("mul_mod", time_it(f, x, y, iters=iters), bytes_moved=3 * 4 * L * n)

    # NTT fwd/inv: traffic ~ 3 passes over [L,n] u32 + tables; MXU work =
    # 2 stages x 16 digit matmuls x n1*n1*n2 MACs per limb
    macs = L * 2 * 16 * n1 * n1 * n2
    f = jax.jit(lambda a: ntt_fwd(a, ctx, limbs=np.arange(L)))
    row("ntt_fwd", time_it(f, x, iters=iters), bytes_moved=6 * 4 * L * n, macs=macs)
    f = jax.jit(lambda a: ntt_inv(a, ctx, limbs=np.arange(L)))
    row("ntt_inv", time_it(f, x, iters=iters), bytes_moved=6 * 4 * L * n, macs=macs)

    # --- RNS base conversion + hybrid key switch (BASELINE: every modular
    # kernel against a roofline) -----------------------------------------
    from gpufhe_tpu.primitives import keyswitch as ksw
    from gpufhe_tpu.primitives import rns
    from gpufhe_tpu.keys.keys import keygen

    level = L
    alpha = params.alpha
    dnum = params.dnum
    ksc = rns.make_ks_context(params, level)

    # ModUp: read K coeff limbs, write dnum x (K+alpha) raised limbs
    f = jax.jit(lambda a: rns.mod_up(a, params, level, ctx, ksc))
    row("mod_up", time_it(f, x, iters=iters),
        bytes_moved=4 * n * (L + dnum * (L + alpha)))

    xp = jnp.asarray(rng.integers(
        0, np.concatenate([q, np.asarray(params.p_primes, np.uint32)])[:, None],
        size=(L + alpha, n), dtype=np.uint32,
    ))
    # ModDown: read K+alpha, one base-convert pass (K r/w) + diff/scale (K r/w)
    f = jax.jit(lambda a: rns.mod_down(a, params, level, ctx, ksc))
    row("mod_down", time_it(f, xp, iters=iters),
        bytes_moved=4 * n * (L + alpha + 3 * L))

    # fused key-switch MAC: per gadget group read raised poly + two key rows,
    # accumulate two sums (accumulators assumed fused/register-resident)
    chest = keygen(params, np.random.default_rng(1))
    ksk = chest.device_rlk
    qp_idx = np.asarray(ksw.qp_indices(params, level))
    qp_q = ctx.q[qp_idx][:, None]
    qp_qinv = ctx.qinv_neg[qp_idx][:, None]
    raised = jnp.stack([xp] * dnum)

    @jax.jit
    def ks_mac(r_all):
        acc0 = acc1 = None
        for d in range(dnum):
            r = r_all[d]
            t0 = modops.mont_mul(
                r, ksw.key_rows(ksk.b_mont[d], params, level), qp_q, qp_qinv)
            t1 = modops.mont_mul(
                r, ksw.key_rows(ksk.a_mont[d], params, level), qp_q, qp_qinv)
            acc0 = t0 if acc0 is None else modops.add_mod(acc0, t0, qp_q)
            acc1 = t1 if acc1 is None else modops.add_mod(acc1, t1, qp_q)
        return acc0, acc1

    row("ks_mac", time_it(ks_mac, raised, iters=iters),
        bytes_moved=4 * n * (L + alpha) * (3 * dnum + 2))

    # full hybrid key switch (iNTT + ModUp + dnum NTTs + MAC + 2x(iNTT +
    # ModDown + NTT)): transform traffic dominates
    f = jax.jit(lambda a: ksw.key_switch_core(a, params, level, ctx, ksc, ksk))
    n_tf = L + dnum * (L + alpha) + 2 * (L + alpha) + 2 * L
    row("key_switch", time_it(f, x, iters=iters),
        bytes_moved=n_tf * (2 * 4 * n + 4 * n1 * n1 + 4 * n2 * n2 + 4 * n)
        + 4 * n * (L + alpha) * (3 * dnum + 2))

    return rows


if __name__ == "__main__":
    import json

    for r in bench_all(os.environ.get("BENCH_PRESET", "config5_boot")):
        print(json.dumps(r))
