"""Benchmark: CKKS homomorphic multiply (tensor+relin+rescale) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline config is BASELINE.json config 5 scale: N=2^16, L=30 q-primes,
alpha=5 special primes (dnum=6 hybrid key-switching). Latency is measured on
a chain of data-dependent mult steps inside one jit (optimization_barrier
between steps), so inter-op pipelining cannot hide real latency and per-call
dispatch overhead is amortized away.

The reference publishes no numbers (BASELINE.md), so vs_baseline reports the
achieved fraction of an HBM speed-of-light estimate for the op: every
limb-transform streams its polynomial block + its per-limb NTT tables once
(the fused Pallas kernel keeps all digit partials in VMEM, ops/ntt_pallas.py)
plus the elementwise MAC/base-conversion passes.

Env overrides: BENCH_PRESET (default config5_boot), BENCH_CHAIN, BENCH_ITERS,
PEAK_HBM_GBPS.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _random_ct, _random_key, _setup
    from gpufhe_tpu.ciphertext.ct import _relin_core, _rescale_core, _tensor_core
    from gpufhe_tpu.ops.context import fourstep_split

    preset_name = os.environ.get("BENCH_PRESET", "config5_boot")
    chain = int(os.environ.get("BENCH_CHAIN", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    hbm_bw = float(os.environ.get("PEAK_HBM_GBPS", 819e9))

    t0 = time.time()
    params, ctx, level, ksc = _setup(preset_name)
    rng = np.random.default_rng(0)
    rlk = _random_key(params, rng)
    a0, a1 = _random_ct(params, level, rng)
    b0, b1 = _random_ct(params, level, rng)
    print(f"# setup {time.time() - t0:.1f}s  N={params.n} L={level} "
          f"alpha={params.alpha} dnum={params.dnum}", flush=True)

    def one_mult(a0, a1, b0, b1):
        cs = _tensor_core((a0, a1), (b0, b1), ctx, level)
        c0, c1 = _relin_core(cs, ctx, ksc, rlk, params, level)
        return _rescale_core((c0, c1), ctx, ksc, params, level)

    @jax.jit
    def step_chain(a0, a1, b0, b1):
        # fori_loop: one compiled mult body, `chain` data-dependent iterations
        # (barriers tie both outputs into the carry so nothing is DCE'd and
        # iteration i+1 cannot start before i finishes)
        def body(_, carry):
            a0, a1, b0, b1 = carry
            r0, r1 = one_mult(a0, a1, b0, b1)
            a0 = jax.lax.optimization_barrier((a0, r0))[0]
            a1 = jax.lax.optimization_barrier((a1, r1))[0]
            return (a0, a1, b0, b1)

        return jax.lax.fori_loop(0, chain, body, (a0, a1, b0, b1))

    t0 = time.time()
    out = step_chain(a0, a1, b0, b1)
    jax.block_until_ready(out)
    print(f"# compile+first {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    for _ in range(iters):
        out = step_chain(a0, a1, b0, b1)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / (iters * chain)
    ops_per_s = 1.0 / dt

    # --- HBM speed-of-light estimate ---
    n1, n2 = fourstep_split(params.n)
    alpha, dnum, k = params.alpha, params.dnum, level
    limb_bytes = params.n * 4
    # limb-transforms per mult (iNTT d2, dnum modup NTTs, 2 iNTT + 2 NTT in
    # mod-down, rescale's 2x(iNTT K + NTT K-1))
    n_limb_tf = k + dnum * (k + alpha) + 2 * (k + alpha) + 2 * k + 2 * k + 2 * (k - 1)
    # per limb-transform: x in + out + (wl + wr digits + tw) tables
    tf_traffic = n_limb_tf * (2 * limb_bytes + 4 * n1 * n1 + 4 * n2 * n2 + limb_bytes)
    # elementwise passes (tensor 3x, MAC 2*dnum, mod-down/rescale ~8) r+w
    ew_traffic = (3 + 2 * dnum + 8) * 3 * k * limb_bytes
    sol_s = (tf_traffic + ew_traffic) / hbm_bw
    print(f"# {dt*1e3:.3f} ms/mult; est. traffic "
          f"{(tf_traffic+ew_traffic)/1e6:.0f} MB -> HBM SoL {sol_s*1e3:.3f} ms "
          f"({1/sol_s:.0f} mult/s)", flush=True)

    print(json.dumps({
        "metric": f"ckks_mult_relin_rescale_N{params.n}_L{level}",
        "value": round(ops_per_s, 3),
        "unit": "ops/s/chip",
        "vs_baseline": round(ops_per_s * sol_s, 4),
    }))


if __name__ == "__main__":
    main()
