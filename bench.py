"""Benchmark: CKKS homomorphic multiply (tensor+relin+rescale) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline config is BASELINE.json config 5 scale: N=2^16, L=30 q-primes,
alpha=5 special primes (dnum=6 hybrid key-switching). The reference publishes
no numbers (BASELINE.md), so vs_baseline reports the achieved fraction of a
speed-of-light roofline for this chip, computed from the op's arithmetic
work: the transform cost is dominated by the digit-decomposed MXU matmuls
(16 uint8xuint8->int32 [n1,n1]x[n1,n2] products per limb-transform stage).

Env overrides: BENCH_PRESET (default config5_boot), BENCH_ITERS.
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
    from gpufhe_tpu.primitives.rns import ks_groups

    preset_name = os.environ.get("BENCH_PRESET", "config5_boot")
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    t0 = time.time()
    params, ctx, level, ksc = _setup(preset_name)
    rng = np.random.default_rng(0)
    rlk = _random_key(params, rng)
    a0, a1 = _random_ct(params, level, rng)
    b0, b1 = _random_ct(params, level, rng)
    print(f"# setup {time.time() - t0:.1f}s  N={params.n} L={level} "
          f"alpha={params.alpha} dnum={params.dnum}", flush=True)

    @jax.jit
    def step(a0, a1, b0, b1, ctx, ksc, rlk):
        cs = _tensor_core((a0, a1), (b0, b1), ctx, level)
        c0, c1 = _relin_core(cs, ctx, ksc, rlk, params, level)
        return _rescale_core((c0, c1), ctx, ksc, params, level)

    t0 = time.time()
    out = step(a0, a1, b0, b1, ctx, ksc, rlk)
    jax.block_until_ready(out)
    print(f"# compile+first {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    for _ in range(iters):
        out = step(a0, a1, b0, b1, ctx, ksc, rlk)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    ops_per_s = 1.0 / dt

    # --- speed-of-light roofline (compute-side, int8 MXU) ---
    n1, n2 = fourstep_split(params.n)
    alpha, dnum, k = params.alpha, params.dnum, level
    # limb-transforms per mult: iNTT d2 (k) + dnum NTT(k+alpha) + 2 iNTT(k+alpha)
    # + 2 NTT(k) + rescale 2 iNTT(k) + 2 NTT(k-1)
    n_limb_tf = k + dnum * (k + alpha) + 2 * (k + alpha) + 2 * k + 2 * k + 2 * (k - 1)
    # per limb-transform: two digit-matmul stages, 16 uint8 products each
    macs = n_limb_tf * 2 * 16 * n1 * n1 * n2
    flops = 2 * macs
    # v5e/v5p-class int8 peak ~ 394 TOPS; fraction of speed of light
    peak = float(os.environ.get("BENCH_PEAK_OPS", 394e12))
    sol_ops_per_s = peak / flops
    print(f"# {dt*1e3:.2f} ms/mult, NTT-matmul work {flops/1e9:.1f} GFLOP/mult, "
          f"SoL {sol_ops_per_s:.1f} mult/s", flush=True)

    print(json.dumps({
        "metric": f"ckks_mult_relin_rescale_N{params.n}_L{level}",
        "value": round(ops_per_s, 3),
        "unit": "ops/s/chip",
        "vs_baseline": round(ops_per_s / sol_ops_per_s, 4),
    }))


if __name__ == "__main__":
    main()
