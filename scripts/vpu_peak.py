"""Measured VPU u32 throughput ceiling (parallel-tile, NOT the rejected
serial chain) — the NTT kernel's speed-of-light denominator.

VERDICT r3 item 3: the round-3 attempt at a VPU ceiling chained one LCG
stream serially and was latency-bound (~0.25 Tops/s, contradicted 10x by
the real kernel's own throughput); rejected in bench.py. This bench fixes
the methodology: T independent [a, b] u32 tiles per grid step, each
advancing D steps of an elementwise mix, so the VLIW scheduler always has
T independent dependency chains (x 2048 lanes per op) to fill issue slots
with. Two mixes:

  * muladd    — v = v * c + c' (2 ops/elem/step): the classic peak.
  * recombine — one approximate-Shoup constant-multiply + lazy subtract
    (ops/ntt_pallas.py _shoup_approx + _lazy_sub, 15 ops/elem/step): the
    EXACT op mix of the v3 NTT recombine's inner loop, so the measured
    rate prices the recombine in its own currency.

Writes VPU_PEAK.json: {mix: {tops, ops_per_elem_step, ...}}. The NTT's
vs_sol in NTT_N16.json divides the kernel's counted elementwise ops by the
recombine-mix rate (+ the MXU floor) — see scripts/ntt_bench.py.

Timing: read-synced, floor (G=4 call) subtracted, min of ITERS.
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
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

T = int(os.environ.get("VPU_TILES", "8"))  # independent streams
D = int(os.environ.get("VPU_DEPTH", "64"))  # serial steps per stream
A, B = 256, 256  # tile shape (u32, 256 KB)
G = int(os.environ.get("VPU_GRID", "2048"))
ITERS = int(os.environ.get("VPU_ITERS", "3"))

# constants with the same shape as the real recombine's (q just under 2^30)
Q = np.uint32((1 << 30) - 35)
TWO_Q = np.uint32(2 * Q)
W = np.uint32(998244353 % Q)
WSH = np.uint32((int(W) << 32) // int(Q))
B0 = np.uint32(int(WSH) & 0xFFFF)
B1 = np.uint32(int(WSH) >> 16)


def _mix_muladd(v):
    return v * np.uint32(2654435761) + np.uint32(40503)


def _mix_recombine(v):
    # _shoup_approx + _lazy_sub, verbatim op structure (15 elementwise ops)
    a0 = v & np.uint32(0xFFFF)
    a1 = v >> np.uint32(16)
    quot = a1 * B1 + ((a0 * B1) >> np.uint32(16)) + ((a1 * B0) >> np.uint32(16))
    r = v * W - quot * Q
    return jnp.where(r >= TWO_Q, r - TWO_Q, r)


MIXES = {
    "muladd": (_mix_muladd, 2),
    "recombine": (_mix_recombine, 15),
}


def make_prog(mix_fn, grid):
    def kernel(x_ref, o_ref):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        salt = jnp.full((A, B), 1, jnp.uint32) * pid.astype(jnp.uint32)
        vs = [x_ref[t] + salt for t in range(T)]
        for _ in range(D):
            vs = [mix_fn(v) for v in vs]
        acc = functools.reduce(lambda x, y: x ^ y, vs)
        o_ref[0] = o_ref[0] ^ acc

    @jax.jit
    def prog(x):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((T, A, B), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, A, B), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, A, B), jnp.uint32),
        )(x)

    return prog


def run(mix_name):
    mix_fn, ops = MIXES[mix_name]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=(T, A, B), dtype=np.uint64)
                    .astype(np.uint32))

    def timed(grid):
        prog = make_prog(mix_fn, grid)
        c = prog.lower(x).compile()
        out = c(x)
        jax.block_until_ready(out)
        _ = np.asarray(out[0, 0, :4])  # read-sync (CLAUDE.md trap)
        dts = []
        for _ in range(ITERS):
            t0 = time.time()
            out = c(x)
            _ = np.asarray(out[0, 0, :4])
            dts.append(time.time() - t0)
        return min(dts)

    t_floor = timed(4)
    t_full = timed(G)
    dt = t_full - t_floor
    total_ops = (G - 4) * T * D * A * B * ops
    tops = total_ops / dt / 1e12
    print(f"# {mix_name}: {t_full*1e3:.2f} ms - floor {t_floor*1e3:.2f} ms; "
          f"{total_ops/1e9:.1f} Gops -> {tops:.3f} Tops/s (u32 elementwise)",
          flush=True)
    return {
        "tops": round(tops, 4),
        "ops_per_elem_step": ops,
        "tiles": T, "depth": D, "grid": G, "tile": [A, B],
        "wall_ms": round(dt * 1e3, 2),
    }


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    out = {"metric": "vpu_u32_peak", "unit": "Tops/s",
           "method": "parallel-tile (T independent VMEM streams per grid "
                     "step); replaces the rejected serial-chain bench "
                     "(bench.py round-3 note)",
           "mixes": {}}
    for m in MIXES:
        out["mixes"][m] = run(m)
    out["value"] = out["mixes"]["recombine"]["tops"]
    print(json.dumps(out), flush=True)
    (pathlib.Path(__file__).resolve().parents[1] / "VPU_PEAK.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
