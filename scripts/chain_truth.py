"""Ground-truth the chained-mult timing methodology on the real chip.

Motivated by a round-3 profiling anomaly: every stage program (NTT, MAC,
full mult) measured the SAME wall per dispatch-pass (~24 ms) regardless of
its size, and round 2's two bench presets (L=30 and L=48 dw, 2x different
traffic) ALSO both measured ~24 ms per pass. Hypothesis: XLA's
OptimizationBarrier has ELEMENTWISE operand->output semantics, so
`optimization_barrier((a0, r0))[0]` does NOT make the carry depend on r0 —
the loop body may be dead-code-eliminated and the bench chain may measure
pure tunnel dispatch+read overhead.

Three programs, same shapes (N=2^16, L=30 fused mult):
  A. barrier-chain   — bench.py r2 body (suspect)
  B. genuine-chain   — carry = concat(mult output, pad rows): true data dep
  C. empty-chain     — body returns carry unchanged: the overhead floor

If A ~= C << B: the barrier chain was empty and r2 headline numbers are
overhead. If A ~= B: the barrier serializes after all and the chip is
simply much faster than the traffic model's speed of light.
"""

from __future__ import annotations

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

from __graft_entry__ import _random_ct, _random_key, _setup
from gpufhe_tpu.ciphertext.ct import _mul_full_core
from gpufhe_tpu.primitives.rns import make_ks_context

assert jax.devices()[0].platform == "tpu", jax.devices()

CHAIN = int(os.environ.get("CHAIN", "64"))
PRESET = os.environ.get("PRESET", "config5_boot")
params, ctx, level, _ = _setup(PRESET)
w = params.scale_words
kscs = tuple(make_ks_context(params, level - i) for i in range(w))
rng = np.random.default_rng(0)
rlk = _random_key(params, rng)
a0, a1 = _random_ct(params, level, rng)
b0, b1 = _random_ct(params, level, rng)
print(f"# {PRESET}: N={params.n} L={level} chain={CHAIN}", flush=True)


def timeit(name, prog, args):
    t0 = time.time()
    compiled = prog.lower(*args).compile()
    tc = time.time() - t0
    out = compiled(*args)
    jax.block_until_ready(out)
    _ = np.asarray(out[0].reshape(-1)[:4])
    dts = []
    for _ in range(3):
        t0 = time.time()
        out = compiled(*out)
        _ = np.asarray(out[0].reshape(-1)[:4])
        dts.append(time.time() - t0)
    dt = min(dts)
    print(f"# {name:<16s} pass {dt * 1e3:8.2f} ms -> {dt / CHAIN * 1e3:7.3f} "
          f"ms/iter  (compile {tc:.1f}s)", flush=True)
    return dt


@jax.jit
def barrier_chain(a0, a1, b0, b1):
    def body(_, carry):
        a0, a1, b0, b1 = carry
        r0, r1 = _mul_full_core((a0, a1), (b0, b1), ctx, kscs, rlk, params)
        a0 = jax.lax.optimization_barrier((a0, r0))[0]
        a1 = jax.lax.optimization_barrier((a1, r1))[0]
        return (a0, a1, b0, b1)

    return jax.lax.fori_loop(0, CHAIN, body, (a0, a1, b0, b1))


@jax.jit
def genuine_chain(a0, a1, b0, b1):
    def body(_, carry):
        a0, a1, b0, b1 = carry
        r0, r1 = _mul_full_core((a0, a1), (b0, b1), ctx, kscs, rlk, params)
        # true data dependency: next iteration multiplies the OUTPUT
        # (padded back to the full level with rows of the old input so the
        # carry is shape-stable; pad rows are valid residues of their primes)
        a0 = jnp.concatenate([r0, a0[level - w:]])
        a1 = jnp.concatenate([r1, a1[level - w:]])
        return (a0, a1, b0, b1)

    return jax.lax.fori_loop(0, CHAIN, body, (a0, a1, b0, b1))


@jax.jit
def empty_chain(a0, a1, b0, b1):
    def body(_, carry):
        return carry

    return jax.lax.fori_loop(0, CHAIN, body, (a0, a1, b0, b1))


args = (a0, a1, b0, b1)
which = os.environ.get("PROGRAMS", "empty,barrier,genuine").split(",")
t_empty = timeit("empty", empty_chain, args) if "empty" in which else 0.0
t_barrier = (
    timeit("barrier (r2)", barrier_chain, args) if "barrier" in which else 0.0
)
t_genuine = timeit("genuine", genuine_chain, args)

per_mult = (t_genuine - t_empty) / CHAIN
print(f"# overhead floor {t_empty * 1e3:.2f} ms/pass; "
      f"genuine-minus-floor {per_mult * 1e3:.3f} ms/mult", flush=True)
if t_barrier < 0.5 * t_genuine:
    print("# VERDICT: barrier chain was NOT serialized/computed — r2 bench "
          "mult headlines measured tunnel overhead, not the op.", flush=True)
else:
    print("# VERDICT: barrier chain matches genuine chain — methodology "
          "holds; the chip is simply faster than the model.", flush=True)
