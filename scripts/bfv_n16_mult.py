"""Production-scale BFV multiply timing on the real TPU: N=2^16, L=30.

The integer-scheme counterpart of bench.py's CKKS headline, using the SAME
(round-3 corrected) methodology: a fori_loop chain of GENUINELY
data-dependent multiplies inside ONE compiled program — each iteration
multiplies the previous iteration's output (BFV mult keeps the level, so
outputs feed back directly) — minus the measured empty-loop floor, then a
read-synced wall-clock. The earlier optimization_barrier tie did NOT
serialize (XLA DCE'd the body; scripts/chain_truth.py) — the first BFV_N16
artifact measured dispatch overhead only. Correctness is asserted separately
by decrypting a short eager chain (exact mod t).

Writes BFV_N16.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpufhe_tpu.ciphertext import bfv as dbfv
from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.params.params import preset, make_context

assert jax.devices()[0].platform == "tpu", jax.devices()

CHAIN = int(__import__("os").environ.get("CHAIN", "64"))  # chain=16 left +-0.6 ms of floor noise on the headline
params = preset("bfv_n16")
t = params.plain_modulus
level = params.num_limbs
print(f"# N={params.n} L={level} t={t}")

t0 = time.time()
ctx = make_context(params)
chest = dbfv.keygen(params, np.random.default_rng(0))
auxp, aux_ctx, tabs = dbfv.make_bfv_mul_context(params, level)
ksc = dbfv._ckks_ksc(params, level)
rlk = chest.device_rlk
print(f"# setup {time.time() - t0:.1f}s  aux limbs={len(auxp.q_primes)}")

m = np.random.default_rng(1).integers(0, t, size=params.n, dtype=np.int64)
ct = dbfv.encrypt(gbfv.encode(m, params), params, chest.device_pk, ctx,
                  np.random.default_rng(2))

# correctness: 3 eager squarings decrypt exactly
t0 = time.time()
out = ct
want = m.copy()
for _ in range(3):
    out = dbfv.ct_mul(out, out, params, ctx, chest.device_rlk)
    want = want * want % t
got = dbfv.decrypt_decode(out, params, chest.device_sk, ctx)
assert (got == want).all(), "BFV N=2^16 chain decrypt mismatch"
print(f"# eager compile+check {time.time() - t0:.1f}s")


from gpufhe_tpu.ops.context import fourstep_split

n1f, n2f = fourstep_split(params.n)
_2d = lambda x: x.reshape(level, params.n)
_3d = lambda x: x.reshape(level, n1f, n2f)


@jax.jit
def step_chain(a0, a1, b0, b1):
    # one compiled body, CHAIN genuinely data-dependent iterations: the BFV
    # mult is scale-invariant (output at the same level), so iteration i+1
    # multiplies iteration i's OUTPUT by iteration i's first operand —
    # both operands vary, nothing can be DCE'd or hoisted. The carry rides
    # in the kernel-native [L, n1, n2] view (the 2D-carry per-iteration
    # relayout artifact — NTT_N16.json siblings).
    def body(_, carry):
        c0, c1, d0, d1 = carry
        # all components cross the tensor->relin boundary in coefficient
        # domain; relin adds in coeff and transforms each output once
        # (bfv.py ct_mul — 4*level boundary transforms cancelled)
        d = dbfv._bfv_tensor_core(
            (_2d(c0), _2d(c1)), (_2d(d0), _2d(d1)), ctx, aux_ctx, tabs,
            params, auxp, level, out_mode="coeff",
        )
        r0, r1 = dbfv._bfv_relin_coeff(d, ctx, ksc, rlk, params, level)
        return (_3d(r0), _3d(r1), c0, c1)

    return jax.lax.fori_loop(0, CHAIN, body, (a0, a1, b0, b1))


@jax.jit
def floor_chain(a0, a1, b0, b1):
    def body(_, carry):
        return carry

    return jax.lax.fori_loop(0, CHAIN, body, (a0, a1, b0, b1))


def timed(compiled, args):
    res = compiled(*args)
    jax.block_until_ready(res)
    _ = np.asarray(res[0][0, 0, :4])  # pay the read-sync slice compile here
    dts = []
    for _ in range(3):
        t0 = time.time()
        res = compiled(*res)
        _ = np.asarray(res[0][0, 0, :4])  # read-sync (block_until_ready lies)
        dts.append(time.time() - t0)
    return min(dts)


a0, a1 = (_3d(c) for c in ct.c)
t0 = time.time()
compiled = step_chain.lower(a0, a1, a0, a1).compile()
floor_c = floor_chain.lower(a0, a1, a0, a1).compile()
print(f"# chain compile {time.time() - t0:.1f}s")
t_floor = timed(floor_c, (a0, a1, a0, a1))
t_pass = timed(compiled, (a0, a1, a0, a1))
print(f"# pass {t_pass * 1e3:.2f} ms - floor {t_floor * 1e3:.2f} ms "
      f"over chain={CHAIN}")
dt = (t_pass - t_floor) / CHAIN
result = {
    "metric": f"bfv_mult_relin_N{params.n}_L{level}",
    "value": round(1.0 / dt, 3),
    "unit": "ops/s/chip",
    "ms_per_mult": round(dt * 1e3, 3),
    "aux_limbs": len(auxp.q_primes),
    "chain": CHAIN,
}

# ceilings (VERDICT r3 weak #4): vs_baseline against the measured BFV
# stage-sum (profile_bfv_stages.py recon_ms = tensor + relin, each its own
# chained one-jit program), vs_ckks_mult against the CKKS L=30 leaf-derived
# mult (same N/L/alpha/dnum hybrid-KS geometry)
import pathlib

_root = pathlib.Path(__file__).resolve().parents[1]
_prof = _root / "PROFILE_BFV_N16.json"
if _prof.exists():
    recon = json.loads(_prof.read_text()).get("recon_ms")
    if recon:
        result["recon_ms"] = recon
        result["vs_baseline"] = round(recon / (dt * 1e3), 4)
_ckks = _root / "PROFILE_MULT_config5_boot.json"
if _ckks.exists():
    ck = json.loads(_ckks.read_text())["stages_ms"].get("mul_full")
    if ck:
        result["vs_ckks_mult"] = round(dt * 1e3 / ck, 3)
print(json.dumps(result))
with open("BFV_N16.json", "w") as f:
    json.dump(result, f)
