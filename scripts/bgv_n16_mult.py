"""Production-scale BGV multiply timing on the real TPU: N=2^16, L=30.

Completes the three-scheme production evidence (CKKS: bench.py; BFV:
bfv_n16_mult.py; BGV: this). Same corrected methodology: a fori_loop chain
of GENUINELY data-dependent multiplies inside ONE compiled program, minus
the measured empty-loop floor, read-synced wall clock.

BGV mult = tensor + relinearize + t-corrected ModSwitch, so each mult DROPS
a level. The chain keeps a static shape the way bench.py's CKKS chain does:
the ModSwitch output (level-1 limbs) is padded back to `level` with a stale
row of the carried operand — garbage as a ciphertext but identical kernels
and genuine data dependence, which is all a latency chain needs. Correctness
is asserted separately by decrypting a short eager chain (exact mod t).

Writes BGV_N16.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpufhe_tpu.ciphertext import bgv as dbgv
from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.golden import bgv as gbgv
from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from gpufhe_tpu.params.params import preset, make_context
from gpufhe_tpu.primitives.rns import bgv_modswitch, make_ks_context

assert jax.devices()[0].platform == "tpu", jax.devices()

CHAIN = int(__import__("os").environ.get("CHAIN", "64"))  # chain=16 left +-0.6 ms of floor noise on the headline
# same ring/chain/t as the BFV headline so the two exact schemes compare
# one-to-one (bfv_n16: N=2^16, L=30, t=786433, alpha=15/dnum=2)
params = preset("bfv_n16")
t = params.plain_modulus
level = params.num_limbs
print(f"# N={params.n} L={level} t={t}")

t0 = time.time()
ctx = make_context(params)
chest = dbgv.keygen(params, np.random.default_rng(0))
ksc = make_ks_context(params, level)  # t-corrected: BGV relin + ModSwitch
rlk = chest.device_rlk
print(f"# setup {time.time() - t0:.1f}s")

m = np.random.default_rng(1).integers(0, t, size=params.n, dtype=np.int64)
ct = dbgv.encrypt(gbgv.encode(m, params), params, chest.device_pk, ctx,
                  np.random.default_rng(2))

# correctness: 3 eager squarings decrypt exactly (levels drop 30 -> 27;
# decrypt folds the accumulated pt_factor)
t0 = time.time()
out = ct
want = m.copy()
for _ in range(3):
    out = dbgv.ct_mul(out, out, params, ctx, rlk)
    want = want * want % t
got = dbgv.decrypt_decode(out, params, chest.device_sk, ctx)
assert (got == want).all(), "BGV N=2^16 chain decrypt mismatch"
print(f"# eager compile+check {time.time() - t0:.1f}s")

q_idx = list(range(level))

from gpufhe_tpu.ops.context import fourstep_split

n1f, n2f = fourstep_split(params.n)
_2d = lambda x: x.reshape(x.shape[0], params.n)
_3d = lambda x: x.reshape(x.shape[0], n1f, n2f)


@jax.jit
def step_chain(a0, a1, b0, b1):
    # one compiled body, CHAIN genuinely data-dependent iterations: each
    # iteration runs the FULL production fused mult (bgv.py
    # _bgv_mul_full_core — tensor + hybrid-KS relin with the coeff-domain
    # add + t-corrected ModSwitch in coeff + ONE NTT per output) at the
    # static top level; the output (level-1 limbs) is padded back with the
    # carried operand's last row so the carry is shape-stable, and
    # iteration i+1 multiplies iteration i's OUTPUT by iteration i's first
    # operand — nothing is loop-invariant. Carry rides the kernel-native
    # [L, n1, n2] view (docs/MEASUREMENT.md 2b).
    def body(_, carry):
        c0, c1, d0, d1 = carry
        r0, r1 = dbgv._bgv_mul_full_core(
            (_2d(c0), _2d(c1)), (_2d(d0), _2d(d1)), ctx, ksc, rlk, params)
        n0 = jnp.concatenate([_3d(r0), c0[level - 1:]])
        n1 = jnp.concatenate([_3d(r1), c1[level - 1:]])
        return (n0, n1, c0, c1)

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
    "metric": f"bgv_mult_relin_modswitch_N{params.n}_L{level}",
    "value": round(1.0 / dt, 3),
    "unit": "ops/s/chip",
    "ms_per_mult": round(dt * 1e3, 3),
    "chain": CHAIN,
}

# ceiling (VERDICT r3 weak #4): the BGV mult's stage structure is the CKKS
# mult's (tensor + hybrid key-switch + NTT round trips) with the rescale
# replaced by the t-corrected ModSwitch — same N/L/alpha/dnum geometry as
# config5_boot, so the CKKS LEAF-derived recon_ms prices it. ModSwitch
# costs slightly more than rescale (two extra elementwise passes), so this
# denominator slightly UNDERSTATES the true BGV stage-sum — vs_baseline is
# conservative.
import pathlib

_ckks = pathlib.Path(__file__).resolve().parents[1] / "PROFILE_MULT_config5_boot.json"
if _ckks.exists():
    recon = json.loads(_ckks.read_text()).get("recon_ms")
    if recon:
        result["recon_ms_ckks_leaves"] = recon
        result["vs_baseline"] = round(recon / (dt * 1e3), 4)
        result["vs_baseline_basis"] = ("CKKS leaf-derived stage-sum at the "
                                       "same KS geometry; ModSwitch delta "
                                       "unpriced (conservative)")
print(json.dumps(result))
with open("BGV_N16.json", "w") as f:
    json.dump(result, f)
