"""Production-scale BFV multiply timing on the real TPU: N=2^16, L=30.

The integer-scheme counterpart of bench.py's CKKS headline. BFV multiplies
keep the level, so the timing chain is data-dependent squarings of one
ciphertext (out = relin(tensor(out, out))) — per-dispatch tunnel overhead
(~1.5 ms, CLAUDE.md) is amortized over the two dispatches per mult and the
chain defeats dead-code elimination. Timing is read-synced (a bare
block_until_ready can return early through the axon tunnel).

Writes BFV_N16.json. Correctness is asserted by decrypting the end of a
short chain (exact mod t).
"""

import json
import time

import numpy as np
import jax

from gpufhe_tpu.ciphertext import bfv as dbfv
from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.params.params import preset, make_context

assert jax.devices()[0].platform == "tpu", jax.devices()

params = preset("bfv_n16")
t = params.plain_modulus
print(f"# N={params.n} L={params.num_limbs} t={t}")

t0 = time.time()
ctx = make_context(params)
chest = dbfv.keygen(params, np.random.default_rng(0))
auxp, aux_ctx, tabs = dbfv.make_bfv_mul_context(params, params.num_limbs)
print(f"# setup {time.time() - t0:.1f}s  aux limbs={len(auxp.q_primes)}")

m = np.random.default_rng(1).integers(0, t, size=params.n, dtype=np.int64)
ct = dbfv.encrypt(gbfv.encode(m, params), params, chest.device_pk, ctx,
                  np.random.default_rng(2))

# warm-up / compile + correctness: 3 squarings decrypt exactly
t0 = time.time()
out = ct
want = m.copy()
for _ in range(3):
    out = dbfv.ct_mul(out, out, params, ctx, chest.device_rlk)
    want = want * want % t
got = dbfv.decrypt_decode(out, params, chest.device_sk, ctx)
assert (got == want).all(), "BFV N=2^16 chain decrypt mismatch"
print(f"# compile+first+check {time.time() - t0:.1f}s")

# timed chain (data-dependent squarings), read-synced
iters = 20
out = ct
np.asarray(out.c[0][..., :4])
t0 = time.time()
for _ in range(iters):
    out = dbfv.ct_mul(out, out, params, ctx, chest.device_rlk)
np.asarray(out.c[0][..., :4])  # read-sync
dt = (time.time() - t0) / iters
result = {
    "metric": f"bfv_mult_relin_N{params.n}_L{params.num_limbs}",
    "value": round(1.0 / dt, 3),
    "unit": "ops/s/chip",
    "ms_per_mult": round(dt * 1e3, 3),
    "aux_limbs": len(auxp.q_primes),
}
print(json.dumps(result))
with open("BFV_N16.json", "w") as f:
    json.dump(result, f)
