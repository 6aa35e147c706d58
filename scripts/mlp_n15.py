"""Production-scale encrypted MLP inference on the real TPU: N=2^15.

Extends the production evidence from primitives (bench.py) and bootstrap
(bootstrap_n16_dw.py) to the MODELS layer: an MNIST-shaped MLP
(784 -> 128 -> 10, square activation) over encrypted activations with
cleartext weights, BSGS plaintext-matrix products (ciphertext/linalg.py),
at the BASELINE config-3 ring (N=2^15, 16384 slots, L=12).

Timing is read-synced end-to-end inference latency (encrypt/decrypt
excluded — they are the API boundary, not the homomorphic pipeline).
Correctness is max |logit - reference| over the 10 output slots.

Writes MLP_N15.json.
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

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys.device_keygen import device_keygen
from gpufhe_tpu.models.mlp import EncryptedMLP, mlp_rotations_for
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset

assert jax.devices()[0].platform == "tpu", jax.devices()

params = preset("config3_ckks")
print(f"# N={params.n} L={params.num_limbs} slots={params.slots}", flush=True)

rng = np.random.default_rng(1)
d_in, d_h, d_out = 784, 128, 10
layers = [
    (rng.normal(size=(d_h, d_in)) * 0.1, rng.normal(size=d_h) * 0.1),
    (rng.normal(size=(d_out, d_h)) * 0.1, rng.normal(size=d_out) * 0.1),
]

t0 = time.time()
ctx = make_context(params)
# exact steps this layer stack uses (NOT the dense 254-key BSGS set): every
# dropped step is ~16 MB of Galois key the chest never holds on HBM
rots = mlp_rotations_for(layers, params.slots)
chest = device_keygen(params, np.random.default_rng(0),
                      rotations=tuple(rots), conjugation=False)
jax.block_until_ready(chest.device_rlk.b_mont)
print(f"# keygen {time.time()-t0:.0f}s ({len(rots)} galois keys)", flush=True)

be = DeviceBackend(params, ctx, chest)
model = EncryptedMLP(be, layers)
x = rng.normal(size=d_in) * 0.5
slots_x = np.zeros(params.slots, dtype=np.complex128)
slots_x[:d_in] = x
ct = dct.encrypt(
    encoder.encode(slots_x, params), params, chest.device_pk, ctx,
    np.random.default_rng(2), params.scale,
)

t0 = time.time()
out = model(ct)
_ = np.asarray(out.c[0][0, :4])  # read-sync through the tunnel
first = time.time() - t0
print(f"# compile+first {first:.1f}s", flush=True)

times = []
for _ in range(3):
    miss0 = be.encode_misses
    t0 = time.time()
    out = model(ct)
    _ = np.asarray(out.c[0][0, :4])
    times.append(time.time() - t0)
    print(f"#   eager iter {times[-1]*1e3:.1f} ms, encode misses "
          f"{be.encode_misses - miss0}", flush=True)
eager_steady = min(times)

# whole-model fusion: the eager forward is a ~hundreds-dispatch fan
# (hoist + rotations + MACs per BSGS product + per-call bias encodes) and
# measures dispatch, not kernels — the same disease whole-stage fusion
# cured for the bootstrap (ciphertext/backend.py FusedPipeline)
from gpufhe_tpu.ciphertext.backend import FusedPipeline

fused = FusedPipeline(be, model)
t0 = time.time()
out = fused(ct)
_ = np.asarray(out.c[0][0, :4])
print(f"# fused compile+first {time.time()-t0:.1f}s", flush=True)
times = []
for _ in range(5):
    miss0 = be.encode_misses
    t0 = time.time()
    out = fused(ct)
    _ = np.asarray(out.c[0][0, :4])
    times.append(time.time() - t0)
    print(f"#   fused iter {times[-1]*1e3:.1f} ms, encode misses "
          f"{be.encode_misses - miss0}", flush=True)
steady = min(times)

got = np.real(be.decrypt_decode(out)[:d_out])
want = model.reference(x)
err = float(np.abs(got - want).max())
print(f"# logits err {err:.2e} (|ref| max {np.abs(want).max():.2f})",
      flush=True)
assert err < 1e-2, err

result = {
    "demo": "encrypted_mlp_inference", "N": params.n, "L": params.num_limbs,
    "slots": params.slots, "arch": [d_in, d_h, d_out],
    "activation": "square",
    "steady_ms": round(steady * 1e3, 1),
    "eager_steady_ms": round(eager_steady * 1e3, 1),
    "first_s": round(first, 1),
    "max_logit_err": err, "timing": "read-synced",
}
print(json.dumps(result), flush=True)
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MLP_N15.json"), "w") as f:
    f.write(json.dumps(result) + "\n")
