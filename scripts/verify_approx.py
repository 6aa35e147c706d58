"""On-chip verification of ciphertext/approx.py (see .claude/skills/verify).

Drives inverse / sqrt / exp / softmax on the REAL TPU at ci_deep /
boot_ci_deep scale and checks against the cleartext functions (same
tolerances as tests/test_approx.py).
"""

import time

import numpy as np
import jax

from gpufhe_tpu.ciphertext import approx
from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset

assert jax.devices()[0].platform == "tpu", jax.devices()


def enc(params, chest, ctx, z, seed):
    return dct.encrypt(
        encoder.encode(np.asarray(z, dtype=np.complex128), params), params,
        chest.device_pk, ctx, np.random.default_rng(seed), params.scale,
    )


params = preset("ci_deep")
ctx = make_context(params)
chest = dkeys.keygen(params, np.random.default_rng(0))
be = DeviceBackend(params, ctx, chest)
rng = np.random.default_rng(1)

t0 = time.time()
x = rng.uniform(0.2, 1.0, size=params.slots)
got = np.real(be.decrypt_decode(approx.inverse(be, enc(params, chest, ctx, x, 2), iters=5)))
err = (np.abs(got - 1.0 / x) * x).max()
print(f"inverse rel err {err:.2e} ({time.time()-t0:.0f}s)")
assert err < 5e-3, err

t0 = time.time()
x = rng.uniform(0.1, 1.0, size=params.slots)
got = np.real(be.decrypt_decode(approx.sqrt(be, enc(params, chest, ctx, x, 3), iters=6)))
err = np.abs(got - np.sqrt(x)).max()
print(f"sqrt err {err:.2e} ({time.time()-t0:.0f}s)")
assert err < 5e-3, err

t0 = time.time()
x = rng.uniform(-2.0, 2.0, size=params.slots)
got = np.real(be.decrypt_decode(approx.exp(be, enc(params, chest, ctx, x, 4), half_range=2.0)))
err = (np.abs(got - np.exp(x)) / np.exp(x)).max()
print(f"exp rel err {err:.2e} ({time.time()-t0:.0f}s)")
assert err < 2e-3, err

sp = preset("boot_ci_deep")
sctx = make_context(sp)
schest = dkeys.keygen(
    sp, np.random.default_rng(5),
    rotations=tuple(approx.rotations_for_softmax(sp.slots)),
)
sbe = DeviceBackend(sp, sctx, schest)
t0 = time.time()
x = rng.uniform(-1.0, 1.0, size=sp.slots)
got = np.real(sbe.decrypt_decode(
    approx.softmax(sbe, enc(sp, schest, sctx, x, 6), inv_iters=6, degree=7)))
want = np.exp(x) / np.exp(x).sum()
err = np.abs(got - want).max() / want.max()
print(f"softmax rel err {err:.2e} ({time.time()-t0:.0f}s)")
assert err < 2e-3, err

print("approx toolkit verified on real TPU (inverse, sqrt, exp, softmax)")
