"""On-chip verification of backend.FusedPipeline (see .claude/skills/verify).

Drives the public API on the REAL TPU: a composition (mul, rescale,
mul_plain, add_plain) fused into one XLA program must match the eager
dispatch-by-dispatch path limb-exactly, and decrypt to the right values
(golden cross-check). Also drives the split Chebyshev EvalMod form the
Bootstrapper uses (basis program + eval program).
"""

import time

import numpy as np
import jax

from gpufhe_tpu import make_context
from gpufhe_tpu.params.params import preset
from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend, FusedPipeline
from gpufhe_tpu.ciphertext.polyeval import ChebyshevEvaluator, sine_coeffs
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys

assert jax.devices()[0].platform == "tpu", jax.devices()

params = preset("boot_ci_cheb")
ctx = make_context(params)
chest = dkeys.keygen(params, np.random.default_rng(7))
be = DeviceBackend(params, ctx, chest)
rng = np.random.default_rng(0)
z = rng.uniform(-1, 1, size=params.slots)
ct = dct.encrypt(
    encoder.encode(z + 0j, params), params, chest.device_pk, ctx,
    np.random.default_rng(1), params.scale,
)


def fn(x):
    y = be.mul(x, x)  # full mult: tensor + relin + rescale (backend contract)
    pt = be.encode_slots(0.5, y.scale, y.level)
    y = be.rescale(be.mul_plain(y, pt))
    return be.add_plain(y, 0.25)


t0 = time.time()
fused = FusedPipeline(be, fn)
out_f = fused(ct)
print(f"fused compile+run {time.time() - t0:.1f}s")
out_e = fn(ct)
assert out_f.level == out_e.level and out_f.scale == out_e.scale
for cf, ce in zip(out_f.c, out_e.c):
    assert (np.asarray(cf) == np.asarray(ce)).all(), "fused != eager (limb)"
want = 0.5 * z * z + 0.25
err = np.abs(be.decrypt_decode(out_f) - want).max()
print(f"composition decrypt err {err:.2e}")
assert err < 1e-3, err

# split Chebyshev EvalMod form (basis program + eval program), run twice —
# second call must hit the compiled programs and stay exact
ev = ChebyshevEvaluator(be, sine_coeffs(1.0, degree=17), baby_log=2)
eager = ev(ct)
basis = FusedPipeline(be, ev._build_basis)
evalp = FusedPipeline(be, lambda t: ev._eval(ev.c, t))
t0 = time.time()
first = evalp(basis(ct))
print(f"cheb fused compile+run {time.time() - t0:.1f}s")
for _ in range(2):
    out2 = evalp(basis(ct))
    assert out2.level == eager.level and out2.scale == eager.scale
    for cf, ce in zip(out2.c, eager.c):
        assert (np.asarray(cf) == np.asarray(ce)).all(), "cheb fused != eager"
print("bit-exact on real TPU (FusedPipeline: composition + split cheb)")
