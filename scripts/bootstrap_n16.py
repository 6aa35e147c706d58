"""Production-scale CKKS bootstrapping demo: N=2^16, L=30, one TPU chip.

BASELINE.json config 5. Device-side keygen (keys/device_keygen.py),
factored-FFT CoeffToSlot/SlotToCoeff (radix-4 stages at radix_log=2 keep the
Galois-key working set inside HBM), EvalMod with r=8 double-angles.

Run: python scripts/bootstrap_n16.py   (expects the real chip; slow compile)
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax

    from gpufhe_tpu.ciphertext import ct as dct
    from gpufhe_tpu.ciphertext.backend import DeviceBackend
    from gpufhe_tpu.ciphertext.bootstrap import Bootstrapper, bootstrap_rotations
    from gpufhe_tpu.encoding import encoder
    from gpufhe_tpu.keys.device_keygen import device_keygen
    from gpufhe_tpu.ops.context import make_context
    from gpufhe_tpu.params.params import preset

    radix = 2
    params = preset("config5_boot_h")
    t0 = time.time()
    ctx = make_context(params)
    print(f"# context {time.time()-t0:.0f}s", flush=True)

    rots = bootstrap_rotations(params, transform="factored", radix_log=radix)
    print(f"# {len(rots)} galois keys needed", flush=True)
    t0 = time.time()
    chest = device_keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    jax.block_until_ready(chest.device_rlk.b_mont)
    print(f"# device keygen {time.time()-t0:.0f}s", flush=True)

    be = DeviceBackend(params, ctx, chest)
    t0 = time.time()
    bs = Bootstrapper(
        be, transform="factored", radix_log=radix, evalmod="cheb", k_bound=12.0
    )
    print(f"# transform plans {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)) * 0.2
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=1,
    )

    t0 = time.time()
    out = bs(ct)
    jax.block_until_ready(out.c)
    first = time.time() - t0
    print(f"# bootstrap compile+first {first:.0f}s", flush=True)

    t0 = time.time()
    out = bs(ct)
    jax.block_until_ready(out.c)
    steady = time.time() - t0

    got = be.decrypt_decode(out)
    err = float(np.abs(got - z).max())
    print(json.dumps({
        "demo": "ckks_bootstrap", "N": params.n, "L": params.num_limbs,
        "slots": params.slots, "out_level": out.level,
        "steady_s": round(steady, 3), "first_s": round(first, 1),
        "max_err": err,
    }))


if __name__ == "__main__":
    main()
