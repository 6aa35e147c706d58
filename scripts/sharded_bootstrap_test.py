"""Full CKKS bootstrap running on the ('limb','coeff') mesh (BASELINE cfg 5:
"sharded over multi-host mesh"). CPU 8-virtual-device validation; the same
code path runs on a real pod slice via parallel/multihost.py meshes.

Run: python scripts/sharded_bootstrap_test.py
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)

import time

import numpy as np

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.bootstrap import Bootstrapper, bootstrap_rotations
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.keys import keys as dkeys
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.parallel import sharded as sh
from gpufhe_tpu.parallel.backend import ShardedBackend
from gpufhe_tpu.params.params import preset


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="boot_ci_f",
                    help="boot_ci_f (CI), boot_mid (N=2^12 stress) or "
                         "boot_mid_dw (N=2^14 double-word — the largest "
                         "ring the 8-virtual-CPU mesh tolerates)")
    ap.add_argument("--iters", type=int, default=1,
                    help="steady-state iterations to time after the first")
    ap.add_argument("--evalmod", default="cos",
                    help="cos (CI scale) or cheb (production: no 2^r noise "
                         "amplification — required beyond CI scale)")
    ap.add_argument("--k-bound", type=float, default=12.0,
                    help="ModRaise overflow bound; ~6*sqrt(h/12) is safe")
    ap.add_argument("--radix-log", type=int, default=3,
                    help="factored-transform radix (4 at N=2^14)")
    ap.add_argument("--mesh", type=int, nargs=2, default=(2, 4),
                    metavar=("LIMB", "COEFF"),
                    help="mesh shape; 2 2 on 4-core boxes at N>=2^14 — 8 "
                         "device threads on 4 cores can straggle past XLA's "
                         "40 s CPU-collective rendezvous deadline")
    args = ap.parse_args()

    t0 = time.time()
    params = preset(args.preset)
    ctx = make_context(params)
    rots = bootstrap_rotations(params, transform="factored",
                               radix_log=args.radix_log)
    if params.n >= 2**12:
        # golden keygen is recursive numpy (O(minutes-hours) at these rings);
        # the device generator makes equally-valid keys in seconds and this
        # script self-compares sharded vs single-chip, not vs golden
        from gpufhe_tpu.keys.device_keygen import device_keygen

        chest = device_keygen(
            params, np.random.default_rng(7), rotations=tuple(rots),
            conjugation=True,
        )
    else:
        chest = dkeys.keygen(
            params, np.random.default_rng(7), rotations=tuple(rots),
            conjugation=True,
        )
    n_dev = args.mesh[0] * args.mesh[1]
    mesh = sh.make_fhe_mesh(args.mesh[0], args.mesh[1],
                            devices=jax.devices()[:n_dev])
    be = ShardedBackend(params, mesh, chest)
    bs = Bootstrapper(be, transform="factored", radix_log=args.radix_log,
                      evalmod=args.evalmod, k_bound=args.k_bound)
    print(f"# setup {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)) * 0.2
    ct1 = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=params.scale_words,
    )
    t0 = time.time()
    out = bs(be.from_single(ct1))
    jax.block_until_ready(out.c)
    first = time.time() - t0
    steady = []
    for _ in range(args.iters):
        t0 = time.time()
        out = bs(be.from_single(ct1))
        jax.block_until_ready(out.c)
        steady.append(round(time.time() - t0, 2))
    err = float(np.abs(be.decrypt_decode(out) - z).max())
    print(f"SHARDED_BOOTSTRAP preset={args.preset} N={params.n} ok={err < 0.01} "
          f"err={err:.2e} level={out.level} first={first:.0f}s steady={steady}")


if __name__ == "__main__":
    main()
