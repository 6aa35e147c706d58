"""Timing probe: is the steady bootstrap wall-clock honest?

Syncs each iteration with a HOST READ of the output (a device->host copy
cannot complete before the producing computation), immune to any
block_until_ready no-op through the tunnel.
"""
import json, pathlib, sys, time
import numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache_tpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from gpufhe_tpu.ciphertext import ct as dct
    from gpufhe_tpu.ciphertext.backend import DeviceBackend
    from gpufhe_tpu.ciphertext.bootstrap import Bootstrapper, bootstrap_rotations
    from gpufhe_tpu.encoding import encoder
    from gpufhe_tpu.keys.device_keygen import device_keygen
    from gpufhe_tpu.ops.context import make_context
    from gpufhe_tpu.params.params import preset

    params = preset("config5_boot_dw")
    ctx = make_context(params)
    rots = bootstrap_rotations(params, transform="factored", radix_log=3)
    t0 = time.time()
    chest = device_keygen(
        params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True
    )
    jax.block_until_ready(chest.device_rlk.b_mont)
    print(f"# keygen {time.time()-t0:.0f}s", flush=True)
    be = DeviceBackend(params, ctx, chest)
    t0 = time.time()
    bs = Bootstrapper(be, transform="factored", radix_log=3,
                      evalmod="cheb", k_bound=12.0)
    print(f"# plans {time.time()-t0:.0f}s", flush=True)
    from gpufhe_tpu.keys.keys import truncate_galois_device
    steps, conj_lvl = bs.galois_step_levels()
    truncate_galois_device(chest, steps, conj_lvl, params)
    print("# keys truncated", flush=True)
    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)) * 0.2
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=2,
    )
    t0 = time.time()
    out = bs(ct)
    _ = np.asarray(out.c[0][0, :4])  # host read = hard sync
    print(f"# first (read-synced) {time.time()-t0:.1f}s", flush=True)
    times = []
    for i in range(4):
        t0 = time.time()
        out = bs(ct)
        v = np.asarray(out.c[0][0, :4])  # hard sync
        times.append(time.time() - t0)
        print(f"#   iter {times[-1]:.3f}s (read-synced)", flush=True)
    print(json.dumps({
        "demo": "bootstrap_probe_readsync", "steady_s": round(min(times), 3),
        "iters": [round(t, 3) for t in times],
    }), flush=True)


if __name__ == "__main__":
    main()
