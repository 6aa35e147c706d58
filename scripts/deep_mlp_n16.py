"""Production-scale capstone: DEEP encrypted MLP inference THROUGH the
N=2^16 double-word bootstrap on the real chip (VERDICT r3 item 8).

A 5-layer square-activation MLP (d=8 features) whose depth (5 matmuls + 4
activations = 9 mults = 18 dw levels + floor) exceeds the level budget the
input carries (level 8): the forward pass bootstraps MID-INFERENCE at every
layer boundary where the remaining budget cannot fit the next layer
(models/mlp.py refresh=), then finishes on the refreshed chain. This welds
the two flagship results — the 0.56 s dw bootstrap (BOOT_N16_DW.json) and
the encrypted MLP (MLP_N15.json) — into one end-to-end proof: arbitrary-
depth encrypted inference at production ring size.

Configuration notes:
  * d=8 keeps the BSGS rotation-key set small (~12 keys at ~63 MB each
    once truncated to the post-bootstrap level) — the bootstrap chest alone
    holds ~9 GiB of the 16 GB chip.
  * Fused EvalMod + lean keys (the flagship configuration) measured FITS
    with the MLP keys aboard: 13.78 GiB peak, steady 1.087 s vs 1.12 eager.
    GPUFHE_FUSE_EVALMOD=0 falls back to the never-OOM eager path.
  * Accuracy bar: max |logit - reference| <= 1e-2 (the dw bootstrap's
    8.5e-6 slot error times the squared-activation amplification of a
    5-layer 0.3-weight network stays well under it).

Writes DEEP_MLP_N16.json. First run is compile-heavy through the tunnel
(~20-40 min COLD, minutes warm .jax_cache_tpu); steady-state is reported
read-synced.
"""

import json
import os
import pathlib
import sys
import time

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
    from gpufhe_tpu.keys.keys import truncate_galois_device
    from gpufhe_tpu.models.mlp import EncryptedMLP, mlp_rotations_for
    from gpufhe_tpu.ops.context import make_context
    from gpufhe_tpu.params.params import preset

    assert jax.devices()[0].platform == "tpu", jax.devices()

    radix = 3
    d = int(os.environ.get("DEEP_MLP_D", "8"))
    n_layers = int(os.environ.get("DEEP_MLP_LAYERS", "5"))
    in_level = int(os.environ.get("DEEP_MLP_IN_LEVEL", "8"))
    params = preset("config5_boot_dw")
    t0 = time.time()
    ctx = make_context(params)

    rng = np.random.default_rng(11)
    layers = []
    for i in range(n_layers):
        out_d = 4 if i == n_layers - 1 else d
        layers.append((rng.normal(size=(out_d, d)) * (0.5 / np.sqrt(d)),
                       rng.normal(size=out_d) * 0.05))

    mlp_steps = mlp_rotations_for(layers, params.slots)
    boot_rots = bootstrap_rotations(params, transform="factored",
                                    radix_log=radix)
    rots = sorted(set(boot_rots) | set(mlp_steps))
    print(f"# context {time.time()-t0:.0f}s; {len(boot_rots)} bootstrap + "
          f"{len(mlp_steps)} mlp rotation keys", flush=True)

    t0 = time.time()
    chest = device_keygen(
        params, np.random.default_rng(7), rotations=tuple(rots),
        conjugation=True,
    )
    jax.block_until_ready(chest.device_rlk.b_mont)
    print(f"# device keygen {time.time()-t0:.0f}s", flush=True)

    be = DeviceBackend(params, ctx, chest)
    fuse = os.environ.get("GPUFHE_FUSE_EVALMOD", "1") == "1"
    # fuse=1 pairs with lean keys exactly like the flagship (the fused
    # EvalMod trace needs the HBM headroom; the lean drop/replay covers the
    # MLP Galois keys too — regen_galois_a replays every seeded key)
    bs = Bootstrapper(be, transform="factored", radix_log=radix,
                      evalmod="cheb", k_bound=10.0, fuse_evalmod=fuse,
                      lean_keys=fuse)

    # truncate every Galois key to the highest level it is used at:
    # bootstrap steps at their planned levels (galois_step_levels), MLP
    # steps at the post-bootstrap entry level (all MLP matmuls run at or
    # below it — bit-exact row selection, frees ~6 GiB vs full-chain keys)
    t0 = time.time()
    steps, conj_lvl = bs.galois_step_levels()
    boot_out_level = bs.f_stc.first_lo.level - bs.f_stc.levels_used
    # MLP matmuls run at or below the bootstrap output level (or the input
    # level before the first refresh) — truncate their keys there
    mlp_lvl = max(boot_out_level, in_level)
    for s in mlp_steps:
        steps[s] = max(steps.get(s, 0), mlp_lvl)
    truncate_galois_device(chest, steps, conj_lvl, params)
    print(f"# key truncation {time.time()-t0:.0f}s (mlp keys at level "
          f"{mlp_lvl}; boot output level {boot_out_level})", flush=True)

    def hbm(tag):
        gb = sum(a.nbytes for a in jax.live_arrays()) / 2**30
        print(f"# live device bytes [{tag}]: {gb:.2f} GiB", flush=True)

    hbm("after setup")

    model = EncryptedMLP(be, layers, refresh=bs)
    x = rng.normal(size=d) * 0.3
    slots_x = np.zeros(params.slots, dtype=np.complex128)
    slots_x[:d] = x
    ct = dct.encrypt(
        encoder.encode(slots_x, params), params, chest.device_pk, ctx,
        np.random.default_rng(2), params.scale, level=in_level,
    )

    t0 = time.time()
    out = model(ct)
    _ = np.asarray(out.c[0][0, :4])  # read-sync
    first = time.time() - t0
    n_ref = model.refreshes
    print(f"# first forward {first:.0f}s ({n_ref} mid-inference bootstraps)",
          flush=True)
    hbm("after first forward")

    times = []
    for _ in range(2):
        t0 = time.time()
        out = model(ct)
        _ = np.asarray(out.c[0][0, :4])
        times.append(round(time.time() - t0, 3))
    got = np.real(be.decrypt_decode(out)[: layers[-1][0].shape[0]])
    want = model.reference(x)
    err = float(np.abs(got - want).max())
    print(f"# steady {times} s; logits err {err:.2e}", flush=True)

    result = {
        "metric": f"deep_mlp_bootstrap_N{params.n}_dw",
        "value": min(times),
        "unit": "s/forward (read-synced steady)",
        "layers": n_layers,
        "d": d,
        "in_level": in_level,
        "mid_inference_bootstraps": n_ref,
        "first_s": round(first, 1),
        "steady_s": times,
        "logits_max_err": err,
        "err_ok": err <= 1e-2,
        "evalmod": "fused" if fuse else "eager",
        "rotation_keys": len(rots),
    }
    print(json.dumps(result), flush=True)
    with open(pathlib.Path(__file__).resolve().parents[1]
              / "DEEP_MLP_N16.json", "w") as f:
        json.dump(result, f, indent=1)
    assert err <= 1e-2, err


if __name__ == "__main__":
    main()
