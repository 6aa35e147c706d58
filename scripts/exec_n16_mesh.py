"""Execute representative N=2^16/L=48 dw bootstrap mesh programs NUMERICALLY
on the virtual 8-device CPU mesh (VERDICT r4 item 1: turn "compiles at
scale" into "computes correctly at scale").

For each representative program of the N16_MESH_LOWER.json inventory —
  eph_ks  L=2   (encapsulation hop before ModRaise)
  mod_raise2    (centered CRT lift L=2 -> 48)
  eph_ks  L=48  (hop back under the dense base secret)
  fan     L=48  (the top CoeffToSlot diagonal stage, 7 offsets — the exact
                 first-stage geometry of the flagship bootstrap: same
                 grouped inverse-FFT diagonals, same factor spread)
  mult    L=26  (+ its chained dw rescale program)
— build REAL keys (device_keygen, seeded), run the program on BOTH the
single-device path (DeviceBackend / ciphertext/ct.py) and the 8-device
('limb','coeff') mesh (ShardedBackend / parallel/sharded.py) from IDENTICAL
inputs, and compare every output limb with `==`.

Each step feeds from the single-device output of the previous step, so each
program's parity is independent (not compounding).

Writes N16_MESH_EXEC.json. Pure CPU; wall is dominated by XLA CPU compiles
of the N=2^16 programs (persistent .jax_cache makes repeats fast).
Run: python scripts/exec_n16_mesh.py [--preset config5_boot_dw]
"""

from __future__ import annotations

import json
import math
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"),
)

from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext import fftboot as fb
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.parallel import sharded as sh
from gpufhe_tpu.parallel.backend import ShardedBackend
from gpufhe_tpu.params.params import preset


def first_cts_stage_diags(params, radix_log: int, k_bound: float):
    """The flagship bootstrap's FIRST CoeffToSlot DiagPlan diagonals at the
    full level — exactly FactoredCtS's groups[0] with the geometric factor
    spread (ciphertext/fftboot.py FactoredCtS.__init__)."""
    n_s = params.slots
    fwd = [fb._inv_stage_diags(n_s, h, w)
           for h, w in reversed(fb._stage_twiddles(n_s))]
    groups = fb.group_stages(fwd, n_s, radix_log)
    q0 = math.prod(params.q_primes[: params.scale_words])
    cts_factor = params.scale / (q0 * k_bound)
    mag = abs(cts_factor) ** (1.0 / len(groups))
    return fb.scale_diags(groups[0], mag), len(groups)


def _parity(sct, dct_) -> bool:
    """Sharded vs single-device ciphertext: every limb of every component
    equal (`==`, never allclose — the repo's bit-exact contract)."""
    ok = True
    for cs, cd in zip(sct.c, dct_.c):
        got = sh.unshard_ct_component(cs)
        want = np.asarray(cd)
        if got.shape != want.shape or not (got == want).all():
            ok = False
    return ok and len(sct.c) == len(dct_.c)


def run_parity(preset_name: str, mesh_shape=(2, 4), radix_log: int = 3,
               k_bound: float = 10.0, mid_level: int | None = None,
               log=print):
    """Run the representative program set at `preset_name` shapes; returns
    (entries, params). Each entry: {program, level, parity, dev_s, mesh_s}."""
    t0 = time.time()
    params = preset(preset_name)
    assert params.scale_words == 2, "representative set is the dw pipeline"
    ctx = make_context(params)
    full = params.num_limbs

    diags0, n_groups = first_cts_stage_diags(params, radix_log, k_bound)
    offsets = tuple(sorted(r for r in diags0 if r != 0))
    log(f"# preset={preset_name} N={params.n} L={full} "
        f"fan offsets={offsets} ({n_groups} CtS groups)")

    from gpufhe_tpu.keys.device_keygen import device_keygen

    chest = device_keygen(params, np.random.default_rng(7),
                          rotations=offsets)
    dev = DeviceBackend(params, ctx, chest)
    n_dev = mesh_shape[0] * mesh_shape[1]
    mesh = sh.make_fhe_mesh(*mesh_shape, devices=jax.devices()[:n_dev])
    shb = ShardedBackend(params, mesh, chest)
    log(f"# keygen+setup {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots)
         + 1j * rng.normal(size=params.slots)) * 0.2
    ct_w = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(1), params.scale, level=params.scale_words,
    )

    entries = []

    def step(name, level, dev_fn, sh_fn, dev_in, multi=False):
        t1 = time.time()
        want = dev_fn(dev_in)
        jax.block_until_ready([w.c for w in want] if multi else want.c)
        dev_s = time.time() - t1
        t1 = time.time()
        sh_in = shb.from_single(dev_in)
        got = sh_fn(sh_in)
        jax.block_until_ready([g.c for g in got] if multi else got.c)
        mesh_s = time.time() - t1
        if multi:
            ok = (len(got) == len(want)
                  and all(_parity(g, w) for g, w in zip(got, want)))
        else:
            ok = _parity(got, want)
        entries.append({
            "program": name, "level": level, "parity": bool(ok),
            "dev_s": round(dev_s, 1), "mesh_s": round(mesh_s, 1),
        })
        log(f"# {name:14s} L={level:3d} parity={ok} "
            f"dev={dev_s:.0f}s mesh={mesh_s:.0f}s")
        return want

    has_eph = chest.eph is not None
    # 1) encapsulation hop at the base level (bootstrap step -1)
    ct_t = ct_w
    if has_eph:
        ct_t = step("eph_ks_to", params.scale_words,
                    lambda c: dev.key_switch(c, "to_eph"),
                    lambda c: shb.key_switch(c, "to_eph"), ct_w)

    # 2) double-word ModRaise: L=2 -> full
    raised = step("mod_raise2", full, dev.mod_raise, shb.mod_raise, ct_t)

    # 3) hop back under the dense base secret at the FULL level
    ct_f = raised
    if has_eph:
        ct_f = step("eph_ks_from", full,
                    lambda c: dev.key_switch(c, "from_eph"),
                    lambda c: shb.key_switch(c, "from_eph"), raised)

    # 4) top CoeffToSlot diagonal fan (hoist + rotation fan + MACs + fused
    # dw rescale), the exact flagship stage-1 geometry
    plan_dev = fb.DiagPlan(dev, diags0, full)
    plan_sh = fb.DiagPlan(shb, diags0, full)
    step(f"fan_{len(offsets)}off", full,
         plan_dev.apply_multi, plan_sh.apply_multi, ct_f, multi=True)

    # 5) mult (+ chained dw rescale program) at a mid level
    mid = mid_level if mid_level is not None else max(
        params.scale_words + 2, full // 2 + 2)
    ct_mid = dev.drop_to_level(ct_f, mid)
    step("mult_rescale", mid,
         lambda c: dev.mul(c, c),
         lambda c: shb.mul(c, c), ct_mid)

    return entries, params


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="config5_boot_dw")
    ap.add_argument("--mesh", type=int, nargs=2, default=(2, 4),
                    metavar=("LIMB", "COEFF"))
    ap.add_argument("--radix-log", type=int, default=3)
    ap.add_argument("--k-bound", type=float, default=10.0)
    ap.add_argument("--mid-level", type=int, default=None,
                    help="level of the mult+rescale program (flagship runs "
                         "use 26, the busiest mult level of the inventory; "
                         "default full//2+2)")
    args = ap.parse_args()

    t0 = time.time()
    entries, params = run_parity(
        args.preset, tuple(args.mesh), args.radix_log, args.k_bound,
        args.mid_level)
    ok = all(e["parity"] for e in entries)
    result = {
        "metric": "n16_dw_mesh_numeric_execution",
        "preset": args.preset,
        "n": params.n,
        "level": params.num_limbs,
        "mesh": {"limb": args.mesh[0], "coeff": args.mesh[1]},
        "all_parity": ok,
        "programs": entries,
        "keys": "real (device_keygen seed 7): pk, rlk, eph pair, "
                "7 galois",
        "comparison": "sharded output limbs == single-device output limbs "
                      "per program, independent inputs per step",
        "wall_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps({k: v for k, v in result.items() if k != "programs"}),
          flush=True)
    with open(pathlib.Path(__file__).resolve().parents[1]
              / "N16_MESH_EXEC.json", "w") as f:
        json.dump(result, f, indent=1)
    print(f"# all_parity={ok}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
