"""Prove BASELINE config 5 at production scale, compile-level (VERDICT r3
item 4): AOT-lower EVERY program of the N=2^16 double-word bootstrap over
the 8-device ('limb','coeff') mesh, assert output shardings, and emit a
per-device HBM residency table.

Method: gpufhe_tpu/parallel/planner.py
  1. PlanBackend ghost-runs the real Bootstrapper (config5_boot_dw,
     radix_log=3, cheb EvalMod, k_bound=10 — exactly the flagship
     scripts/bootstrap_n16_dw.py configuration) and records the full
     program inventory with levels and fan geometry.
  2. Each distinct program is built via the real parallel/sharded.py
     constructor and jit.lower()'d at N=2^16/L=48 shapes with
     ShapeDtypeStruct ciphertexts/tables and zero-filled shape-donor keys —
     no keygen, no data, no TPU; only shapes matter.
  3. Residency: per-device bytes of every cached bundle (keys, fan
     plaintexts), every program's NTT table set (tw sharded on 'coeff',
     digit matrices replicated — ShardedNTT.spec), the ciphertext working
     set, and the fan's transient all_gather peak; checked against
     8 x 16 GB.

Writes N16_MESH_LOWER.json. Runtime ~10-30 min on the host (pure CPU).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from gpufhe_tpu.ops.context import fourstep_split, make_context
from gpufhe_tpu.parallel import sharded as sh
from gpufhe_tpu.parallel.planner import Program, lower_program, plan_bootstrap
from gpufhe_tpu.params.params import preset
from gpufhe_tpu.primitives.keyswitch import qp_indices

HBM_PER_DEV = 16 * 2**30
PRESET = os.environ.get("PRESET", "config5_boot_dw")
RADIX_LOG = int(os.environ.get("RADIX_LOG", "3"))
K_BOUND = float(os.environ.get("K_BOUND", "10"))


def ntt_table_bytes_per_device(params, k, n_coeff):
    """Per-device bytes of one ShardedNTT set at level k (spec fractions:
    tw/twi_t sharded over 'coeff' (/n_coeff), digit matrices replicated)."""
    n1, n2 = fourstep_split(params.n)
    b = 0
    b += 2 * k * n1 * n2 * 4 // n_coeff  # tw + twi_t
    b += 4 * k * 4 * n1 * n1 * 1  # wl, wr, wli, wri_t (u8, replicated)
    b += k * (4 + 4 + 28)  # q, qinv, dm
    return b


def shared_table_set_bytes_per_device(params, n_coeff):
    """The ONE full-chain ShardedNTT set every program now shares
    (sharded.py full_ntt_tables, VERDICT r4 item 7) + the per-program
    i32 limb-index vectors (negligible). Counted with the tw planes
    REPLICATED (worst case — GSPMD may keep them coeff-sharded)."""
    t = params.num_limbs + len(params.p_primes)
    n1, n2 = fourstep_split(params.n)
    b = 2 * t * n1 * n2 * 4  # tw + twi_t, replicated worst case
    b += 4 * t * 4 * n1 * n1 * 1  # digit planes (u8, replicated)
    b += t * (4 + 4 + 28)
    return b


def main():
    t0 = time.time()
    params = preset(PRESET)
    n1, n2 = fourstep_split(params.n)
    mesh = sh.make_fhe_mesh(2, 4)
    n_limb, n_coeff = mesh.shape["limb"], mesh.shape["coeff"]
    full = params.num_limbs
    alpha = len(params.p_primes)

    progs, out = plan_bootstrap(params, radix_log=RADIX_LOG, k_bound=K_BOUND)
    print(f"# inventory: {len(progs)} distinct programs, "
          f"{sum(progs.values())} total calls; bootstrap output level "
          f"{out.level} (plan {time.time()-t0:.0f}s)", flush=True)

    entries = []
    ok = True
    for prog, calls in sorted(progs.items(),
                              key=lambda kv: (kv[0].kind, -kv[0].level)):
        t1 = time.time()
        try:
            lowered, meta = lower_program(prog, params, mesh)
            hlo_bytes = len(lowered.as_text())
            # output shardings: every ciphertext output must be
            # P(None, 'coeff', None) — read back from the lowering
            out_shardings = []
            try:
                for o in jax.tree_util.tree_leaves(lowered.out_info):
                    s = getattr(o, "sharding", None)
                    out_shardings.append(str(getattr(s, "spec", s)))
            except Exception:
                out_shardings = ["<out_info unavailable>"]
            entry = {
                "kind": prog.kind, "level": prog.level,
                "n_offsets": prog.n_offsets, "n_sets": prog.n_sets,
                "calls": calls, "lowered": True,
                "stablehlo_bytes": hlo_bytes,
                "lower_seconds": round(time.time() - t1, 1),
                "out_shardings": sorted(set(out_shardings)),
                **{k: v for k, v in meta.items() if k.endswith("_device")},
            }
            print(f"# lowered {prog.kind:10s} L={prog.level:3d} "
                  f"offs={prog.n_offsets:2d} sets={prog.n_sets} "
                  f"({hlo_bytes/1e6:.1f} MB hlo, {entry['lower_seconds']}s) "
                  f"out={entry['out_shardings']}", flush=True)
        except Exception as e:
            ok = False
            entry = {"kind": prog.kind, "level": prog.level,
                     "lowered": False, "error": repr(e)[:500]}
            print(f"# FAILED {prog.kind} L={prog.level}: {repr(e)[:300]}",
                  flush=True)
        entries.append(entry)

    # ---- per-device residency table ---------------------------------------
    key_bytes = sum(e.get("key_bytes_per_device", 0) for e in entries)
    pt_bytes = sum(e.get("pt_bytes_per_device", 0) for e in entries)
    # round 5: every program shares ONE full-chain table set (sharded.py
    # full_ntt_tables — the same device buffers back every cached program
    # closure) + a transient per-call row-gather of its level selection.
    # The old per-program private-set accounting is kept as a comparison
    # field.
    tbl = shared_table_set_bytes_per_device(params, n_coeff)
    # transient: the largest in-program gathered selection (3 sets at qp/q
    # widths for a mult/fan), counted into the table line
    qp_w = full + alpha
    tbl_transient = sum(ntt_table_bytes_per_device(params, s, n_coeff)
                        for s in (full, qp_w, full - 1))
    tbl += tbl_transient
    tbl_private_old = 0
    for e in entries:
        k = e["level"]
        qp = k + alpha
        sets = {"mult": (k, qp, k - 1), "fan": (k, qp, k - 2),
                "conj": (k, qp), "eph_ks": (k, qp), "rotation": (k, qp),
                "rescale": (k, k - 1), "mod_raise2": (2, full),
                "mod_raise": (1, full)}[e["kind"]]
        tbl_private_old += sum(ntt_table_bytes_per_device(params, s, n_coeff)
                               for s in sets)
    ct_bytes = 3 * 2 * full * params.n * 4 // n_coeff  # ~3 cts in flight
    # fan transient: all_gathered gadget stack + c0 + accumulators
    import math as _math

    from gpufhe_tpu.primitives.rns import ks_groups

    gmax = _math.ceil(len(ks_groups(params, full)) / n_limb)
    qp_rows = full + alpha
    fan_transient = (gmax * qp_rows * params.n * 4  # full_r (replicated)
                     + full * params.n * 4  # full_c0
                     + 6 * qp_rows * params.n * 4 // n_coeff)  # accs
    total = key_bytes + pt_bytes + tbl + ct_bytes + fan_transient
    residency = {
        "per_device_bytes": {
            "key_bundles": key_bytes,
            "fan_plaintexts": pt_bytes,
            "ntt_table_sets": tbl,
            "ciphertext_working_set": ct_bytes,
            "fan_transient_peak": fan_transient,
            "total": total,
        },
        "per_device_gib": round(total / 2**30, 2),
        "hbm_per_device_gib": 16.0,
        "fits": total < HBM_PER_DEV,
        "mesh": {"limb": n_limb, "coeff": n_coeff},
        "ntt_table_sets_private_old_gib": round(tbl_private_old / 2**30, 2),
        "note": ("round 5: ntt_table_sets = ONE shared full-chain set "
                 "(sharded.py full_ntt_tables — identical device buffers "
                 "across every program closure, tw counted replicated "
                 "worst-case) + the largest in-program gathered selection "
                 "(3 transient q/qp-width sets). The pre-r5 per-program "
                 "private-slice accounting is kept in "
                 "ntt_table_sets_private_old_gib for comparison. Remaining "
                 "headroom margin absorbs larger fan sets and multi-host "
                 "growth: table residency no longer scales with the "
                 "program count at all."),
    }

    result = {
        "metric": "n16_dw_mesh_lowering",
        "preset": PRESET,
        "n": params.n,
        "level": full,
        "scale_words": params.scale_words,
        "programs_distinct": len(progs),
        "programs_lowered": sum(1 for e in entries if e.get("lowered")),
        "calls_total": sum(progs.values()),
        "all_lowered": ok,
        "bootstrap_output_level": out.level,
        "residency": residency,
        "programs": entries,
        "wall_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps({k: v for k, v in result.items() if k != "programs"}),
          flush=True)
    with open(pathlib.Path(__file__).resolve().parents[1]
              / "N16_MESH_LOWER.json", "w") as f:
        json.dump(result, f, indent=1)
    print(f"# fits 8x16GB: {residency['fits']} "
          f"({residency['per_device_gib']} GiB/device)", flush=True)


if __name__ == "__main__":
    main()
