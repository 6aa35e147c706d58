"""Multi-host mesh construction and weak-scaling measurement.

TPU-native distributed model (SURVEY.md §2.3): there is no NCCL/MPI layer to
write — `jax.distributed.initialize` + a global mesh over all hosts' devices
is the entire "communication backend". Design rules baked in here:

* the **coeff** axis (all_to_all per NTT, latency-sensitive) maps to devices
  *within* a host/slice so its transposes ride ICI;
* the **limb** axis (one modular all-reduce per key-switch, infrequent) takes
  the cross-host dimension, so DCN only carries low-frequency traffic.

A single-host run (or the CPU CI mesh) is the degenerate case of the same
code path. Restart-from-keys is the recovery story: params + key material +
PRNG seeds fully determine all state (utils/serialization.py).
"""

from __future__ import annotations

import time

import numpy as np


def initialize_multihost(coordinator: str | None = None, num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Bring up jax.distributed (no-op when single-process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_fhe_mesh(limb_hosts: int | None = None):
    """('limb', 'coeff') mesh over ALL processes' devices.

    limb axis spans hosts (DCN), coeff axis stays within a host (ICI). With
    limb_hosts=None the limb axis equals the process count (>=1).
    """
    import jax

    from gpufhe_tpu.parallel.sharded import make_fhe_mesh

    n_proc = jax.process_count()
    per_host = jax.local_device_count()
    limb = limb_hosts if limb_hosts is not None else max(n_proc, 1)
    total = n_proc * per_host
    assert total % limb == 0
    return make_fhe_mesh(limb, total // limb, devices=jax.devices())


def scaling_report(params, mesh_shapes: list[tuple[int, int]], iters: int = 5,
                   level: int | None = None, mode: str = "strong") -> list[dict]:
    """ops/s of the sharded mult step across mesh shapes.

    mode="strong": fixed total work (one mult of fixed N) — efficiency is
    speedup / device-ratio.
    mode="weak": total work scales with the device count (each shape runs a
    batch of `devices / base_devices` independent mults, so per-device work
    is constant) — efficiency is base_time / time for the scaled batch.
    Both modes report ops/s so curves are comparable.
    """
    import jax

    from __graft_entry__ import _random_ct, _random_key
    from gpufhe_tpu.ops.context import make_context
    from gpufhe_tpu.parallel import sharded as sh

    assert mode in ("strong", "weak")
    ctx = make_context(params)
    level = level if level is not None else params.num_limbs
    rng = np.random.default_rng(0)
    rlk = _random_key(params, rng)
    a0, a1 = _random_ct(params, level, rng)
    b0, b1 = _random_ct(params, level, rng)

    shapes = [s for s in mesh_shapes if s[0] * s[1] <= jax.device_count()]
    base_ndev = min(s[0] * s[1] for s in shapes) if shapes else 1

    rows = []
    base = None
    for limb, coeff in shapes:
        ndev = limb * coeff
        batch = max(1, ndev // base_ndev) if mode == "weak" else 1
        mesh = sh.make_fhe_mesh(limb, coeff, devices=jax.devices()[:ndev])
        run, prepare = sh.make_sharded_mult(params, level, mesh)
        bundle = prepare(rlk)
        blocks = [sh.shard_ct_component(c, params, mesh) for c in (a0, a1, b0, b1)]
        out = run(*blocks, bundle)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            for _b in range(batch):
                out = run(*blocks, bundle)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters  # per batch of `batch` mults
        ops = batch / dt
        if base is None:
            base = (ndev, ops, dt)
        if mode == "weak":
            eff = 100.0 * base[2] / dt  # flat time = perfect weak scaling
        else:
            eff = 100.0 * (ops / base[1]) / (ndev / base[0])
        rows.append({
            "mode": mode,
            "mesh": f"limb={limb} x coeff={coeff}",
            "devices": ndev,
            "batch": batch,
            "ms_per_mult": round(dt * 1e3 / batch, 3),
            "ops_per_s": round(ops, 2),
            "scaling_eff_pct": round(eff, 1),
        })
    return rows


def weak_scaling_report(params, mesh_shapes, iters: int = 5, level=None):
    """Back-compat alias; see scaling_report (mode='weak')."""
    return scaling_report(params, mesh_shapes, iters=iters, level=level, mode="weak")
