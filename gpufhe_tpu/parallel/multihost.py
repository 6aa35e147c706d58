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


def weak_scaling_report(params, mesh_shapes: list[tuple[int, int]], iters: int = 5,
                        level: int | None = None) -> list[dict]:
    """ops/s of the sharded mult step across mesh shapes (same per-device work
    when N scales with the coeff axis; here fixed N => strong scaling, the
    report normalizes both ways)."""
    import jax

    from __graft_entry__ import _random_ct, _random_key
    from gpufhe_tpu.ops.context import make_context
    from gpufhe_tpu.parallel import sharded as sh

    ctx = make_context(params)
    level = level if level is not None else params.num_limbs
    rng = np.random.default_rng(0)
    rlk = _random_key(params, rng)
    a0, a1 = _random_ct(params, level, rng)
    b0, b1 = _random_ct(params, level, rng)

    rows = []
    base = None
    for limb, coeff in mesh_shapes:
        ndev = limb * coeff
        if ndev > jax.device_count():
            continue
        mesh = sh.make_fhe_mesh(limb, coeff, devices=jax.devices()[:ndev])
        run, prepare = sh.make_sharded_mult(params, level, mesh)
        bundle = prepare(rlk)
        blocks = [sh.shard_ct_component(c, params, mesh) for c in (a0, a1, b0, b1)]
        out = run(*blocks, bundle)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = run(*blocks, bundle)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        ops = 1.0 / dt
        if base is None:
            base = (ndev, ops)
        rows.append({
            "mesh": f"limb={limb} x coeff={coeff}",
            "devices": ndev,
            "ms_per_mult": round(dt * 1e3, 3),
            "ops_per_s": round(ops, 2),
            "scaling_eff_pct": round(
                100.0 * (ops / base[1]) / (ndev / base[0]), 1
            ),
        })
    return rows
