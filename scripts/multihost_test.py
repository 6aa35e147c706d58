"""Two-process jax.distributed validation on localhost (SURVEY.md §4 item 4).

Each process contributes 4 virtual CPU devices; the global ('limb','coeff')
mesh spans both processes, so the limb-axis collectives of the sharded mult
actually cross the process boundary (the DCN analogue). Process 0 checks the
result against the single-process path bit-for-bit.

Run: python scripts/multihost_test.py            (spawns both processes)
     python scripts/multihost_test.py <rank>     (inner invocation)
"""

import os
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

PORT = 12355
NPROC = 2


def worker(rank: int):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROC,
        process_id=rank,
    )
    import numpy as np

    from gpufhe_tpu.keys import keys as dkeys
    from gpufhe_tpu.ciphertext import ct as dct
    from gpufhe_tpu.encoding import encoder
    from gpufhe_tpu.ops.context import make_context
    from gpufhe_tpu.parallel import sharded as sh
    from gpufhe_tpu.params.params import preset

    assert jax.process_count() == NPROC and jax.device_count() == 8

    params = preset("tiny2")
    ctx = make_context(params)
    chest = dkeys.keygen(params, np.random.default_rng(7))
    # limb axis spans the two processes (the "DCN" dimension)
    mesh = sh.make_fhe_mesh(2, 4, devices=jax.devices())

    rng = np.random.default_rng(5)
    z = rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)
    ct = dct.encrypt(
        encoder.encode(z, params), params, chest.device_pk, ctx,
        np.random.default_rng(61), params.scale,
    )
    want = dct.ct_mul(ct, ct, params, ctx, chest.device_rlk)

    run, prepare = sh.make_sharded_mult(params, ct.level, mesh)
    bundle = prepare(chest.device_rlk)
    blocks = [sh.shard_ct_component(c, params, mesh) for c in (ct.c + ct.c)]
    c0, c1 = run(*blocks, bundle)

    # replicate the (multi-process) output so rank 0 can read it all locally
    rep = jax.jit(
        lambda x: x,
        out_shardings=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )
    g0 = sh.eval3d_to_natural(np.asarray(jax.device_get(rep(c0).addressable_data(0))))
    g1 = sh.eval3d_to_natural(np.asarray(jax.device_get(rep(c1).addressable_data(0))))

    ok = (g0 == np.asarray(want.c[0])).all() and (g1 == np.asarray(want.c[1])).all()
    if rank == 0:
        print(f"MULTIHOST_RESULT ok={bool(ok)} processes={jax.process_count()}")
    jax.distributed.shutdown()


def main():
    procs = []
    me = pathlib.Path(__file__).resolve()
    for rank in range(NPROC):
        procs.append(
            subprocess.Popen(
                [sys.executable, str(me), str(rank)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    out0, _ = procs[0].communicate(timeout=900)
    procs[1].wait(timeout=60)
    print(out0.strip().splitlines()[-1])
    assert "ok=True" in out0, out0


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        main()
