"""Mesh program planner (parallel/planner.py): data-free bootstrap program
inventory + shape-only AOT lowering — the machinery behind the N=2^16
config-5 compile-level proof (N16_MESH_LOWER.json)."""

import numpy as np
import pytest

from gpufhe_tpu.params.params import preset


def test_plan_bootstrap_inventory():
    """The ghost run records the full program set with coherent levels and
    a sane output level, without keys, encodes, or device work."""
    from gpufhe_tpu.parallel.planner import plan_bootstrap

    params = preset("boot_ci_f")
    progs, out = plan_bootstrap(params, radix_log=3, k_bound=5.0)
    kinds = {p.kind for p in progs}
    # every pipeline family appears: ModRaise, encapsulation switches,
    # diagonal fans (CtS+StC), EvalMod mults, rescales, conjugation
    assert {"mod_raise", "eph_ks", "fan", "mult", "rescale", "conj"} <= kinds
    full = params.num_limbs
    assert all(1 <= p.level <= full for p in progs)
    # the top CtS fan runs at the full chain
    assert max(p.level for p in progs if p.kind == "fan") == full
    # output carries usable budget above the floor
    assert out.level > params.scale_words
    # normalization invariant: the plan lands the output at exactly Delta
    assert abs(out.scale / params.scale - 1.0) < 1e-9


@pytest.mark.slow
def test_lower_program_families():
    """Every program family AOT-lowers with shape-only inputs on the
    8-virtual-device mesh and emits ciphertext outputs sharded
    P(None, 'coeff', None)."""
    import jax

    from gpufhe_tpu.parallel import sharded as sh
    from gpufhe_tpu.parallel.planner import Program, lower_program

    params = preset("boot_ci_f")
    mesh = sh.make_fhe_mesh(2, 4, devices=jax.devices()[:8])
    k = params.num_limbs
    for prog in (
        Program("mult", k),
        Program("fan", k, n_offsets=3, n_sets=2, pt0_mask=(True, False)),
        Program("conj", k - 2),
        Program("eph_ks", k),
        Program("rescale", k),
        Program("mod_raise", 1),
    ):
        lowered, meta = lower_program(prog, params, mesh)
        txt = lowered.as_text()
        assert len(txt) > 1000, prog
        for o in jax.tree_util.tree_leaves(lowered.out_info):
            s = getattr(o, "sharding", None)
            if s is not None and hasattr(s, "spec"):
                assert "coeff" in str(s.spec), (prog, s)
