"""Numeric execution of the representative dw bootstrap mesh-program set
(scripts/exec_n16_mesh.py run_parity) — sharded == single-device limb parity
per program at CI scale. The production-scale run of the SAME code path
(config5_boot_dw, N=2^16/L=48) produces N16_MESH_EXEC.json (VERDICT r4
item 1)."""

import pytest


@pytest.mark.slow
def test_mesh_exec_representative_programs():
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                           / "scripts"))
    from exec_n16_mesh import run_parity

    entries, params = run_parity("boot_dw_ci_enc", mesh_shape=(2, 4))
    names = {e["program"] for e in entries}
    # the full representative set must run: both encapsulation hops, the
    # dw ModRaise, the top CtS fan, and mult+chained rescale
    assert {"eph_ks_to", "mod_raise2", "eph_ks_from", "mult_rescale"} <= names
    assert any(n.startswith("fan_") for n in names)
    for e in entries:
        assert e["parity"], e
