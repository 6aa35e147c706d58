"""PIR over exact-integer schemes: oblivious lookup returns the right record
with zero error, on both the BFV and BGV backends (models/pir.py)."""

import numpy as np
import pytest

from gpufhe_tpu.models import pir
from gpufhe_tpu.params.params import preset, make_context


@pytest.mark.parametrize("scheme", ["bfv", "bgv"])
def test_pir_retrieval_exact(scheme):
    if scheme == "bfv":
        from gpufhe_tpu.ciphertext import bfv as dev
        from gpufhe_tpu.ciphertext.bfv_backend import BFVDeviceBackend as BE
        from gpufhe_tpu.golden import bfv as gold
        params = preset("bfv_tiny")
    else:
        from gpufhe_tpu.ciphertext import bgv as dev
        from gpufhe_tpu.ciphertext.bgv_backend import BGVDeviceBackend as BE
        from gpufhe_tpu.golden import bgv as gold
        params = preset("bgv_tiny")

    ctx = make_context(params)
    t = params.plain_modulus
    n_s = params.slots
    rots = pir.pir_rotations(n_s)
    chest = dev.keygen(params, np.random.default_rng(3), rotations=rots)
    be = BE(params, ctx, chest)

    rows, cols = 50, 8
    db = np.random.default_rng(4).integers(0, t, size=(rows, cols))

    for index in (0, 17, rows - 1):
        onehot = pir.encode_query(be, index, rows)
        raw = np.empty(params.n, dtype=np.int64)
        raw[be.rings[0]] = onehot
        raw[be.rings[1]] = onehot
        ct = dev.encrypt(
            gold.encode(raw, params), params, chest.device_pk, ctx,
            np.random.default_rng(50 + index),
        )
        out = pir.pir_retrieve(be, ct, db)
        got = be.decrypt_decode(out)[0][:cols]
        assert (got == db[index]).all(), (index, got, db[index])
