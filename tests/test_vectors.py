"""Checked-in known-answer vectors (SURVEY.md §4 item 2, BASELINE.json:7-9).

Regenerating the golden model's outputs and comparing against the stored
.npz artifacts pins the parity contract: any change to golden semantics (and
therefore, via the parity tests, to device semantics) fails here. The device
pipeline is additionally checked directly against the config-3 limb trace.
"""

import numpy as np

from gpufhe_tpu.golden import ntt as gn
from gpufhe_tpu.golden import vectors as gv


def _load(name):
    return np.load(gv.VEC_DIR / f"{name}.npz")


def test_config1_ntt_60bit_vectors():
    v = _load("config1_ntt_60bit")
    q, psi = int(v["q"]), int(v["psi"])
    assert q.bit_length() == 60 and q % (2 * len(v["x"])) == 1
    x = v["x"].astype(object)
    fwd = gn.ntt_fwd(x, q, psi)
    assert all(int(a) == int(b) for a, b in zip(fwd, v["fwd"]))
    back = gn.ntt_inv(v["fwd"].astype(object), q, psi)
    assert all(int(a) == int(b) for a, b in zip(back, v["x"]))


def test_config2_rns_vectors():
    got = gv.gen_config2_rns()
    want = _load("config2_rns")
    for k in ("add", "mul", "base_convert_to_p", "rescale"):
        assert (np.asarray(got[k], dtype=np.int64) == want[k]).all(), k


def test_config3_ckks_limb_trace_vectors():
    got = gv.gen_config3_ckks()
    want = _load("config3_ckks")
    for k in want.files:
        if k in ("seed", "preset", "za", "zb"):
            continue
        assert (np.asarray(got[k], dtype=np.int64) == want[k]).all(), k


def test_config3_device_matches_vectors():
    """Device pipeline reproduces the stored golden limb trace end-to-end."""
    from gpufhe_tpu.ciphertext import ct as dct
    from gpufhe_tpu.encoding import encoder
    from gpufhe_tpu.golden import ckks as gckks
    from gpufhe_tpu.keys import keys as dkeys
    from gpufhe_tpu.ops.context import make_context
    from gpufhe_tpu.params.params import preset

    want = _load("config3_ckks")
    seed = int(want["seed"])
    params = preset(want["preset"].item().decode())
    ctx = make_context(params)

    rng = np.random.default_rng(seed)
    sk, pk = gckks.keygen(params, rng)
    rlk = gckks.make_relin_key(params, sk, rng)
    dev_pk = dkeys.upload_public_key(pk, params)
    dev_rlk = dkeys.upload_ks_key(rlk, params)

    pa = encoder.encode(want["za"], params)
    pb = encoder.encode(want["zb"], params)
    ca = dct.encrypt(pa, params, dev_pk, ctx, np.random.default_rng(seed + 2), params.scale)
    cb = dct.encrypt(pb, params, dev_pk, ctx, np.random.default_rng(seed + 3), params.scale)
    assert (np.asarray(ca.c[0]).astype(np.int64) == want["ct_a0"]).all()
    assert (np.asarray(ca.c[1]).astype(np.int64) == want["ct_a1"]).all()

    s = dct.ct_mul(ca, cb, params, ctx, dev_rlk)
    assert (np.asarray(s.c[0]).astype(np.int64) == want["rescale_c0"]).all()
    assert (np.asarray(s.c[1]).astype(np.int64) == want["rescale_c1"]).all()

    sk_dev = dkeys.upload_secret_key(sk, params)
    dec = dct.decrypt_to_coeff(s, params, sk_dev, ctx)
    assert (dec == want["decrypt_coeff"]).all()


def test_config4_rotation_vectors():
    got = gv.gen_config4_rotations()
    want = _load("config4_rotations")
    for k in want.files:
        if k in ("seed", "preset", "z"):
            continue
        assert (np.asarray(got[k], dtype=np.int64) == want[k]).all(), k


def test_bgv_integer_vectors():
    got = gv.gen_bgv_integer()
    want = _load("bgv_integer")
    for k in want.files:
        if k in ("seed", "preset"):
            continue
        assert (np.asarray(got[k], dtype=np.int64) == want[k]).all(), k


def test_bfv_integer_vectors():
    got = gv.gen_bfv_integer()
    want = _load("bfv_integer")
    for k in want.files:
        if k in ("seed", "preset"):
            continue
        assert (np.asarray(got[k], dtype=np.int64) == want[k]).all(), k
