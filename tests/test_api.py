"""Session facade (gpufhe_tpu/api.py): the batteries-included API drives all
three schemes end to end — encrypt, algebra, rotations, matmul, decrypt."""

import numpy as np
import pytest

from gpufhe_tpu.api import Session


def test_ckks_session():
    s = Session.create("tiny2", rotations=(1, 3))
    n_s = s.params.slots
    rng = np.random.default_rng(0)
    za = rng.uniform(-1, 1, size=n_s)
    zb = rng.uniform(-1, 1, size=n_s)
    ca, cb = s.encrypt(za), s.encrypt(zb)
    assert np.abs(s.decrypt(s.add(ca, cb)) - (za + zb)).max() < 1e-4
    assert np.abs(s.decrypt(s.mul(ca, cb)) - za * zb).max() < 1e-3
    assert np.abs(s.decrypt(s.mul_plain(ca, zb)) - za * zb).max() < 1e-3
    assert np.abs(s.decrypt(s.rotate(ca, 3)) - np.roll(za, -3)).max() < 1e-4
    prod = s.mul(ca, cb)
    assert s.level(prod) == s.level(ca) - s.params.scale_words


@pytest.mark.parametrize("scheme", ["bgv", "bfv"])
def test_integer_session(scheme):
    name = "bgv_tiny" if scheme == "bgv" else "bfv_tiny"
    s = Session.create(name, scheme=scheme, rotations="bsgs")
    t = s.params.plain_modulus
    n_s = s.params.slots
    rng = np.random.default_rng(1)
    va = rng.integers(0, t, size=n_s, dtype=np.int64)
    vb = rng.integers(0, t, size=n_s, dtype=np.int64)
    ca, cb = s.encrypt(va), s.encrypt(vb)
    assert (s.decrypt(s.add(ca, cb))[0] == (va + vb) % t).all()
    assert (s.decrypt(s.sub(ca, cb))[0] == (va - vb) % t).all()
    prod = s.mul(ca, cb)
    assert (s.decrypt(prod)[0] == va * vb % t).all()
    if scheme == "bfv":
        assert s.level(prod) == s.level(ca)  # scale-invariant
        red = s.rescale(prod)
        assert s.level(red) == s.level(prod) - 1
        assert (s.decrypt(red)[0] == va * vb % t).all()
    else:
        assert s.level(prod) == s.level(ca) - 1
    assert (s.decrypt(s.mul_plain(ca, vb))[0] == va * vb % t).all()
    assert (s.decrypt(s.add_plain(ca, vb))[0] == (va + vb) % t).all()
    got = s.decrypt(s.rotate(ca, 1))[0]
    assert (got == np.roll(va, -1)).all()
    a_mat = rng.integers(0, t, size=(n_s, n_s))
    out = s.decrypt(s.matmul(ca, a_mat))[0]
    want = (a_mat.astype(object) @ va.astype(object) % t).astype(np.int64)
    assert (out == want).all()


def test_scheme_inference_and_guards():
    s = Session.create("bgv_tiny")
    assert s.scheme == "bgv"
    s2 = Session.create("tiny2")
    assert s2.scheme == "ckks"
    with pytest.raises(AssertionError):
        Session.create("tiny2", scheme="bfv")


def test_rotate_composed_pow2_keys():
    """Arbitrary rotation amounts from only log2(slots) power-of-two keys
    (linalg.rotate_composed), on both a CKKS and a BGV session."""
    from gpufhe_tpu.ciphertext import linalg

    s = Session.create("tiny2", rotations=tuple(linalg.pow2_rotations(
        Session.create("tiny2").params.slots)))
    n_s = s.params.slots
    z = np.random.default_rng(7).uniform(-1, 1, size=n_s)
    ct = s.encrypt(z)
    for k in (3, 11, n_s - 1):
        out = linalg.rotate_composed(s.be, ct, k)
        assert np.abs(s.decrypt(out) - np.roll(z, -k)).max() < 1e-3

    b = Session.create(
        "bgv_tiny", rotations=tuple(linalg.pow2_rotations(128))
    )
    t = b.params.plain_modulus
    v = np.random.default_rng(8).integers(0, t, size=b.params.slots)
    ct = b.encrypt(v)
    out = linalg.rotate_composed(b.be, ct, 37)
    assert (b.decrypt(out)[0] == np.roll(v, -37)).all()


def test_session_nonlinear_toolkit():
    """Session exposes the CKKS approximation toolkit (approx.py)."""
    s = Session.create("ci_deep")
    rng = np.random.default_rng(5)
    x = rng.uniform(0.2, 1.0, size=s.params.slots)
    ct = s.encrypt(x)
    inv = np.real(s.decrypt(s.inverse(ct, iters=5)))
    assert (np.abs(inv - 1.0 / x) * x).max() < 5e-3
    rt = np.real(s.decrypt(s.sqrt(s.encrypt(x), iters=6)))
    assert np.abs(rt - np.sqrt(x)).max() < 5e-3
    with pytest.raises(AssertionError):
        Session.create("bfv_tiny", scheme="bfv").inverse(None)
