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
    # reduced iteration depth (5->4, 6->4) keeps this in the fast tier; the
    # full-depth accuracy of the same primitives is asserted in
    # tests/test_approx.py (Goldschmidt/Newton convergence)
    inv = np.real(s.decrypt(s.inverse(ct, iters=3)))
    assert (np.abs(inv - 1.0 / x) * x).max() < 2e-1
    rt = np.real(s.decrypt(s.sqrt(s.encrypt(x), iters=3)))
    assert np.abs(rt - np.sqrt(x)).max() < 2e-1
    with pytest.raises(AssertionError):
        Session.create("bfv_tiny", scheme="bfv").inverse(None)


@pytest.mark.slow
def test_session_bootstrap():
    """`Session.create(..., bootstrap=True)` wires keys + Bootstrapper so a
    user refreshes levels with one call (VERDICT r2 item 7)."""
    s = Session.create("boot_ci", bootstrap=True)
    rng = np.random.default_rng(0)
    z = (rng.normal(size=s.params.slots)
         + 1j * rng.normal(size=s.params.slots)) * 0.2
    ct = s.encrypt(z, level=1)
    out = s.bootstrap(ct)
    assert s.level(out) >= 2
    assert np.abs(s.decrypt(out) - z).max() < 0.02
    # a session without the bootstrap keys refuses with a clear error
    with pytest.raises(AssertionError):
        Session.create("boot_ci").bootstrap(ct)


@pytest.mark.parametrize("scheme", ["ckks", "bgv", "bfv"])
def test_session_save_load(tmp_path, scheme):
    """Session.save/load round-trips params + keys (+ conj) per scheme; a
    ciphertext written by the old session decrypts in the restored one."""
    name = {"ckks": "tiny2", "bgv": "bgv_tiny", "bfv": "bfv_tiny"}[scheme]
    s = Session.create(name, scheme=scheme, rotations=(1,),
                       conjugation=(scheme == "ckks"))
    rng = np.random.default_rng(3)
    if scheme == "ckks":
        v = rng.uniform(-1, 1, size=s.params.slots)
    else:
        v = rng.integers(0, s.params.plain_modulus, size=s.params.slots,
                         dtype=np.int64)
    ct = s.encrypt(v)
    s.save_ct(tmp_path / "ct.npz", ct)
    s.save(tmp_path / "sess.npz")

    r = Session.load(tmp_path / "sess.npz")
    assert r.scheme == scheme and r.params == s.params
    ct2 = r.load_ct(tmp_path / "ct.npz")
    got = r.decrypt(r.mul(ct2, ct2))
    if scheme == "ckks":
        assert np.abs(got - v * v).max() < 1e-3
    else:
        assert (got[0] == v * v % s.params.plain_modulus).all()
    # rotation keys survived too
    got_rot = r.decrypt(r.rotate(ct2, 1))
    if scheme == "ckks":
        assert np.abs(got_rot - np.roll(v, -1)).max() < 1e-4
    else:
        assert (got_rot[0] == np.roll(v, -1)).all()


@pytest.mark.parametrize("scheme", ["ckks", "bfv"])
def test_threshold_session(scheme):
    """ThresholdSession: full homomorphism under joint keys, decryption only
    via all-party partials (VERDICT r2 item 7)."""
    from gpufhe_tpu.api import ThresholdSession

    name = "tiny2" if scheme == "ckks" else "bfv_tiny"
    ts = ThresholdSession.create_threshold(name, n_parties=3, scheme=scheme,
                                           rotations=(1,))
    rng = np.random.default_rng(5)
    if scheme == "ckks":
        v = rng.uniform(-0.5, 0.5, size=ts.params.slots)
    else:
        v = rng.integers(0, ts.params.plain_modulus, size=ts.params.slots,
                         dtype=np.int64)
    ct = ts.encrypt(v)
    out = ts.rotate(ts.mul(ct, ct), 1)  # collaborative rlk + galois key
    with pytest.raises(RuntimeError):
        ts.decrypt(out)
    partials = [ts.partial_decrypt(out, i, np.random.default_rng(20 + i))
                for i in range(3)]
    got = ts.combine(out, partials)
    if scheme == "ckks":
        want = np.roll(v * v, -1)
        assert np.abs(got - want).max() < 1e-2
    else:
        want = np.roll(v * v % ts.params.plain_modulus, -1)
        assert (got[0] == want).all()
    # any strict subset of partials yields garbage
    bad = ts.combine(out, partials[:-1])
    if scheme == "ckks":
        assert np.abs(bad - want).max() > 1.0
    else:
        assert not (bad[0] == want).all()


@pytest.mark.parametrize("scheme", ["bgv", "bfv"])
def test_noise_budget_monotone(scheme):
    """s.noise_budget decreases monotonically along a squaring chain and
    decryption is correct exactly while the budget stays positive
    (VERDICT r2 item 9)."""
    name = "bgv_tiny" if scheme == "bgv" else "bfv_tiny"
    s = Session.create(name, scheme=scheme)
    t = s.params.plain_modulus
    rng = np.random.default_rng(11)
    v = rng.integers(0, t, size=s.params.slots, dtype=np.int64)
    ct = s.encrypt(v)
    want = v.copy()
    budgets = [s.noise_budget(ct)]
    assert budgets[0] > 10  # fresh ciphertext has real headroom
    steps = s.params.num_limbs - 1 if scheme == "bgv" else 6
    saw_failure = False
    for _ in range(steps):
        ct = s.mul(ct, ct)
        want = want * want % t
        b = s.noise_budget(ct)
        assert b < budgets[-1], "budget must decrease after a mult"
        budgets.append(b)
        ok = (s.decrypt(ct)[0] == want).all()
        if b > 2:
            assert ok, f"decryption failed with {b:.1f} bits of budget left"
        if b < -1:
            assert not ok, "budget exhausted but decryption still correct"
        if not ok:
            saw_failure = True
            break
    if scheme == "bfv":
        # level is kept, so the chain can always be run to exhaustion
        assert saw_failure or budgets[-1] <= 2
