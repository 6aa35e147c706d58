"""Threshold (multiparty) FHE: joint keygen, distributed decryption
(ciphertext/threshold.py) — secure aggregation across all three schemes."""

import numpy as np
import pytest

from gpufhe_tpu.ciphertext import threshold as th
from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.golden import bgv as gbgv
from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.params.params import preset

N_PARTIES = 3


def _shares(params, seed=0):
    a = th.common_a(params, seed=seed)
    shares = [
        th.party_keygen(params, a, np.random.default_rng(100 + i))
        for i in range(N_PARTIES)
    ]
    pk = th.aggregate_public_key(params, a, [s.b for s in shares])
    return a, shares, pk


def test_ckks_threshold_aggregation():
    """Three parties' encrypted vectors summed homomorphically; decryption
    needs ALL shares (partial sets yield garbage)."""
    params = preset("tiny2")
    _, shares, pk = _shares(params)
    rng = np.random.default_rng(1)
    vecs = [rng.uniform(-1, 1, size=params.slots) for _ in range(N_PARTIES)]
    cts = [
        gckks.encrypt(
            gckks.encode(v + 0j, params.scale, params.q_primes, params.n),
            params, pk, np.random.default_rng(10 + i), params.scale,
        )
        for i, v in enumerate(vecs)
    ]
    acc = cts[0]
    for ct in cts[1:]:
        acc = gckks.ct_add(acc, ct, params)
    partials = [
        th.partial_decrypt(acc, params, s, np.random.default_rng(20 + i))
        for i, s in enumerate(shares)
    ]
    got = th.decrypt_ckks(acc, params, partials)
    want = np.sum(vecs, axis=0)
    assert np.abs(got.real - want).max() < 1e-3
    # any strict subset of partials decodes to garbage (masked by a*s_j)
    bad = th.decrypt_ckks(acc, params, partials[:-1])
    assert np.abs(bad.real - want).max() > 1.0


@pytest.mark.parametrize("scheme", ["bgv", "bfv"])
def test_integer_threshold_aggregation(scheme):
    params = preset("bgv_tiny" if scheme == "bgv" else "bfv_tiny")
    t = params.plain_modulus
    _, shares, pk = _shares(params, seed=3)
    gold = gbgv if scheme == "bgv" else gbfv
    rng = np.random.default_rng(4)
    vecs = [
        rng.integers(0, t, size=params.n, dtype=np.int64)
        for _ in range(N_PARTIES)
    ]
    cts = [
        gold.encrypt(gold.encode(v, params), params, pk,
                     np.random.default_rng(30 + i))
        for i, v in enumerate(vecs)
    ]
    acc = cts[0]
    for ct in cts[1:]:
        acc = gold.ct_add(acc, ct, params)
    partials = [
        th.partial_decrypt(acc, params, s, np.random.default_rng(40 + i))
        for i, s in enumerate(shares)
    ]
    dec = th.decrypt_bgv if scheme == "bgv" else th.decrypt_bfv
    got = gold.decode(dec(acc, params, partials), params)
    want = np.sum(vecs, axis=0) % t
    assert (got == want).all()


def test_device_partial_matches_golden():
    """The jitted partial-decryption core mirrors the golden partial
    limb-exactly (same share, same smudge draw)."""
    import jax.numpy as jnp

    from gpufhe_tpu.ciphertext import ct as dct
    from gpufhe_tpu.params.params import make_context

    params = preset("tiny2")
    ctx = make_context(params)
    _, shares, pk = _shares(params, seed=7)
    rng = np.random.default_rng(8)
    v = rng.uniform(-1, 1, size=params.slots)
    g = gckks.encrypt(
        gckks.encode(v + 0j, params.scale, params.q_primes, params.n),
        params, pk, np.random.default_rng(9), params.scale,
    )
    want = th.partial_decrypt(g, params, shares[0], np.random.default_rng(50))
    d = dct.Ciphertext(
        [jnp.asarray(c.astype(np.uint32)) for c in g.c], g.level, g.scale
    )
    s_mont = th.upload_share(shares[0], params)
    got = th.partial_decrypt_device(
        d, params, ctx, s_mont, shares[0], np.random.default_rng(50)
    )
    assert (np.asarray(got) == want.astype(np.uint32)).all()


def test_collaborative_relinearization_ckks():
    """Two-round interactive RKG yields a drop-in relin key: a ct-ct multiply
    on jointly-encrypted data decrypts correctly under threshold decryption."""
    params = preset("tiny2")
    _, shares, pk = _shares(params, seed=11)
    rlk = th.collaborative_relin_key(params, shares, seed=12)
    rng = np.random.default_rng(13)
    za = rng.uniform(-1, 1, size=params.slots)
    zb = rng.uniform(-1, 1, size=params.slots)
    enc = lambda z, i: gckks.encrypt(
        gckks.encode(z + 0j, params.scale, params.q_primes, params.n),
        params, pk, np.random.default_rng(60 + i), params.scale,
    )
    prod = gckks.ct_mul(enc(za, 0), enc(zb, 1), params, rlk)
    partials = [
        th.partial_decrypt(prod, params, s, np.random.default_rng(70 + i))
        for i, s in enumerate(shares)
    ]
    got = th.decrypt_ckks(prod, params, partials)
    assert np.abs(got.real - za * zb).max() < 1e-2


def test_collaborative_relinearization_bfv():
    params = preset("bfv_tiny")
    t = params.plain_modulus
    _, shares, pk = _shares(params, seed=21)
    # BFV key noise is NOT t-scaled: clear plain_modulus for the RKG errors
    import dataclasses

    kp = dataclasses.replace(params, plain_modulus=0)
    kp_shares = [th.PartyShare(s=s.s, b=s.b) for s in shares]
    rlk = th.collaborative_relin_key(kp, kp_shares, seed=22)
    rng = np.random.default_rng(23)
    va = rng.integers(0, t, size=params.n, dtype=np.int64)
    vb = rng.integers(0, t, size=params.n, dtype=np.int64)
    enc = lambda v, i: gbfv.encrypt(
        gbfv.encode(v, params), params, pk, np.random.default_rng(80 + i)
    )
    prod = gbfv.ct_mul(enc(va, 0), enc(vb, 1), params, rlk)
    partials = [
        th.partial_decrypt(prod, params, s, np.random.default_rng(90 + i))
        for i, s in enumerate(shares)
    ]
    got = gbfv.decode(th.decrypt_bfv(prod, params, partials), params)
    assert (got == va * vb % t).all()


def test_collaborative_galois_key_rotation():
    """One-round collaborative rotation key: rotate jointly-encrypted slots,
    threshold-decrypt, compare to the rolled cleartext."""
    params = preset("tiny2")
    _, shares, pk = _shares(params, seed=31)
    gk = th.collaborative_galois_key(params, shares, steps=2, seed=32)
    rng = np.random.default_rng(33)
    z = rng.uniform(-1, 1, size=params.slots)
    ct = gckks.encrypt(
        gckks.encode(z + 0j, params.scale, params.q_primes, params.n),
        params, pk, np.random.default_rng(34), params.scale,
    )
    rot = gckks.ct_rotate(ct, 2, params, gk)
    partials = [
        th.partial_decrypt(rot, params, s, np.random.default_rng(35 + i))
        for i, s in enumerate(shares)
    ]
    got = th.decrypt_ckks(rot, params, partials)
    assert np.abs(got.real - np.roll(z, -2)).max() < 1e-2
