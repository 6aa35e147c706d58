"""Known-answer vector generation + verification (SURVEY.md §4 item 2).

The reference ships no test vectors (SURVEY.md §4 — no tests at all), so the
parity contract of BASELINE.json:5 is *constructed* here: the golden model
generates deterministic .npz vectors for each BASELINE.json:7-11 milestone
config, checked into tests/vectors/ and verified by tests/test_vectors.py on
every run (golden model regressions) and against the device pipeline where
size permits.

Config 1 uses a true 60-bit NTT prime (exact via python-int object arrays),
which by design exceeds the 31-bit word discipline of the device path — it is
a golden-model-only artifact demonstrating the transform at the reference's
implied word size (SURVEY.md §7 "config1_ntt" note).
"""

from __future__ import annotations

import pathlib

import numpy as np

from gpufhe_tpu.golden import arithmetic as ga
from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.golden import ntt as gn
from gpufhe_tpu.golden import rns as grns
from gpufhe_tpu.params.params import gen_ntt_primes, preset

VEC_DIR = pathlib.Path(__file__).resolve().parents[2] / "tests" / "vectors"


def _find_prime_60bit(two_n: int) -> int:
    """Largest 60-bit prime p = 1 mod 2N."""
    p = ((1 << 60) - 1) // two_n * two_n + 1
    while not gn.is_prime(p):
        p -= two_n
    return p


def gen_config1_ntt(n: int = 2**12, seed: int = 101) -> dict:
    """Forward/inverse negacyclic NTT, single 60-bit prime (BASELINE cfg 1)."""
    q = _find_prime_60bit(2 * n)
    psi = gn.find_primitive_root_2n(q, 2 * n)
    rng = np.random.default_rng(seed)
    # sample < 2^63 then mod q to stay in int64 range; exact math is object-dtype
    x = rng.integers(0, 1 << 62, size=n, dtype=np.int64) % q
    fwd = gn.ntt_fwd(x, q, psi)
    inv = gn.ntt_inv(fwd, q, psi)
    assert (inv == x).all()
    as_u64 = lambda a: np.asarray([int(v) for v in a], dtype=np.uint64)
    return {
        "q": np.uint64(q), "psi": np.uint64(psi), "x": as_u64(x),
        "fwd": as_u64(fwd),
    }


def gen_config2_rns(seed: int = 102) -> dict:
    """RNS arithmetic + fast basis extension, N=2^14 L=10 (BASELINE cfg 2)."""
    params = preset("config2_rns")
    n = params.n
    rng = np.random.default_rng(seed)
    qs = params.q_primes
    ps = params.p_primes
    a = np.stack([rng.integers(0, q, size=n, dtype=np.int64) for q in qs])
    b = np.stack([rng.integers(0, q, size=n, dtype=np.int64) for q in qs])
    qcol = np.array(qs, dtype=np.int64)[:, None]
    conv = grns.base_convert(a, qs, ps)
    resc = grns.rescale_coeff(a, qs)
    return {
        "q_primes": np.asarray(qs, dtype=np.int64),
        "p_primes": np.asarray(ps, dtype=np.int64),
        "a": a, "b": b,
        "add": (a + b) % qcol,
        "mul": np.stack([ga.vec_mul(a[i], b[i], qs[i]) for i in range(len(qs))]),
        "base_convert_to_p": conv,
        "rescale": resc,
    }


def gen_config3_ckks(preset_name: str = "tiny2", seed: int = 103) -> dict:
    """Full encrypt->mult->relin->rescale->decrypt limb trace (BASELINE cfg 3).

    Generated at a CPU-friendly ring size; the same pipeline at N=2^15 is the
    benchmark config (identical code path, level count is what matters).
    """
    params = preset(preset_name)
    rng = np.random.default_rng(seed)
    sk, pk = gckks.keygen(params, rng)
    rlk = gckks.make_relin_key(params, sk, rng)
    zrng = np.random.default_rng(seed + 1)
    slots = params.slots
    za = zrng.normal(size=slots) + 1j * zrng.normal(size=slots)
    zb = zrng.normal(size=slots) + 1j * zrng.normal(size=slots)
    pa = gckks.encode(za, params.scale, params.q_primes, params.n)
    pb = gckks.encode(zb, params.scale, params.q_primes, params.n)
    ca = gckks.encrypt(pa, params, pk, np.random.default_rng(seed + 2), params.scale)
    cb = gckks.encrypt(pb, params, pk, np.random.default_rng(seed + 3), params.scale)
    t = gckks.ct_tensor(ca, cb, params)
    r = gckks.ct_relinearize(t, params, rlk)
    s = gckks.ct_rescale(r, params)
    dec = gckks.decrypt_to_coeff(s, params, sk)
    return {
        "seed": np.int64(seed),
        "preset": np.bytes_(preset_name.encode()),
        "za": za, "zb": zb,
        "ct_a0": ca.c[0], "ct_a1": ca.c[1],
        "tensor_d0": t.c[0], "tensor_d1": t.c[1], "tensor_d2": t.c[2],
        "relin_c0": r.c[0], "relin_c1": r.c[1],
        "rescale_c0": s.c[0], "rescale_c1": s.c[1],
        "decrypt_coeff": dec,
    }


def gen_config4_rotations(preset_name: str = "tiny2", seed: int = 104) -> dict:
    """Hybrid key-switching with hoisted rotations (BASELINE cfg 4)."""
    params = preset(preset_name)
    rng = np.random.default_rng(seed)
    sk, pk = gckks.keygen(params, rng)
    gks = {s: gckks.make_galois_key(params, s, sk, rng) for s in (1, 3)}
    zrng = np.random.default_rng(seed + 1)
    z = zrng.normal(size=params.slots) + 1j * zrng.normal(size=params.slots)
    pt = gckks.encode(z, params.scale, params.q_primes, params.n)
    ct = gckks.encrypt(pt, params, pk, np.random.default_rng(seed + 2), params.scale)
    outs = gckks.ct_rotate_hoisted(ct, [1, 3], params, gks)
    return {
        "seed": np.int64(seed),
        "preset": np.bytes_(preset_name.encode()),
        "z": z,
        "rot1_c0": outs[0].c[0], "rot1_c1": outs[0].c[1],
        "rot3_c0": outs[1].c[0], "rot3_c1": outs[1].c[1],
    }


def gen_bgv_integer(preset_name: str = "bgv_tiny", seed: int = 105) -> dict:
    """BGV limb trace: encrypt -> mul (relin + modswitch) -> rotate."""
    from gpufhe_tpu.golden import bgv as gbgv

    params = preset(preset_name)
    t = params.plain_modulus
    rng = np.random.default_rng(seed)
    sk, pk = gbgv.keygen(params, rng)
    rlk = gbgv.make_relin_key(params, sk, rng)
    gk = gbgv.make_galois_key(params, 1, sk, rng)
    mrng = np.random.default_rng(seed + 1)
    m1 = mrng.integers(0, t, size=params.n, dtype=np.int64)
    m2 = mrng.integers(0, t, size=params.n, dtype=np.int64)
    c1 = gbgv.encrypt(gbgv.encode(m1, params), params, pk,
                      np.random.default_rng(seed + 2))
    c2 = gbgv.encrypt(gbgv.encode(m2, params), params, pk,
                      np.random.default_rng(seed + 3))
    prod = gbgv.ct_mul(c1, c2, params, rlk)
    rot = gbgv.ct_rotate(c1, 1, params, gk)
    assert (gbgv.decrypt_decode(prod, params, sk) == m1 * m2 % t).all()
    return {
        "seed": np.int64(seed),
        "preset": np.bytes_(preset_name.encode()),
        "m1": m1, "m2": m2,
        "ct1_c0": c1.c[0], "ct1_c1": c1.c[1],
        "mul_c0": prod.c[0], "mul_c1": prod.c[1],
        "mul_pt_factor": np.int64(prod.pt_factor),
        "rot1_c0": rot.c[0], "rot1_c1": rot.c[1],
    }


def gen_bfv_integer(preset_name: str = "bfv_tiny", seed: int = 106) -> dict:
    """BFV limb trace: encrypt -> scale-invariant mul (tensor + relin) ->
    mod-reduce -> rotate -> scheme switch to BGV."""
    from gpufhe_tpu.golden import bfv as gbfv

    params = preset(preset_name)
    t = params.plain_modulus
    rng = np.random.default_rng(seed)
    sk, pk = gbfv.keygen(params, rng)
    rlk = gbfv.make_relin_key(params, sk, rng)
    gk = gbfv.make_galois_key(params, 1, sk, rng)
    mrng = np.random.default_rng(seed + 1)
    m1 = mrng.integers(0, t, size=params.n, dtype=np.int64)
    m2 = mrng.integers(0, t, size=params.n, dtype=np.int64)
    c1 = gbfv.encrypt(gbfv.encode(m1, params), params, pk,
                      np.random.default_rng(seed + 2))
    c2 = gbfv.encrypt(gbfv.encode(m2, params), params, pk,
                      np.random.default_rng(seed + 3))
    prod = gbfv.ct_mul(c1, c2, params, rlk)
    red = gbfv.ct_mod_reduce(prod, params)
    rot = gbfv.ct_rotate(c1, 1, params, gk)
    sw = gbfv.bfv_to_bgv(c1, params)
    assert (gbfv.decrypt_decode(prod, params, sk) == m1 * m2 % t).all()
    return {
        "seed": np.int64(seed),
        "preset": np.bytes_(preset_name.encode()),
        "m1": m1, "m2": m2,
        "ct1_c0": c1.c[0], "ct1_c1": c1.c[1],
        "mul_c0": prod.c[0], "mul_c1": prod.c[1],
        "modred_c0": red.c[0], "modred_c1": red.c[1],
        "rot1_c0": rot.c[0], "rot1_c1": rot.c[1],
        "switch_c0": sw.c[0], "switch_c1": sw.c[1],
        "switch_pt_factor": np.int64(sw.pt_factor),
    }


GENERATORS = {
    "config1_ntt_60bit": gen_config1_ntt,
    "config2_rns": gen_config2_rns,
    "config3_ckks": gen_config3_ckks,
    "config4_rotations": gen_config4_rotations,
    "bgv_integer": gen_bgv_integer,
    "bfv_integer": gen_bfv_integer,
}


def write_all(out_dir: pathlib.Path = VEC_DIR) -> list[pathlib.Path]:
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for name, gen in GENERATORS.items():
        path = out_dir / f"{name}.npz"
        np.savez_compressed(path, **gen())
        paths.append(path)
    return paths


if __name__ == "__main__":
    for p in write_all():
        print(p)
