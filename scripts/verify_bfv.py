"""On-chip verification of the BFV scheme (see .claude/skills/verify).

Drives the device BFV pipeline on the REAL TPU and compares bit-exact
against golden/bfv.py: encrypt, the full scale-invariant multiply
(tensor + relin), a rotation, and scheme switching. Mirrors
tests/test_bfv_device.py at bfv_tiny scale.
"""

import numpy as np
import jax

from gpufhe_tpu.ciphertext import bfv as dbfv
from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.params.params import preset, make_context

assert jax.devices()[0].platform == "tpu", jax.devices()

params = preset("bfv_tiny")
ctx = make_context(params)
chest = dbfv.keygen(params, np.random.default_rng(21), rotations=(1,))
t = params.plain_modulus


def pair(seed):
    m = np.random.default_rng(seed).integers(0, t, size=params.n, dtype=np.int64)
    pt = gbfv.encode(m, params)
    g = gbfv.encrypt(pt, params, chest.pk, np.random.default_rng(seed + 100))
    d = dbfv.encrypt(pt, params, chest.device_pk, ctx,
                     np.random.default_rng(seed + 100))
    return m, g, d


def check(g, d, what):
    for gc, dc in zip(g.c, d.c):
        assert (gc.astype(np.uint32) == np.asarray(dc)).all(), f"{what} mismatch"


m1, g1, d1 = pair(1)
m2, g2, d2 = pair(2)
check(g1, d1, "encrypt")

gm = gbfv.ct_mul(g1, g2, params, chest.rlk)
dm = dbfv.ct_mul(d1, d2, params, ctx, chest.device_rlk)
check(gm, dm, "mul")
assert (dbfv.decrypt_decode(dm, params, chest.device_sk, ctx) == m1 * m2 % t).all()

gr = gbfv.ct_rotate(g1, 1, params, chest.galois[1][0])
dr = dbfv.ct_rotate(d1, 1, params, ctx, chest.galois[1][1])
check(gr, dr, "rotate")

gs = gbfv.bfv_to_bgv(g1, params)
ds = dbfv.bfv_to_bgv(d1, params, ctx)
assert gs.pt_factor == ds.pt_factor
check(gs, ds, "bfv_to_bgv")

print("bit-exact on real TPU (BFV: encrypt, mul, rotate, scheme switch)")
