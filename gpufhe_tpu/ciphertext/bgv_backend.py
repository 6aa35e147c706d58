"""BGV entries in the backend protocol: exact-integer slots for the
linear-algebra layer.

`BGVDeviceBackend` / `BGVGoldenBackend` expose the subset of the backend
surface (ciphertext/backend.py) that linalg.py consumes — encode_slots,
mul_plain, add, rotate_hoisted, rescale, level — with exact integer
semantics mod t, so `linalg.matmul_plain(be, ct, A)` computes A @ v mod t
with NO approximation error.

Slot model: the N integer slots split into two length-N/2 rings under the
rotation automorphism (golden/bgv.py slot_orbit_rings). The backends work in
ORBIT order, where `rotate(ct, s)` is a plain left-rotation by s of both
rings — exactly the semantics linalg's BSGS decomposition assumes. A
matrix-vector product therefore acts on both rings in parallel (the same
matrix applied to two independent vectors, the BGV analogue of CKKS's
slot-batched matvec). `params.slots == N/2` is the per-ring length.

The reference has no BGV, no backends, no linalg (SURVEY.md §2.4); this is
the exact-integer counterpart of the CKKS backend pair, VERDICT.md round-1
item 10.
"""

from __future__ import annotations

import numpy as np

from gpufhe_tpu.golden import bgv as gbgv
from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.params.params import CKKSParams


def _orbit_to_raw(d: np.ndarray, rings: np.ndarray, t: int, n: int) -> np.ndarray:
    """Per-ring orbit-ordered values [n/2] or [2, n/2] -> raw slot vector [n]."""
    d = np.asarray(d, dtype=np.int64) % t
    raw = np.empty(n, dtype=np.int64)
    if d.ndim == 1:  # same vector on both rings (batched matvec semantics)
        raw[rings[0]] = d
        raw[rings[1]] = d
    else:
        raw[rings[0]] = d[0]
        raw[rings[1]] = d[1]
    return raw


class BGVGoldenBackend:
    """linalg-compatible op surface over the golden BGV pipeline (oracle)."""

    def __init__(self, params: CKKSParams, chest):
        self.params = params
        self.chest = chest
        self.rings = gbgv.slot_orbit_rings(params)
        self.t = params.plain_modulus

    # linalg probes params.scale for the default encode scale; meaningless
    # for exact integers — encode_slots ignores it.
    def encode_slots(self, d, scale, level: int):
        raw = _orbit_to_raw(d, self.rings, self.t, self.params.n)
        return gbgv.encode(raw, self.params)

    def mul_plain(self, ct, pt_coeff):
        return gbgv.ct_mul_plain(ct, pt_coeff, self.params)

    def add(self, a, b):
        return gbgv.ct_add(a, b, self.params)

    def sub(self, a, b):
        return gbgv.ct_sub(a, b, self.params)

    def mul(self, a, b):
        return gbgv.ct_mul(a, b, self.params, self.chest.rlk)

    def rotate(self, ct, steps: int):
        return gbgv.ct_rotate(ct, steps, self.params, self.chest.galois[steps][0])

    def rotate_hoisted(self, ct, steps_list):
        gks = {s: self.chest.galois[s][0] for s in steps_list}
        outs = gbgv.ct_rotate_hoisted(ct, steps_list, self.params, gks)
        return dict(zip(steps_list, outs))

    def rescale(self, ct):
        """The BGV level-consuming step is ModSwitch (exact, t-corrected)."""
        return gbgv.ct_modswitch(ct, self.params)

    def add_plain(self, ct, d):
        """Add integer slots d (orbit order) to the message, exactly.

        The ciphertext stores m_raw with message m = m_raw * pt_factor, so
        the plaintext is pre-multiplied by pt_factor^{-1} mod t."""
        raw = _orbit_to_raw(d, self.rings, self.t, self.params.n)
        corr = raw * pow(int(ct.pt_factor), -1, self.t) % self.t
        pt = gbgv.encode(corr, self.params)
        primes = ct.primes(self.params)
        m_rns = np.stack([pt % q for q in primes])
        pt_ntt = gckks.ntt_limbs(m_rns, self.params, primes)
        c = list(ct.c)
        c[0] = gckks.poly_add(c[0], pt_ntt, primes)
        return gbgv.BGVCiphertext(c, ct.level, ct.pt_factor)

    def level(self, ct):
        return ct.level

    def decrypt_decode(self, ct):
        """-> int64[2, N/2] orbit-ordered slot rings."""
        raw = gbgv.decrypt_decode(ct, self.params, self.chest.sk)
        return raw[self.rings]


class BGVDeviceBackend:
    """linalg-compatible op surface over the jitted device BGV pipeline.

    Bit-exact vs BGVGoldenBackend composition-for-composition (every
    primitive here is individually bit-exact, tests/test_bgv.py)."""

    def __init__(self, params: CKKSParams, ctx, chest):
        from gpufhe_tpu.ciphertext import bgv as dbgv

        self.params = params
        self.ctx = ctx
        self.chest = chest
        self._bgv = dbgv
        self.rings = gbgv.slot_orbit_rings(params)
        self.t = params.plain_modulus

    def encode_slots(self, d, scale, level: int):
        raw = _orbit_to_raw(d, self.rings, self.t, self.params.n)
        pt = gbgv.encode(raw, self.params)
        return self._bgv.plaintext_to_device(pt, self.params, self.ctx, level)

    def mul_plain(self, ct, pt_mont):
        return self._bgv.ct_mul_plain(ct, pt_mont, self.ctx)

    def add(self, a, b):
        return self._bgv.ct_add(a, b, self.ctx)

    def sub(self, a, b):
        return self._bgv.ct_sub(a, b, self.ctx)

    def mul(self, a, b):
        return self._bgv.ct_mul(a, b, self.params, self.ctx, self.chest.device_rlk)

    def rotate(self, ct, steps: int):
        return self._bgv.ct_rotate(
            ct, steps, self.params, self.ctx, self.chest.galois[steps][1]
        )

    def rotate_hoisted(self, ct, steps_list):
        gks = {s: self.chest.galois[s][1] for s in steps_list}
        outs = self._bgv.ct_rotate_hoisted(ct, steps_list, self.params, self.ctx, gks)
        return dict(zip(steps_list, outs))

    def rescale(self, ct):
        return self._bgv.ct_modswitch(ct, self.params, self.ctx)

    def add_plain(self, ct, d):
        import jax.numpy as jnp

        from gpufhe_tpu.ops.modops import add_mod
        from gpufhe_tpu.ops.ntt import ntt_fwd

        raw = _orbit_to_raw(d, self.rings, self.t, self.params.n)
        corr = raw * pow(int(ct.pt_factor), -1, self.t) % self.t
        pt = gbgv.encode(corr, self.params)
        m_rns = np.stack(
            [pt % q for q in self.params.q_primes[: ct.level]]
        ).astype(np.uint32)
        pt_ntt = ntt_fwd(
            jnp.asarray(m_rns), self.ctx, limbs=list(range(ct.level))
        )
        q = self.ctx.q[: ct.level][:, None]
        c = list(ct.c)
        c[0] = add_mod(c[0], pt_ntt, q)
        return self._bgv.BGVCiphertext(c, ct.level, ct.pt_factor)

    def level(self, ct):
        return ct.level

    def decrypt_decode(self, ct):
        """-> int64[2, N/2] orbit-ordered slot rings."""
        raw = self._bgv.decrypt_decode(
            ct, self.params, self.chest.device_sk, self.ctx
        )
        return raw[self.rings]
