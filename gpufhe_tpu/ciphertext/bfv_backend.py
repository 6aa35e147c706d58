"""BFV entries in the backend protocol: exact-integer slots, scale-invariant.

`BFVDeviceBackend` / `BFVGoldenBackend` expose the linalg.py op surface
(encode_slots, mul_plain, add, rotate_hoisted, rescale, level) with exact
integer semantics mod t — the scale-invariant counterpart of the BGV pair
(ciphertext/bgv_backend.py): no pt_factor bookkeeping (the Delta = floor(Q/t)
embedding is level-local), and `rescale` is BFV modulus reduction
(ct_mod_reduce), which keeps the plaintext intact while dropping a limb.

Slot model is shared with BGV: the N integer slots form two length-N/2
orbit rings under the rotation automorphism (golden/bgv.py
slot_orbit_rings); backends work in orbit order so linalg's BSGS rotations
see plain cyclic shifts. The reference has no scheme at all (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np

from gpufhe_tpu.ciphertext.bgv_backend import _orbit_to_raw
from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.golden import bgv as gbgv
from gpufhe_tpu.params.params import CKKSParams


class BFVGoldenBackend:
    """linalg-compatible op surface over the golden BFV pipeline (oracle)."""

    def __init__(self, params: CKKSParams, chest):
        self.params = params
        self.chest = chest
        self.rings = gbgv.slot_orbit_rings(params)
        self.t = params.plain_modulus

    def encode_slots(self, d, scale, level: int):
        raw = _orbit_to_raw(d, self.rings, self.t, self.params.n)
        return gbfv.encode(raw, self.params)

    def mul_plain(self, ct, pt_coeff):
        return gbfv.ct_mul_plain(ct, pt_coeff, self.params)

    def add(self, a, b):
        return gbfv.ct_add(a, b, self.params)

    def sub(self, a, b):
        return gbfv.ct_sub(a, b, self.params)

    def mul(self, a, b):
        return gbfv.ct_mul(a, b, self.params, self.chest.rlk)

    def rotate(self, ct, steps: int):
        return gbfv.ct_rotate(ct, steps, self.params, self.chest.galois[steps][0])

    def rotate_hoisted(self, ct, steps_list):
        gks = {s: self.chest.galois[s][0] for s in steps_list}
        outs = gbfv.ct_rotate_hoisted(ct, steps_list, self.params, gks)
        return dict(zip(steps_list, outs))

    def rescale(self, ct):
        """BFV's level-consuming step: modulus reduction (plaintext intact)."""
        return gbfv.ct_mod_reduce(ct, self.params)

    def add_plain(self, ct, d):
        raw = _orbit_to_raw(d, self.rings, self.t, self.params.n)
        return gbfv.ct_add_plain(ct, gbfv.encode(raw, self.params), self.params)

    def level(self, ct):
        return ct.level

    def decrypt_decode(self, ct):
        """-> int64[2, N/2] orbit-ordered slot rings."""
        raw = gbfv.decrypt_decode(ct, self.params, self.chest.sk)
        return raw[self.rings]


class BFVDeviceBackend:
    """linalg-compatible op surface over the jitted device BFV pipeline.

    Bit-exact vs BFVGoldenBackend composition-for-composition (every
    primitive individually bit-exact, tests/test_bfv_device.py)."""

    def __init__(self, params: CKKSParams, ctx, chest):
        from gpufhe_tpu.ciphertext import bfv as dbfv

        self.params = params
        self.ctx = ctx
        self.chest = chest
        self._bfv = dbfv
        self.rings = gbgv.slot_orbit_rings(params)
        self.t = params.plain_modulus

    def encode_slots(self, d, scale, level: int):
        raw = _orbit_to_raw(d, self.rings, self.t, self.params.n)
        pt = gbfv.encode(raw, self.params)
        return self._bfv.plaintext_to_device(pt, self.params, self.ctx, level)

    def mul_plain(self, ct, pt_mont):
        return self._bfv.ct_mul_plain(ct, pt_mont, self.ctx)

    def add(self, a, b):
        return self._bfv.ct_add(a, b, self.ctx)

    def sub(self, a, b):
        return self._bfv.ct_sub(a, b, self.ctx)

    def mul(self, a, b):
        return self._bfv.ct_mul(a, b, self.params, self.ctx, self.chest.device_rlk)

    def rotate(self, ct, steps: int):
        return self._bfv.ct_rotate(
            ct, steps, self.params, self.ctx, self.chest.galois[steps][1]
        )

    def rotate_hoisted(self, ct, steps_list):
        gks = {s: self.chest.galois[s][1] for s in steps_list}
        outs = self._bfv.ct_rotate_hoisted(ct, steps_list, self.params, self.ctx, gks)
        return dict(zip(steps_list, outs))

    def rescale(self, ct):
        return self._bfv.ct_mod_reduce(ct, self.params, self.ctx)

    def add_plain(self, ct, d):
        raw = _orbit_to_raw(d, self.rings, self.t, self.params.n)
        return self._bfv.ct_add_plain(
            ct, gbfv.encode(raw, self.params), self.params, self.ctx
        )

    def level(self, ct):
        return ct.level

    def decrypt_decode(self, ct):
        """-> int64[2, N/2] orbit-ordered slot rings."""
        raw = self._bfv.decrypt_decode(
            ct, self.params, self.chest.device_sk, self.ctx
        )
        return raw[self.rings]
