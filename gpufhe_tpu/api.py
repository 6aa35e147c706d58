"""User-facing session API: one object per (scheme, parameter set).

The modular layers (params / keys / ciphertext / backends) stay the
power-user surface; `Session` is the batteries-included facade a user of a
conventional FHE library expects — create once, then encrypt / evaluate /
decrypt without touching contexts, chests, or backends:

    from gpufhe_tpu.api import Session

    s = Session.create("bfv_tiny", scheme="bfv", rotations="bsgs")
    ct = s.encrypt(values)                       # integers mod t
    out = s.matmul(s.mul(ct, ct), A)             # exact homomorphic algebra
    print(s.decrypt(out))

Scheme semantics:
  * ckks — approximate complex slots; `mul` rescales (one level), values
    are length-`slots` arrays.
  * bgv  — exact integers mod t; `mul` mod-switches (one level); values are
    per-ring [n/2] or [2, n/2] arrays (orbit order).
  * bfv  — exact integers mod t; `mul` keeps the level (scale-invariant).

The reference has no API surface at all (SURVEY.md §1 missing-layer list).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gpufhe_tpu.ciphertext import linalg
from gpufhe_tpu.params.params import CKKSParams, preset as _preset
from gpufhe_tpu.ops.context import make_context


@dataclasses.dataclass
class Session:
    params: CKKSParams
    scheme: str
    ctx: object
    chest: object
    be: object
    _rng: np.random.Generator

    # -- construction ---------------------------------------------------------
    @classmethod
    def create(
        cls,
        params_or_preset,
        scheme: str | None = None,
        rotations=(),
        conjugation: bool = False,
        seed: int = 0,
    ) -> "Session":
        """rotations: explicit step tuple, or "bsgs" for the full BSGS set
        the matmul layer needs. scheme defaults to ckks when the preset has
        no plain modulus, else bgv (pass "bfv" explicitly for BFV)."""
        params = (
            _preset(params_or_preset)
            if isinstance(params_or_preset, str)
            else params_or_preset
        )
        if scheme is None:
            scheme = "bgv" if params.plain_modulus else "ckks"
        assert scheme in ("ckks", "bgv", "bfv")
        assert (scheme == "ckks") == (params.plain_modulus == 0), (
            "integer schemes need plain_modulus; ckks needs plain_modulus=0"
        )
        if rotations == "bsgs":
            rotations = tuple(linalg.bsgs_rotations(params.slots))
        rng = np.random.default_rng(seed)
        ctx = make_context(params)
        if scheme == "ckks":
            from gpufhe_tpu.ciphertext.backend import DeviceBackend
            from gpufhe_tpu.keys import keys as dkeys

            chest = dkeys.keygen(
                params, rng, rotations=tuple(rotations), conjugation=conjugation
            )
            be = DeviceBackend(params, ctx, chest)
        elif scheme == "bgv":
            from gpufhe_tpu.ciphertext import bgv as dbgv
            from gpufhe_tpu.ciphertext.bgv_backend import BGVDeviceBackend

            chest = dbgv.keygen(params, rng, rotations=tuple(rotations))
            be = BGVDeviceBackend(params, ctx, chest)
        else:
            from gpufhe_tpu.ciphertext import bfv as dbfv
            from gpufhe_tpu.ciphertext.bfv_backend import BFVDeviceBackend

            chest = dbfv.keygen(params, rng, rotations=tuple(rotations))
            be = BFVDeviceBackend(params, ctx, chest)
        return cls(params, scheme, ctx, chest, be, rng)

    # -- encrypt / decrypt ----------------------------------------------------
    def encrypt(self, values, level: int | None = None):
        """ckks: complex/real [slots]; bgv/bfv: [n/2] or [2, n/2] mod t."""
        if self.scheme == "ckks":
            from gpufhe_tpu.ciphertext import ct as dct
            from gpufhe_tpu.encoding import encoder

            z = np.asarray(values, dtype=np.complex128)
            assert z.shape == (self.params.slots,)
            return dct.encrypt(
                encoder.encode(z, self.params), self.params,
                self.chest.device_pk, self.ctx, self._rng, self.params.scale,
                level=level,
            )
        from gpufhe_tpu.ciphertext.bgv_backend import _orbit_to_raw

        raw = _orbit_to_raw(values, self.be.rings, self.be.t, self.params.n)
        if self.scheme == "bgv":
            from gpufhe_tpu.ciphertext import bgv as dev
            from gpufhe_tpu.golden import bgv as gold
        else:
            from gpufhe_tpu.ciphertext import bfv as dev
            from gpufhe_tpu.golden import bfv as gold
        return dev.encrypt(
            gold.encode(raw, self.params), self.params, self.chest.device_pk,
            self.ctx, self._rng, level=level,
        )

    def decrypt(self, ct):
        """ckks: complex [slots]; bgv/bfv: int [2, n/2] orbit rings."""
        return self.be.decrypt_decode(ct)

    # -- homomorphic ops -------------------------------------------------------
    def add(self, a, b):
        return self.be.add(a, b)

    def sub(self, a, b):
        return self.be.sub(a, b)

    def mul(self, a, b):
        """One level-normalized multiply: ckks mul_full (tensor + relin +
        rescale inside), bgv mul (+modswitch inside), bfv mul (level kept)."""
        return self.be.mul(a, b)

    def mul_plain(self, ct, values):
        lvl = self.be.level(ct)
        if self.scheme == "ckks":
            pt = self.be.encode_slots(
                np.asarray(values, dtype=np.complex128), self.params.scale, lvl
            )
            return self.be.rescale(self.be.mul_plain(ct, pt))
        return self.be.mul_plain(ct, self.be.encode_slots(values, 1.0, lvl))

    def add_plain(self, ct, values):
        return self.be.add_plain(ct, values)

    def rotate(self, ct, steps: int):
        if self.scheme == "ckks":
            return self.be.rotate_hoisted(ct, [steps])[steps]
        return self.be.rotate(ct, steps)

    def rescale(self, ct):
        """Level-consuming normalization (ckks rescale / bgv modswitch /
        bfv modulus reduction)."""
        return self.be.rescale(ct)

    def matmul(self, ct, a: np.ndarray):
        """Plaintext-matrix x ciphertext (BSGS; needs rotations="bsgs")."""
        return linalg.matmul_plain(self.be, ct, a)

    def level(self, ct) -> int:
        return self.be.level(ct)

    # -- ckks-only non-linear toolkit (compare.py / approx.py) ---------------
    def _ckks_only(self, what: str):
        assert self.scheme == "ckks", f"{what} is CKKS-only (approximate)"

    def sign(self, ct, **kw):
        """sign(x) for slots in [-1, 1] (composite minimax polynomials)."""
        self._ckks_only("sign")
        from gpufhe_tpu.ciphertext import compare

        return compare.sign(self.be, ct, **kw)

    def relu(self, ct, **kw):
        self._ckks_only("relu")
        from gpufhe_tpu.ciphertext import compare

        return compare.relu(self.be, ct, **kw)

    def inverse(self, ct, bound: float = 1.0, iters: int = 6, **kw):
        """1/x for slots in (0, bound] (Goldschmidt)."""
        self._ckks_only("inverse")
        from gpufhe_tpu.ciphertext import approx

        return approx.inverse(self.be, ct, bound=bound, iters=iters, **kw)

    def sqrt(self, ct, bound: float = 1.0, iters: int = 6):
        self._ckks_only("sqrt")
        from gpufhe_tpu.ciphertext import approx

        return approx.sqrt(self.be, ct, bound=bound, iters=iters)

    def exp(self, ct, half_range: float = 1.0, **kw):
        self._ckks_only("exp")
        from gpufhe_tpu.ciphertext import approx

        return approx.exp(self.be, ct, half_range=half_range, **kw)

    def softmax(self, ct, **kw):
        """softmax over all slots; needs the rotations from
        approx.rotations_for_softmax(slots) in the key chest."""
        self._ckks_only("softmax")
        from gpufhe_tpu.ciphertext import approx

        return approx.softmax(self.be, ct, **kw)
