"""Homomorphic linear algebra: BSGS plaintext-matrix x ciphertext products.

The slot-space matrix product (Mz)[j] = sum_r diag_r(M)[j] * rot_r(z)[j] is
evaluated baby-step/giant-step: G baby rotations of the input (hoisted — ONE
decomposition for all of them, ciphertext/ct.py ct_rotate_hoisted) and
ceil(slots/G) giant rotations of partial sums:

    M z = sum_g rot_{gG}( sum_b rot_{-gG}(diag_{gG+b}(M)) * rot_b(z) )

Matrices with a conjugate part (out = A z + B conj(z), as in CoeffToSlot)
share the baby rotations of conj(z). Consumes one level (the final rescale).

Backend-generic (ciphertext/backend.py): runs identically on the device and
golden pipelines. Reference has no such layer (SURVEY.md §2.4).
"""

from __future__ import annotations

import math

import numpy as np


def bsgs_rotations(slots: int) -> list[int]:
    """All rotation steps a dense BSGS matmul needs (babies + giants)."""
    g = max(1, math.isqrt(slots))
    babies = list(range(1, g))
    giants = [k * g for k in range(1, math.ceil(slots / g))]
    return sorted(set(babies + giants))


def pow2_rotations(slots: int) -> list[int]:
    """Power-of-two step set: rotate by ANY amount via rotate_composed with
    only log2(slots) Galois keys (vs one key per distinct step)."""
    out = []
    s = 1
    while s < slots:
        out.append(s)
        s *= 2
    return out


def rotate_composed(be, ct, steps: int):
    """Rotate by an arbitrary step count using only power-of-two keys.

    Binary-decomposes `steps` (mod slots) into at most log2(slots)
    single-key rotations — the standard key-storage/latency trade against
    holding a key per step. Works on any backend exposing rotate()."""
    n_s = be.params.slots
    steps %= n_s

    def rot1(c, s):
        if hasattr(be, "rotate"):
            return be.rotate(c, s)
        return be.rotate_hoisted(c, [s])[s]  # CKKS DeviceBackend surface

    s = 1
    while steps:
        if steps & 1:
            ct = rot1(ct, s)
        steps >>= 1
        s *= 2
    return ct


def _diag(m: np.ndarray, r: int) -> np.ndarray:
    n = m.shape[0]
    j = np.arange(n)
    return m[j, (j + r) % n]


class BsgsPlan:
    """Precomputed (rotated, encoded) diagonals of A (+ optional conj-part B)."""

    def __init__(self, be, a: np.ndarray, b: np.ndarray | None, level: int,
                 scale: float | None = None):
        self.be = be
        n_s = be.params.slots
        assert a.shape == (n_s, n_s)
        self.g = max(1, math.isqrt(n_s))
        self.n_giant = math.ceil(n_s / self.g)
        self.has_conj = b is not None
        self.level = level
        scale = scale if scale is not None else be.params.scale
        self.scale = scale

        j = np.arange(n_s)
        self.pt = {}  # (g_idx, b_idx, is_conj) -> encoded diagonal
        for gi in range(self.n_giant):
            for bi in range(self.g):
                r = gi * self.g + bi
                if r >= n_s:
                    break
                for mat, is_conj in ((a, False), (b, True)) if self.has_conj else (
                    (a, False),
                ):
                    d = _diag(mat, r)[(j - gi * self.g) % n_s]  # rot_{-gG}(diag_r)
                    if np.abs(d).max() == 0.0:
                        continue
                    self.pt[(gi, bi, is_conj)] = be.encode_slots(d, scale, level)

    def apply(self, ct):
        be = self.be
        assert be.level(ct) == self.level, (be.level(ct), self.level)
        # hoist only the babies a nonzero diagonal actually uses: block-
        # structured matrices (models/mlp.py, cnn.py, attention.py) keep
        # O(block) of the slots diagonals, so this is the difference between
        # O(block) and O(sqrt(slots)) rotations per product
        babies = sorted({bi for (_, bi, _) in self.pt} - {0})
        rots = {0: ct}
        if babies:
            rots.update(be.rotate_hoisted(ct, babies))
        rots_c = None
        if self.has_conj:
            babies_c = sorted({bi for (_, bi, c) in self.pt if c} - {0})
            ctc = be.conjugate(ct)
            rots_c = {0: ctc}
            if babies_c:
                rots_c.update(be.rotate_hoisted(ctc, babies_c))

        out = None
        for gi in range(self.n_giant):
            acc = None
            for bi in range(self.g):
                for is_conj in (False, True) if self.has_conj else (False,):
                    pt = self.pt.get((gi, bi, is_conj))
                    if pt is None:
                        continue
                    src = rots_c[bi] if is_conj else rots[bi]
                    term = be.mul_plain(src, pt)
                    acc = term if acc is None else be.add(acc, term)
            if acc is None:
                continue
            if gi > 0:
                acc = be.rotate_hoisted(acc, [gi * self.g])[gi * self.g]
            out = acc if out is None else be.add(out, acc)
        return be.rescale(out)


def matmul_plain(be, ct, a: np.ndarray, b: np.ndarray | None = None,
                 scale: float | None = None):
    """One-shot BSGS product (builds the plan at ct's level and applies it)."""
    return BsgsPlan(be, a, b, be.level(ct), scale).apply(ct)
