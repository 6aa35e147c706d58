"""Encrypted MLP inference (CryptoNets-style square activations).

Evaluates a cleartext multi-layer perceptron on an encrypted input vector
under CKKS: each layer is a BSGS plaintext-matrix x ciphertext product
(ciphertext/linalg.py — hoisted baby rotations, zero diagonals skipped, so a
rectangular (out_dim x in_dim) block embedded in the slots x slots identity
frame costs ~(in+out) diagonals, not slots) followed by a bias add and, on
hidden layers, the HE-friendly square activation x -> x^2 (Gilad-Bachrach
et al., CryptoNets — the standard substitution for ReLU under leveled HE).

Levels consumed: 2*len(layers) - 1 (one per matmul rescale, one per hidden
square; the output layer skips the activation).

Backend-generic (ciphertext/backend.py): identical code runs on the device,
golden, and sharded pipelines. Reference trace: the reference has no model
layer at all (SURVEY.md §1 "missing layers: models/applications").
"""

from __future__ import annotations

import numpy as np

from gpufhe_tpu.ciphertext.linalg import BsgsPlan, bsgs_rotations


def mlp_rotations(slots: int) -> list[int]:
    """All Galois rotation steps EncryptedMLP needs (BSGS babies + giants)."""
    return bsgs_rotations(slots)


def _embed(w: np.ndarray, slots: int) -> np.ndarray:
    """Zero-pad an (out_dim, in_dim) weight block into a slots x slots map."""
    out_d, in_d = w.shape
    assert out_d <= slots and in_d <= slots, (w.shape, slots)
    m = np.zeros((slots, slots), dtype=np.complex128)
    m[:out_d, :in_d] = w
    return m


class EncryptedMLP:
    """Cleartext weights, encrypted activations.

    layers: [(W_1, b_1), ..., (W_k, b_k)] with W_i of shape (out_i, in_i),
    in_{i+1} == out_i, all dims <= slots. Input ciphertext packs the feature
    vector in slots [0, in_1) (remaining slots zero). Hidden activations are
    squared; the final layer returns raw affine outputs (logits) in slots
    [0, out_k).
    """

    def __init__(self, be, layers: list[tuple[np.ndarray, np.ndarray]]):
        self.be = be
        slots = be.params.slots
        dims = None
        self.layers = []
        for w, b in layers:
            w = np.asarray(w, dtype=np.float64)
            b = np.asarray(b, dtype=np.float64)
            assert w.ndim == 2 and b.shape == (w.shape[0],), (w.shape, b.shape)
            if dims is not None:
                assert w.shape[1] == dims, "layer dims must chain"
            dims = w.shape[0]
            bz = np.zeros(slots, dtype=np.complex128)
            bz[: b.size] = b
            self.layers.append((w, bz))
        self.levels_used = 2 * len(self.layers) - 1
        self._plans: dict[int, list[BsgsPlan]] = {}  # input level -> per-layer

    def _plans_at(self, level: int) -> list[BsgsPlan]:
        plans = self._plans.get(level)
        if plans is None:
            be, slots = self.be, self.be.params.slots
            plans, lvl = [], level
            for i, (w, _) in enumerate(self.layers):
                plans.append(BsgsPlan(be, _embed(w, slots), None, lvl))
                lvl -= 2 if i < len(self.layers) - 1 else 1  # matmul + square
            self._plans[level] = plans
        return plans

    def __call__(self, ct_x):
        be = self.be
        lvl = be.level(ct_x)
        assert lvl > self.levels_used, (
            f"MLP consumes {self.levels_used} levels; need level > that, got {lvl}"
        )
        plans = self._plans_at(lvl)
        ct = ct_x
        for i, ((_, bz), plan) in enumerate(zip(self.layers, plans)):
            ct = plan.apply(ct)  # W x, one level
            ct = be.add_plain(ct, bz)
            if i < len(self.layers) - 1:
                ct = be.mul(ct, ct)  # square activation, one level
        return ct

    def reference(self, x: np.ndarray) -> np.ndarray:
        """Cleartext forward of the same circuit (square activations)."""
        h = np.asarray(x, dtype=np.float64)
        for i, (w, bz) in enumerate(self.layers):
            h = w @ h + np.real(bz[: w.shape[0]])
            if i < len(self.layers) - 1:
                h = h * h
        return h
