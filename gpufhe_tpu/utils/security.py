"""Security accounting: HE-standard modulus budgets per ring degree,
with sparse-secret (hamming-weight) penalties.

Dense table: maximum log2(Q*P) for classical 128/192/256-bit security with
uniform ternary secrets, from the Homomorphic Encryption Standard
(homomorphicencryption.org, Albrecht et al. tables; N=2^16 row as used by
Lattigo/OpenFHE defaults).

Sparse secrets (hamming_weight h > 0) admit hybrid combinatorial/dual
attacks below the dense table (Cheon-Hhan-Hong-Son; Son-Cheon; the
SparseLWE-estimator line of work), so the dense budget does NOT apply. We
model the penalty with literature-anchored caps at N=2^16 — h=192 ->
logQP ~1546 for 128-bit (the Lattigo bootstrapping parameter family),
h=128 -> ~1425, h=64 -> ~1300 — interpolated log-linearly in h and applied
as a multiplicative budget ratio at other ring degrees (documented
approximation, conservative below h=64). These are estimates, not an
estimator run; parameter sets for real deployments should be confirmed
against the lattice estimator.

The clean production answer is sparse-secret ENCAPSULATION
(params.eph_hamming_weight, Bossuat et al.): the chain stays under a dense
secret (dense table applies) and the ephemeral sparse key only ever exists
at the base modulus Q0, where even tiny h is far above 128 bits (the
sparse penalty at log2(Q0) ~ 60 against N=2^16 is irrelevant — the dense
cap at that modulus is 30x larger).

CI/bench presets intentionally run shallower chains at small N — call
`check(params)` before deploying a parameter set for real data.
"""

from __future__ import annotations

import math

from gpufhe_tpu.params.params import CKKSParams

# N -> max log2(QP) at (128, 192, 256)-bit classical security, ternary secret
_HE_STD_LOGQP = {
    1024: (27, 19, 14),
    2048: (54, 37, 29),
    4096: (109, 75, 58),
    8192: (218, 152, 118),
    16384: (438, 305, 237),
    32768: (881, 611, 476),
    65536: (1772, 1229, 954),
}

# sparse-secret 128-bit caps at N=2^16 (literature-anchored, see module doc)
_SPARSE_128_CAP_N16 = {64: 1300.0, 128: 1425.0, 192: 1546.0}


def _sparse_budget_ratio(h: int) -> float:
    """Fraction of the dense logQP budget a sparse ternary secret of weight h
    retains (anchored at N=2^16, log-linear in log2 h, clamped)."""
    anchors = sorted(_SPARSE_128_CAP_N16.items())
    dense = _HE_STD_LOGQP[65536][0]
    if h <= anchors[0][0]:
        # below the lowest anchor: scale down proportionally in log2 h
        return (anchors[0][1] / dense) * (
            math.log2(max(h, 2)) / math.log2(anchors[0][0])
        )
    if h >= anchors[-1][0]:
        return anchors[-1][1] / dense
    for (h0, c0), (h1, c1) in zip(anchors, anchors[1:]):
        if h0 <= h <= h1:
            t = (math.log2(h) - math.log2(h0)) / (math.log2(h1) - math.log2(h0))
            return (c0 + t * (c1 - c0)) / dense
    return anchors[0][1] / dense


def log_qp(params: CKKSParams) -> float:
    return math.log2(params.big_q * params.big_p)


def max_log_qp(params: CKKSParams, bits_idx: int) -> float:
    """h-adjusted budget for the standard level at bits_idx (0=128,1=192,2=256)."""
    row = _HE_STD_LOGQP.get(params.n)
    if row is None:
        return 0.0
    cap = float(row[bits_idx])
    h = params.hamming_weight
    if h:  # sparse base secret: penalized budget
        cap *= _sparse_budget_ratio(h)
    return cap


def security_level(params: CKKSParams) -> int:
    """Largest standard level (128/192/256) the modulus budget satisfies,
    with the sparse-secret penalty applied when the BASE secret is sparse.
    An ephemeral encapsulation key (eph_hamming_weight) does not penalize
    the chain — it only exists at the base modulus (see module doc).
    Returns 0 if the chain exceeds the (adjusted) 128-bit budget."""
    if params.n not in _HE_STD_LOGQP:
        return 0  # below-table ring degrees are toy/CI sizes
    budget = log_qp(params)
    for bits, idx in ((256, 2), (192, 1), (128, 0)):
        if budget <= max_log_qp(params, idx):
            return bits
    return 0


def check(params: CKKSParams, min_bits: int = 128) -> None:
    """Raise if the parameter set does not reach min_bits classical security."""
    lvl = security_level(params)
    if lvl < min_bits:
        raise ValueError(
            f"params N={params.n} log2(QP)={log_qp(params):.0f} reach only "
            f"{lvl}-bit security (< {min_bits}); shrink the prime chain or "
            f"raise N (HE-standard table, utils/security.py)"
        )


def report(params: CKKSParams) -> dict:
    return {
        "n": params.n,
        "log_qp": round(log_qp(params), 1),
        "max_log_qp_128": round(max_log_qp(params, 0), 1),
        "levels": params.num_limbs,
        "security_bits": security_level(params),
        "sparse_secret_h": params.hamming_weight or None,
        "encapsulation_eph_h": params.eph_hamming_weight or None,
    }
