"""Security accounting: HE-standard modulus budgets per ring degree.

Maximum log2(Q*P) for classical 128/192/256-bit security with ternary
secrets, from the Homomorphic Encryption Standard (homomorphicencryption.org,
Albrecht et al. tables; N=2^16 row as used by Lattigo/OpenFHE defaults).
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


def log_qp(params: CKKSParams) -> float:
    return math.log2(params.big_q * params.big_p)


def security_level(params: CKKSParams) -> int:
    """Largest standard level (128/192/256) the modulus budget satisfies; 0 if
    the chain is too large for 128-bit at this ring degree."""
    row = _HE_STD_LOGQP.get(params.n)
    if row is None:
        return 0  # below-table ring degrees are toy/CI sizes
    budget = log_qp(params)
    if budget <= row[2]:
        return 256
    if budget <= row[1]:
        return 192
    if budget <= row[0]:
        return 128
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
        "levels": params.num_limbs,
        "security_bits": security_level(params),
        "sparse_secret_h": params.hamming_weight or None,
    }
