"""Generate the estimator-backed security table (utils/security.py backend).

VERDICT r3 item 7: the sparse-secret penalty was a literature interpolation.
This script runs a self-contained lattice estimator over the (N, h, logQP)
grid the presets use and writes gpufhe_tpu/params/security_table.json, which
utils/security.py then interpolates WITHIN (never beyond).

Model (the standard core-SVP methodology):

  * Primal uSVP attack with Bai-Galbraith secret/error rebalancing
    [Bai-Galbraith'14]: secret columns scaled by nu = s_e/s_s, embedding
    dim d = n + m + 1, lattice volume V = q^m * nu^n.
  * BKZ-beta success condition, "2016 estimate" [Alkim-Ducas-Poeppelmann-
    Schwabe'16, as used by the lattice-estimator's usvp model]:
        s_e * sqrt(beta) <= delta(beta)^(2*beta - d) * V^(1/d)
    with delta(beta) = ((beta/(2*pi*e)) * (pi*beta)^(1/beta))^(1/(2(beta-1))).
  * Classical sieving core-SVP cost: bits = 0.292*beta + 16.4 + log2(8d)
    [Becker-Ducas-Gama-Laarhoven'16 exponent; additive terms as in the
    lattice-estimator's "BDGL16" default].
  * Sparse ternary secrets (weight h): drop-and-solve hybrid [Albrecht'17
    "On dual lattice attacks...", Cheon-Hhan-Hong-Son'19]: guess g of the n
    secret coordinates to be zero (success prob C(n-g,h)/C(n,h)), run the
    primal attack in dimension n-g with s_s = sqrt(h/(n-g)); total bits =
    attack_bits(n-g) - log2(p_guess), minimized over g.

Calibration: the raw model is ANCHORED so that the HE-standard dense row
(homomorphicencryption.org v1.1, ternary secret, sigma=3.19) maps exactly
to its stated security level at N=2^15: we compute the model's bits at
(N=2^15, logQP=881) and shift all outputs so that point reads 128.0. The
shift absorbs the standard's more conservative multi-attack minimum; the
model then supplies the SHAPE in (N, h, logQP). Anchor residuals at the
other dense rows are printed and stored for judging the fit.

Run: python scripts/gen_security_table.py   (pure host math, ~1 min)
"""

from __future__ import annotations

import json
import math
import os
import sys
from datetime import date

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIGMA_E = 3.19  # HE-standard error stddev
LOG2E = math.log2(math.e)

# HE-standard v1.1 dense ternary max log2(QP) rows (classical): anchors
HE_STD = {
    1024: (27, 19, 14),
    2048: (54, 37, 29),
    4096: (109, 75, 58),
    8192: (218, 152, 118),
    16384: (438, 305, 237),
    32768: (881, 611, 476),
    65536: (1772, 1229, 954),
}

BETAS = np.arange(60, 2200)
_lnb = np.log(BETAS)
# delta(beta), vectorized (natural log form)
_ln_delta = (np.log(BETAS / (2 * math.pi * math.e)) +
             (np.log(math.pi) + _lnb) / BETAS) / (2 * (BETAS - 1))


def _lgamma_log2(x: float) -> float:
    return math.lgamma(x) * LOG2E


def _log2_binom(n: int, k: int) -> float:
    if k < 0 or k > n:
        return -math.inf
    return (_lgamma_log2(n + 1) - _lgamma_log2(k + 1) - _lgamma_log2(n - k + 1))


def attack_bits_dim(n: int, log_q: float, s_s: float) -> float:
    """Min core-SVP bits of the primal uSVP attack on n-dim LWE, optimizing
    beta and the sample count m (0..2n). Vectorized over (beta, m)."""
    if s_s <= 0:
        return math.inf
    nu = SIGMA_E / s_s
    ln_q = log_q * math.log(2)
    ln_nu = math.log(nu)
    ms = np.arange(max(64, n // 8), 2 * n + 1, max(1, n // 256), dtype=np.float64)
    d = n + ms[None, :] + 1  # (1, M)
    b = BETAS[:, None].astype(np.float64)  # (B, 1)
    ln_v_over_d = (ms[None, :] * ln_q + n * ln_nu) / d
    lhs = math.log(SIGMA_E) + 0.5 * np.log(b)
    rhs = (2 * b - d) * _ln_delta[:, None] + ln_v_over_d
    ok = lhs <= rhs
    if not ok.any():
        return math.inf
    # min beta with any feasible m
    bi = np.argmax(ok.any(axis=1))
    beta = float(BETAS[bi])
    dmin = float(d[0, np.argmax(ok[bi])])
    return 0.292 * beta + 16.4 + math.log2(8 * dmin)


def attack_bits(n: int, log_q: float, h: int | None) -> float:
    """Min bits over the drop-and-solve guess dimension g (h=None: dense)."""
    if h is None:
        return attack_bits_dim(n, log_q, math.sqrt(2.0 / 3.0))
    best = math.inf
    log2_cnh = _log2_binom(n, h)
    # g sweep: 0 .. n-h-1 coarse-to-fine
    for g in sorted({int(x) for x in np.linspace(0, n - h - 1, 48)}):
        p_bits = _log2_binom(n - g, h) - log2_cnh  # log2 success prob (<=0)
        if p_bits < -best:  # guessing alone already exceeds current best
            continue
        cost = attack_bits_dim(n - g, log_q, math.sqrt(h / (n - g))) - p_bits
        best = min(best, cost)
    return best


_CAL = None  # calibration shift in bits


def calibrated_bits(n: int, log_q: float, h: int | None) -> float:
    return attack_bits(n, log_q, h) + _CAL


def max_log_qp(n: int, h: int | None, target_bits: float) -> float:
    """Largest logQP with calibrated attack cost >= target_bits (bisect)."""
    lo, hi = 10.0, 4000.0
    if calibrated_bits(n, lo, h) < target_bits:
        return 0.0
    for _ in range(40):
        mid = (lo + hi) / 2
        if calibrated_bits(n, mid, h) >= target_bits:
            lo = mid
        else:
            hi = mid
    return round(lo, 1)


def main() -> None:
    global _CAL
    # anchor: dense N=2^15 @ logQP=881 == 128 bits
    raw = attack_bits(32768, 881.0, None)
    _CAL = 128.0 - raw
    print(f"# calibration: raw model bits at (N=2^15, logQP=881) = "
          f"{raw:.1f}; shift {_CAL:+.1f} bits", flush=True)

    residuals = {}
    for n, (q128, q192, q256) in HE_STD.items():
        b = calibrated_bits(n, float(q128), None)
        residuals[str(n)] = round(b - 128.0, 1)
        print(f"# dense anchor N={n}: HE-std logQP={q128} -> calibrated "
              f"{b:.1f} bits (residual {b - 128:+.1f})", flush=True)

    hs = [16, 32, 64, 128, 192, 256, 512]
    table: dict[str, dict[str, list[float]]] = {}
    for n in HE_STD:
        row: dict[str, list[float]] = {}
        for h in [None] + hs:
            if h is not None and h >= n:
                continue
            caps = [max_log_qp(n, h, t) for t in (128.0, 192.0, 256.0)]
            row["dense" if h is None else str(h)] = caps
            print(f"# N={n} h={'dense' if h is None else h}: "
                  f"max logQP (128/192/256) = {caps}", flush=True)
        table[str(n)] = row

    out = {
        "model": "primal uSVP (Bai-Galbraith rebalancing, ADPS16 success "
                 "condition), core-SVP 0.292*beta + 16.4 + log2(8d); sparse "
                 "secrets via drop-and-solve (g-guess) hybrid",
        "calibration": {
            "anchor": "HE-std v1.1 dense ternary N=2^15 logQP=881 == 128 bits",
            "shift_bits": round(_CAL, 2),
            "dense_residuals_bits_at_128": residuals,
        },
        "sigma_e": SIGMA_E,
        "generated": str(date.today()),
        "generator": "scripts/gen_security_table.py",
        "caps": table,  # caps[N][h or 'dense'] = [logQP@128, @192, @256]
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "gpufhe_tpu", "params",
        "security_table.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", flush=True)


if __name__ == "__main__":
    main()
