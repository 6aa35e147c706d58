"""Device context: precomputed per-limb constant tables.

The reference keeps no state at all (the modulus is a bare argument,
reference arithmetic.py:3). A real RNS-CKKS stack on TPU wants every
per-prime constant precomputed once on the host and laid out as stacked
[L, ...] device arrays so all limb-batched kernels are a single fused XLA op.

The context is a pytree (flax-free NamedTuples of jnp arrays) so it can be
passed straight through `jax.jit` / `shard_map`; the static CKKSParams rides
alongside as a hashable static argument.

NTT table layout (see ops/ntt.py for the transform itself): the negacyclic
N-point transform is evaluated as a four-step factorization N = n1 * n2 whose
n1/n2-point DFT matrices are stored as signed 8-bit digit planes
(int8[L, 4, n, n], see _digits_i8) feeding the MXU, with the psi twist, the inter-step
twiddles, and the 1/N scaling folded into the tables.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from gpufhe_tpu.golden.arithmetic import mont_constants
from gpufhe_tpu.params.params import CKKSParams

R = 1 << 32


def fourstep_split(n: int) -> tuple[int, int]:
    """Factor n = n1 * n2 with n1 >= n2, both powers of two (n1 = n2 or 2*n2)."""
    log = n.bit_length() - 1
    n1 = 1 << ((log + 1) // 2)
    return n1, n // n1


def _digits_i8(x: np.ndarray) -> np.ndarray:
    """uint32[..., a, b] (values < 2^30) -> int8[..., 4, a, b] signed digits.

    Base-256 digits recoded into [-128, 127] with carry propagation, so
    sum_t s_t * 2^(8t) == x exactly (the carry out of the top digit is zero
    for x < 2^30 — guaranteed by the <=30-bit prime discipline). Signed
    digits are required because the MXU int8 path is exact for s8 x s8 ->
    s32 while u8 operands are misinterpreted inside Pallas kernels.
    """
    x = np.asarray(x, dtype=np.uint32)
    assert (x < (1 << 30)).all(), "signed-digit recoding requires values < 2^30"
    planes = []
    c = np.zeros_like(x)
    for t in range(4):
        v = ((x >> (8 * t)) & 0xFF) + c
        c = (v > 127).astype(np.uint32)
        planes.append((v.astype(np.int32) - 256 * c.astype(np.int32)).astype(np.int8))
    return np.stack(planes, axis=-3)


class NTTTables(NamedTuple):
    """Four-step tables for one direction (fwd or inv), stacked over limbs.

    The transform computes, per limb, with X viewed as an (a, b) matrix:
        C = (WL @ X) * TW  @ WR        (all mod q)
    followed by a transpose-reshape back to a length-n vector.

    Two table families: the `*_digits` + `tw_mont` triple drives the jnp/XLA
    formulation (ops/ntt.py); the `*_cat` + Shoup + offset-correction fields
    drive the fused Pallas kernel (ops/ntt_pallas.py), which computes each
    digit stage as ONE stacked MXU matmul and reduces taps with Shoup
    constant-multiplies on offset (carry-free) runtime digits."""

    wl_digits: jnp.ndarray  # int8[L, 4, a, a] (signed-digit recoding)
    tw_mont: jnp.ndarray  # uint32[L, a, b]   twiddles, Montgomery form
    wr_digits: jnp.ndarray  # int8[L, 4, b, b]
    # --- Pallas-kernel family (same W content, kernel-friendly layout) ---
    wl_cat: jnp.ndarray  # int8[L, 4a, a]  W digit planes stacked over rows
    wr_cat: jnp.ndarray  # int8[L, b, 4b]  W digit planes stacked over cols
    tw: jnp.ndarray  # uint32[L, a, b]  twiddles, canonical
    tw_shoup: jnp.ndarray  # uint32[L, a, b]  floor(tw * 2^32 / q)
    corr_l: jnp.ndarray  # uint32[L, 7, a]  stage-1 offset-digit correction + q
    corr_r: jnp.ndarray  # uint32[L, 7, b]  stage-2 correction + q


class NTTTablesLazy(NamedTuple):
    """NTTTables variant whose TYPE marks an all-primes < 2^29 chain — the
    static gate for the lazy [0, 4q)-accumulation recombine (ops/ntt.py
    _lazy_recombine). Same fields/layout as NTTTables; the distinct pytree
    type survives jit flattening where a Python bool field would be traced."""

    wl_digits: jnp.ndarray
    tw_mont: jnp.ndarray
    wr_digits: jnp.ndarray
    wl_cat: jnp.ndarray
    wr_cat: jnp.ndarray
    tw: jnp.ndarray
    tw_shoup: jnp.ndarray
    corr_l: jnp.ndarray
    corr_r: jnp.ndarray


class Context(NamedTuple):
    """All per-limb device constants for the q-chain followed by the p-chain."""

    q: jnp.ndarray  # uint32[L_total]
    qinv_neg: jnp.ndarray  # uint32[L_total]   -q^-1 mod 2^32
    r2: jnp.ndarray  # uint32[L_total]   2^64 mod q
    digit_mont: jnp.ndarray  # uint32[L_total, 7]  (2^(8t) * 2^32) mod q, t = 0..6
    digit_plain: jnp.ndarray  # uint32[L_total, 7]  2^(8t) mod q (Shoup operand)
    digit_shoup: jnp.ndarray  # uint32[L_total, 7]  floor(2^(8t) mod q * 2^32 / q)
    ntt_fwd: NTTTables
    ntt_inv: NTTTables

    @property
    def num_total(self) -> int:
        return self.q.shape[0]

    def col(self, name: str, limbs) -> jnp.ndarray:
        """Per-limb constant broadcast-ready against [L, N] planes."""
        return getattr(self, name)[limbs][:, None]


def _pow_table(base: int, n: int, q: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint32)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * base % q
    return out


def _to_mont_np(x: np.ndarray, q: int) -> np.ndarray:
    return (np.asarray(x, dtype=np.uint64) * np.uint64(R % q) % np.uint64(q)).astype(
        np.uint32
    )


def _shoup_np(w: np.ndarray, q: int) -> np.ndarray:
    """Shoup companion constants floor(w * 2^32 / q) for canonical w < q."""
    return ((np.asarray(w, dtype=np.uint64) << np.uint64(32)) // np.uint64(q)).astype(
        np.uint32
    )


def _offset_corr(w_digits: np.ndarray, axis: int, q: int) -> np.ndarray:
    """Per-tap correction for OFFSET runtime digits, plus q (uint32[7, m]).

    The Pallas kernel extracts runtime digits as d'_t = ((x >> 8t) & 0xFF) -
    128 (one xor + bitcast, no carry chain), so each digit matrix is
    X_t = d'_t + 128 * ones and every digit-pair product picks up a rank-one
    term 128 * (row|col)sum(W_e). corr[t] = 128 * sum_{e+d=t} sum(W_e, axis)
    + q: adding it to the raw tap (i32, |tap| <= 16.8M) yields the exact
    nonnegative representative (< q + 33.6M < 2^31) of the true tap value
    mod q — it replaces the old "+ q" bias at zero extra cost. axis=1 sums
    rows (stage 1, W on the left); axis=0 sums columns (stage 2, W right)."""
    assert q > (1 << 26), "offset-digit correction sized for 27+-bit primes"
    sums = w_digits.astype(np.int64).sum(axis=1 + axis)  # [4, m]
    out = np.zeros((7, sums.shape[1]), dtype=np.int64)
    for t in range(7):
        for e in range(4):
            if 0 <= t - e < 4:
                out[t] += sums[e]
    out = out * 128 + q
    assert (out >= 0).all() and (out + (1 << 25) < (1 << 32)).all()
    return out.astype(np.uint32)


def _limb_tables(q: int, psi: int, n: int):
    """Host-side table build for one prime. Returns (fwd, inv) tuples of
    (WL uint32, TW uint32 canonical, WR uint32) matrices."""
    n1, n2 = fourstep_split(n)
    omega = psi * psi % q
    psi_pows = _pow_table(psi, 2 * n, q)  # psi^e for e in [0, 2n)

    j1 = np.arange(n1)
    j2 = np.arange(n2)
    k1 = np.arange(n1)
    k2 = np.arange(n2)

    # ---- forward: x_j -> X_k, j = j1*n2 + j2, k = k2*n1 + k1 ----
    # WL[k1, j1] = omega_{n1}^{j1 k1} * psi^{j1 n2}   (omega_{n1} = omega^{n2})
    om_n1 = _pow_table(pow(omega, n2, q), n1, q).astype(np.uint64)
    wl = om_n1[(j1[None, :] * k1[:, None]) % n1]
    wl = wl * psi_pows[(j1[None, :] * n2) % (2 * n)] % q
    # TW[k1, j2] = omega^{j2 k1} * psi^{j2} = psi^{j2 (2 k1 + 1)}
    tw = psi_pows[(j2[None, :] * (2 * k1[:, None] + 1)) % (2 * n)]
    # WR[j2, k2] = omega_{n2}^{j2 k2}   (omega_{n2} = omega^{n1})
    om_n2 = _pow_table(pow(omega, n1, q), n2, q).astype(np.uint64)
    wr = om_n2[(j2[:, None] * k2[None, :]) % n2]
    fwd = (wl.astype(np.uint32), tw.astype(np.uint32), wr.astype(np.uint32))

    # ---- inverse: X_k -> x_j, input viewed as (n2, n1) matrix M[k2, k1] ----
    winv = pow(omega, -1, q)
    psinv_pows = _pow_table(pow(psi, -1, q), 2 * n, q)
    n_inv = pow(n, -1, q)
    # WLi[j2, k2] = omega_{n2}^{-j2 k2}
    om_n2i = _pow_table(pow(winv, n1, q), n2, q).astype(np.uint64)
    wli = om_n2i[(j2[:, None] * k2[None, :]) % n2]
    # TWi[j2, k1] = omega^{-j2 k1} * psi^{-j2} = psi^{-j2 (2 k1 + 1)}
    twi = psinv_pows[(j2[:, None] * (2 * k1[None, :] + 1)) % (2 * n)]
    # WRi[k1, j1] = omega_{n1}^{-j1 k1} * psi^{-j1 n2} * n^-1
    om_n1i = _pow_table(pow(winv, n2, q), n1, q).astype(np.uint64)
    wri = om_n1i[(j1[None, :] * k1[:, None]) % n1]
    wri = wri * psinv_pows[(j1[None, :] * n2) % (2 * n)] % q
    wri = wri * n_inv % q
    inv = (wli.astype(np.uint32), twi.astype(np.uint32), wri.astype(np.uint32))
    return fwd, inv


@functools.lru_cache(maxsize=8)
def make_context(params: CKKSParams) -> Context:
    """Build the full device context for a parameter set (host precompute)."""
    primes = params.q_primes + params.p_primes
    psis = params.psi
    n = params.n

    qs, qinvs, r2s, digit_monts = [], [], [], []
    digit_plains, digit_shoups = [], []
    fwd, inv = {}, {}
    for acc in (fwd, inv):
        for k in ("wl", "tw", "wr", "wl_cat", "wr_cat", "tw_sh", "cl", "cr"):
            acc[k] = []
    for q, psi in zip(primes, psis):
        qinv_neg, r2 = mont_constants(q)
        qs.append(q)
        qinvs.append(qinv_neg)
        r2s.append(r2)
        digit_monts.append([(1 << (8 * t)) * R % q for t in range(7)])
        dp = [(1 << (8 * t)) % q for t in range(7)]
        digit_plains.append(dp)
        digit_shoups.append([(d << 32) // q for d in dp])
        tabs = _limb_tables(q, psi, n)
        for acc, (wl, tw, wr) in zip((fwd, inv), tabs):
            wld, wrd = _digits_i8(wl), _digits_i8(wr)
            acc["wl"].append(wld)
            acc["tw"].append(tw)
            acc["wr"].append(wrd)
            # Pallas family: digit planes stacked for the one-dot-per-stage
            # form (wl over rows: [4a, a]; wr over columns: [b, 4b])
            acc["wl_cat"].append(wld.reshape(-1, wld.shape[-1]))
            acc["wr_cat"].append(
                np.transpose(wrd, (1, 0, 2)).reshape(wrd.shape[1], -1)
            )
            acc["tw_sh"].append(_shoup_np(tw, q))
            acc["cl"].append(_offset_corr(wld, 1, q))
            acc["cr"].append(_offset_corr(wrd, 0, q))

    u32 = lambda v: jnp.asarray(np.asarray(v, dtype=np.uint32))

    # lazy-recombine qualification is a STATIC property of the chain, so it
    # rides the PYTREE TYPE (jit arguments are tracers; a bool field would
    # be traced): all-primes < 2^29 chains get NTTTablesLazy tables, and
    # ops/ntt.py keys the [0, 4q) accumulation kernel off isinstance at
    # trace time (8q < 2^32 must hold for EVERY selectable prime).
    cls = NTTTablesLazy if max(primes) < (1 << 29) else NTTTables

    def tables(acc):
        return cls(
            wl_digits=jnp.asarray(np.stack(acc["wl"])),
            tw_mont=u32(np.stack(
                [_to_mont_np(tw, q) for tw, q in zip(acc["tw"], qs)]
            )),
            wr_digits=jnp.asarray(np.stack(acc["wr"])),
            wl_cat=jnp.asarray(np.stack(acc["wl_cat"])),
            wr_cat=jnp.asarray(np.stack(acc["wr_cat"])),
            tw=u32(np.stack(acc["tw"])),
            tw_shoup=u32(np.stack(acc["tw_sh"])),
            corr_l=u32(np.stack(acc["cl"])),
            corr_r=u32(np.stack(acc["cr"])),
        )

    return Context(
        q=u32(qs),
        qinv_neg=u32(qinvs),
        r2=u32(r2s),
        digit_mont=u32(digit_monts),
        digit_plain=u32(digit_plains),
        digit_shoup=u32(digit_shoups),
        ntt_fwd=tables(fwd),
        ntt_inv=tables(inv),
    )
