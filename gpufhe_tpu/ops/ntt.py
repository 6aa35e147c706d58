"""Negacyclic NTT as digit-decomposed MXU matmuls (the TPU-first design).

The reference's NTT is an identity stub (reference arithmetic.py:15-19); a
faithful "translation" would be a radix-2 butterfly network, which is the
wrong program for a TPU: butterflies are strided lane shuffles the VPU hates,
while the MXU is a 128x128 systolic array begging for matrices. So the
transform is evaluated in four-step (Bailey) form, N = n1 * n2:

    X[k2*n1 + k1] = sum_{j2} W_n2^{j2 k2} * TW[k1, j2] *
                    sum_{j1} WL[k1, j1] * x[j1*n2 + j2]

i.e. two batched (per-limb) modular matrix multiplies with an elementwise
twiddle in between, plus one transpose. The n1/n2-point DFT matrices live as
SIGNED byte planes (carry-recoded base-256 digits in [-128, 127], exact for
residues < 2^30): an exact uint32 modmatmul is 16 int8 x int8 -> int32 MXU
matmuls (digit pairs), recombined as sum_t T_t * 2^(8t) mod q with seven
Montgomery multiplies per element (|T_t| <= 4 * 128^2 * n2 < 2^27 for
n2 <= 2048, far inside int32).

The psi twist (negacyclic wrap), the four-step twiddles, and the 1/N inverse
scaling are all folded into the precomputed tables (ops/context.py), so a
forward or inverse transform is exactly: digits -> dot -> recombine ->
mont_mul -> digits -> dot -> recombine -> transpose.

Everything is plain jnp: XLA fuses the digit split / recombination into the
matmul epilogues. Output is in natural order, bit-exact against
gpufhe_tpu.golden.ntt.ntt_fwd / ntt_inv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from gpufhe_tpu.ops.context import Context, NTTTables, fourstep_split
from gpufhe_tpu.ops.modops import add_mod, mont_mul


def _norm_limbs(limbs):
    """Allow python lists of limb indices (jax forbids list indexing)."""
    return np.asarray(limbs, dtype=np.int32) if isinstance(limbs, list) else limbs


def _staged_rows(arr, limbs, stage: bool):
    """Per-limb row selection, optionally STAGED under ensure_compile_time_eval.

    FusedPipeline (ciphertext/backend.py) traces whole backend compositions
    with eager constant folding ON; evaluating these gathers there
    materializes a fresh per-level table slice PER OP CALL — the twiddle +
    digit-matrix rows are ~1 MB/limb at N=2^16, and an EvalMod trace makes
    hundreds of such calls, so the pre-dedup slices transiently pinned ~9 GiB
    and OOMed the flagship's fused EvalMod on a 16 GB chip. Staged, the FULL
    context table enters the jaxpr once (consts dedup by buffer bytes) and
    the row gather compiles into the program (~2 MB/limb-transform of extra
    HBM traffic per fused call — micro vs the residency). Same pattern as
    primitives/keyswitch.py key_rows. No-op semantics change: identical
    values, and under ordinary jit the operands are tracers so gathers were
    staged anyway.

    `stage` must be True exactly when the transform's DATA input is a tracer.
    A concrete transform (host encodes run under a fused trace) must stay
    eager: forcing it staged turns the whole concrete subcomputation into
    tracers, and any lazy host cache that stores the result (DeviceBackend
    encode cache) then poisons every later trace with a leaked tracer
    (tests/test_fftboot.py::test_fused_pipeline_smoke_tiny)."""
    if not stage:
        return arr[limbs]
    try:
        from jax._src import config as _cfg

        ctxmgr = _cfg.eager_constant_folding(False)
    except Exception:  # pragma: no cover - future jax refactor
        import contextlib

        ctxmgr = contextlib.nullcontext()
    with ctxmgr:
        return arr[limbs]


import os


def _use_pallas() -> bool:
    """Fused Pallas kernel on TPU backends; jnp path on CPU (and for tests).

    Override with GPUFHE_PALLAS=0/1.
    """
    env = os.environ.get("GPUFHE_PALLAS")
    if env is not None:
        return env == "1"
    import jax

    return jax.default_backend() not in ("cpu",)


def _use_v3() -> bool:
    """Pipelined scalar-prefetch kernel (v3, the round-4 default on TPU).

    GPUFHE_NTT_KERNEL=v2 restores the monolithic gathered-tables kernel
    (GPUFHE_NTT_V1=1 still selects the round-2 kernel below that)."""
    return _use_pallas() and os.environ.get(
        "GPUFHE_NTT_KERNEL", "v3") == "v3" and os.environ.get(
        "GPUFHE_NTT_V1") != "1"

_BYTE = np.uint32(0xFF)


def _to_digits(x: jnp.ndarray) -> jnp.ndarray:
    """uint32[L, a, b] (values < 2^30) -> int8[L, 4, a, b] signed digits.

    Same recoding as the host-side table build (ops/context.py _digits_i8):
    base-256 digits carried into [-128, 127]. Signed digits are mandatory —
    the MXU int8 path is exact for s8 x s8 -> s32, while uint8 operands are
    misinterpreted as signed inside Pallas kernels.
    """
    planes = []
    c = jnp.zeros_like(x)
    for t in range(4):
        v = ((x >> np.uint32(8 * t)) & _BYTE) + c
        c = (v > np.uint32(127)).astype(jnp.uint32)
        planes.append((v.astype(jnp.int32) - (c << np.uint32(8)).astype(jnp.int32)))
    return jnp.stack(planes, axis=1).astype(jnp.int8)


def _digit_dot_left(w_digits: jnp.ndarray, x_digits: jnp.ndarray) -> jnp.ndarray:
    """S[l, e, i, d, b] = sum_j w[l, e, i, j] * x[l, d, j, b]  (int32, exact)."""
    return jax.lax.dot_general(
        w_digits,
        x_digits,
        dimension_numbers=(((3,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def _digit_dot_right(x_digits: jnp.ndarray, w_digits: jnp.ndarray) -> jnp.ndarray:
    """S[l, d, a, e, k] = sum_j x[l, d, a, j] * w[l, e, j, k]  (int32, exact)."""
    return jax.lax.dot_general(
        x_digits,
        w_digits,
        dimension_numbers=(((3,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )


def _recombine(s: jnp.ndarray, digit_mont: jnp.ndarray, q, qinv_neg) -> jnp.ndarray:
    """Fold signed digit-pair partial sums back to residues in [0, q).

    s: int32[L, 4, a, 4, b]; result[l] = sum_{e,d} s[l,e,:,d,:] * 2^(8(e+d))
    mod q[l], via seven Montgomery multiplies by digit_mont[l, t] =
    2^(8t) * 2^32 mod q[l]. Each group sum |T_t| <= 4 * 128^2 * n2 < 2^27 <=
    q, so adding one q makes it a nonnegative representative of the same
    residue before the (uint32) Montgomery multiply; the canonical result is
    identical to the unsigned-digit formulation.
    """
    qi32 = q.astype(jnp.int32)
    acc = None
    for t in range(7):
        tt = None
        for e in range(4):
            d = t - e
            if 0 <= d < 4:
                term = s[:, e, :, d, :]
                tt = term if tt is None else tt + term  # |.| < 2^29: exact int32
        contrib = mont_mul(
            (tt + qi32).astype(jnp.uint32), digit_mont[:, t, None, None], q, qinv_neg
        )
        acc = contrib if acc is None else add_mod(acc, contrib, q)
    return acc


def _approx_recombine() -> bool:
    # round-4 approximate-mulhi Shoup recombine (bit-exact, ~35% fewer VPU
    # ops, measured -10% in-kernel); GPUFHE_NTT_RECOMBINE=shoup restores
    # the v2 exact-mulhi path for A/B
    return os.environ.get("GPUFHE_NTT_RECOMBINE", "approx") != "shoup"


def _lazy_recombine(tables) -> bool:
    """Round-5 [0, 4q) lazy-accumulation recombine (bit-exact, 6 fewer VPU
    ops per tap): requires 8q < 2^32 for EVERY prime the compiled v3
    program may select, i.e. the whole table chain under 2^29. The v3
    kernel takes full tables + a limb index, so the gate is per-chain and
    STATIC — it rides the tables' pytree type (ops/context.py
    NTTTablesLazy), which make_context sets from the concrete primes.
    GPUFHE_NTT_LAZY=0 disables for A/B; =1 asserts the chain qualifies."""
    from gpufhe_tpu.ops.context import NTTTablesLazy

    env = os.environ.get("GPUFHE_NTT_LAZY", "auto")
    if env == "0" or not _approx_recombine():
        return False
    ok = isinstance(tables, NTTTablesLazy)
    if env == "1":
        assert ok, "GPUFHE_NTT_LAZY=1 but a chain prime is >= 2^29"
    return ok


def _fourstep_v3(x_mat: jnp.ndarray, ctx: Context, limbs: list, inv: bool):
    """Pipelined scalar-prefetch kernel path: FULL tables + a limb index
    vector — no host-side table gathers (ops/ntt_pallas.py v3 docstring).
    One compiled program serves every limb selection of a given length.

    NOTE on fencing (round-4 seam bisect): XLA's cross-boundary
    optimization between an ELEMENTWISE producer (the key-switch MAC) and
    this Pallas custom call can cost ~1.6 ms at dw shapes. Fencing the
    input HERE does nothing — the win only appears when the producer's
    outputs are barriered JOINTLY at the caller (primitives/keyswitch.py
    key_switch_core: mac+2iNTT 2.63 ms unfenced vs 1.06 with a tuple
    optimization_barrier == the exact leaf sum)."""
    from gpufhe_tpu.ops.ntt_pallas import fourstep_pallas_v3

    t = ctx.ntt_inv if inv else ctx.ntt_fwd
    if isinstance(limbs, slice):
        limbs = np.arange(ctx.q.shape[0], dtype=np.int32)[limbs]
    idx = jnp.asarray(np.asarray(limbs, dtype=np.int32))
    return fourstep_pallas_v3(
        x_mat, idx, t.wl_cat, t.tw, t.tw_shoup, t.wr_cat, t.corr_l,
        t.corr_r, ctx.q, ctx.digit_plain, ctx.digit_shoup,
        approx=_approx_recombine(),
        lazy=_lazy_recombine(t) and os.environ.get(
            "GPUFHE_NTT_MODE", "mono") == "mono",
        # mono measured FASTEST on chip at N=2^16 L=30 (5.81 us/limb-tf vs
        # pipe 7.09, zip 6.92): Mosaic already overlaps MXU dots with the
        # VPU recombine as much as it will; the explicit pipeline/zip
        # structures only add scratch/guard overhead (scripts/ntt_ablate.py)
        mode=os.environ.get("GPUFHE_NTT_MODE", "mono"),
    )


def _fourstep(x_mat: jnp.ndarray, tables: NTTTables, q, qinv_neg, digit_mont,
              digit_plain=None, digit_shoup=None):
    """Shared four-step core: (WL @ X) * TW @ WR, then transpose.

    x_mat: uint32[L, a, b] canonical residues. Returns uint32[L, b, a].
    Dispatches to the fused Pallas kernel on TPU (ops/ntt_pallas.py, bit-exact
    with this path); the jnp formulation runs everywhere else.
    """
    if _use_pallas():
        if os.environ.get("GPUFHE_NTT_V1") == "1":  # A/B: the round-2 kernel
            from gpufhe_tpu.ops.ntt_pallas import fourstep_pallas

            return fourstep_pallas(
                x_mat,
                tables.wl_digits,
                tables.tw_mont,
                tables.wr_digits,
                q[:, 0, 0],
                qinv_neg[:, 0, 0],
                digit_mont,
            )
        from gpufhe_tpu.ops.ntt_pallas import fourstep_pallas_v2

        return fourstep_pallas_v2(
            x_mat,
            tables.wl_cat,
            tables.tw,
            tables.tw_shoup,
            tables.wr_cat,
            tables.corr_l,
            tables.corr_r,
            q[:, 0, 0],
            digit_plain,
            digit_shoup,
            approx=_approx_recombine(),
        )
    s1 = _digit_dot_left(tables.wl_digits, _to_digits(x_mat))
    a_mat = _recombine(s1, digit_mont, q, qinv_neg)
    b_mat = mont_mul(a_mat, tables.tw_mont, q, qinv_neg)
    s2 = _digit_dot_right(_to_digits(b_mat), tables.wr_digits)
    c_mat = _recombine(s2, digit_mont, q, qinv_neg)
    return jnp.swapaxes(c_mat, -1, -2)


def ntt_fwd(x: jnp.ndarray, ctx: Context, limbs=slice(None)) -> jnp.ndarray:
    """Forward negacyclic NTT over the last axis of uint32[..., L, N].

    `limbs` selects which rows of the context's prime chain the L axis of `x`
    corresponds to (e.g. a level-truncated ciphertext or the p-chain).
    """
    limbs = _norm_limbs(limbs)
    *lead, L, n = x.shape
    n1, n2 = fourstep_split(n)
    x_mat = x.reshape(*lead, L, n1, n2)
    if _use_v3():
        if lead:
            flat = x_mat.reshape(-1, L, n1, n2)
            out = jnp.stack([_fourstep_v3(flat[i], ctx, limbs, inv=False)
                             for i in range(flat.shape[0])])
            return out.reshape(*lead, L, n)
        return _fourstep_v3(x_mat, ctx, limbs, inv=False).reshape(L, n)
    stage = isinstance(x, jax.core.Tracer)
    q = _staged_rows(ctx.q, limbs, stage)[:, None, None]
    qinv = _staged_rows(ctx.qinv_neg, limbs, stage)[:, None, None]
    dm = _staged_rows(ctx.digit_mont, limbs, stage)
    dp = _staged_rows(ctx.digit_plain, limbs, stage)
    ds = _staged_rows(ctx.digit_shoup, limbs, stage)
    tables = NTTTables(*(_staged_rows(t, limbs, stage) for t in ctx.ntt_fwd))
    if lead:
        flat = x_mat.reshape(-1, L, n1, n2)
        out = jax.vmap(lambda m: _fourstep(m, tables, q, qinv, dm, dp, ds))(flat)
        return out.reshape(*lead, L, n)
    return _fourstep(x_mat, tables, q, qinv, dm, dp, ds).reshape(L, n)


def ntt_inv(x: jnp.ndarray, ctx: Context, limbs=slice(None)) -> jnp.ndarray:
    """Inverse negacyclic NTT over the last axis of uint32[..., L, N]."""
    limbs = _norm_limbs(limbs)
    *lead, L, n = x.shape
    n1, n2 = fourstep_split(n)
    x_mat = x.reshape(*lead, L, n2, n1)  # input natural order k = k2*n1 + k1
    if _use_v3():
        if lead:
            flat = x_mat.reshape(-1, L, n2, n1)
            out = jnp.stack([_fourstep_v3(flat[i], ctx, limbs, inv=True)
                             for i in range(flat.shape[0])])
            return out.reshape(*lead, L, n)
        return _fourstep_v3(x_mat, ctx, limbs, inv=True).reshape(L, n)
    stage = isinstance(x, jax.core.Tracer)
    q = _staged_rows(ctx.q, limbs, stage)[:, None, None]
    qinv = _staged_rows(ctx.qinv_neg, limbs, stage)[:, None, None]
    dm = _staged_rows(ctx.digit_mont, limbs, stage)
    dp = _staged_rows(ctx.digit_plain, limbs, stage)
    ds = _staged_rows(ctx.digit_shoup, limbs, stage)
    tables = NTTTables(*(_staged_rows(t, limbs, stage) for t in ctx.ntt_inv))
    if lead:
        flat = x_mat.reshape(-1, L, n2, n1)
        out = jax.vmap(lambda m: _fourstep(m, tables, q, qinv, dm, dp, ds))(flat)
        return out.reshape(*lead, L, n)
    return _fourstep(x_mat, tables, q, qinv, dm, dp, ds).reshape(L, n)
