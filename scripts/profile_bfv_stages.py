"""Attribute the BFV N=2^16 mult wall time to its BEHZ pipeline stages.

Same genuine-chain methodology as profile_mult_stages.py (xor-reduce tie,
empty-floor subtraction). Run on the real chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpufhe_tpu.ciphertext import bfv as dbfv
from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ops.modops import mont_mul
from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from gpufhe_tpu.params.params import make_context, preset
from gpufhe_tpu.primitives.rns import _base_convert_shoup

assert jax.devices()[0].platform == "tpu", jax.devices()

CHAIN = int(os.environ.get("PROFILE_CHAIN", "32"))  # big composites
C_LEAF = CHAIN * 8  # sub-ms leaves must sit well above floor noise
ITERS = 3
params = preset("bfv_n16")
level = params.num_limbs
ctx = make_context(params)
auxp, aux_ctx, tabs = dbfv.make_bfv_mul_context(params, level)
ksc = dbfv._ckks_ksc(params, level)
A = len(auxp.q_primes)
rng = np.random.default_rng(0)
from __graft_entry__ import _random_ct, _random_key

rlk = _random_key(params, rng)
a0, a1 = _random_ct(params, level, rng)
qa = np.asarray(auxp.q_primes, dtype=np.uint32)
x_aux = jnp.asarray(rng.integers(0, qa[:, None], size=(A, params.n),
                                 dtype=np.uint32))
print(f"# bfv_n16: N={params.n} L={level} aux={A} chain={CHAIN}", flush=True)

_floor_cache = {}


def _tie(xs, y):
    """Genuine dependency: xor-reduce every output leaf into input 0 (see
    profile_mult_stages.py — optimization_barrier and element ties are
    both DCE'd)."""
    s = jnp.zeros((), jnp.uint32)
    for leaf in jax.tree_util.tree_leaves(y):
        s = s ^ jax.lax.reduce(
            leaf.astype(jnp.uint32), np.uint32(0), jax.lax.bitwise_xor,
            tuple(range(leaf.ndim)),
        )
    return (xs[0] ^ s,) + tuple(xs[1:])


def timed_chain(name, f, args, chain=None):
    chain = CHAIN if chain is None else chain
    # poly args ride the carry in the kernel-native [L, n1, n2] view (the
    # 2D-carry per-iteration relayout artifact — NTT_N16.json siblings)
    from gpufhe_tpu.ops.context import fourstep_split

    n = params.n
    n1f, n2f = fourstep_split(n)

    def to3(x):
        return (x.reshape(x.shape[0], n1f, n2f)
                if x.ndim == 2 and x.shape[-1] == n else x)

    def to2(x):
        return (x.reshape(x.shape[0], n)
                if x.ndim == 3 and x.shape[-2:] == (n1f, n2f) else x)

    args = tuple(to3(x) for x in args)

    @jax.jit
    def prog(*xs):
        def body(_, xs):
            return _tie(xs, f(*(to2(x) for x in xs)))

        return jax.lax.fori_loop(0, chain, body, tuple(xs))

    shapes = tuple((x.shape, str(x.dtype)) for x in args) + (chain,)

    @jax.jit
    def floor_prog(*xs):
        def body(_, xs):
            return _tie(xs, (xs[0],))

        return jax.lax.fori_loop(0, chain, body, tuple(xs))

    def run(prog, args):
        t0 = time.time()
        compiled = prog.lower(*args).compile()
        tc = time.time() - t0
        out = compiled(*args)
        jax.block_until_ready(out)
        _ = np.asarray(out[0].reshape(-1)[:4])
        dts = []
        for _ in range(ITERS):
            t0 = time.time()
            out = compiled(*out)
            _ = np.asarray(out[0].reshape(-1)[:4])
            dts.append((time.time() - t0) / chain)
        return min(dts), tc

    if shapes not in _floor_cache:
        _floor_cache[shapes] = run(floor_prog, args)[0]
    floor = _floor_cache[shapes]
    raw, tc = run(prog, args)
    dt = max(raw - floor, 0.0)
    print(f"# {name:<28s} {dt * 1e3:8.3f} ms  (raw {raw * 1e3:.3f}, floor "
          f"{floor * 1e3:.3f}, compile {tc:.1f}s)", flush=True)
    return dt

results = {}
q_idx = list(range(level))
a_idx = list(range(A))

results["intt_q"] = timed_chain(
    "intt_q[30]", lambda x: ntt_inv(x, ctx, limbs=q_idx), (a0,), chain=C_LEAF)
results["ntt_aux"] = timed_chain(
    "ntt_aux[34]", lambda x: ntt_fwd(x, aux_ctx, limbs=a_idx), (x_aux,),
    chain=C_LEAF)

# the conversion the pipeline ACTUALLY dispatches at this width (S=30 -> MXU
# digit kernel, ops/convert_pallas.py; round-3 artifact measured the dead
# per-term Shoup loop instead - VERDICT r3 weak #4)
from gpufhe_tpu.ops.convert_pallas import digit_convert
from gpufhe_tpu.primitives.rns import _use_mxu_convert

assert _use_mxu_convert(level), "pipeline dispatches MXU at this width"


def f_q2aux(x):
    return digit_convert(x, tabs.q2aux_dc)


def f_b2q(y):
    # B basis = aux minus the m_sk row (bfv.py:371: conv_b2q(y[:-1]))
    return digit_convert(y[:-1], tabs.b2q_dc)


results["conv_q2aux_mxu"] = timed_chain("conv q->aux (MXU)", f_q2aux, (a0,),
                                        chain=C_LEAF)
results["conv_b2q_mxu"] = timed_chain("conv b->q (MXU)", f_b2q, (x_aux,),
                                      chain=C_LEAF)


def f_q2aux_shoup(x):
    return _base_convert_shoup(
        x, ctx.q[:level], ctx.qinv_neg[:level], tabs.q2aux_qhatinv,
        tabs.q2aux_conv_plain, tabs.q2aux_conv_shoup, aux_ctx.q,
    )


results["conv_q2aux_shoup_ref"] = timed_chain(
    "conv q->aux (Shoup ref)", f_q2aux_shoup, (a0,), chain=C_LEAF)


def f_to_aux(x):
    coeff = ntt_inv(x, ctx, limbs=q_idx)
    return ntt_fwd(f_q2aux(coeff), aux_ctx, limbs=a_idx)


results["to_aux_full"] = timed_chain("to_aux (iNTT+conv+NTT)", f_to_aux,
                                     (a0,), chain=C_LEAF)


def f_tensor_pair(x, y):
    d = dbfv._bfv_tensor_core((x, y), (y, x), ctx, aux_ctx, tabs, params,
                              auxp, level)
    return d


results["bfv_tensor"] = timed_chain("bfv_tensor (full BEHZ)", f_tensor_pair,
                                    (a0, a1))

# ---- bfv_tensor INTERNAL decomposition (VERDICT r4 item 4) -----------------
# bfv_tensor = 4x to_aux + tensor_q + tensor_aux + 3x per-output round block
# (iNTT_q + iNTT_aux + round_mid + NTT_q); every leaf its own chained program
from gpufhe_tpu.ops.modops import add_mod, barrett_reduce_u32, sub_mod

results["intt_aux"] = timed_chain(
    "intt_aux[34]", lambda y: ntt_inv(y, aux_ctx, limbs=a_idx), (x_aux,),
    chain=C_LEAF)
results["ntt_q"] = timed_chain(
    "ntt_q[30]", lambda x: ntt_fwd(x, ctx, limbs=q_idx), (a0,), chain=C_LEAF)

_q = ctx.q[:level][:, None]
_qinv = ctx.qinv_neg[:level][:, None]
_r2 = ctx.r2[:level][:, None]
_aq = aux_ctx.q[:, None]
_aqinv = aux_ctx.qinv_neg[:, None]
_ar2 = aux_ctx.r2[:, None]


def f_tensor_q(x, y):
    # the 6-elementwise-pass one-sided-Montgomery tensor over the Q basis
    # (bfv.py _bfv_tensor_core `tensor`); returns all three components
    y0m = mont_mul(y, _r2, _q, _qinv)
    y1m = mont_mul(x, _r2, _q, _qinv)
    d0 = mont_mul(x, y0m, _q, _qinv)
    d1 = add_mod(mont_mul(x, y1m, _q, _qinv), mont_mul(y, y0m, _q, _qinv), _q)
    d2 = mont_mul(y, y1m, _q, _qinv)
    return d0, d1, d2


def f_tensor_aux(u):
    y0m = mont_mul(u, _ar2, _aq, _aqinv)
    y1m = mont_mul(u, _ar2, _aq, _aqinv)
    d0 = mont_mul(u, y0m, _aq, _aqinv)
    d1 = add_mod(mont_mul(u, y1m, _aq, _aqinv), mont_mul(u, y0m, _aq, _aqinv),
                 _aq)
    d2 = mont_mul(u, y1m, _aq, _aqinv)
    return d0, d1, d2


results["tensor_q_elem"] = timed_chain("tensor_q (6 passes)", f_tensor_q,
                                       (a0, a1), chain=C_LEAF)
results["tensor_aux_elem"] = timed_chain("tensor_aux (6 passes)",
                                         f_tensor_aux, (x_aux,),
                                         chain=C_LEAF)

_m_sk = int(auxp.q_primes[-1])


def f_round_mid(dq, daux):
    """Per-output scaling/rounding block between the iNTTs and the final
    NTT_q (bfv.py _bfv_tensor_core loop body, coeff-domain in/out)."""
    r = mont_mul(dq, tabs.t_mont_q[:, None], _q, _qinv)
    r_aux = f_q2aux(r)
    td = mont_mul(daux, tabs.t_mont_aux[:, None], _aq, _aqinv)
    y = mont_mul(sub_mod(td, r_aux, _aq), tabs.qinv_mont_aux[:, None], _aq,
                 _aqinv)
    conv_sk = _base_convert_shoup(
        y[:-1], aux_ctx.q[:-1], aux_ctx.qinv_neg[:-1], tabs.b_qhatinv,
        tabs.b2msk_conv_plain, tabs.b2msk_conv_shoup, aux_ctx.q[-1:],
    )[0]
    alpha = mont_mul(
        sub_mod(conv_sk, y[-1], aux_ctx.q[-1]),
        tabs.binv_mont_msk[0], aux_ctx.q[-1], aux_ctx.qinv_neg[-1],
    )
    conv_q = f_b2q(y)
    ra = barrett_reduce_u32(alpha[None, :], _q)
    lifted = jnp.where(
        alpha[None, :] > jnp.uint32(_m_sk // 2),
        sub_mod(ra, tabs.msk_mod_q[:, None], _q), ra,
    )
    return sub_mod(conv_q, mont_mul(lifted, tabs.b_mont_q[:, None], _q,
                                    _qinv), _q)


results["round_mid"] = timed_chain("round_mid (scale+SK-convert)",
                                   f_round_mid, (a0, x_aux), chain=C_LEAF)

# the narrow Shenoy-Kumaresan B -> m_sk conversion alone (33 -> 1 limbs)
results["conv_b2msk"] = timed_chain(
    "conv b->msk (Shoup, 33->1)",
    lambda y: _base_convert_shoup(
        y[:-1], aux_ctx.q[:-1], aux_ctx.qinv_neg[:-1], tabs.b_qhatinv,
        tabs.b2msk_conv_plain, tabs.b2msk_conv_shoup, aux_ctx.q[-1:],
    ), (x_aux,), chain=C_LEAF)

# grouped leaves: the composite fuses the 4 input conversions (and the 3
# output blocks) into ONE program — measuring them separately multiplies
# the per-program boundary cost 4x/3x and overshoots the recon. Chain each
# GROUP as one program with distinct inputs (no CSE) to match the fusion.
from gpufhe_tpu.ops.modops import sub_mod as _subm


def f_to_aux_x4(x, y):
    a = add_mod(x, y, _q)
    b = _subm(x, y, _q)
    return tuple(f_to_aux(c) for c in (x, y, a, b))


def f_outputs_x3(dq_ntt, daux_ntt):
    outs = []
    pairs = (
        (dq_ntt, daux_ntt),
        (add_mod(dq_ntt, dq_ntt, _q), add_mod(daux_ntt, daux_ntt, _aq)),
        (_subm(dq_ntt, jnp.uint32(1) & dq_ntt, _q), daux_ntt),
    )
    for dqn, dxn in pairs:
        dq = ntt_inv(dqn, ctx, limbs=q_idx)
        daux = ntt_inv(dxn, aux_ctx, limbs=a_idx)
        outs.append(ntt_fwd(f_round_mid(dq, daux), ctx, limbs=q_idx))
    return tuple(outs)


results["to_aux_x4"] = timed_chain("to_aux x4 (one program)", f_to_aux_x4,
                                   (a0, a1), chain=C_LEAF // 4)
results["outputs_x3"] = timed_chain("output blocks x3 (one program)",
                                    f_outputs_x3, (a0, x_aux),
                                    chain=C_LEAF // 4)

tensor_recon = (results["to_aux_x4"]
                + results["tensor_q_elem"] + results["tensor_aux_elem"]
                + results["outputs_x3"])
tensor_recon_flat = (4 * results["to_aux_full"]
                     + results["tensor_q_elem"] + results["tensor_aux_elem"]
                     + 3 * (results["intt_q"] + results["intt_aux"]
                            + results["round_mid"] + results["ntt_q"]))
print(f"# bfv_tensor {results['bfv_tensor']*1e3:.3f} ms; grouped-leaf recon "
      f"{tensor_recon*1e3:.3f} ms "
      f"(residual {(results['bfv_tensor']-tensor_recon)*1e3:+.3f}; flat "
      f"per-leaf sum {tensor_recon_flat*1e3:.3f})",
      flush=True)


def f_relin(d2):
    return dct._relin_core((a0, a1, d2), ctx, ksc, rlk, params, level)


results["relin"] = timed_chain("relin (ckks ks)", f_relin, (a1,))


def f_mul(x, y):
    # the PRODUCTION path (bfv.py ct_mul): every component crosses the
    # tensor->relin boundary in coefficient domain — d2's NTT+iNTT pair
    # cancelled, relin adds in coeff, one output NTT per component
    d = dbfv._bfv_tensor_core((x, y), (y, x), ctx, aux_ctx, tabs, params,
                              auxp, level, out_mode="coeff")
    return dbfv._bfv_relin_coeff(d, ctx, ksc, rlk, params, level)


results["bfv_mul_full"] = timed_chain("bfv mult+relin", f_mul, (a0, a1))

# the separately-measured tensor and relin leaves each still carry their
# halves of the four cancelled boundary transforms: d2's NTT (tensor) +
# iNTT (relin open), and d0/d1's tensor-output NTTs (the fused path adds
# in coeff and pays its 2 output NTTs either way — net 3 NTT + 1 iNTT)
recon = (results["bfv_tensor"] + results["relin"]
         - results["intt_q"] - 3 * results["ntt_q"])
print(f"# bfv_mul_full {results['bfv_mul_full']*1e3:.3f} ms; tensor+relin "
      f"- 4 boundary transforms = {recon*1e3:.3f} ms "
      f"(residual {(results['bfv_mul_full']-recon)*1e3:+.3f})", flush=True)
out = {"stages_ms": {k: round(v * 1e3, 4) for k, v in results.items()},
       # stage-sum SoL for the BFV mult (tensor and relin each measured as
       # their own chained one-jit programs; bfv_n16_mult.py reads this as
       # the vs_baseline denominator)
       "recon_ms": round(recon * 1e3, 4),
       "tensor_recon_ms": round(tensor_recon * 1e3, 4),
       "tensor_recon": "to_aux_x4 + tensor_q_elem + tensor_aux_elem + "
                       "outputs_x3 (grouped leaves — the composite fuses "
                       "each group into one program)",
       "tensor_recon_flat_ms": round(tensor_recon_flat * 1e3, 4),
       "chains": {"composite": CHAIN, "leaf": C_LEAF},
       "pipeline": "MXU digit conversions (ops/convert_pallas.py)"}
print(json.dumps(out), flush=True)
with open("PROFILE_BFV_N16.json", "w") as f:
    json.dump(out, f, indent=1)
