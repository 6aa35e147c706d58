"""Sharded BFV scale-invariant multiply over the ('limb','coeff') mesh.

Ciphertext components ride the mesh coeff-sharded (eval3d blocks, exactly
like the CKKS/BGV sharded mult in parallel/sharded.py); the limb axis
parallelizes the relinearization's key-switch groups. The BEHZ-style aux
machinery (basis conversions, t/Q scaling, Shenoy-Kumaresan return —
ciphertext/bfv.py) is purely per-coefficient, so it needs NO new
collectives: the only communication is the four-step NTTs' all_to_all pairs
(Q-basis and aux-basis transforms both reuse ntt_fwd_body/ntt_inv_body) and
the key-switch's existing modular allreduce.

Bit-exact vs the single-chip `_bfv_tensor_core` + `_relin_core` composition:
same conversion tables, same per-term reduction order, same NTT
factorization (tests/test_bfv_device.py::test_sharded_bfv_mult_parity).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gpufhe_tpu.ciphertext.bfv import make_bfv_mul_context
from gpufhe_tpu.golden import bfv as gbfv
from gpufhe_tpu.keys.keys import DeviceKSKey
from gpufhe_tpu.ops.context import fourstep_split, make_context
from gpufhe_tpu.ops.modops import add_mod, barrett_reduce_u32, mont_mul, mul_mod, sub_mod
from gpufhe_tpu.params.params import CKKSParams
from gpufhe_tpu.parallel.sharded import (
    ShardedKS,
    ShardedNTT,
    _keyswitch_body,
    _ntt_tables_for,
    make_sharded_ks,
    ntt_fwd_body,
    ntt_inv_body,
)
from gpufhe_tpu.primitives.rns import ks_groups


def _conv_body(coeff, qhatinv, conv_m, src_q, src_qinv, dst_q, dst_qinv):
    """Per-coefficient approximate base conversion on eval3d blocks —
    the sharded mirror of primitives/rns.py base_convert (same per-term
    reduction order, so limbs stay bit-exact)."""
    v = mont_mul(
        coeff, qhatinv[:, None, None], src_q[:, None, None], src_qinv[:, None, None]
    )
    dq, dqinv = dst_q[:, None, None], dst_qinv[:, None, None]
    acc = None
    for i in range(coeff.shape[0]):
        term = mont_mul(v[i][None], conv_m[:, i, None, None], dq, dqinv)
        acc = term if acc is None else add_mod(acc, term, dq)
    return acc


def _bfv_mult_body(
    a0, a1, b0, b1, r2_q, r2_aux, t_q, t_aux, t_qp, tabs, ks, level, gmax, msk_half
):
    """tensor (dual basis) -> t/Q scale -> S-K return -> relinearize."""
    q = t_q.q[:, None, None]
    qinv = t_q.qinv[:, None, None]
    rq = r2_q[:, None, None]
    aq = t_aux.q[:, None, None]
    aqinv = t_aux.qinv[:, None, None]
    raux = r2_aux[:, None, None]

    def to_aux_ntt(comp):
        coeff = ntt_inv_body(comp, t_q)
        conv = _conv_body(
            coeff, tabs.q2aux_qhatinv, tabs.q2aux_conv,
            t_q.q, t_q.qinv, t_aux.q, t_aux.qinv,
        )
        return ntt_fwd_body(conv, t_aux)

    a_aux = [to_aux_ntt(c) for c in (a0, a1)]
    b_aux = [to_aux_ntt(c) for c in (b0, b1)]

    def tensor(x, y, qq, qqinv, rr2):
        d0 = mul_mod(x[0], y[0], qq, qqinv, rr2)
        d1 = add_mod(
            mul_mod(x[0], y[1], qq, qqinv, rr2),
            mul_mod(x[1], y[0], qq, qqinv, rr2), qq,
        )
        d2 = mul_mod(x[1], y[1], qq, qqinv, rr2)
        return d0, d1, d2

    d_q = tensor((a0, a1), (b0, b1), q, qinv, rq)
    d_aux = tensor(a_aux, b_aux, aq, aqinv, raux)

    scaled = []
    for dq_ntt, daux_ntt in zip(d_q, d_aux):
        dq_c = ntt_inv_body(dq_ntt, t_q)
        daux_c = ntt_inv_body(daux_ntt, t_aux)
        r = mont_mul(dq_c, tabs.t_mont_q[:, None, None], q, qinv)
        r_aux = _conv_body(
            r, tabs.q2aux_qhatinv, tabs.q2aux_conv,
            t_q.q, t_q.qinv, t_aux.q, t_aux.qinv,
        )
        td = mont_mul(daux_c, tabs.t_mont_aux[:, None, None], aq, aqinv)
        y = mont_mul(
            sub_mod(td, r_aux, aq), tabs.qinv_mont_aux[:, None, None], aq, aqinv
        )
        # Shenoy-Kumaresan exact return B ∪ {m_sk} -> Q
        conv_sk = _conv_body(
            y[:-1], tabs.b_qhatinv, tabs.b2msk_conv,
            t_aux.q[:-1], t_aux.qinv[:-1], t_aux.q[-1:], t_aux.qinv[-1:],
        )[0]
        alpha = mont_mul(
            sub_mod(conv_sk, y[-1], t_aux.q[-1]),
            tabs.binv_mont_msk[0], t_aux.q[-1], t_aux.qinv[-1],
        )
        conv_q = _conv_body(
            y[:-1], tabs.b_qhatinv, tabs.b2q_conv,
            t_aux.q[:-1], t_aux.qinv[:-1], t_q.q, t_q.qinv,
        )
        ra = barrett_reduce_u32(alpha[None], q)
        lifted = jnp.where(
            alpha[None] > jnp.uint32(msk_half),
            sub_mod(ra, tabs.msk_mod_q[:, None, None], q),
            ra,
        )
        back = sub_mod(
            conv_q, mont_mul(lifted, tabs.b_mont_q[:, None, None], q, qinv), q
        )
        scaled.append(ntt_fwd_body(back, t_q))

    d0, d1, d2 = scaled
    ks0, ks1 = _keyswitch_body(d2, t_q, t_qp, ks, level, gmax)
    return add_mod(d0, ks0, q), add_mod(d1, ks1, q)


@functools.lru_cache(maxsize=None)
def make_sharded_bfv_mult(params: CKKSParams, level: int, mesh: Mesh):
    """Compile the sharded BFV tensor+relin step for a mesh.

    Returns (run, prepare): prepare(rlk) builds the key bundle;
    run(a0, a1, b0, b1, bundle) maps eval3d-sharded components [K, n1, n2]
    -> two [K, n1, n2] components (same level — BFV mult keeps the chain)."""
    n_limb = mesh.shape["limb"]
    cv = gbfv._ckks_view(params)  # plain ModDown for BFV key switching
    ctx = make_context(params)
    auxp, aux_ctx, tabs = make_bfv_mul_context(params, level)
    k = level
    n_aux = len(auxp.q_primes)
    from gpufhe_tpu.parallel.sharded import qp_indices

    qp_idx = np.asarray(qp_indices(params, level))
    t_q = _ntt_tables_for(ctx, np.arange(k))
    t_aux = _ntt_tables_for(aux_ctx, np.arange(n_aux))
    t_qp = _ntt_tables_for(ctx, qp_idx)
    r2_q = ctx.r2[:k]
    r2_aux = aux_ctx.r2[:n_aux]
    msk_half = int(auxp.q_primes[-1]) // 2
    gmax_static = math.ceil(len(ks_groups(params, level)) / n_limb)

    def prepare(ksk: DeviceKSKey):
        ks, gmax = make_sharded_ks(cv, level, ksk, n_limb)
        assert gmax == gmax_static
        return (ks, gmax)

    ct_spec = P(None, "coeff", None)

    def body(a0, a1, b0, b1, r2_q, r2_aux, t_q, t_aux, t_qp, tabs, ks):
        return _bfv_mult_body(
            a0, a1, b0, b1, r2_q, r2_aux, t_q, t_aux, t_qp, tabs, ks,
            level, gmax_static, msk_half,
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            ct_spec, ct_spec, ct_spec, ct_spec,
            P(), P(),
            ShardedNTT.spec(), ShardedNTT.spec(), ShardedNTT.spec(),
            P(),
            ShardedKS.spec(),
        ),
        out_specs=(ct_spec, ct_spec),
        check_vma=False,
    )
    jit_fn = jax.jit(fn)

    def run(a0, a1, b0, b1, bundle):
        ks, _gmax = bundle
        return jit_fn(a0, a1, b0, b1, r2_q, r2_aux, t_q, t_aux, t_qp, tabs, ks)

    return run, prepare


# ---------------------------------------------------------------------------
# BFV rotations on the mesh: the CKKS sharded Galois/hoisted-fan programs
# instantiated with the NON-t-corrected parameter view (BFV key switching is
# the plain CKKS hybrid switch, golden/bfv.py _ckks_view) — the level is
# kept, no ModSwitch. Mirrors ciphertext/bfv.py ct_rotate/ct_rotate_hoisted.
# ---------------------------------------------------------------------------


def make_sharded_bfv_rotation(params, level: int, mesh: Mesh, steps: int):
    """(run, prepare) for one BFV rotation on the ('limb','coeff') mesh."""
    from gpufhe_tpu.parallel import sharded as sh

    return sh.make_sharded_rotation(gbfv._ckks_view(params), level, mesh, steps)


def make_sharded_bfv_hoisted_fan(params, level: int, mesh: Mesh, n_offsets: int):
    """(run, prepare) for a hoisted BFV rotation fan (ONE decomposition for
    the whole fan — the BSGS inner loop of PIR's plaintext-matrix product)."""
    from gpufhe_tpu.parallel import sharded as sh

    return sh.make_sharded_hoisted_fan(
        gbfv._ckks_view(params), level, mesh, n_offsets
    )
