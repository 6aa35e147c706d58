"""Multi-chip SPMD pipeline: mesh ('limb', 'coeff'), shard_map + collectives.

The reference has no distributed anything (SURVEY.md §2.3 — no NCCL/MPI, no
device code at all); this module is the TPU-native scaling design demanded by
BASELINE.json:5: "residue channels and polynomial coefficients partitioned
over the mesh, NTT butterfly stages exchanged via all-to-all across ICI, and
key-switch inner products reduced with psum collectives".

Axes
----
* ``coeff`` — shards polynomial coefficients. At rest a polynomial limb is
  the four-step matrix ``[n1, n2]`` (ops/ntt.py) sharded over rows; a forward
  or inverse transform is two local MXU matmul stages joined by two
  ``all_to_all`` transposes over ICI (the classic distributed four-step).
  Eval-domain data lives in the ``[k1, k2]`` matrix layout (a fixed
  permutation of natural order — pointwise ops and iNTT are layout-agnostic,
  tests un-permute when comparing against the single-chip path).
* ``limb`` — shards the *gadget decomposition groups* of hybrid
  key-switching, the dominant cost of ct-mult: each limb-row of devices
  ModUps + NTTs + MACs its own groups and the partial inner products are
  reduced across the axis. The reduction must be **exact mod q**, so instead
  of a raw ``psum`` (which would wrap uint32 at >=3 shards) it is an
  all_gather followed by a modular tree add — bit-exact by construction.

Everything in this module is bit-exact against the single-chip path
(ciphertext/ct.py), which is itself bit-exact against the golden model:
collectives only move data; every arithmetic op is the same op in the same
order (modular adds are associative/commutative exactly, so the group-order
of the inner-product reduction cannot change the result).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpufhe_tpu.keys.keys import DeviceKSKey
from gpufhe_tpu.ops.context import Context, fourstep_split, make_context
from gpufhe_tpu.ops.modops import add_mod, barrett_reduce_u32, mont_mac, mont_mul, mul_mod, sub_mod
from gpufhe_tpu.ops.ntt import _digit_dot_left, _digit_dot_right, _recombine, _to_digits
from gpufhe_tpu.params.params import CKKSParams
from gpufhe_tpu.primitives.keyswitch import qp_indices
from gpufhe_tpu.primitives.rns import ks_groups, make_ks_context


def make_fhe_mesh(n_limb: int, n_coeff: int, devices=None) -> Mesh:
    """The standard ('limb', 'coeff') device mesh."""
    if devices is None:
        return jax.make_mesh((n_limb, n_coeff), ("limb", "coeff"))
    return Mesh(np.asarray(devices).reshape(n_limb, n_coeff), ("limb", "coeff"))


# ---------------------------------------------------------------------------
# Layout converters (host/test utilities)
# ---------------------------------------------------------------------------


def natural_to_eval3d(x: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """Natural-order eval vector [..., N] -> [k1, k2] matrix [..., n1, n2].

    Natural index k = k2*n1 + k1, so the natural vector is the [k2, k1]
    matrix flattened; the sharded layout is its transpose.
    """
    *lead, n = x.shape
    return jnp.swapaxes(x.reshape(*lead, n2, n1), -1, -2)


def eval3d_to_natural(x: jnp.ndarray) -> jnp.ndarray:
    *lead, n1, n2 = x.shape
    return jnp.swapaxes(x, -1, -2).reshape(*lead, n1 * n2)


def coeff_to_3d(x: jnp.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """Coefficient-order vector [..., N] -> [j1, j2] matrix (j = j1*n2 + j2)."""
    *lead, n = x.shape
    return x.reshape(*lead, n1, n2)


# ---------------------------------------------------------------------------
# Sharded NTT table bundle (one per limb subset: q-chain level, QP, level-1)
# ---------------------------------------------------------------------------


class ShardedNTT(NamedTuple):
    """Per-limb-subset tables for the sharded four-step transform.

    tw is sharded over its j2 axis (forward) / twi_T over its k1 axis
    (inverse); digit matrices and per-limb constants are replicated.
    """

    wl: jnp.ndarray  # u8[L, 4, n1, n1]
    tw: jnp.ndarray  # u32[L, n1, n2]   (sharded axis 2)
    wr: jnp.ndarray  # u8[L, 4, n2, n2]
    wli: jnp.ndarray  # u8[L, 4, n2, n2] (symmetric: WLi[j2,k2] = WLi[k2,j2])
    twi_t: jnp.ndarray  # u32[L, n1, n2]   TWi transposed, (sharded axis 1)
    wri_t: jnp.ndarray  # u8[L, 4, n1, n1] WRi transposed
    q: jnp.ndarray  # u32[L]
    qinv: jnp.ndarray  # u32[L]
    dm: jnp.ndarray  # u32[L, 7]

    @staticmethod
    def spec():
        return ShardedNTT(
            wl=P(), tw=P(None, None, "coeff"), wr=P(),
            wli=P(), twi_t=P(None, "coeff", None), wri_t=P(),
            q=P(), qinv=P(), dm=P(),
        )


@functools.lru_cache(maxsize=8)
def full_ntt_tables(params: CKKSParams) -> ShardedNTT:
    """ONE full-chain ShardedNTT set per parameter set, shared by EVERY mesh
    program (VERDICT r4 item 7): constructors hold this same object and pass
    it as a jit argument alongside a small i32 limb-index vector; the
    program row-gathers its level selection on entry (gather_ntt_tables).
    The same device buffers then back every cached program closure,
    collapsing the residency table's per-program private table slices
    (3.48 GiB/device across the N=2^16 dw inventory) to one shared set
    (~0.09 GiB/device). The per-call row gather costs one k-row copy of
    each table inside the program (~60 us at N=2^16 on real HBM — a few
    permille of any mesh program's wall)."""
    ctx = make_context(params)
    return _ntt_tables_for(ctx, np.arange(ctx.num_total))


def gather_ntt_tables(t_full: ShardedNTT, idx: jnp.ndarray) -> ShardedNTT:
    """Row-gather a limb selection out of the shared full-chain set (inside
    the program, before the shard_map; the limb-axis gather commutes with
    the coeff-axis sharding). Bit-identical to _ntt_tables_for(ctx, idx):
    every field is limb-major and _ntt_tables_for's swapaxes act on the
    trailing axes."""
    return ShardedNTT(*(jnp.take(a, idx, axis=0) for a in t_full))


def _ntt_tables_for(ctx: Context, limbs: np.ndarray) -> ShardedNTT:
    fwd = ctx.ntt_fwd
    inv = ctx.ntt_inv
    return ShardedNTT(
        wl=fwd.wl_digits[limbs],
        tw=fwd.tw_mont[limbs],
        wr=fwd.wr_digits[limbs],
        wli=inv.wl_digits[limbs],
        twi_t=jnp.swapaxes(inv.tw_mont[limbs], -1, -2),
        wri_t=jnp.swapaxes(inv.wr_digits[limbs], -1, -2),
        q=ctx.q[limbs],
        qinv=ctx.qinv_neg[limbs],
        dm=ctx.digit_mont[limbs],
    )


# -- transform bodies (called INSIDE shard_map; x blocks are local shards) --


def ntt_fwd_body(x: jnp.ndarray, t: ShardedNTT, axis: str = "coeff") -> jnp.ndarray:
    """Coeff rows [L, n1/C, n2] -> eval [L, n1/C (k1), n2 (k2)]. Two a2a."""
    q, qinv = t.q[:, None, None], t.qinv[:, None, None]
    x1 = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)
    a = _recombine(_digit_dot_left(t.wl, _to_digits(x1)), t.dm, q, qinv)
    b = mont_mul(a, t.tw, q, qinv)  # t.tw is the local j2 slice
    b2 = jax.lax.all_to_all(b, axis, split_axis=1, concat_axis=2, tiled=True)
    return _recombine(_digit_dot_right(_to_digits(b2), t.wr), t.dm, q, qinv)


def ntt_inv_body(e: jnp.ndarray, t: ShardedNTT, axis: str = "coeff") -> jnp.ndarray:
    """Eval [L, n1/C (k1), n2 (k2)] -> coeff rows [L, n1/C (j1), n2]. Two a2a.

    Uses the same inverse tables as the single-chip path; WLi is symmetric so
    the row-major contraction is the same sum in the same order (bit-exact).
    """
    q, qinv = t.q[:, None, None], t.qinv[:, None, None]
    a = _recombine(_digit_dot_right(_to_digits(e), t.wli), t.dm, q, qinv)
    b = mont_mul(a, t.twi_t, q, qinv)  # local k1 slice of TWi^T
    b2 = jax.lax.all_to_all(b, axis, split_axis=2, concat_axis=1, tiled=True)
    d = _recombine(_digit_dot_left(t.wri_t, _to_digits(b2)), t.dm, q, qinv)
    return jax.lax.all_to_all(d, axis, split_axis=1, concat_axis=2, tiled=True)


def _modular_allreduce(x: jnp.ndarray, q: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Exact mod-q sum across a mesh axis (raw psum would wrap uint32)."""
    parts = jax.lax.all_gather(x, axis)  # [D, ...]
    acc = parts[0]
    for i in range(1, parts.shape[0]):
        acc = add_mod(acc, parts[i], q)
    return acc


# ---------------------------------------------------------------------------
# Sharded key-switch bundle: group-parallel over the 'limb' axis
# ---------------------------------------------------------------------------


class ShardedKS(NamedTuple):
    """Key-switch + ModDown + rescale tables, gadget groups sharded on 'limb'.

    Groups are padded to gmax per limb-shard with zero tables (zero conv
    columns/keys contribute exact zeros through the modular MAC).
    """

    src_idx: jnp.ndarray  # i32[Dl, gmax, S]   q-limb index of each src column
    src_q: jnp.ndarray  # u32[Dl, gmax, S]
    src_qinv: jnp.ndarray  # u32[Dl, gmax, S]
    qhatinv: jnp.ndarray  # u32[Dl, gmax, S]   Montgomery (zero-padded)
    conv: jnp.ndarray  # u32[Dl, gmax, K+alpha, S] extended matrix, Montgomery
    key_b: jnp.ndarray  # u32[Dl, gmax, K+alpha, n1, n2] eval3d, Montgomery
    key_a: jnp.ndarray  # u32[Dl, gmax, K+alpha, n1, n2]
    p2q_qhatinv: jnp.ndarray  # u32[alpha]
    p2q_conv: jnp.ndarray  # u32[K, alpha]
    pinv: jnp.ndarray  # u32[K]
    p_q: jnp.ndarray  # u32[alpha]
    p_qinv: jnp.ndarray  # u32[alpha]
    qlast_mod: jnp.ndarray  # u32[K-1]
    qlast_inv: jnp.ndarray  # u32[K-1]
    bgv_negtinv: jnp.ndarray  # u32[1]    BGV ModSwitch (zeros for CKKS)
    bgv_t: jnp.ndarray  # u32[K-1]

    @staticmethod
    def spec():
        g = P("limb")
        return ShardedKS(
            src_idx=g, src_q=g, src_qinv=g, qhatinv=g, conv=g,
            key_b=P("limb", None, None, "coeff", None),
            key_a=P("limb", None, None, "coeff", None),
            p2q_qhatinv=P(), p2q_conv=P(), pinv=P(), p_q=P(), p_qinv=P(),
            qlast_mod=P(), qlast_inv=P(), bgv_negtinv=P(), bgv_t=P(),
        )


def _key_eval3d(key: jnp.ndarray, qp_idx: np.ndarray, n1: int, n2: int) -> jnp.ndarray:
    """[dnum, L_full, N] natural eval -> [dnum, K+alpha, n1, n2] sharded layout."""
    sel = key[:, qp_idx]
    return natural_to_eval3d(sel, n1, n2)


@functools.lru_cache(maxsize=None)
def _ks_host_tables(params: CKKSParams, level: int, n_limb: int):
    """Host-side padded group tables (indices + primes), cached."""
    ksc = make_ks_context(params, level)
    groups = ks_groups(params, level)
    dnum = len(groups)
    alpha = params.alpha
    gmax = math.ceil(dnum / n_limb)
    qs = params.q_primes[:level]

    src_idx = np.zeros((n_limb * gmax, alpha), dtype=np.int32)
    src_q = np.ones((n_limb * gmax, alpha), dtype=np.uint32)
    qhatinv = np.zeros((n_limb * gmax, alpha), dtype=np.uint32)
    conv = np.zeros(
        (n_limb * gmax, level + len(params.p_primes), alpha), dtype=np.uint32
    )
    for d, (d0, d1) in enumerate(groups):
        s = d1 - d0
        src_idx[d, :s] = np.arange(d0, d1)
        src_q[d, :s] = np.asarray(qs[d0:d1], dtype=np.uint32)
        qhatinv[d, :s] = np.asarray(ksc.modup_qhatinv[d])
        conv[d, :, :s] = np.asarray(ksc.modup_conv[d])
    shape = (n_limb, gmax)
    return (
        gmax,
        dnum,
        src_idx.reshape(*shape, alpha),
        src_q.reshape(*shape, alpha),
        qhatinv.reshape(*shape, alpha),
        conv.reshape(*shape, *conv.shape[1:]),
        ksc,
    )


def make_sharded_ks(
    params: CKKSParams, level: int, ksk: DeviceKSKey, n_limb: int
) -> tuple[ShardedKS, int]:
    """Build the ShardedKS bundle (device arrays) for a key at a level."""
    n1, n2 = fourstep_split(params.n)
    qp_idx = np.asarray(qp_indices(params, level))
    gmax, dnum, src_idx, src_q, qhatinv, conv, ksc = _ks_host_tables(
        params, level, n_limb
    )
    ctx = make_context(params)

    # keys carry the FULL-level gadget rows; only the level's active groups
    # participate (a truncated level can have fewer groups than key rows)
    kb = _key_eval3d(ksk.b_mont[:dnum], qp_idx, n1, n2)
    ka = _key_eval3d(ksk.a_mont[:dnum], qp_idx, n1, n2)
    pad = n_limb * gmax - dnum
    if pad:
        z = jnp.zeros((pad,) + kb.shape[1:], dtype=kb.dtype)
        kb = jnp.concatenate([kb, z], axis=0)
        ka = jnp.concatenate([ka, z], axis=0)
    kb = kb.reshape(n_limb, gmax, *kb.shape[1:])
    ka = ka.reshape(n_limb, gmax, *ka.shape[1:])

    alpha = len(params.p_primes)
    p_idx = np.arange(params.num_limbs, params.num_limbs + alpha)
    src_q_j = jnp.asarray(src_q)
    # -q^{-1} mod 2^32 for the (padded) src primes, computed host-side
    src_qinv = np.zeros_like(src_q)
    flat_q = src_q.reshape(-1)
    flat_inv = src_qinv.reshape(-1)
    for i, q in enumerate(flat_q):
        flat_inv[i] = (-pow(int(q), -1, 1 << 32)) % (1 << 32) if int(q) % 2 == 1 else 0

    return (
        ShardedKS(
            src_idx=jnp.asarray(src_idx),
            src_q=src_q_j,
            src_qinv=jnp.asarray(src_qinv),
            qhatinv=jnp.asarray(qhatinv),
            conv=jnp.asarray(conv),
            key_b=kb,
            key_a=ka,
            p2q_qhatinv=ksc.p2q_qhatinv,
            p2q_conv=ksc.p2q_conv,
            pinv=ksc.pinv_mont,
            p_q=ctx.q[p_idx],
            p_qinv=ctx.qinv_neg[p_idx],
            qlast_mod=ksc.qlast_mod,
            qlast_inv=ksc.qlast_inv_mont,
            bgv_negtinv=ksc.bgv_negtinv_mont,
            bgv_t=ksc.bgv_t_mont,
        ),
        gmax,
    )


# ---------------------------------------------------------------------------
# The sharded homomorphic-multiply program (tensor + relin + rescale)
# ---------------------------------------------------------------------------


def _keyswitch_body(
    d2: jnp.ndarray,
    t_q: ShardedNTT,
    t_qp: ShardedNTT,
    ks: ShardedKS,
    level: int,
    gmax: int,
):
    """Group-parallel hybrid key switch of eval3d d2 [K, n1/C, n2]."""
    kq = t_qp.q[:, None, None]
    kqinv = t_qp.qinv[:, None, None]

    d2_coeff = ntt_inv_body(d2, t_q)

    # my limb-shard's group tables (leading axis of size 1 under shard_map)
    src_idx = ks.src_idx[0]
    src_q = ks.src_q[0][..., None, None]
    src_qinv = ks.src_qinv[0][..., None, None]
    qhatinv = ks.qhatinv[0][..., None, None]
    conv = ks.conv[0]
    key_b, key_a = ks.key_b[0], ks.key_a[0]

    rs = []
    for g in range(gmax):
        x_src = jnp.take(d2_coeff, src_idx[g], axis=0)  # [S, n1/C, n2]
        v = mont_mul(x_src, qhatinv[g], src_q[g], src_qinv[g])
        # paired-REDC MAC for the base-conversion inner product (modops
        # mont_mac — canonical result, bit-identical to the eager chain)
        raised = mont_mac(
            [(v[i][None], conv[g, :, i][:, None, None])
             for i in range(v.shape[0])], kq, kqinv)
        rs.append(ntt_fwd_body(raised, t_qp))
    acc0 = mont_mac([(r, key_b[g]) for g, r in enumerate(rs)], kq, kqinv)
    acc1 = mont_mac([(r, key_a[g]) for g, r in enumerate(rs)], kq, kqinv)

    # exact modular reduction of the inner product across the limb axis
    acc0 = _modular_allreduce(acc0, kq, "limb")
    acc1 = _modular_allreduce(acc1, kq, "limb")

    # ModDown by P, back to the q-basis, NTT domain
    k = level
    qq = t_q.q[:, None, None]
    qqinv = t_q.qinv[:, None, None]
    out = []
    for acc in (acc0, acc1):
        coeff = ntt_inv_body(acc, t_qp)
        vp = mont_mul(
            coeff[k:],
            ks.p2q_qhatinv[:, None, None],
            ks.p_q[:, None, None],
            ks.p_qinv[:, None, None],
        )
        p_part = None
        for i in range(vp.shape[0]):
            term = mont_mul(vp[i][None], ks.p2q_conv[:, i][:, None, None], qq, qqinv)
            p_part = term if p_part is None else add_mod(p_part, term, qq)
        down = mont_mul(
            sub_mod(coeff[:k], p_part, qq), ks.pinv[:, None, None], qq, qqinv
        )
        out.append(ntt_fwd_body(down, t_q))
    return out[0], out[1]


def _mult_body(
    a0, a1, b0, b1, r2_q, t_q, t_qp, t_qm1, ks: ShardedKS, level: int, gmax: int,
    q_last_half: int, bgv: bool = False,
):
    """tensor -> relinearize -> rescale/modswitch, all sharded (eval3d blocks).

    bgv=True switches the final stage to the t-corrected BGV ModSwitch; the
    key-switch ModDown is BGV-corrected transparently through the tables
    (primitives/rns.py make_ks_context).
    """
    q = t_q.q[:, None, None]
    qinv = t_q.qinv[:, None, None]
    r2 = r2_q[:, None, None]

    d0 = mul_mod(a0, b0, q, qinv, r2)
    d1 = add_mod(mul_mod(a0, b1, q, qinv, r2), mul_mod(a1, b0, q, qinv, r2), q)
    d2 = mul_mod(a1, b1, q, qinv, r2)

    ks0, ks1 = _keyswitch_body(d2, t_q, t_qp, ks, level, gmax)
    c0 = add_mod(d0, ks0, q)
    c1 = add_mod(d1, ks1, q)

    # rescale by q_last (coefficient domain)
    k = level
    qm = t_qm1.q[:, None, None]
    qminv = t_qm1.qinv[:, None, None]
    q_last = t_q.q[k - 1]
    q_last_inv = t_q.qinv[k - 1]
    out = []
    for comp in (c0, c1):
        coeff = ntt_inv_body(comp, t_q)
        last = coeff[k - 1]
        if bgv:
            # u = [-x t^{-1}]_{q_last}; out = (x + t*centered(u)) / q_last
            u = mont_mul(last, ks.bgv_negtinv[0], q_last, q_last_inv)
            r = barrett_reduce_u32(u[None], qm)
            lifted = jnp.where(
                u[None] > jnp.uint32(q_last_half),
                sub_mod(r, ks.qlast_mod[:, None, None], qm),
                r,
            )
            term = mont_mul(lifted, ks.bgv_t[:, None, None], qm, qminv)
            down = mont_mul(
                add_mod(coeff[: k - 1], term, qm),
                ks.qlast_inv[:, None, None], qm, qminv,
            )
        else:
            r = barrett_reduce_u32(last[None], qm)
            lifted = jnp.where(
                last[None] > jnp.uint32(q_last_half),
                sub_mod(r, ks.qlast_mod[:, None, None], qm),
                r,
            )
            down = mont_mul(
                sub_mod(coeff[: k - 1], lifted, qm),
                ks.qlast_inv[:, None, None], qm, qminv,
            )
        out.append(ntt_fwd_body(down, t_qm1))
    return out[0], out[1]


@functools.lru_cache(maxsize=None)
def make_sharded_mult(params: CKKSParams, level: int, mesh: Mesh):
    """Compile the sharded tensor+relin+rescale step for a mesh.

    Returns (fn, prepare) where prepare(rlk) builds the operand bundle and
    fn(a0, a1, b0, b1, bundle) maps eval3d-sharded ciphertext components
    [K, n1, n2] -> two [K-1, n1, n2] components.
    """
    n_limb = mesh.shape["limb"]
    n1, n2 = fourstep_split(params.n)
    ctx = make_context(params)
    k = level
    qp_idx = np.asarray(qp_indices(params, level))
    t_full = full_ntt_tables(params)  # ONE shared set across all programs
    idx_q = jnp.arange(k, dtype=jnp.int32)
    idx_qp = jnp.asarray(qp_idx, dtype=jnp.int32)
    idx_qm1 = jnp.arange(k - 1, dtype=jnp.int32)
    r2_q = ctx.r2[:k]
    q_last_half = int(params.q_primes[k - 1]) // 2

    def prepare(ksk: DeviceKSKey):
        ks, gmax = make_sharded_ks(params, level, ksk, n_limb)
        assert gmax == math.ceil(len(ks_groups(params, level)) / n_limb)
        return (ks, gmax)

    ct_spec = P(None, "coeff", None)
    gmax_static = math.ceil(len(ks_groups(params, level)) / n_limb)

    bgv = bool(params.plain_modulus)

    def body(a0, a1, b0, b1, r2_q, t_q, t_qp, t_qm1, ks):
        return _mult_body(
            a0, a1, b0, b1, r2_q, t_q, t_qp, t_qm1, ks, level, gmax_static,
            q_last_half, bgv,
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            ct_spec, ct_spec, ct_spec, ct_spec,
            P(),
            ShardedNTT.spec(), ShardedNTT.spec(), ShardedNTT.spec(),
            ShardedKS.spec(),
        ),
        out_specs=(ct_spec, ct_spec),
        check_vma=False,
    )

    def outer(a0, a1, b0, b1, r2_q, t_full, idx_q, idx_qp, idx_qm1, ks):
        return fn(a0, a1, b0, b1, r2_q,
                  gather_ntt_tables(t_full, idx_q),
                  gather_ntt_tables(t_full, idx_qp),
                  gather_ntt_tables(t_full, idx_qm1), ks)

    jit_fn = jax.jit(outer)

    def run(a0, a1, b0, b1, bundle):
        ks, _gmax = bundle
        return jit_fn(a0, a1, b0, b1, r2_q, t_full, idx_q, idx_qp, idx_qm1,
                      ks)

    return run, prepare


# ---------------------------------------------------------------------------
# Host helpers for moving single-chip ciphertexts onto the mesh
# ---------------------------------------------------------------------------


def shard_ct_component(x: jnp.ndarray, params: CKKSParams, mesh: Mesh) -> jnp.ndarray:
    """Natural-order eval [K, N] -> eval3d [K, n1, n2] sharded on the mesh."""
    n1, n2 = fourstep_split(params.n)
    e3 = natural_to_eval3d(x, n1, n2)
    return jax.device_put(e3, NamedSharding(mesh, P(None, "coeff", None)))


def unshard_ct_component(x: jnp.ndarray) -> jnp.ndarray:
    """Eval3d [K, n1, n2] (any sharding) -> natural-order eval [K, N] on host."""
    return eval3d_to_natural(jax.device_get(x))


# ---------------------------------------------------------------------------
# Sharded Galois rotation: eval-domain permutation + group-parallel key switch
# ---------------------------------------------------------------------------


def _perm_lin_e3(g: int, n1: int, n2: int) -> np.ndarray:
    """Row-major linear gather indices realizing the eval-domain automorphism
    in the [k1, k2] sharded layout: out.flat[q] = in.flat[lin[q]]."""
    from gpufhe_tpu.golden.ckks import automorphism_perm_eval

    n = n1 * n2
    perm = automorphism_perm_eval(g, n)  # natural order: out[k] = in[perm[k]]
    k1o, k2o = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    src = perm[k2o * n1 + k1o]  # natural eval index feeding out[k1o, k2o]
    return ((src % n1) * n2 + src // n1).astype(np.int32)  # [n1, n2] row-major


def _permute_body(x: jnp.ndarray, lin_local: jnp.ndarray) -> jnp.ndarray:
    """Apply the automorphism to eval3d blocks [L, n1/C, n2].

    v1 strategy: all_gather the coeff axis (the permutation is global), then
    each shard gathers its own output rows. Traffic is C x the ciphertext —
    still the right choice for FAN programs (R rotations share ONE gather:
    C x once beats 1 x R routing for R > C); single rotations use the
    all_to_all routing below (1 x traffic, _permute_body_v2).
    """
    full = jax.lax.all_gather(x, "coeff", axis=1, tiled=True)  # [L, n1, n2]
    L, n1, n2 = full.shape
    out = jnp.take(full.reshape(L, n1 * n2), lin_local.reshape(-1), axis=1)
    return out.reshape(L, lin_local.shape[0], n2)


def _perm_route_tables(g: int, n1: int, n2: int, n_coeff: int):
    """Host routing tables for the 1x-traffic automorphism (v2).

    In the eval3d layout the odd-exponent automorphism is ROW-PURE: output
    row k1o reads exactly one input row (src mod n1 depends only on k1o —
    write k = k2*n1 + k1, then g(2k+1) = g(2k1+1) + 2*n1*g*k2, so
    src = (g(2k+1)-1)/2 == (g(2k1+1)-1)/2 (mod n1)). Each source shard
    therefore sends, per destination shard, the <= n1/C rows that land
    there (placed at their output position, garbage elsewhere); one padded
    all_to_all moves exactly 1x the ciphertext (vs all_gather's C x), and
    the destination picks its p-th output row from the source shard that
    owns it.

    Returns (send_idx u32[C, C, B], src_of u32[C, B], col_idx i32[n1, n2]):
    send_idx[s, d, p] = source-local row index shard s places in the slot
    destination d reads for output row p; src_of[d, p] = which source shard
    that is; col_idx = the within-row column gather.
    """
    lin = _perm_lin_e3(g, n1, n2)  # [n1, n2] row-major global gather
    row_src = lin[:, 0] // n2
    assert (lin // n2 == row_src[:, None]).all(), (
        "automorphism not row-pure in eval3d layout"
    )
    col_idx = (lin % n2).astype(np.int32)
    b = n1 // n_coeff
    send_idx = np.zeros((n_coeff, n_coeff, b), dtype=np.int32)
    src_of = np.zeros((n_coeff, b), dtype=np.int32)
    for r_out in range(n1):
        r_in = int(row_src[r_out])
        s, d, p = r_in // b, r_out // b, r_out % b
        send_idx[s, d, p] = r_in % b
        src_of[d, p] = s
    return send_idx, src_of, col_idx


def _permute_body_v2(
    x: jnp.ndarray, send_idx_local: jnp.ndarray, src_of_local: jnp.ndarray,
    col_idx_local: jnp.ndarray,
) -> jnp.ndarray:
    """1x-traffic automorphism on eval3d blocks [L, B, n2] (see
    _perm_route_tables). send_idx_local [1, C, B] / src_of_local [1?, B] /
    col_idx_local [B, n2] arrive pre-sharded over 'coeff'."""
    L = x.shape[0]
    # stage rows for every destination: [L, C, B, n2]
    send = jnp.take(x, send_idx_local[0].reshape(-1), axis=1).reshape(
        L, send_idx_local.shape[1], send_idx_local.shape[2], x.shape[2]
    )
    buf = jax.lax.all_to_all(send, "coeff", split_axis=1, concat_axis=1,
                             tiled=True)  # [L, C(src), B, n2]
    # pick output row p from its owning source shard
    rows = jnp.take_along_axis(
        buf, src_of_local.reshape(1, 1, -1, 1).astype(jnp.int32), axis=1
    )[:, 0]  # [L, B, n2]
    # within-row column permutation
    return jnp.take_along_axis(rows, col_idx_local[None], axis=2)


# ---------------------------------------------------------------------------
# Fused sharded diagonal-fan stage: the mesh mirror of ct_diag_fan ("double
# hoisting"). One ModUp + NTT for the whole rotation fan, the raised gadget
# polys all_gathered over the coeff axis ONCE (R rotations then permute
# locally — for fan sizes R > C this moves strictly less data than ppermute
# routing each rotation, C x once vs 1 x R), plaintext MACs in the extended
# QP basis, ONE exact modular allreduce over the limb axis and ONE ModDown
# per output set, rescale fused in. Bit-exact vs golden ct_diag_fan.
# ---------------------------------------------------------------------------


def _key_stack_e3(ksk: DeviceKSKey, params: CKKSParams, level: int, n_limb: int):
    """Galois/relin key rows -> limb-sharded eval3d stacks (zero-padded)."""
    n1, n2 = fourstep_split(params.n)
    qp_idx = np.asarray(qp_indices(params, level))
    dnum = len(ks_groups(params, level))
    gmax = math.ceil(dnum / n_limb)
    kb = _key_eval3d(ksk.b_mont[:dnum], qp_idx, n1, n2)
    ka = _key_eval3d(ksk.a_mont[:dnum], qp_idx, n1, n2)
    pad = n_limb * gmax - dnum
    if pad:
        z = jnp.zeros((pad,) + kb.shape[1:], dtype=kb.dtype)
        kb = jnp.concatenate([kb, z], axis=0)
        ka = jnp.concatenate([ka, z], axis=0)
    return (
        kb.reshape(n_limb, gmax, *kb.shape[1:]),
        ka.reshape(n_limb, gmax, *ka.shape[1:]),
    )


@functools.lru_cache(maxsize=None)
def make_sharded_fan(
    params: CKKSParams,
    level: int,
    mesh: Mesh,
    n_offsets: int,
    nsets: int,
    pt0_mask: tuple,
):
    """Compile the fused diagonal-fan stage for a mesh.

    Returns (run, prepare): prepare(list_of_galois_keys) -> per-rotation key
    stacks; run(c0, c1, lins, key_stacks, pt_stacks, pt0s) -> list of
    (c0', c1') eval3d pairs at level - scale_words. `lins` are the
    [R, n1, n2] linear automorphism gather maps (_perm_lin_e3)."""
    n_limb = mesh.shape["limb"]
    n1, n2 = fourstep_split(params.n)
    ctx = make_context(params)
    k = level
    words = params.scale_words
    qp_idx = np.asarray(qp_indices(params, level))
    t_full = full_ntt_tables(params)
    idx_q = jnp.arange(k, dtype=jnp.int32)
    idx_qp = jnp.asarray(qp_idx, dtype=jnp.int32)
    idx_out = jnp.arange(k - words, dtype=jnp.int32)
    gmax = math.ceil(len(ks_groups(params, level)) / n_limb)
    ks0, _ = None, None  # shared tables built in prepare

    # per-rescale-word constants (coeff-domain chained rescale)
    resc = []
    for w in range(words):
        ksc_w = make_ks_context(params, level - w)
        lvl = level - w
        resc.append(
            (
                ctx.q[: lvl - 1],
                ctx.qinv_neg[: lvl - 1],
                ksc_w.qlast_mod,
                ksc_w.qlast_inv_mont,
                jnp.uint32(int(params.q_primes[lvl - 1]) // 2),
            )
        )
    resc = tuple(resc)

    def body(c0, c1, lins, t_q, t_qp, t_out, ks, resc, key_stacks, pt_stacks, pt0s):
        kq = t_qp.q[:, None, None]
        kqinv = t_qp.qinv[:, None, None]
        q = t_q.q[:, None, None]
        qinv = t_q.qinv[:, None, None]

        # hoist: decompose + ModUp + NTT once for the whole fan
        c1_coeff = ntt_inv_body(c1, t_q)
        src_idx = ks.src_idx[0]
        src_q = ks.src_q[0][..., None, None]
        src_qinv = ks.src_qinv[0][..., None, None]
        qhatinv = ks.qhatinv[0][..., None, None]
        conv = ks.conv[0]
        raised = []
        for g in range(gmax):
            x_src = jnp.take(c1_coeff, src_idx[g], axis=0)
            v = mont_mul(x_src, qhatinv[g], src_q[g], src_qinv[g])
            acc = None
            for i in range(v.shape[0]):
                term = mont_mul(v[i][None], conv[g, :, i][:, None, None], kq, kqinv)
                acc = term if acc is None else add_mod(acc, term, kq)
            raised.append(ntt_fwd_body(acc, t_qp))
        r_stack = jnp.stack(raised)  # [gmax, QP, B, n2]
        # gather the fan's shared operands ONCE (amortized over R rotations)
        full_r = jax.lax.all_gather(r_stack, "coeff", axis=2, tiled=True)
        full_c0 = jax.lax.all_gather(c0, "coeff", axis=1, tiled=True)
        qp_rows = full_r.shape[1]
        fr_flat = full_r.reshape(gmax, qp_rows, n1 * n2)
        fc0_flat = full_c0.reshape(k, n1 * n2)

        b_rows = c1.shape[1]
        # paired-REDC MACs at BOTH fan levels (modops mont_mac): the digit
        # inner product per offset, then the offset accumulation itself —
        # canonical results, bit-identical to the eager chain (ct.py
        # _diag_fan_core mirror)
        t0s, t1s, c0gs = [], [], []
        for j in range(n_offsets):
            lin = lins[j].reshape(-1)
            kb, ka = key_stacks[j]
            rgs = [jnp.take(fr_flat[g], lin, axis=1)
                   .reshape(qp_rows, b_rows, n2) for g in range(gmax)]
            t0s.append(mont_mac([(rg, kb[0][g]) for g, rg in enumerate(rgs)],
                                kq, kqinv))
            t1s.append(mont_mac([(rg, ka[0][g]) for g, rg in enumerate(rgs)],
                                kq, kqinv))
            c0gs.append(jnp.take(fc0_flat, lin, axis=1).reshape(k, b_rows, n2))
        acc0, acc1, c0acc = [], [], []
        for s in range(nsets):
            pts = [pt_stacks[s][j] for j in range(n_offsets)]  # [QP, B, n2]
            acc0.append(mont_mac(
                [(t0s[j], pts[j]) for j in range(n_offsets)], kq, kqinv))
            acc1.append(mont_mac(
                [(t1s[j], pts[j]) for j in range(n_offsets)], kq, kqinv))
            c0acc.append(mont_mac(
                [(c0gs[j], pts[j][:k]) for j in range(n_offsets)], q, qinv))

        outs = []
        for s in range(nsets):
            # ONE exact limb reduction + ONE ModDown for the whole fan
            a0 = _modular_allreduce(acc0[s], kq, "limb")
            a1 = _modular_allreduce(acc1[s], kq, "limb")
            down = []
            for acc in (a0, a1):
                coeff = ntt_inv_body(acc, t_qp)
                vp = mont_mul(
                    coeff[k:],
                    ks.p2q_qhatinv[:, None, None],
                    ks.p_q[:, None, None],
                    ks.p_qinv[:, None, None],
                )
                p_part = None
                for i in range(vp.shape[0]):
                    term = mont_mul(
                        vp[i][None], ks.p2q_conv[:, i][:, None, None], q, qinv
                    )
                    p_part = term if p_part is None else add_mod(p_part, term, q)
                down.append(
                    mont_mul(
                        sub_mod(coeff[:k], p_part, q), ks.pinv[:, None, None], q, qinv
                    )
                )
            e0 = c0acc[s]
            e1 = None
            if pt0_mask[s]:
                pt0 = pt0s[s][:k]
                e0 = add_mod(e0, mont_mul(c0, pt0, q, qinv), q)
                e1 = mont_mul(c1, pt0, q, qinv)
            cc0 = add_mod(down[0], ntt_inv_body(e0, t_q), q)
            cc1 = (
                down[1]
                if e1 is None
                else add_mod(down[1], ntt_inv_body(e1, t_q), q)
            )
            comps = []
            for cc in (cc0, cc1):
                lvl = k
                for qm_, qminv_, qlm, qli, qlh in resc:
                    qm = qm_[:, None, None]
                    qminv = qminv_[:, None, None]
                    last = cc[lvl - 1]
                    r = barrett_reduce_u32(last[None], qm)
                    lifted = jnp.where(
                        last[None] > qlh, sub_mod(r, qlm[:, None, None], qm), r
                    )
                    cc = mont_mul(
                        sub_mod(cc[: lvl - 1], lifted, qm),
                        qli[:, None, None], qm, qminv,
                    )
                    lvl -= 1
                comps.append(ntt_fwd_body(cc, t_out))
            outs.append((comps[0], comps[1]))
        return tuple(outs)

    ct_spec = P(None, "coeff", None)
    key_spec = tuple(
        (P("limb", None, None, "coeff", None), P("limb", None, None, "coeff", None))
        for _ in range(n_offsets)
    )
    pt_spec = tuple(P(None, None, "coeff", None) for _ in range(nsets))
    pt0_spec = tuple(
        ct_spec if has else None for has in pt0_mask
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            ct_spec, ct_spec, P(None, "coeff", None),
            ShardedNTT.spec(), ShardedNTT.spec(), ShardedNTT.spec(),
            ShardedKS.spec(), tuple((P(), P(), P(), P(), P()) for _ in resc),
            key_spec, pt_spec, pt0_spec,
        ),
        out_specs=tuple((ct_spec, ct_spec) for _ in range(nsets)),
        check_vma=False,
    )

    def outer(c0, c1, lins, t_full, idx_q, idx_qp, idx_out, ks, resc,
              key_stacks, pt_stacks, pt0s):
        return fn(c0, c1, lins,
                  gather_ntt_tables(t_full, idx_q),
                  gather_ntt_tables(t_full, idx_qp),
                  gather_ntt_tables(t_full, idx_out),
                  ks, resc, key_stacks, pt_stacks, pt0s)

    jit_fn = jax.jit(outer)

    def prepare(gk_list, any_key):
        shared, _ = make_sharded_ks(params, level, any_key, n_limb)
        # the body reads keys from the per-rotation stacks; drop the bundle's
        # own (unused) key planes so they are not shipped into the program
        stub = jnp.zeros((n_limb, 1, 1, n1, 1), dtype=jnp.uint32)
        shared = shared._replace(key_b=stub, key_a=stub)
        stacks = tuple(
            _key_stack_e3(gk, params, level, n_limb) for gk in gk_list
        )
        return shared, stacks

    def run(c0, c1, lins, bundle, pt_stacks, pt0s):
        shared, stacks = bundle
        return jit_fn(
            c0, c1, lins, t_full, idx_q, idx_qp, idx_out, shared, resc,
            stacks, tuple(pt_stacks), tuple(pt0s),
        )

    return run, prepare


@functools.lru_cache(maxsize=None)
def make_sharded_hoisted_fan(
    params: CKKSParams, level: int, mesh: Mesh, n_offsets: int
):
    """Hoisted rotation fan: MANY rotations of one ciphertext, ONE program.

    The mesh mirror of ct_rotate_hoisted (ciphertext/ct.py): decompose +
    ModUp + NTT of c1 happens ONCE for the whole fan, the raised gadget
    polys and c0 are all_gathered over the coeff axis ONCE, then each
    rotation is a local permuted MAC + its own exact limb allreduce +
    ModDown. Outputs stay at `level` (no plaintext MACs, no rescale —
    the general-purpose backend rotate_hoisted path; the diagonal-fan
    stage with folded plaintexts is make_sharded_fan).

    Returns (run, prepare): prepare(gk_list) -> bundle;
    run(c0, c1, lins, bundle) -> list of (c0', c1') eval3d pairs.
    """
    n_limb = mesh.shape["limb"]
    n1, n2 = fourstep_split(params.n)
    ctx = make_context(params)
    k = level
    qp_idx = np.asarray(qp_indices(params, level))
    t_full = full_ntt_tables(params)
    idx_q = jnp.arange(k, dtype=jnp.int32)
    idx_qp = jnp.asarray(qp_idx, dtype=jnp.int32)
    gmax = math.ceil(len(ks_groups(params, level)) / n_limb)

    def body(c0, c1, lins, t_q, t_qp, ks, key_stacks):
        kq = t_qp.q[:, None, None]
        kqinv = t_qp.qinv[:, None, None]
        q = t_q.q[:, None, None]
        qinv = t_q.qinv[:, None, None]

        # hoist: decompose + ModUp + NTT once for the whole fan
        c1_coeff = ntt_inv_body(c1, t_q)
        src_idx = ks.src_idx[0]
        src_q = ks.src_q[0][..., None, None]
        src_qinv = ks.src_qinv[0][..., None, None]
        qhatinv = ks.qhatinv[0][..., None, None]
        conv = ks.conv[0]
        raised = []
        for g in range(gmax):
            x_src = jnp.take(c1_coeff, src_idx[g], axis=0)
            v = mont_mul(x_src, qhatinv[g], src_q[g], src_qinv[g])
            acc = None
            for i in range(v.shape[0]):
                term = mont_mul(v[i][None], conv[g, :, i][:, None, None], kq, kqinv)
                acc = term if acc is None else add_mod(acc, term, kq)
            raised.append(ntt_fwd_body(acc, t_qp))
        r_stack = jnp.stack(raised)  # [gmax, QP, B, n2]
        full_r = jax.lax.all_gather(r_stack, "coeff", axis=2, tiled=True)
        full_c0 = jax.lax.all_gather(c0, "coeff", axis=1, tiled=True)
        qp_rows = full_r.shape[1]
        fr_flat = full_r.reshape(gmax, qp_rows, n1 * n2)
        fc0_flat = full_c0.reshape(k, n1 * n2)
        b_rows = c1.shape[1]

        outs = []
        for j in range(n_offsets):
            lin = lins[j].reshape(-1)
            kb, ka = key_stacks[j]
            # paired-REDC MAC (modops mont_mac): canonical, bit-identical
            rgs = [jnp.take(fr_flat[g], lin, axis=1)
                   .reshape(qp_rows, b_rows, n2) for g in range(gmax)]
            t0 = mont_mac([(rg, kb[0][g]) for g, rg in enumerate(rgs)],
                          kq, kqinv)
            t1 = mont_mac([(rg, ka[0][g]) for g, rg in enumerate(rgs)],
                          kq, kqinv)
            a0 = _modular_allreduce(t0, kq, "limb")
            a1 = _modular_allreduce(t1, kq, "limb")
            down = []
            for acc in (a0, a1):
                coeff = ntt_inv_body(acc, t_qp)
                vp = mont_mul(
                    coeff[k:],
                    ks.p2q_qhatinv[:, None, None],
                    ks.p_q[:, None, None],
                    ks.p_qinv[:, None, None],
                )
                p_part = None
                for i in range(vp.shape[0]):
                    term = mont_mul(
                        vp[i][None], ks.p2q_conv[:, i][:, None, None], q, qinv
                    )
                    p_part = term if p_part is None else add_mod(p_part, term, q)
                down.append(
                    ntt_fwd_body(
                        mont_mul(
                            sub_mod(coeff[:k], p_part, q),
                            ks.pinv[:, None, None], q, qinv,
                        ),
                        t_q,
                    )
                )
            c0g = jnp.take(fc0_flat, lin, axis=1).reshape(k, b_rows, n2)
            outs.append((add_mod(c0g, down[0], q), down[1]))
        return tuple(outs)

    ct_spec = P(None, "coeff", None)
    key_spec = tuple(
        (P("limb", None, None, "coeff", None), P("limb", None, None, "coeff", None))
        for _ in range(n_offsets)
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            ct_spec, ct_spec, P(None, "coeff", None),
            ShardedNTT.spec(), ShardedNTT.spec(), ShardedKS.spec(),
            key_spec,
        ),
        out_specs=tuple((ct_spec, ct_spec) for _ in range(n_offsets)),
        check_vma=False,
    )

    def outer(c0, c1, lins, t_full, idx_q, idx_qp, ks, key_stacks):
        return fn(c0, c1, lins,
                  gather_ntt_tables(t_full, idx_q),
                  gather_ntt_tables(t_full, idx_qp), ks, key_stacks)

    jit_fn = jax.jit(outer)

    def prepare(gk_list):
        shared, _ = make_sharded_ks(params, level, gk_list[0], n_limb)
        stub = jnp.zeros((n_limb, 1, 1, n1, 1), dtype=jnp.uint32)
        shared = shared._replace(key_b=stub, key_a=stub)
        stacks = tuple(_key_stack_e3(gk, params, level, n_limb) for gk in gk_list)
        return shared, stacks

    def run(c0, c1, lins, bundle):
        shared, stacks = bundle
        return jit_fn(c0, c1, lins, t_full, idx_q, idx_qp, shared, stacks)

    return run, prepare


@functools.lru_cache(maxsize=None)
def make_sharded_rotation(params: CKKSParams, level: int, mesh: Mesh, steps: int):
    """Compile the sharded rotate-by-`steps` (automorphism + key switch).

    Returns (run, prepare): prepare(galois_key) builds the bundle;
    run(c0, c1, bundle) on eval3d-sharded components. Bit-exact vs the
    single-chip ct_rotate.
    """
    from gpufhe_tpu.golden.ckks import galois_exponent

    return _make_sharded_galois(params, level, mesh, galois_exponent(steps, params.n))


@functools.lru_cache(maxsize=None)
def make_sharded_conjugation(params: CKKSParams, level: int, mesh: Mesh):
    """Sharded complex conjugation (the 2N-1 automorphism + key switch)."""
    return _make_sharded_galois(params, level, mesh, 2 * params.n - 1)


@functools.lru_cache(maxsize=None)
def _make_sharded_galois(params: CKKSParams, level: int, mesh: Mesh, g: int):
    n_limb = mesh.shape["limb"]
    n_coeff = mesh.shape["coeff"]
    n1, n2 = fourstep_split(params.n)
    ctx = make_context(params)
    k = level
    qp_idx = np.asarray(qp_indices(params, level))
    t_full = full_ntt_tables(params)
    idx_q = jnp.arange(k, dtype=jnp.int32)
    idx_qp = jnp.asarray(qp_idx, dtype=jnp.int32)
    send_idx, src_of, col_idx = _perm_route_tables(g, n1, n2, n_coeff)
    send_idx = jnp.asarray(send_idx)
    src_of = jnp.asarray(src_of)
    col_idx = jnp.asarray(col_idx)
    gmax_static = math.ceil(len(ks_groups(params, level)) / n_limb)

    ct_spec = P(None, "coeff", None)

    def body(c0, c1, send_idx, src_of, col_idx, t_q, t_qp, ks):
        q = t_q.q[:, None, None]
        # 1x-traffic routed automorphism (v2): all_to_all instead of the
        # fan paths' shared all_gather
        c0g = _permute_body_v2(c0, send_idx, src_of[0], col_idx)
        c1g = _permute_body_v2(c1, send_idx, src_of[0], col_idx)
        ks0, ks1 = _keyswitch_body(c1g, t_q, t_qp, ks, level, gmax_static)
        return add_mod(c0g, ks0, q), ks1

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            ct_spec, ct_spec,
            P("coeff", None, None), P("coeff", None), P("coeff", None),
            ShardedNTT.spec(), ShardedNTT.spec(), ShardedKS.spec(),
        ),
        out_specs=(ct_spec, ct_spec),
        check_vma=False,
    )

    def outer(c0, c1, send_idx, src_of, col_idx, t_full, idx_q, idx_qp, ks):
        return fn(c0, c1, send_idx, src_of, col_idx,
                  gather_ntt_tables(t_full, idx_q),
                  gather_ntt_tables(t_full, idx_qp), ks)

    jit_fn = jax.jit(outer)

    def prepare(gk: DeviceKSKey):
        return make_sharded_ks(params, level, gk, n_limb)

    def run(c0, c1, bundle):
        ks, _ = bundle
        return jit_fn(c0, c1, send_idx, src_of, col_idx, t_full, idx_q,
                      idx_qp, ks)

    return run, prepare
