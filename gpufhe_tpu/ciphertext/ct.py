"""Ciphertext-level operations (device, jitted): the top layer of the stack.

This is the layer the reference sketches as ` polynomial.py` — a single
`poly_add` that computes both component sums and then drops them (reference
 polynomial.py:3-5 returns None; SURVEY.md §2.1 item 8). Here the full
ciphertext algebra is real and jitted end-to-end: add/sub, ct-ct tensor +
relinearize, rescale, plaintext multiply, Galois rotation and conjugation —
each bit-exact against the golden pipeline (golden/ckks.py) per the
BASELINE.json:5 limb-trace contract.

Representation: NTT (evaluation) domain at rest, uint32[K, N] canonical
residues per component, K = current level's active q-primes. `level` and the
frozen CKKSParams are *static* jit arguments — each level compiles its own
specialized executable (standard for leveled FHE; shapes stay static inside
each trace, as XLA requires).

Randomness for encryption is sampled host-side from an explicit numpy
Generator so golden and device runs share identical samples (keys/keys.py).
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.keys.keys import DeviceKSKey, DevicePublicKey, DeviceSecretKey
from gpufhe_tpu.ops.context import Context
from gpufhe_tpu.ops.modops import add_mod, mont_mac, mont_mul, mul_mod, sub_mod
from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from gpufhe_tpu.params.params import CKKSParams
from gpufhe_tpu.primitives.keyswitch import key_switch_core
from gpufhe_tpu.primitives.rns import KSContext, make_ks_context, rescale


@dataclasses.dataclass
class Ciphertext:
    """Device ciphertext: list of u32[K, N] components, NTT domain."""

    c: list  # [c0, c1] (or [d0, d1, d2] post-tensor)
    level: int
    scale: float

    def primes(self, params: CKKSParams) -> tuple[int, ...]:
        return params.q_primes[: self.level]


# pytree registration: components are children, (level, scale) is static
# aux data — lets backend.FusedPipeline trace compositions over arbitrary
# Ciphertext structures (dicts of basis polynomials, ct pairs, ...)
jax.tree_util.register_pytree_node(
    Ciphertext,
    lambda ct: (tuple(ct.c), (ct.level, ct.scale)),
    lambda aux, cs: Ciphertext(list(cs), aux[0], aux[1]),
)


def _qb(ctx: Context, level: int):
    return ctx.q[:level][:, None], ctx.qinv_neg[:level][:, None]


# ---------------------------------------------------------------------------
# jitted cores (params, level static)
#
# Raw-core mode (backend.FusedPipeline): when a whole backend composition is
# traced into ONE program, the per-op jit wrappers must be bypassed —
# concrete arrays (keys, NTT tables, plaintexts) passed into a NESTED pjit
# call get captured as literals inside its sub-computation, where
# jax.closure_convert cannot hoist them (measured: one mult program balloons
# to 254 MB of HLO proto). Calling the undecorated bodies instead surfaces
# every such array as an outer-jaxpr constant -> hoisted to a parameter.
# ---------------------------------------------------------------------------

_RAW_CORES = False


@contextlib.contextmanager
def raw_cores():
    """Trace core bodies inline (no nested pjit) — see note above."""
    global _RAW_CORES
    prev = _RAW_CORES
    _RAW_CORES = True
    try:
        yield
    finally:
        _RAW_CORES = prev


def _core(jitted):
    """The jitted core, or its undecorated body in raw-core mode."""
    return jitted.__wrapped__ if _RAW_CORES else jitted


@functools.partial(jax.jit, static_argnums=(3,))
def _add_core(ca, cb, ctx, level):
    q = ctx.q[:level][:, None]
    return tuple(add_mod(x, y, q) for x, y in zip(ca, cb))


@functools.partial(jax.jit, static_argnums=(3,))
def _sub_core(ca, cb, ctx, level):
    q = ctx.q[:level][:, None]
    return tuple(sub_mod(x, y, q) for x, y in zip(ca, cb))


@functools.partial(jax.jit, static_argnums=(3,))
def _tensor_core(ca, cb, ctx, level):
    """(a0,a1) x (b0,b1) -> (d0,d1,d2), NTT-domain pointwise (golden ct_tensor)."""
    q, qinv = _qb(ctx, level)
    r2 = ctx.r2[:level][:, None]
    a0, a1 = ca
    b0, b1 = cb
    # one-sided Montgomery lift: 2 to_mont + 4 mont_mul (6 elementwise
    # passes) instead of 4 mul_mod (8); results canonical and bit-identical
    b0m = mont_mul(b0, r2, q, qinv)
    b1m = mont_mul(b1, r2, q, qinv)
    d0 = mont_mul(a0, b0m, q, qinv)
    d1 = add_mod(mont_mul(a0, b1m, q, qinv), mont_mul(a1, b0m, q, qinv), q)
    d2 = mont_mul(a1, b1m, q, qinv)
    return d0, d1, d2


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _relin_core(cs, ctx, ksc, rlk, params, level, d2_coeff=False):
    """d2_coeff=True: cs[2] arrives in COEFFICIENT domain (the BFV BEHZ
    tensor hands it over pre-NTT, cancelling an NTT+iNTT pair exactly —
    ciphertext/bfv.py ct_mul)."""
    d0, d1, d2 = cs
    q = ctx.q[:level][:, None]
    ks0, ks1 = key_switch_core(d2, params, level, ctx, ksc, rlk,
                               eval_in=not d2_coeff)
    return add_mod(d0, ks0, q), add_mod(d1, ks1, q)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _rescale_core(cs, ctx, ksc, params, level):
    q_idx = list(range(level))
    out = []
    for comp in cs:
        coeff = ntt_inv(comp, ctx, limbs=q_idx)
        down = rescale(coeff, params, level, ctx, ksc)
        out.append(ntt_fwd(down, ctx, limbs=q_idx[:-1]))
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _galois_core(cs, perm, ctx, ksc, gk, params, level):
    """Automorphism permutation in eval domain + key switch of c1 (golden
    ct_rotate / ct_conjugate)."""
    c0, c1 = cs
    q = ctx.q[:level][:, None]
    c0g = jnp.take(c0, perm, axis=1)
    c1g = jnp.take(c1, perm, axis=1)
    ks0, ks1 = key_switch_core(c1g, params, level, ctx, ksc, gk)
    return add_mod(c0g, ks0, q), ks1


@functools.partial(jax.jit, static_argnums=(3,))
def _mul_plain_core(cs, pt_mont, ctx, level):
    q, qinv = _qb(ctx, level)
    return tuple(mont_mul(x, pt_mont[:level], q, qinv) for x in cs)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _encrypt_core(pt_pe0, v_rns, e1_rns, pk, ctx, params, level):
    """c0 = pk.b*v + NTT(pt + e0), c1 = pk.a*v + NTT(e1) (golden encrypt)."""
    q_idx = list(range(level))
    q, qinv = _qb(ctx, level)
    v_ntt = ntt_fwd(v_rns, ctx, limbs=q_idx)
    m_ntt = ntt_fwd(pt_pe0, ctx, limbs=q_idx)
    e1_ntt = ntt_fwd(e1_rns, ctx, limbs=q_idx)
    c0 = add_mod(mont_mul(v_ntt, pk.b_mont[:level], q, qinv), m_ntt, q)
    c1 = add_mod(mont_mul(v_ntt, pk.a_mont[:level], q, qinv), e1_ntt, q)
    return c0, c1


@functools.partial(jax.jit, static_argnums=(3, 4))
def _decrypt_core(cs, s_mont, ctx, params, level):
    """iNTT( sum_k c_k * s^k ) — works for 2- and 3-component ciphertexts."""
    q, qinv = _qb(ctx, level)
    acc = cs[0]
    s_pow = s_mont[:level]  # s * R: mont_mul by it multiplies by s exactly
    for comp in cs[1:]:
        acc = add_mod(acc, mont_mul(comp, s_pow, q, qinv), q)
        s_pow = mont_mul(s_pow, s_mont[:level], q, qinv)  # stays in Montgomery form
    return ntt_inv(acc, ctx, limbs=list(range(level)))


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def ct_add(a: Ciphertext, b: Ciphertext, ctx: Context) -> Ciphertext:
    assert a.level == b.level and a.scale == b.scale and len(a.c) == len(b.c)
    return Ciphertext(list(_core(_add_core)(tuple(a.c), tuple(b.c), ctx, a.level)), a.level, a.scale)


def ct_sub(a: Ciphertext, b: Ciphertext, ctx: Context) -> Ciphertext:
    assert a.level == b.level and a.scale == b.scale and len(a.c) == len(b.c)
    return Ciphertext(list(_core(_sub_core)(tuple(a.c), tuple(b.c), ctx, a.level)), a.level, a.scale)


def ct_tensor(a: Ciphertext, b: Ciphertext, ctx: Context) -> Ciphertext:
    assert a.level == b.level and len(a.c) == 2 and len(b.c) == 2
    return Ciphertext(
        list(_tensor_core(tuple(a.c), tuple(b.c), ctx, a.level)),
        a.level,
        a.scale * b.scale,
    )


def ct_relinearize(
    ct: Ciphertext, params: CKKSParams, ctx: Context, rlk: DeviceKSKey
) -> Ciphertext:
    assert len(ct.c) == 3
    ksc = make_ks_context(params, ct.level)
    return Ciphertext(
        list(_relin_core(tuple(ct.c), ctx, ksc, rlk, params, ct.level)),
        ct.level,
        ct.scale,
    )


def ct_rescale(ct: Ciphertext, params: CKKSParams, ctx: Context) -> Ciphertext:
    ksc = make_ks_context(params, ct.level)
    new = list(_core(_rescale_core)(tuple(ct.c), ctx, ksc, params, ct.level))
    return Ciphertext(new, ct.level - 1, ct.scale / params.q_primes[ct.level - 1])


def ct_mul(
    a: Ciphertext, b: Ciphertext, params: CKKSParams, ctx: Context, rlk: DeviceKSKey
) -> Ciphertext:
    """Full homomorphic multiply: tensor -> relinearize -> rescale."""
    return ct_rescale(ct_relinearize(ct_tensor(a, b, ctx), params, ctx, rlk), params, ctx)


@functools.partial(jax.jit, static_argnums=(5,))
def _mul_full_core(ca, cb, ctx, kscs, rlk, params):
    """Tensor + relinearize + scale_words rescales as ONE program.

    Bit-exact vs ct_rescale^w(ct_relinearize(ct_tensor(a, b))): the NTT/iNTT
    round trips between the chained rescales cancel exactly mod q, so the
    rescales run back-to-back in coefficient domain. One dispatch instead of
    2 + scale_words — the polynomial evaluators (polyeval.py, bootstrap.py
    EvalMod) issue hundreds of multiplies per bootstrap, and per-dispatch
    overhead dominated their steady-state time at N=2^16.
    """
    level = ca[0].shape[0]
    q, qinv = _qb(ctx, level)
    r2 = ctx.r2[:level][:, None]
    a0, a1 = ca
    b0, b1 = cb
    # one-sided Montgomery lift: 2 to_mont + 4 mont_mul (6 elementwise
    # passes) instead of 4 mul_mod (8); results canonical and bit-identical
    b0m = mont_mul(b0, r2, q, qinv)
    b1m = mont_mul(b1, r2, q, qinv)
    d0 = mont_mul(a0, b0m, q, qinv)
    d1 = add_mod(mont_mul(a0, b1m, q, qinv), mont_mul(a1, b0m, q, qinv), q)
    d2 = mont_mul(a1, b1m, q, qinv)
    # coefficient-domain key-switch output: d_i + NTT(ks_i) would be iNTT'd
    # right back for the rescale chain — add iNTT(d_i) + ks_i instead, which
    # is limb-bit-exact by modular linearity and saves a 2k-limb-transform
    # round trip per mult (measured ~10% of mult traffic at L=30/48)
    # joint fence before the Pallas NTT consumers: XLA's cross-boundary
    # optimization between a shared-input elementwise fusion and the custom
    # calls is harmful (primitives/keyswitch.py fence note, round-4 seam
    # bisect; same shared-producer shape here: d0/d1/d2 all read a0/a1/b*m)
    from gpufhe_tpu.primitives.keyswitch import fence_enabled

    if fence_enabled(params.dnum):
        d0, d1, d2 = jax.lax.optimization_barrier((d0, d1, d2))
    ks0, ks1 = key_switch_core(
        d2, params, level, ctx, kscs[0], rlk, eval_out=False
    )
    from gpufhe_tpu.primitives.rns import rescale as rescale_coeff

    out = []
    for d, ks in ((d0, ks0), (d1, ks1)):
        cc = add_mod(ntt_inv(d, ctx, limbs=list(range(level))), ks, q)
        lvl = level
        for w in range(params.scale_words):
            cc = rescale_coeff(cc, params, lvl, ctx, kscs[w])
            lvl -= 1
        out.append(ntt_fwd(cc, ctx, limbs=list(range(lvl))))
    return tuple(out)


def ct_mul_full(
    a: Ciphertext, b: Ciphertext, params: CKKSParams, ctx: Context, rlk: DeviceKSKey
) -> Ciphertext:
    """Homomorphic multiply incl. scale_words rescales, fused into one jit."""
    assert a.level == b.level and len(a.c) == 2 and len(b.c) == 2
    kscs = tuple(
        make_ks_context(params, a.level - w) for w in range(params.scale_words)
    )
    out = _core(_mul_full_core)(tuple(a.c), tuple(b.c), ctx, kscs, rlk, params)
    scale = a.scale * b.scale
    lvl = a.level
    for _ in range(params.scale_words):
        scale = scale / params.q_primes[lvl - 1]
        lvl -= 1
    return Ciphertext(list(out), lvl, scale)


@functools.partial(jax.jit, static_argnums=(5,))
def _plain_mac_core(cs_list, pts, const_ntt, ctx, kscs, params):
    """sum_i pt_i * ct_i, rescaled scale_words times, plus a constant: ONE
    program. Bit-exact vs the generic mul_plain/add/rescale/add_plain chain
    (modular ops are order-independent; the NTT/iNTT round trips between
    chained rescales cancel exactly)."""
    from gpufhe_tpu.primitives.rns import rescale as rescale_coeff

    level = cs_list[0][0].shape[0]
    q, qinv = _qb(ctx, level)
    from gpufhe_tpu.primitives.keyswitch import _packed_mac

    if _packed_mac():
        # paired-REDC lazy MAC — [0, 2q) accumulators; the iNTT of the
        # rescale chain below canonicalizes (ops/modops.py mont_mac)
        acc0 = mont_mac([(c0, pt) for (c0, _c1), pt in zip(cs_list, pts)],
                        q, qinv)
        acc1 = mont_mac([(c1, pt) for (_c0, c1), pt in zip(cs_list, pts)],
                        q, qinv)
    else:
        acc0 = acc1 = None
        for (c0, c1), pt in zip(cs_list, pts):
            t0 = mont_mul(c0, pt, q, qinv)
            t1 = mont_mul(c1, pt, q, qinv)
            acc0 = t0 if acc0 is None else add_mod(acc0, t0, q)
            acc1 = t1 if acc1 is None else add_mod(acc1, t1, q)
    # joint fence before the Pallas iNTTs (shared-producer elementwise MAC;
    # primitives/keyswitch.py fence note)
    from gpufhe_tpu.primitives.keyswitch import fence_enabled

    if fence_enabled(params.dnum):
        import jax as _jax

        acc0, acc1 = _jax.lax.optimization_barrier((acc0, acc1))
    out = []
    for comp in (acc0, acc1):
        cc = ntt_inv(comp, ctx, limbs=list(range(level)))
        lvl = level
        for w in range(params.scale_words):
            cc = rescale_coeff(cc, params, lvl, ctx, kscs[w])
            lvl -= 1
        out.append(ntt_fwd(cc, ctx, limbs=list(range(lvl))))
    if const_ntt is not None:
        qf = ctx.q[:lvl][:, None]
        out[0] = add_mod(out[0], const_ntt, qf)
    return tuple(out)


def ct_plain_mac(
    cts: list,
    pt_monts: list,
    const_ntt,
    params: CKKSParams,
    ctx: Context,
    out_scale: float,
) -> Ciphertext:
    """Fused plaintext MAC fan (see _plain_mac_core); all cts at one level.

    out_scale is the (pre-rescale) product scale term0 carries in the generic
    path; the returned scale mirrors chained ct_rescale float arithmetic."""
    level = cts[0].level
    assert all(c.level == level and len(c.c) == 2 for c in cts)
    kscs = tuple(
        make_ks_context(params, level - w) for w in range(params.scale_words)
    )
    out = _core(_plain_mac_core)(
        tuple(tuple(c.c) for c in cts),
        tuple(pt[:level] for pt in pt_monts),
        const_ntt,
        ctx,
        kscs,
        params,
    )
    lvl = level
    for _ in range(params.scale_words):
        out_scale = out_scale / params.q_primes[lvl - 1]
        lvl -= 1
    return Ciphertext(list(out), lvl, out_scale)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _keyswitch_ct_core(cs, ctx, ksc, ksk, params, level):
    c0, c1 = cs
    q = ctx.q[:level][:, None]
    ks0, ks1 = key_switch_core(c1, params, level, ctx, ksc, ksk)
    return add_mod(c0, ks0, q), ks1


def ct_key_switch(
    ct: Ciphertext, params: CKKSParams, ctx: Context, ksk: DeviceKSKey
) -> Ciphertext:
    """Re-encrypt under ksk's key (golden ct_key_switch mirror; used by the
    sparse-secret encapsulation around bootstrap ModRaise)."""
    assert len(ct.c) == 2
    ksc = make_ks_context(params, ct.level)
    out = _keyswitch_ct_core(tuple(ct.c), ctx, ksc, ksk, params, ct.level)
    return Ciphertext(list(out), ct.level, ct.scale)


@functools.lru_cache(maxsize=None)
def _perm_dev(g: int, n: int) -> jnp.ndarray:
    return jnp.asarray(gckks.automorphism_perm_eval(g, n).astype(np.int32))


def ct_rotate(
    ct: Ciphertext, steps: int, params: CKKSParams, ctx: Context, gk: DeviceKSKey
) -> Ciphertext:
    """Rotate slots left by `steps`: Galois automorphism + key switch."""
    assert len(ct.c) == 2
    g = gckks.galois_exponent(steps, params.n)
    ksc = make_ks_context(params, ct.level)
    out = _galois_core(
        tuple(ct.c), _perm_dev(g, params.n), ctx, ksc, gk, params, ct.level
    )
    return Ciphertext(list(out), ct.level, ct.scale)


def ct_conjugate(
    ct: Ciphertext, params: CKKSParams, ctx: Context, ck: DeviceKSKey
) -> Ciphertext:
    assert len(ct.c) == 2
    g = 2 * params.n - 1
    ksc = make_ks_context(params, ct.level)
    out = _galois_core(
        tuple(ct.c), _perm_dev(g, params.n), ctx, ksc, ck, params, ct.level
    )
    return Ciphertext(list(out), ct.level, ct.scale)


def ct_mul_plain(
    ct: Ciphertext, pt_mont: jnp.ndarray, pt_scale: float, ctx: Context
) -> Ciphertext:
    """Multiply by an NTT-domain Montgomery-form plaintext (encoding/encoder.py)."""
    return Ciphertext(
        list(_core(_mul_plain_core)(tuple(ct.c), pt_mont, ctx, ct.level)),
        ct.level,
        ct.scale * pt_scale,
    )


def encrypt(
    pt_coeff: np.ndarray,
    params: CKKSParams,
    pk: DevicePublicKey,
    ctx: Context,
    rng: np.random.Generator,
    scale: float,
    level: int | None = None,
) -> Ciphertext:
    """Public-key encrypt a coefficient-domain plaintext int64[L, N].

    Host samples (identical to golden encrypt's draw order), device computes.
    """
    level = level if level is not None else params.num_limbs
    primes = params.q_primes[:level]
    n = params.n
    v = gckks.small_to_rns(gckks.sample_ternary(rng, n), primes)
    e0 = gckks.small_to_rns(gckks.sample_gauss(rng, n, params.sigma), primes)
    e1 = gckks.small_to_rns(gckks.sample_gauss(rng, n, params.sigma), primes)
    pt_pe0 = gckks.poly_add(pt_coeff[:level], e0, primes)
    u32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.uint32))
    c0, c1 = _encrypt_core(
        u32(pt_pe0), u32(v), u32(e1), pk, ctx, params, level
    )
    return Ciphertext([c0, c1], level, scale)


def decrypt_to_coeff(
    ct: Ciphertext, params: CKKSParams, sk: DeviceSecretKey, ctx: Context
) -> np.ndarray:
    """Decrypt to canonical coefficient-domain residues int64[K, N] (host)."""
    out = _decrypt_core(tuple(ct.c), sk.s_mont, ctx, params, ct.level)
    return np.asarray(out).astype(np.int64)


def decrypt_decode(
    ct: Ciphertext, params: CKKSParams, sk: DeviceSecretKey, ctx: Context
) -> np.ndarray:
    coeff = decrypt_to_coeff(ct, params, sk, ctx)
    return gckks.decode(coeff, ct.scale, ct.primes(params), params.n)


# ---------------------------------------------------------------------------
# Hoisted rotations (BASELINE.json:10 config 4) — device mirror of
# golden ct_rotate_hoisted: ONE decompose+ModUp+NTT, many automorphisms.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3, 4))
def _hoist_core(c1, ctx, ksc, params, level):
    """Raised gadget polys of c1 in NTT domain over the active QP basis."""
    from gpufhe_tpu.primitives.keyswitch import qp_indices
    from gpufhe_tpu.primitives.rns import mod_up

    q_idx = list(range(level))
    qp_idx = qp_indices(params, level)
    c1_coeff = ntt_inv(c1, ctx, limbs=q_idx)
    raised = mod_up(c1_coeff, params, level, ctx, ksc)
    return tuple(ntt_fwd(r, ctx, limbs=qp_idx) for r in raised)


@functools.partial(jax.jit, static_argnums=(6, 7))
def _hoisted_galois_core(raised, c0, perm, ctx, ksc, gk, params, level):
    from gpufhe_tpu.primitives.keyswitch import qp_indices
    from gpufhe_tpu.primitives.rns import mod_down

    qp_idx = np.asarray(qp_indices(params, level))
    q_idx = list(range(level))
    qp_q = ctx.q[qp_idx][:, None]
    qp_qinv = ctx.qinv_neg[qp_idx][:, None]
    q = ctx.q[:level][:, None]

    from gpufhe_tpu.primitives.keyswitch import _packed_mac, key_rows

    if _packed_mac():
        # paired-REDC lazy MAC — [0, 2q) accumulators; the iNTT below
        # canonicalizes (ops/modops.py mont_mac)
        rgs = [jnp.take(r, perm, axis=1) for r in raised]
        acc0 = mont_mac(
            [(rg, key_rows(gk.b_mont[d], params, level))
             for d, rg in enumerate(rgs)], qp_q, qp_qinv)
        acc1 = mont_mac(
            [(rg, key_rows(gk.a_mont[d], params, level))
             for d, rg in enumerate(rgs)], qp_q, qp_qinv)
    else:
        acc0 = acc1 = None
        for d, r in enumerate(raised):
            rg = jnp.take(r, perm, axis=1)
            t0 = mont_mul(rg, key_rows(gk.b_mont[d], params, level), qp_q, qp_qinv)
            t1 = mont_mul(rg, key_rows(gk.a_mont[d], params, level), qp_q, qp_qinv)
            acc0 = t0 if acc0 is None else add_mod(acc0, t0, qp_q)
            acc1 = t1 if acc1 is None else add_mod(acc1, t1, qp_q)

    # joint fence before the Pallas iNTTs (shared-producer MAC fusion;
    # primitives/keyswitch.py fence note)
    from gpufhe_tpu.primitives.keyswitch import fence_enabled

    if fence_enabled(params.dnum):
        acc0, acc1 = jax.lax.optimization_barrier((acc0, acc1))
    out = []
    for acc in (acc0, acc1):
        coeff = ntt_inv(acc, ctx, limbs=qp_idx)
        down = mod_down(coeff, params, level, ctx, ksc)
        out.append(ntt_fwd(down, ctx, limbs=q_idx))
    ks0, ks1 = out
    c0g = jnp.take(c0, perm, axis=1)
    return add_mod(c0g, ks0, q), ks1


def ct_rotate_hoisted(
    ct: Ciphertext,
    steps_list,
    params: CKKSParams,
    ctx: Context,
    gks: dict,
) -> list:
    """Rotate by many step counts sharing one decomposition (device).

    gks maps steps -> DeviceKSKey. Bit-exact vs golden ct_rotate_hoisted.
    """
    assert len(ct.c) == 2
    ksc = make_ks_context(params, ct.level)
    raised = _hoist_core(ct.c[1], ctx, ksc, params, ct.level)
    out = []
    for steps in steps_list:
        g = gckks.galois_exponent(steps, params.n)
        c0, c1 = _hoisted_galois_core(
            raised, ct.c[0], _perm_dev(g, params.n), ctx, ksc, gks[steps],
            params, ct.level,
        )
        out.append(Ciphertext([c0, c1], ct.level, ct.scale))
    return out


# ---------------------------------------------------------------------------
# Fused rotation-fan linear combination ("double hoisting") — ONE jitted
# program for a whole sparse-diagonal stage: hoist + every rotation's gadget
# MAC + plaintext MACs in the extended QP basis + ONE delayed ModDown per
# output + in-jit rescale. Device mirror of golden ct_diag_fan (bit-exact).
# This is the kernel behind fftboot.DiagPlan: it collapses the ~85 dispatches
# a factored-transform stage used to take into a single XLA program.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(7, 8))
def _diag_fan_core(cs, perm_stack, gk_list, pt_stacks, pt0s, ctx, kscs, params, level):
    """One grouped diagonal stage, fully fused.

    cs: (c0, c1) u32[K, N] NTT domain. perm_stack: i32[R, N] eval-domain
    automorphism permutations (one per nonzero offset). gk_list: tuple of R
    DeviceKSKeys. pt_stacks: per output set, u32[R, K+alpha, N] Montgomery
    NTT-domain plaintext diagonals over the active QP basis (missing offsets
    zero-padded — exact, 0 terms add nothing mod q). pt0s: per set, the
    zero-offset plaintext u32[K+alpha, N] or None. kscs: KSContext per
    rescale word (levels K, K-1, ...).

    Returns one (c0, c1) pair per set at level K - scale_words; bit-exact vs
    golden ct_diag_fan (NTT/iNTT cancellation makes the in-coeff-domain
    double rescale identical to repeated ct_rescale).
    """
    from gpufhe_tpu.primitives.keyswitch import key_rows, qp_indices
    from gpufhe_tpu.primitives.rns import mod_down, mod_up
    from gpufhe_tpu.primitives.rns import rescale as rescale_coeff

    qp_idx = np.asarray(qp_indices(params, level))
    q_idx = list(range(level))
    q = ctx.q[:level][:, None]
    qinv = ctx.qinv_neg[:level][:, None]
    qp_q = ctx.q[qp_idx][:, None]
    qp_qinv = ctx.qinv_neg[qp_idx][:, None]
    c0, c1 = cs

    # hoist: one decompose + ModUp + NTT for the whole fan
    c1_coeff = ntt_inv(c1, ctx, limbs=q_idx)
    raised = mod_up(c1_coeff, params, level, ctx, kscs[0])
    raised_ntt = [ntt_fwd(r, ctx, limbs=qp_idx) for r in raised]

    nsets = len(pt_stacks)
    acc0 = [None] * nsets
    acc1 = [None] * nsets
    c0_acc = [None] * nsets
    from gpufhe_tpu.primitives.keyswitch import _packed_mac

    packed = _packed_mac()
    r_count = perm_stack.shape[0]
    if packed:
        # Paired-REDC lazy MACs at BOTH fan levels (ops/modops.py mont_mac).
        # Round-5 device trace: the fan programs' elementwise MAC fusions
        # (compare_select 152 ms + fusion 78 ms of a 477 ms bootstrap)
        # dominate, and the OFFSET accumulation (R terms x 3 accumulators
        # x nsets) is the bigger loop — pairing it halves its REDC count
        # and drops the per-term conditional subtracts. Same (a, b) pairs
        # as the eager chain, so the canonical result limbs are
        # bit-identical (mont_mac contract).
        t0s, t1s, c0gs = [], [], []
        for j in range(r_count):
            perm = perm_stack[j]
            gk = gk_list[j]
            rgs = [jnp.take(r, perm, axis=1) for r in raised_ntt]
            t0s.append(mont_mac(
                [(rg, key_rows(gk.b_mont[d], params, level))
                 for d, rg in enumerate(rgs)], qp_q, qp_qinv))
            t1s.append(mont_mac(
                [(rg, key_rows(gk.a_mont[d], params, level))
                 for d, rg in enumerate(rgs)], qp_q, qp_qinv))
            c0gs.append(jnp.take(c0, perm, axis=1))
        for s in range(nsets):
            pts = [pt_stacks[s][j] for j in range(r_count)]
            acc0[s] = mont_mac(
                [(t0s[j], pts[j]) for j in range(r_count)], qp_q, qp_qinv)
            acc1[s] = mont_mac(
                [(t1s[j], pts[j]) for j in range(r_count)], qp_q, qp_qinv)
            c0_acc[s] = mont_mac(
                [(c0gs[j], pts[j][:level]) for j in range(r_count)], q, qinv)
    else:
        for j in range(r_count):
            perm = perm_stack[j]
            gk = gk_list[j]
            t0 = t1 = None
            for d, r in enumerate(raised_ntt):
                rg = jnp.take(r, perm, axis=1)
                u0 = mont_mul(rg, key_rows(gk.b_mont[d], params, level), qp_q, qp_qinv)
                u1 = mont_mul(rg, key_rows(gk.a_mont[d], params, level), qp_q, qp_qinv)
                t0 = u0 if t0 is None else add_mod(t0, u0, qp_q)
                t1 = u1 if t1 is None else add_mod(t1, u1, qp_q)
            c0g = jnp.take(c0, perm, axis=1)
            for s in range(nsets):
                pt = pt_stacks[s][j]
                v0 = mont_mul(t0, pt, qp_q, qp_qinv)
                v1 = mont_mul(t1, pt, qp_q, qp_qinv)
                acc0[s] = v0 if acc0[s] is None else add_mod(acc0[s], v0, qp_q)
                acc1[s] = v1 if acc1[s] is None else add_mod(acc1[s], v1, qp_q)
                w0 = mont_mul(c0g, pt[:level], q, qinv)
                c0_acc[s] = w0 if c0_acc[s] is None else add_mod(c0_acc[s], w0, q)

    # joint fence over ALL sets' accumulators (shared-producer MAC fusion;
    # primitives/keyswitch.py fence note)
    from gpufhe_tpu.primitives.keyswitch import fence_enabled

    if fence_enabled(params.dnum):
        fenced = jax.lax.optimization_barrier(tuple(acc0) + tuple(acc1))
        acc0 = list(fenced[:nsets])
        acc1 = list(fenced[nsets:])
    outs = []
    for s in range(nsets):
        down = [
            mod_down(ntt_inv(a, ctx, limbs=qp_idx), params, level, ctx, kscs[0])
            for a in (acc0[s], acc1[s])
        ]
        e0 = c0_acc[s]
        e1 = None
        if pt0s[s] is not None:
            pt0 = pt0s[s][:level]
            e0 = add_mod(e0, mont_mul(c0, pt0, q, qinv), q)
            e1 = mont_mul(c1, pt0, q, qinv)
        comp_coeff = [
            add_mod(down[0], ntt_inv(e0, ctx, limbs=q_idx), q),
            down[1]
            if e1 is None
            else add_mod(down[1], ntt_inv(e1, ctx, limbs=q_idx), q),
        ]
        # rescale scale_words times entirely in coefficient domain: the
        # NTT/iNTT round trips of repeated ct_rescale cancel exactly mod q
        new = []
        for cc in comp_coeff:
            lvl = level
            for w in range(params.scale_words):
                cc = rescale_coeff(cc, params, lvl, ctx, kscs[w])
                lvl -= 1
            new.append(ntt_fwd(cc, ctx, limbs=list(range(lvl))))
        outs.append(tuple(new))
    return tuple(outs)


@functools.lru_cache(maxsize=None)
def _perm_stack_dev(steps: tuple, n: int) -> jnp.ndarray:
    perms = [
        gckks.automorphism_perm_eval(gckks.galois_exponent(s, n), n).astype(np.int32)
        for s in steps
    ]
    return jnp.asarray(np.stack(perms))


def ct_diag_fan(
    ct: Ciphertext,
    offsets: tuple,
    pt_stacks: tuple,
    pt0s: tuple,
    pt_scale: float,
    params: CKKSParams,
    ctx: Context,
    gks: dict,
) -> list:
    """Apply a fused diagonal-fan stage (see _diag_fan_core).

    offsets: sorted nonzero rotation steps. pt_stacks/pt0s: one entry per
    output set (device Montgomery NTT-domain QP-basis plaintexts, stacked
    [R, K+alpha, N] / single [K+alpha, N] or None), all at scale pt_scale.
    """
    assert len(ct.c) == 2
    level = ct.level
    kscs = tuple(
        make_ks_context(params, level - w) for w in range(params.scale_words)
    )
    gk_list = tuple(gks[s] for s in offsets)
    perm_stack = _perm_stack_dev(tuple(offsets), params.n)
    outs = _diag_fan_core(
        tuple(ct.c), perm_stack, gk_list, pt_stacks, pt0s, ctx, kscs, params, level
    )
    scale = ct.scale * pt_scale
    lvl = level
    for _ in range(params.scale_words):
        scale = scale / params.q_primes[lvl - 1]
        lvl -= 1
    return [Ciphertext(list(c), lvl, scale) for c in outs]


# ---------------------------------------------------------------------------
# ModRaise (bootstrapping step 0) — device mirror of golden ct_mod_raise
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2,))
def _mod_raise_core(cs, ctx, params):
    """Centered lift of single-limb coeffs mod q0 into the full chain."""
    from gpufhe_tpu.ops.modops import barrett_reduce_u32

    level = params.num_limbs
    q0 = int(params.q_primes[0])
    q = ctx.q[:level][:, None]
    qlift = barrett_reduce_u32(jnp.full((level, 1), jnp.uint32(q0 % (1 << 32))), q)
    # q0 mod q_i for each target limb (q0 itself may exceed some q_i)
    out = []
    for comp in cs:
        coeff = ntt_inv(comp, ctx, limbs=[0])  # u32[1, N] mod q0
        r = barrett_reduce_u32(coeff, q)  # broadcast to [level, N]
        lifted = jnp.where(
            coeff > jnp.uint32(q0 // 2), sub_mod(r, qlift, q), r
        )
        out.append(ntt_fwd(lifted, ctx, limbs=list(range(level))))
    return tuple(out)


def ct_mod_raise(ct: Ciphertext, params: CKKSParams, ctx: Context) -> Ciphertext:
    """Re-embed an exhausted (level-1) ciphertext into the full chain.

    Output encrypts m + q0*I for a small integer polynomial I (golden
    ct_mod_raise); the bootstrap pipeline removes the q0*I term.
    """
    assert ct.level == 1 and len(ct.c) == 2
    new = list(_mod_raise_core(tuple(ct.c), ctx, params))
    return Ciphertext(new, params.num_limbs, ct.scale)


# ---------------------------------------------------------------------------
# Double-word ModRaise: composite base modulus Q0 = q0*q1 (scale_words == 2)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dw_modraise_consts(params: CKKSParams):
    import math as _math

    from gpufhe_tpu.primitives.rns import _mont_np

    q0, q1 = params.q_primes[0], params.q_primes[1]
    big = q0 * q1
    primes = np.asarray(params.q_primes, dtype=np.uint64)
    # eager even when first called inside a jit trace: every input is host
    # data, and caching a traced jnp.asarray poisons every later trace that
    # reads this lru_cache (CLAUDE.md lazily-populated-cache invariant)
    with jax.ensure_compile_time_eval():
        return _dw_modraise_consts_eager(q0, big, primes)


def _dw_modraise_consts_eager(q0, big, primes):
    from gpufhe_tpu.primitives.rns import _mont_np

    q1 = int(big // q0)
    return (
        jnp.asarray(_mont_np([pow(q0, -1, q1)], np.asarray([q1]))),  # q0^-1 (mont, mod q1)
        jnp.uint32((big // 2) // q0),  # half1
        jnp.uint32((big // 2) % q0),  # rem
        jnp.asarray(
            _mont_np(np.asarray([q0 % int(p) for p in primes]), primes)
        ),  # q0 mod q_i (mont)
        jnp.asarray(np.asarray([big % int(p) for p in primes], dtype=np.uint32)),  # Q0 mod q_i
    )


@functools.partial(jax.jit, static_argnums=(2,))
def _mod_raise2_core(cs, ctx, params):
    """Centered CRT lift from (q0, q1) into the full chain, bit-exact vs
    golden ct_mod_raise (same centering rule: v > Q0//2 <-> t > half1 or
    (t == half1 and x0 > rem), all in exact uint32 comparisons)."""
    from gpufhe_tpu.ops.modops import barrett_reduce_u32

    level = params.num_limbs
    q0inv_m, half1, rem, q0_mod_m, big_mod = _dw_modraise_consts(params)
    q = ctx.q[:level][:, None]
    qinv = ctx.qinv_neg[:level][:, None]
    q1_s = ctx.q[1]
    q1inv_s = ctx.qinv_neg[1]
    out = []
    for comp in cs:
        coeff = ntt_inv(comp, ctx, limbs=[0, 1])  # u32[2, N]
        x0, x1 = coeff[0], coeff[1]
        x0m1 = barrett_reduce_u32(x0, q1_s)
        diff = sub_mod(x1, x0m1, q1_s)
        t = mont_mul(diff, q0inv_m[0], q1_s, q1inv_s)  # canonical mod q1
        cond = (t > half1) | ((t == half1) & (x0 > rem))
        a = barrett_reduce_u32(x0[None, :], q)
        b = barrett_reduce_u32(t[None, :], q)
        v0 = add_mod(a, mont_mul(b, q0_mod_m[:, None], q, qinv), q)
        v = jnp.where(cond[None, :], sub_mod(v0, big_mod[:, None], q), v0)
        out.append(ntt_fwd(v, ctx, limbs=list(range(level))))
    return tuple(out)


def ct_mod_raise2(ct: Ciphertext, params: CKKSParams, ctx: Context) -> Ciphertext:
    assert ct.level == 2 and len(ct.c) == 2
    new = list(_mod_raise2_core(tuple(ct.c), ctx, params))
    return Ciphertext(new, params.num_limbs, ct.scale)
