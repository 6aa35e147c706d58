"""Hybrid key-switching core (device): ModUp -> inner product -> ModDown.

The FHE primitive layer the reference only marks with a placeholder
(reference primitive.py:3-4 `XXX()`; SURVEY.md §2.4 "hybrid key-switching:
none"). Mirrors golden key_switch_core (golden/ckks.py) stage for stage so
every intermediate limb is bit-exact:

  1. iNTT the switched polynomial to coefficient domain
  2. ModUp each of the dnum decomposition groups to the full active Q·P basis
     (primitives/rns.py mod_up — approximate base conversion, per-term reduced)
  3. NTT-domain MAC against the gadget key rows (keys in Montgomery form:
     one mont_mul + add_mod per row — pure VPU, fuses into one XLA kernel)
  4. iNTT, ModDown by P, NTT back

The NTT dominates: 2*(dnum+2) transforms of K+alpha limbs. All transforms
ride the MXU four-step path (ops/ntt.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gpufhe_tpu.keys.keys import DeviceKSKey
from gpufhe_tpu.ops.context import Context
from gpufhe_tpu.ops.modops import add_mod, mont_mac, mont_mul


def _packed_mac() -> bool:
    """Paired-REDC lazy MAC accumulation (ops/modops.py mont_mac) for the
    key-switch / fan inner products. GPUFHE_MAC=eager restores the
    per-term mont_mul + add_mod chain for A/B."""
    import os

    return os.environ.get("GPUFHE_MAC", "packed") != "eager"
from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from gpufhe_tpu.primitives.rns import KSContext, mod_down, mod_up
from gpufhe_tpu.params.params import CKKSParams


def fence_enabled(dnum: int) -> bool:
    """Whether to fence shared-producer MACs before Pallas NTT consumers.

    Measured (round 4, genuine chains): the joint optimization_barrier
    recovers ~0.3 ms on the dnum=5 dw mult (the MAC boundary cost scales
    with the number of shared-read gadget groups) but COSTS ~0.3 ms on the
    dnum=2 BGV mult and is noise-level on dnum=2 CKKS. Auto policy: fence
    at dnum >= 3. GPUFHE_KS_FENCE=1/0 forces either way."""
    import os

    env = os.environ.get("GPUFHE_KS_FENCE", "auto")
    if env == "auto":
        return dnum >= 3
    return env == "1"


def qp_indices(params: CKKSParams, level: int) -> list[int]:
    """Context-chain indices of the active Q-prefix + P-chain limbs."""
    alpha = len(params.p_primes)
    return list(range(level)) + list(
        range(params.num_limbs, params.num_limbs + alpha)
    )


def key_rows(comp: jnp.ndarray, params: CKKSParams, level: int) -> jnp.ndarray:
    """Active QP rows of one gadget-key component, tolerant of LEVEL-TRUNCATED
    key storage (keys/keys.py truncate_galois_device): a key whose q-prefix
    was shrunk to exactly the level it is used at needs no row gather at all.
    Pure row selection — bit-identical values either way."""
    alpha = len(params.p_primes)
    stored_l = comp.shape[0] - alpha
    assert stored_l >= level, (stored_l, level)
    if stored_l == level:
        return comp
    idx = np.concatenate([np.arange(level), np.arange(stored_l, stored_l + alpha)])
    # STAGE the gather even under jax.ensure_compile_time_eval()
    # (FusedPipeline traces, ciphertext/backend.py): eager evaluation there
    # materializes a fresh (level+alpha, N) buffer PER CALL — ~8.5 MB x
    # 2 components x dnum per multiply at N=2^16, which pinned GBs of
    # duplicate key slices into the traced program's consts and OOMed the
    # flagship bootstrap's fused EvalMod on a real chip. Staged, the FULL
    # key enters the jaxpr once (consts dedup by object id) and the row
    # gather compiles into the program.
    try:
        from jax._src import config as _cfg

        ctxmgr = _cfg.eager_constant_folding(False)
    except Exception:  # pragma: no cover - future jax refactor
        import contextlib

        ctxmgr = contextlib.nullcontext()
    with ctxmgr:
        return comp[idx]


def key_switch_core(
    d2: jnp.ndarray,
    params: CKKSParams,
    level: int,
    ctx: Context,
    ksc: KSContext,
    ksk: DeviceKSKey,
    eval_out: bool = True,
    eval_in: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Switch one NTT-domain poly u32[K, N] to the target key's secret.

    Returns (ks0, ks1) u32[K, N] NTT domain, bit-exact vs golden
    key_switch_core. With eval_out=False the final per-component NTT is
    skipped and the pair is returned in COEFFICIENT domain — callers that
    immediately iNTT the sum (the fused mult's rescale chain) instead add
    in coefficient domain, cancelling a full NTT+iNTT round trip per
    component exactly (modular linearity: iNTT(d + NTT(ks)) == iNTT(d) + ks
    mod q, limb-bit-exact). With eval_in=False, d2 arrives ALREADY in
    coefficient domain and the initial iNTT is skipped — producers whose
    last step would be an NTT back to eval domain (the BFV BEHZ tensor's
    d2, ciphertext/bfv.py) hand the coefficient form over directly,
    cancelling that NTT+iNTT pair exactly (NTT(iNTT(x)) is bit-exact).
    """
    k = level
    qp_idx = qp_indices(params, level)
    q_idx = list(range(k))

    d2_coeff = ntt_inv(d2, ctx, limbs=q_idx) if eval_in else d2
    raised = mod_up(d2_coeff, params, level, ctx, ksc)

    qp_q = ctx.q[np.asarray(qp_idx)][:, None]
    qp_qinv = ctx.qinv_neg[np.asarray(qp_idx)][:, None]
    # NOTE: batching the dnum transforms into one vmapped call was measured
    # SLOWER on-chip (vmap-of-pallas lowers to a serialized loop with extra
    # copies); the unrolled per-group calls pipeline better.
    from gpufhe_tpu.primitives.rns import ks_groups

    import os

    # Identity-row skip v2 (round 4): the group's own rows of the raised
    # poly are the identity conversion (= d2_coeff rows exactly, rns.py
    # modup_conv docstring), and NTT(iNTT(d2)) is bit-exact, so those rows'
    # forward NTT IS the original eval-domain d2 — reuse it and transform
    # only the other rows, saving dnum*alpha of the mult's limb-transforms.
    # The round-3 version reassembled the full raised poly with a concat
    # before one full-array MAC (two ~65-limb-plane copies per group;
    # measured 4.31 vs 3.98 ms/mult — worse). v2 never materializes the
    # reassembled poly: the MAC runs in three row SEGMENTS whose products
    # are concatenated once. MEASURED round 4 (genuine chain, /tmp A/B):
    # L=30 2.835 vs 2.823 ms (wash), dw 7.280 vs 6.393 (0.9 ms WORSE) —
    # the segmented MAC multiplies the MAC->iNTT fusion-boundary cost the
    # dw seam probe isolated (+1.6 ms standalone; profile_mult_stages
    # PROFILE_SEAMS=1), eating the dnum*alpha limb-transform saving both
    # times. Default OFF; the clean full-NTT MAC stays the production path.
    id_skip = (os.environ.get("GPUFHE_MODUP_IDSKIP", "0") == "1"
               and eval_in)  # the skip reuses the EVAL-domain d2
    groups = ks_groups(params, level)
    packed_mac = _packed_mac()
    acc0 = acc1 = None
    r_ntt = []  # packed path: collect, one mont_mac per key component
    for d, r_coeff in enumerate(raised):
        if not id_skip:
            r = ntt_fwd(r_coeff, ctx, limbs=qp_idx)
            if packed_mac:
                r_ntt.append(r)
                continue
            t0 = mont_mul(r, key_rows(ksk.b_mont[d], params, level), qp_q, qp_qinv)
            t1 = mont_mul(r, key_rows(ksk.a_mont[d], params, level), qp_q, qp_qinv)
            acc0 = t0 if acc0 is None else add_mod(acc0, t0, qp_q)
            acc1 = t1 if acc1 is None else add_mod(acc1, t1, qp_q)
            continue
        d0, d1 = groups[d]
        other_pos = list(range(0, d0)) + list(range(d1, len(qp_idx)))
        other_limbs = [qp_idx[i] for i in other_pos]
        r_other = ntt_fwd(
            jnp.concatenate([r_coeff[:d0], r_coeff[d1:]]), ctx,
            limbs=other_limbs,
        )
        kb = key_rows(ksk.b_mont[d], params, level)
        ka = key_rows(ksk.a_mont[d], params, level)

        def _seg_mac(key):
            parts = []
            if d0:
                parts.append(
                    mont_mul(r_other[:d0], key[:d0], qp_q[:d0], qp_qinv[:d0])
                )
            parts.append(
                mont_mul(d2[d0:d1], key[d0:d1], qp_q[d0:d1], qp_qinv[d0:d1])
            )
            if d1 < len(qp_idx):
                parts.append(
                    mont_mul(r_other[d0:], key[d1:], qp_q[d1:], qp_qinv[d1:])
                )
            return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

        t0 = _seg_mac(kb)
        t1 = _seg_mac(ka)
        acc0 = t0 if acc0 is None else add_mod(acc0, t0, qp_q)
        acc1 = t1 if acc1 is None else add_mod(acc1, t1, qp_q)

    if packed_mac and not id_skip:
        # paired-REDC lazy MAC (ops/modops.py mont_mac): ~1 REDC per 2
        # gadget terms, accumulators stay in [0, 2q) — congruent, and the
        # iNTT below canonicalizes, so ciphertext limbs are bit-identical
        # to the eager chain (round-5 device trace: the MAC fusions, not
        # the NTTs, dominate the bootstrap's fan/key-switch programs)
        acc0 = mont_mac(
            [(r, key_rows(ksk.b_mont[d], params, level))
             for d, r in enumerate(r_ntt)], qp_q, qp_qinv)
        acc1 = mont_mac(
            [(r, key_rows(ksk.a_mont[d], params, level))
             for d, r in enumerate(r_ntt)], qp_q, qp_qinv)

    # fence the MAC accumulators JOINTLY before the Pallas iNTTs: XLA's
    # cross-boundary optimization between the elementwise MAC fusion and
    # the custom call costs ~1.6 ms at dw shapes (round-4 seam bisect:
    # mac+2iNTT 2.63 ms unfenced vs 1.06 fenced == the exact leaf sum; a
    # per-input fence inside ntt_* does NOT get the win — only the joint
    # tuple barrier does). The barrier is live (its outputs feed the
    # transforms), so nothing is DCE'd.
    import jax

    if fence_enabled(len(groups)):
        acc0, acc1 = jax.lax.optimization_barrier((acc0, acc1))
    out = []
    for acc in (acc0, acc1):
        coeff = ntt_inv(acc, ctx, limbs=qp_idx)
        down = mod_down(coeff, params, level, ctx, ksc)
        out.append(ntt_fwd(down, ctx, limbs=q_idx) if eval_out else down)
    return out[0], out[1]
