"""Uniform op surface over the device and golden pipelines.

Bootstrapping and the homomorphic linear-algebra layer (linalg.py,
bootstrap.py) are written once against this interface and executed on either
backend. Because every primitive here is individually bit-exact between the
two pipelines (tests/test_pipeline.py), any composition — including the full
bootstrap — is bit-exact too; the golden backend doubles as the oracle for
end-to-end limb-trace tests at a fraction of the code.

Scale management: adds require (approximately) matching scales; encoded
plaintexts are generated at exactly the scale the consuming op needs, so the
only drift is the standard CKKS rescale drift (q_i != 2^scale_bits), which
stays far below the noise floor for near-power-of-two prime chains.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.params.params import CKKSParams

_REL_SCALE_TOL = 1e-6


class FanPlan(NamedTuple):
    """Precomputed device material for one fused diagonal-fan stage."""

    level: int
    pt_scale: float
    offsets: tuple  # sorted nonzero rotation steps
    pt_stacks: tuple  # per set: u32[R, K+alpha, N] Montgomery NTT QP-basis
    pt0s: tuple  # per set: u32[K+alpha, N] or None (zero-offset diagonal)


class GoldenFanPlan(NamedTuple):
    level: int
    pt_scale: float
    sets: tuple  # per set: dict offset -> int64[K+alpha, N] NTT QP-basis


def _check_scales(a_scale: float, b_scale: float):
    assert abs(a_scale / b_scale - 1.0) < 1e-2, (
        f"scale mismatch: {a_scale} vs {b_scale}"
    )


class FusedPipeline:
    """Collapse a backend composition fn(Ciphertext) -> Ciphertext into ONE
    XLA program per (level, scale) input signature.

    Everything host-side in fn — level bookkeeping, scale steering, constant
    encodes (cache-hits in steady state) — is static under trace; the
    individually-jitted cores it dispatches inline into a single program.
    This is the generic form of the whole-stage fusion that took the N=2^16
    bootstrap from 23 s to 0.7 s (fftboot DiagPlan): here it folds the
    ~80-dispatch fan of a Chebyshev EvalMod evaluation (polyeval.py) into
    one dispatch. Bit-exact by construction: the traced ops are the same
    jitted cores the eager path runs, in the same order.

    Only meaningful for DeviceBackend (jax arrays); the golden backend runs
    fn eagerly unchanged.
    """

    def __init__(self, be, fn):
        self.be = be
        self.fn = fn
        self._cache: dict = {}

    def __call__(self, *args):
        """args: any pytree of Ciphertexts (registered pytree: components
        are children, (level, scale) static aux). Returns fn's Ciphertext
        pytree, executed as one compiled program per input signature."""
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(args)
        key = (treedef, tuple((tuple(x.shape), str(x.dtype)) for x in leaves))
        ent = self._cache.get(key)
        if ent is None:
            meta: dict = {}

            def run(flat):
                from gpufhe_tpu.ciphertext.ct import raw_cores

                a = jax.tree_util.tree_unflatten(treedef, flat)
                # ensure_compile_time_eval: concrete-only subcomputations
                # (lazily-built constants — cached encodes, truncated keys,
                # ks tables) evaluate EAGERLY during the trace, so the
                # long-lived caches they populate hold concrete arrays, not
                # tracers that would poison the next pipeline's trace; ops
                # touching the ciphertext tracers still stage as usual.
                with raw_cores(), jax.ensure_compile_time_eval():
                    out = self.fn(*a)
                out_flat, meta["tree"] = jax.tree_util.tree_flatten(out)
                return tuple(out_flat)

            # hoist every closed-over device array (keys, NTT tables, cached
            # plaintext constants) OUT of the program as ARGUMENTS: jax
            # lowers jaxpr constants as HLO literals, which at N=2^16 would
            # embed the relinearization key (~10^2 MB) et al. into the
            # module text and choke the (tunneled) compiler. raw_cores() is
            # what makes this possible — arrays passed into a NESTED pjit
            # are captured inside its sub-computation where they cannot be
            # hoisted. (jax.closure_convert is not usable here: it hoists
            # only inexact-dtype constants, and FHE limbs are uint32.)
            closed = jax.make_jaxpr(run)(tuple(leaves))
            # value-dedup the hoisted constants: raw-core tracing slices
            # keys/tables EAGERLY per op call, so the same key rows / q
            # vectors recur dozens of times (measured 3589 -> 193 consts) —
            # dedup collapses both the argument list and the HBM copies
            uniq, index, seen = [], [], {}
            by_id = {}  # id(buffer) fast path: staged-gather consts are the
            # SAME full table objects repeated thousands of times
            # (ops/ntt.py _staged_rows) — hashing their bytes per occurrence
            # would serialize GBs
            for c in closed.consts:
                i = by_id.get(id(c))
                if i is None:
                    a = np.asarray(c)
                    # key on the actual bytes, not hash(bytes): a hash
                    # collision would silently substitute one key/plaintext
                    # for another in a bit-exact pipeline
                    k = (a.shape, a.dtype.str, a.tobytes())
                    i = seen.get(k)
                    if i is None:
                        i = seen[k] = len(uniq)
                        uniq.append(c)
                    by_id[id(c)] = i
                index.append(i)
            idx = tuple(index)
            # keep only the jaxpr + the deduped consts: closing over
            # `closed` would pin every pre-dedup slice buffer (the 3396
            # duplicates above) in HBM for the cache entry's lifetime — at
            # N=2^16 that is GBs and OOMed the flagship bootstrap's fused
            # EvalMod on a real chip
            jaxpr = closed.jaxpr
            del closed, seen

            def converted(flat, *ucs):
                cs = [ucs[i] for i in idx]
                return jax.core.eval_jaxpr(jaxpr, cs, *flat)

            ent = (jax.jit(converted), tuple(uniq), meta)
            self._cache[key] = ent
        jitted, consts, meta = ent
        outs = jitted(tuple(leaves), *consts)
        return jax.tree_util.tree_unflatten(meta["tree"], outs)


class DeviceBackend:
    """Ops on the jitted TPU pipeline (ciphertext/ct.py)."""

    def __init__(self, params: CKKSParams, ctx, chest):
        from gpufhe_tpu.ciphertext import ct as dct
        from gpufhe_tpu.encoding import encoder

        self.params = params
        self.ctx = ctx
        self.chest = chest
        self._ct = dct
        self._enc = encoder
        self._const_cache = {}  # (value, scale, level) -> encoded plaintext
        self._addp_cache = {}  # (value, scale, level) -> NTT-domain plaintext
        self.encode_misses = 0  # host encodes actually performed (cache misses)

    # -- plaintext handling -------------------------------------------------
    def encode_slots(self, z, scale: float, level: int):
        """complex[slots] -> device NTT-domain Montgomery plaintext [level, N].

        Uniform-constant vectors are cached (polynomial evaluators re-encode
        the same constants every call; each encode costs a host FFT + device
        NTT, which dominated bootstrap steady-state time at N=2^16).
        """
        z = np.asarray(z)
        if z.ndim == 0 or (z.ndim == 1 and z.size and (z == z.flat[0]).all()):
            key = (complex(z.flat[0] if z.ndim else z), float(scale), level)
            hit = self._const_cache.get(key)
            if hit is None:
                zz = np.broadcast_to(
                    np.complex128(key[0]), (self.params.slots,)
                )
                hit = self._encode_uncached(zz, scale, level)
                # a cached TRACER poisons every later trace (CLAUDE.md:
                # lazily-populated host caches) — encode inputs are host
                # data, so the result must be concrete even mid-trace.
                # Explicit raise (not assert): python -O must not silently
                # reintroduce the poisoning.
                import jax

                if isinstance(hit[0], jax.core.Tracer):
                    raise RuntimeError(
                        "encode produced a tracer under an active trace; "
                        "refusing to cache it (ops/ntt.py _staged_rows gate)"
                    )
                self._const_cache[key] = hit
            return hit
        return self._encode_uncached(z, scale, level)

    def _encode_uncached(self, z, scale: float, level: int):
        self.encode_misses += 1
        pt = gckks.encode(
            np.asarray(z, dtype=np.complex128),
            scale,
            self.params.q_primes[:level],
            self.params.n,
        )
        return self._enc.plaintext_to_device(pt, self.params, self.ctx), scale

    def mul_plain(self, ct, pt_handle):
        pt, scale = pt_handle
        return self._ct.ct_mul_plain(ct, pt, scale, self.ctx)

    def add_plain(self, ct, z):
        """Add a complex constant vector (encoded at ct.scale) to the message.

        Uniform constants are cached keyed on (value, scale, level): EvalMod
        and the Chebyshev evaluator add the same constants every bootstrap
        iteration, and an uncached encode is a host FFT + upload (0.3-0.8 s
        at N=2^16 — a real slice of steady-state time before caching).
        """
        from gpufhe_tpu.ops.modops import add_mod

        pt_ntt = self._addp_pt(z, float(ct.scale), ct.level)
        q = self.ctx.q[: ct.level][:, None]
        c = list(ct.c)
        c[0] = add_mod(c[0], pt_ntt, q)
        return self._ct.Ciphertext(c, ct.level, ct.scale)

    def _addp_pt(self, z, scale: float, level: int):
        """Cached NTT-domain (non-Montgomery) plaintext of a uniform constant."""
        import jax.numpy as jnp

        from gpufhe_tpu.ops.ntt import ntt_fwd

        z = np.asarray(z)
        uniform = z.ndim == 0 or (z.ndim == 1 and z.size and (z == z.flat[0]).all())
        key = None
        if uniform:
            key = (complex(z.flat[0] if z.ndim else z), scale, level)
            hit = self._addp_cache.get(key)
            if hit is not None:
                return hit
        self.encode_misses += 1
        pt = gckks.encode(
            np.broadcast_to(np.asarray(z, dtype=np.complex128), (self.params.slots,)),
            scale,
            self.params.q_primes[:level],
            self.params.n,
        )
        pt_ntt = ntt_fwd(
            jnp.asarray(pt.astype(np.uint32)), self.ctx, limbs=list(range(level))
        )
        if key is not None:
            self._addp_cache[key] = pt_ntt
        return pt_ntt

    def plain_mac(self, terms, const=None):
        """Fused sum_i pt_i * ct_i -> rescale -> (+ const): one dispatch.

        terms: list of (ct, pt_handle) at one common level with (approx)
        matching product scales. Bit-exact vs the generic composition the
        golden backend runs (mul_plain per term, add, rescale, add_plain)."""
        cts = [t[0] for t in terms]
        pts = [t[1][0] for t in terms]
        out_scale = float(cts[0].scale) * float(terms[0][1][1])
        for ct, (pt, s) in terms[1:]:
            _check_scales(float(ct.scale) * float(s), out_scale)
        const_ntt = None
        if const is not None:
            lvl = cts[0].level - self.params.scale_words
            s = out_scale
            l = cts[0].level
            for _ in range(self.params.scale_words):
                s = s / self.params.q_primes[l - 1]
                l -= 1
            const_ntt = self._addp_pt(const, s, lvl)
        return self._ct.ct_plain_mac(
            cts, pts, const_ntt, self.params, self.ctx, out_scale
        )

    # -- fused diagonal-fan stages (fftboot.DiagPlan hot path) --------------
    def _encode_qp(self, z, scale: float, level: int):
        """complex[slots] -> Montgomery NTT-domain u32[K+alpha, N] over the
        active QP basis (q-prefix rows double as the Q-basis plaintext)."""
        from gpufhe_tpu.ops.modops import to_mont
        from gpufhe_tpu.ops.ntt import ntt_fwd
        from gpufhe_tpu.primitives.keyswitch import qp_indices

        import jax.numpy as jnp

        self.encode_misses += 1
        qp_primes = self.params.q_primes[:level] + self.params.p_primes
        pt = gckks.encode(
            np.asarray(z, dtype=np.complex128), scale, qp_primes, self.params.n
        )
        qp_idx = np.asarray(qp_indices(self.params, level))
        x_ntt = ntt_fwd(jnp.asarray(pt.astype(np.uint32)), self.ctx, limbs=qp_idx)
        q = self.ctx.q[qp_idx][:, None]
        return to_mont(x_ntt, q, self.ctx.qinv_neg[qp_idx][:, None],
                       self.ctx.r2[qp_idx][:, None])

    def make_fan_plan(self, diag_sets, level: int, scale: float | None = None):
        """Encode the diagonals of a grouped sparse stage for ct_diag_fan.

        diag_sets: list of dicts offset -> complex[slots]. Offsets missing
        from one set but present in another are zero-padded (exact)."""
        import jax.numpy as jnp

        scale = self.params.scale if scale is None else scale
        offsets = tuple(sorted({r for d in diag_sets for r in d if r != 0}))
        zeros = np.zeros(self.params.slots, dtype=np.complex128)
        pt_stacks, pt0s = [], []
        for dset in diag_sets:
            assert any(r != 0 for r in dset), "each set needs a nonzero offset"
            pt_stacks.append(
                jnp.stack([self._encode_qp(dset.get(r, zeros), scale, level)
                           for r in offsets])
            )
            pt0s.append(
                self._encode_qp(dset[0], scale, level) if 0 in dset else None
            )
        return FanPlan(level, scale, offsets, tuple(pt_stacks), tuple(pt0s))

    def apply_fan(self, ct, plan: FanPlan):
        assert ct.level == plan.level, (ct.level, plan.level)
        gks = {s: self.chest.galois_key(s) for s in plan.offsets}
        return self._ct.ct_diag_fan(
            ct, plan.offsets, plan.pt_stacks, plan.pt0s, plan.pt_scale,
            self.params, self.ctx, gks,
        )

    # -- ciphertext ops (levels auto-aligned by limb truncation) ------------
    def _align(self, a, b):
        lvl = min(a.level, b.level)
        return self.drop_to_level(a, lvl), self.drop_to_level(b, lvl)

    def add(self, a, b):
        _check_scales(a.scale, b.scale)
        a, b = self._align(a, b)
        b = self._ct.Ciphertext(b.c, b.level, a.scale)
        return self._ct.ct_add(a, b, self.ctx)

    def sub(self, a, b):
        _check_scales(a.scale, b.scale)
        a, b = self._align(a, b)
        b = self._ct.Ciphertext(b.c, b.level, a.scale)
        return self._ct.ct_sub(a, b, self.ctx)

    def mul(self, a, b):
        a, b = self._align(a, b)
        return self._ct.ct_mul_full(a, b, self.params, self.ctx, self.chest.device_rlk)

    def mod_raise(self, ct):
        if self.params.scale_words == 2:
            return self._ct.ct_mod_raise2(ct, self.params, self.ctx)
        return self._ct.ct_mod_raise(ct, self.params, self.ctx)

    def rescale(self, ct):
        for _ in range(self.params.scale_words):
            ct = self._ct.ct_rescale(ct, self.params, self.ctx)
        return ct

    def rescale_prod(self, level: int) -> float:
        """Product of the primes a rescale from `level` divides by."""
        w = self.params.scale_words
        out = 1.0
        for i in range(w):
            out *= self.params.q_primes[level - 1 - i]
        return out

    def rotate_hoisted(self, ct, steps_list):
        gks = {s: self.chest.galois_key(s) for s in steps_list}
        outs = self._ct.ct_rotate_hoisted(ct, steps_list, self.params, self.ctx, gks)
        return dict(zip(steps_list, outs))

    def conjugate(self, ct):
        return self._ct.ct_conjugate(ct, self.params, self.ctx, self.chest.conj_key())

    def key_switch(self, ct, which: str):
        """Re-encrypt under the encapsulation key `which` ('to_eph' /
        'from_eph'); see golden ct_key_switch."""
        ksk = self.chest.eph[which][1]
        return self._ct.ct_key_switch(ct, self.params, self.ctx, ksk)

    def drop_to_level(self, ct, level: int):
        """Mod-switch down by truncating RNS limbs (exact, no scaling)."""
        assert level <= ct.level
        return self._ct.Ciphertext([c[:level] for c in ct.c], level, ct.scale)

    def decrypt_decode(self, ct):
        return self._ct.decrypt_decode(ct, self.params, self.chest.device_sk, self.ctx)

    def level(self, ct):
        return ct.level


class GhostCiphertext(NamedTuple):
    level: int
    scale: float


class GhostBackend:
    """Level/scale simulator: runs orchestration code (polyeval, EvalMod)
    with NO data, to plan parameter budgets ahead of time — e.g. the exact
    level the Chebyshev EvalMod output lands on, so SlotToCoeff plans and
    per-step Galois key truncation (keys/keys.py truncate_galois_device) can
    be decided before anything touches the device."""

    def __init__(self, params: CKKSParams):
        self.params = params

    def level(self, ct):
        return ct.level

    def drop_to_level(self, ct, level):
        assert level <= ct.level
        return GhostCiphertext(level, ct.scale)

    def encode_slots(self, z, scale, level):
        return None, float(scale)

    def mul_plain(self, ct, handle):
        return GhostCiphertext(ct.level, ct.scale * handle[1])

    def add_plain(self, ct, z):
        return ct

    def add(self, a, b):
        lvl = min(a.level, b.level)
        return GhostCiphertext(lvl, a.scale)

    def sub(self, a, b):
        lvl = min(a.level, b.level)
        return GhostCiphertext(lvl, a.scale)

    def rescale_prod(self, level: int) -> float:
        w = self.params.scale_words
        out = 1.0
        for i in range(w):
            out *= self.params.q_primes[level - 1 - i]
        return out

    def rescale(self, ct):
        lvl, s = ct.level, ct.scale
        for _ in range(self.params.scale_words):
            s = s / self.params.q_primes[lvl - 1]
            lvl -= 1
        return GhostCiphertext(lvl, s)

    def mul(self, a, b):
        lvl = min(a.level, b.level)
        return self.rescale(GhostCiphertext(lvl, a.scale * b.scale))


class GoldenBackend:
    """Ops on the pure-numpy golden pipeline (golden/ckks.py)."""

    def __init__(self, params: CKKSParams, chest):
        self.params = params
        self.chest = chest

    def encode_slots(self, z, scale: float, level: int):
        pt = gckks.encode(
            np.asarray(z, dtype=np.complex128),
            scale,
            self.params.q_primes[:level],
            self.params.n,
        )
        pt_ntt = gckks.ntt_limbs(pt, self.params, self.params.q_primes[:level])
        return pt_ntt, scale

    def mul_plain(self, ct, pt_handle):
        pt_ntt, scale = pt_handle
        return gckks.ct_mul_plain(ct, pt_ntt, scale, self.params)

    def add_plain(self, ct, z):
        primes = ct.primes(self.params)
        pt = gckks.encode(
            np.broadcast_to(np.asarray(z, dtype=np.complex128), (self.params.slots,)),
            ct.scale,
            primes,
            self.params.n,
        )
        pt_ntt = gckks.ntt_limbs(pt, self.params, primes)
        c = list(ct.c)
        c[0] = gckks.poly_add(c[0], pt_ntt, primes)
        return gckks.Ciphertext(c, ct.level, ct.scale)

    # -- fused diagonal-fan stages (mirror of DeviceBackend.make_fan_plan) --
    def _encode_qp(self, z, scale: float, level: int):
        qp_primes = self.params.q_primes[:level] + self.params.p_primes
        pt = gckks.encode(
            np.asarray(z, dtype=np.complex128), scale, qp_primes, self.params.n
        )
        return gckks.ntt_limbs(pt, self.params, qp_primes)

    def make_fan_plan(self, diag_sets, level: int, scale: float | None = None):
        scale = self.params.scale if scale is None else scale
        sets = tuple(
            {r: self._encode_qp(z, scale, level) for r, z in dset.items()}
            for dset in diag_sets
        )
        for dset in diag_sets:
            assert any(r != 0 for r in dset), "each set needs a nonzero offset"
        return GoldenFanPlan(level, scale, sets)

    def apply_fan(self, ct, plan: GoldenFanPlan):
        assert ct.level == plan.level, (ct.level, plan.level)
        offsets = sorted({r for d in plan.sets for r in d if r != 0})
        gks = {s: self.chest.golden_galois_key(s) for s in offsets}
        return gckks.ct_diag_fan(
            ct, list(plan.sets), plan.pt_scale, self.params, gks
        )

    def _align(self, a, b):
        lvl = min(a.level, b.level)
        return self.drop_to_level(a, lvl), self.drop_to_level(b, lvl)

    def add(self, a, b):
        _check_scales(a.scale, b.scale)
        a, b = self._align(a, b)
        b = gckks.Ciphertext(b.c, b.level, a.scale)
        return gckks.ct_add(a, b, self.params)

    def sub(self, a, b):
        _check_scales(a.scale, b.scale)
        a, b = self._align(a, b)
        b = gckks.Ciphertext(b.c, b.level, a.scale)
        return gckks.ct_sub(a, b, self.params)

    def mul(self, a, b):
        a, b = self._align(a, b)
        t = gckks.ct_tensor(a, b, self.params)
        r = gckks.ct_relinearize(t, self.params, self.chest.rlk)
        for _ in range(self.params.scale_words):
            r = gckks.ct_rescale(r, self.params)
        return r

    def mod_raise(self, ct):
        return gckks.ct_mod_raise(ct, self.params)

    def rescale(self, ct):
        for _ in range(self.params.scale_words):
            ct = gckks.ct_rescale(ct, self.params)
        return ct

    def rescale_prod(self, level: int) -> float:
        w = self.params.scale_words
        out = 1.0
        for i in range(w):
            out *= self.params.q_primes[level - 1 - i]
        return out

    def rotate_hoisted(self, ct, steps_list):
        gks = {s: self.chest.golden_galois_key(s) for s in steps_list}
        outs = gckks.ct_rotate_hoisted(ct, steps_list, self.params, gks)
        return dict(zip(steps_list, outs))

    def conjugate(self, ct):
        return gckks.ct_conjugate(ct, self.params, self.chest.conj[0])

    def key_switch(self, ct, which: str):
        return gckks.ct_key_switch(ct, self.params, self.chest.eph[which][0])

    def drop_to_level(self, ct, level: int):
        assert level <= ct.level
        return gckks.Ciphertext([c[:level] for c in ct.c], level, ct.scale)

    def decrypt_decode(self, ct):
        return gckks.decrypt_decode(ct, self.params, self.chest.sk)

    def level(self, ct):
        return ct.level
