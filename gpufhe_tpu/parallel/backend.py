"""ShardedBackend: the backend.py op surface over mesh-sharded ciphertexts.

Every op is a shard_map program over the ('limb','coeff') mesh reusing the
bodies in parallel/sharded.py; because bootstrap.py / linalg.py / fftboot.py
are written against the backend protocol, composing them on this backend
yields the SHARDED bootstrap (BASELINE config 5's "sharded over a multi-host
mesh") with no changes to the orchestration code.

Representation: a ShardedCiphertext holds eval3d components [K, n1, n2]
with NamedSharding P(None, 'coeff', None); keys/tables ride in pre-sharded
bundles cached per (level, key identity). Multi-step rotate_hoisted runs
the shared-hoist fan program (one ModUp + NTT + all_gather for the whole
fan, sharded.py make_sharded_hoisted_fan); single steps use the standalone
rotation program.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.ops.context import fourstep_split, make_context
from gpufhe_tpu.ops.modops import add_mod, barrett_reduce_u32, mont_mul, mul_mod, sub_mod
from gpufhe_tpu.parallel import sharded as sh
from gpufhe_tpu.params.params import CKKSParams


@dataclasses.dataclass
class ShardedCiphertext:
    c: list  # eval3d jnp arrays [K, n1, n2], sharded P(None, 'coeff', None)
    level: int
    scale: float


class ShardedBackend:
    """Duck-types ciphertext/backend.py's DeviceBackend over a device mesh."""

    def __init__(self, params: CKKSParams, mesh: Mesh, chest):
        self.params = params
        self.mesh = mesh
        self.chest = chest
        self.ctx = make_context(params)
        self.n1, self.n2 = fourstep_split(params.n)
        self._sharding = NamedSharding(mesh, P(None, "coeff", None))
        self._n_limb = mesh.shape["limb"]
        # uniform-constant encode caches, mirroring DeviceBackend (the
        # polynomial evaluators re-encode the same constants every call; an
        # uncached encode is a host FFT + upload — it made sharded EvalMod
        # steady-state encode-bound, VERDICT r2 weak #2)
        self._const_cache = {}  # (value, scale, level) -> sharded eval3d pt
        self._addp_cache = {}  # (value, scale, level) -> canonical eval3d pt
        self.encode_misses = 0  # host encodes actually performed

    # -- plumbing -----------------------------------------------------------
    def from_single(self, ct) -> ShardedCiphertext:
        return ShardedCiphertext(
            [sh.shard_ct_component(c, self.params, self.mesh) for c in ct.c],
            ct.level, ct.scale,
        )

    def to_single(self, ct: ShardedCiphertext):
        from gpufhe_tpu.ciphertext.ct import Ciphertext

        return Ciphertext(
            [jnp.asarray(sh.unshard_ct_component(c)) for c in ct.c],
            ct.level, ct.scale,
        )

    def level(self, ct):
        return ct.level

    def drop_to_level(self, ct, level: int):
        assert level <= ct.level
        return ShardedCiphertext([c[:level] for c in ct.c], level, ct.scale)

    def _align(self, a, b):
        lvl = min(a.level, b.level)
        return self.drop_to_level(a, lvl), self.drop_to_level(b, lvl)

    def _q(self, level):
        return self.ctx.q[:level][:, None, None]

    # -- pointwise ops (sharding-transparent: plain jit, no comms) ----------
    def add(self, a, b):
        a, b = self._align(a, b)
        q = self._q(a.level)
        return ShardedCiphertext(
            [add_mod(x, y, q) for x, y in zip(a.c, b.c)], a.level, a.scale
        )

    def sub(self, a, b):
        a, b = self._align(a, b)
        q = self._q(a.level)
        return ShardedCiphertext(
            [sub_mod(x, y, q) for x, y in zip(a.c, b.c)], a.level, a.scale
        )

    @staticmethod
    def _uniform_key(z, scale: float, level: int):
        """Cache key for uniform-constant vectors, else None."""
        z = np.asarray(z)
        if z.ndim == 0 or (z.ndim == 1 and z.size and (z == z.flat[0]).all()):
            return (complex(z.flat[0] if z.ndim else z), float(scale), level)
        return None

    def _encode_e3(self, z, scale, level):
        """Host encode -> device NTT-domain Montgomery eval3d, sharded.

        Uniform-constant vectors are cached keyed on (value, scale, level),
        mirroring DeviceBackend.encode_slots — steady-state bootstrap
        iterations must perform ZERO host encodes."""
        key = self._uniform_key(z, scale, level)
        if key is not None:
            hit = self._const_cache.get(key)
            if hit is not None:
                return hit
            z = np.broadcast_to(np.complex128(key[0]), (self.params.slots,))
        from gpufhe_tpu.encoding.encoder import plaintext_to_device

        self.encode_misses += 1
        pt = gckks.encode(
            np.asarray(z, dtype=np.complex128), scale,
            self.params.q_primes[:level], self.params.n,
        )
        nat = plaintext_to_device(pt, self.params, self.ctx)  # [level, N] natural
        e3 = sh.natural_to_eval3d(nat, self.n1, self.n2)
        out = jax.device_put(e3, self._sharding)
        if key is not None:
            self._const_cache[key] = out
        return out

    def encode_slots(self, z, scale: float, level: int):
        return self._encode_e3(z, scale, level), scale

    def mul_plain(self, ct, pt_handle):
        pt, scale = pt_handle
        q = self._q(ct.level)
        qinv = self.ctx.qinv_neg[: ct.level][:, None, None]
        return ShardedCiphertext(
            [mont_mul(x, pt[: ct.level], q, qinv) for x in ct.c],
            ct.level, ct.scale * scale,
        )

    def add_plain(self, ct, z):
        from gpufhe_tpu.ops.modops import from_mont

        q = self._q(ct.level)
        key = self._uniform_key(z, float(ct.scale), ct.level)
        pt = self._addp_cache.get(key) if key is not None else None
        if pt is None:
            pt_mont = self._encode_e3(
                np.broadcast_to(
                    np.asarray(z, dtype=np.complex128), (self.params.slots,)
                ),
                ct.scale, ct.level,
            )
            qinv = self.ctx.qinv_neg[: ct.level][:, None, None]
            pt = from_mont(pt_mont, q, qinv)  # back to canonical
            if key is not None:
                self._addp_cache[key] = pt
        c = list(ct.c)
        c[0] = add_mod(c[0], pt, q)
        return ShardedCiphertext(c, ct.level, ct.scale)

    # -- mesh programs ------------------------------------------------------
    def mul(self, a, b):
        a, b = self._align(a, b)
        run, prepare = sh.make_sharded_mult(self.params, a.level, self.mesh)
        bundle = self._mult_bundle(a.level)
        c0, c1 = run(a.c[0], a.c[1], b.c[0], b.c[1], bundle)
        # make_sharded_mult rescales ONCE ([K] -> [K-1]); at dw
        # (scale_words=2) chain the remaining rescale like
        # DeviceBackend.mul's fused double rescale — bit-identical (the
        # NTT/iNTT round trip between chained rescales cancels exactly,
        # ct.py _plain_mac_core note). The old single-word bookkeeping
        # drifted the tracked scale 2^28x per dw mult -> inf -> NaN encodes
        # (the boot_mid_dw sharded-bootstrap failure).
        lvl = a.level - 1
        scale = a.scale * b.scale / self.params.q_primes[a.level - 1]
        cs = [c0, c1]
        for _ in range(self.params.scale_words - 1):
            f = self._rescale_fn(lvl)
            cs = [f(c) for c in cs]
            scale /= self.params.q_primes[lvl - 1]
            lvl -= 1
        return ShardedCiphertext(cs, lvl, scale)

    @functools.lru_cache(maxsize=None)
    def _mult_bundle(self, level):
        _, prepare = sh.make_sharded_mult(self.params, level, self.mesh)
        return prepare(self.chest.device_rlk)

    @functools.lru_cache(maxsize=None)
    def _rescale_fn(self, level):
        params, mesh = self.params, self.mesh
        ctx = self.ctx
        k = level
        t_full = sh.full_ntt_tables(params)  # shared across all programs
        idx_q = jnp.arange(k, dtype=jnp.int32)
        idx_qm1 = jnp.arange(k - 1, dtype=jnp.int32)
        from gpufhe_tpu.primitives.rns import make_ks_context

        ksc = make_ks_context(params, level)
        q_last_half = int(params.q_primes[k - 1]) // 2
        qlast_mod = ksc.qlast_mod
        qlast_inv = ksc.qlast_inv_mont

        def body(comp, t_q, t_qm1, qlast_mod, qlast_inv):
            qm = t_qm1.q[:, None, None]
            qminv = t_qm1.qinv[:, None, None]
            coeff = sh.ntt_inv_body(comp, t_q)
            last = coeff[k - 1]
            r = barrett_reduce_u32(last[None], qm)
            lifted = jnp.where(
                last[None] > jnp.uint32(q_last_half),
                sub_mod(r, qlast_mod[:, None, None], qm), r,
            )
            down = mont_mul(
                sub_mod(coeff[: k - 1], lifted, qm),
                qlast_inv[:, None, None], qm, qminv,
            )
            return sh.ntt_fwd_body(down, t_qm1)

        spec = P(None, "coeff", None)
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, sh.ShardedNTT.spec(), sh.ShardedNTT.spec(), P(), P()),
            out_specs=spec, check_vma=False,
        )

        def outer(comp, t_full, idx_q, idx_qm1, qlast_mod, qlast_inv):
            return fn(comp, sh.gather_ntt_tables(t_full, idx_q),
                      sh.gather_ntt_tables(t_full, idx_qm1),
                      qlast_mod, qlast_inv)

        jit_fn = jax.jit(outer)
        return lambda comp: jit_fn(comp, t_full, idx_q, idx_qm1, qlast_mod,
                                   qlast_inv)

    def rescale(self, ct):
        # scale_words chained single-limb rescales (DeviceBackend.rescale
        # mirror — a dw rescale divides by the limb PAIR)
        for _ in range(self.params.scale_words):
            f = self._rescale_fn(ct.level)
            ct = ShardedCiphertext(
                [f(c) for c in ct.c], ct.level - 1,
                ct.scale / self.params.q_primes[ct.level - 1],
            )
        return ct

    def rescale_prod(self, level: int) -> float:
        """Product of the primes a rescale from `level` divides by
        (DeviceBackend.rescale_prod mirror — polyeval's scale steering
        falls back to ONE prime without it, which is wrong for dw)."""
        w = self.params.scale_words
        out = 1.0
        for i in range(w):
            out *= self.params.q_primes[level - 1 - i]
        return out

    def _rotation_run(self, level, steps):
        run, prepare = sh.make_sharded_rotation(self.params, level, self.mesh, steps)
        return run, prepare

    @functools.lru_cache(maxsize=None)
    def _rot_bundle(self, level, steps):
        _, prepare = sh.make_sharded_rotation(self.params, level, self.mesh, steps)
        if steps == "conj":
            key = self.chest.conj_key()
        else:
            key = self.chest.galois_key(steps)
        return prepare(key)

    @functools.lru_cache(maxsize=None)
    def _hoisted_fan_plan(self, level, steps_tuple):
        from gpufhe_tpu.golden.ckks import galois_exponent

        run, prepare = sh.make_sharded_hoisted_fan(
            self.params, level, self.mesh, len(steps_tuple)
        )
        bundle = prepare([self.chest.galois_key(s) for s in steps_tuple])
        lins = jax.device_put(
            jnp.asarray(
                np.stack(
                    [sh._perm_lin_e3(galois_exponent(s, self.params.n),
                                     self.n1, self.n2) for s in steps_tuple]
                )
            ),
            NamedSharding(self.mesh, P(None, "coeff", None)),
        )
        return run, lins, bundle

    def rotate_hoisted(self, ct, steps_list):
        steps_tuple = tuple(steps_list)
        if len(steps_tuple) == 1:
            steps = steps_tuple[0]
            run, _ = sh.make_sharded_rotation(self.params, ct.level, self.mesh, steps)
            c0, c1 = run(ct.c[0], ct.c[1], self._rot_bundle(ct.level, steps))
            return {steps: ShardedCiphertext([c0, c1], ct.level, ct.scale)}
        # shared-hoist fan: one ModUp + NTT + all_gather for the whole list
        run, lins, bundle = self._hoisted_fan_plan(ct.level, steps_tuple)
        outs = run(ct.c[0], ct.c[1], lins, bundle)
        return {
            s: ShardedCiphertext([c0, c1], ct.level, ct.scale)
            for s, (c0, c1) in zip(steps_tuple, outs)
        }

    def conjugate(self, ct):
        steps_id = 2 * self.params.n - 1  # conj automorphism marker
        run, prepare = sh.make_sharded_conjugation(self.params, ct.level, self.mesh)
        c0, c1 = run(ct.c[0], ct.c[1], self._conj_bundle(ct.level))
        return ShardedCiphertext([c0, c1], ct.level, ct.scale)

    @functools.lru_cache(maxsize=None)
    def _conj_bundle(self, level):
        _, prepare = sh.make_sharded_conjugation(self.params, level, self.mesh)
        return prepare(self.chest.conj_key())

    # -- fused diagonal-fan stages (mesh mirror of ct_diag_fan) -------------
    def _encode_qp_e3(self, z, scale, level):
        """Host encode over the QP basis -> Montgomery eval3d, sharded."""
        from gpufhe_tpu.ops.modops import to_mont
        from gpufhe_tpu.ops.ntt import ntt_fwd
        from gpufhe_tpu.primitives.keyswitch import qp_indices

        qp_primes = self.params.q_primes[:level] + self.params.p_primes
        pt = gckks.encode(
            np.asarray(z, dtype=np.complex128), scale, qp_primes, self.params.n
        )
        qp_idx = np.asarray(qp_indices(self.params, level))
        x_ntt = ntt_fwd(
            jnp.asarray(pt.astype(np.uint32)), self.ctx, limbs=qp_idx
        )
        q = self.ctx.q[qp_idx][:, None]
        mont = to_mont(
            x_ntt, q, self.ctx.qinv_neg[qp_idx][:, None], self.ctx.r2[qp_idx][:, None]
        )
        e3 = sh.natural_to_eval3d(mont, self.n1, self.n2)
        return jax.device_put(e3, self._sharding)

    def make_fan_plan(self, diag_sets, level: int, scale: float | None = None):
        from gpufhe_tpu.golden.ckks import galois_exponent

        scale = self.params.scale if scale is None else scale
        offsets = tuple(sorted({r for d in diag_sets for r in d if r != 0}))
        zeros = np.zeros(self.params.slots, dtype=np.complex128)
        pt_stacks, pt0s, pt0_mask = [], [], []
        for dset in diag_sets:
            assert any(r != 0 for r in dset), "each set needs a nonzero offset"
            pt_stacks.append(
                jnp.stack(
                    [self._encode_qp_e3(dset.get(r, zeros), scale, level)
                     for r in offsets]
                )
            )
            has0 = 0 in dset
            pt0_mask.append(has0)
            pt0s.append(self._encode_qp_e3(dset[0], scale, level) if has0 else None)
        lins = jax.device_put(
            jnp.asarray(
                np.stack(
                    [sh._perm_lin_e3(galois_exponent(r, self.params.n),
                                     self.n1, self.n2) for r in offsets]
                )
            ),
            NamedSharding(self.mesh, P(None, "coeff", None)),
        )
        run, prepare = sh.make_sharded_fan(
            self.params, level, self.mesh, len(offsets), len(diag_sets),
            tuple(pt0_mask),
        )
        gk_list = [self.chest.galois_key(s) for s in offsets]
        bundle = prepare(gk_list, gk_list[0])
        return (level, scale, run, lins, bundle, tuple(pt_stacks), tuple(pt0s))

    def apply_fan(self, ct, plan):
        level, pt_scale, run, lins, bundle, pt_stacks, pt0s = plan
        assert ct.level == level, (ct.level, level)
        outs = run(ct.c[0], ct.c[1], lins, bundle, pt_stacks, pt0s)
        scale = ct.scale * pt_scale
        lvl = level
        for _ in range(self.params.scale_words):
            scale = scale / self.params.q_primes[lvl - 1]
            lvl -= 1
        return [ShardedCiphertext([c0, c1], lvl, scale) for c0, c1 in outs]

    def key_switch(self, ct, which: str):
        """Re-encrypt under the encapsulation key `which` ('to_eph' /
        'from_eph') — the sharded Galois program with the identity
        automorphism (g=1): c0 + ks0(c1), ks1. Enables the sparse-secret
        encapsulation ModRaise (bootstrap.py) on the mesh."""
        run, _ = sh._make_sharded_galois(self.params, ct.level, self.mesh, 1)
        bundle = self._eph_bundle(ct.level, which)
        c0, c1 = run(ct.c[0], ct.c[1], bundle)
        return ShardedCiphertext([c0, c1], ct.level, ct.scale)

    @functools.lru_cache(maxsize=None)
    def _eph_bundle(self, level, which: str):
        ksk = self.chest.eph[which][1]
        return sh.make_sharded_ks(self.params, level, ksk, self._n_limb)

    def mod_raise(self, ct):
        if self.params.scale_words == 2:
            assert ct.level == 2
            f = self._mod_raise2_fn()
        else:
            assert ct.level == 1
            f = self._mod_raise_fn()
        return ShardedCiphertext(
            [f(c) for c in ct.c], self.params.num_limbs, ct.scale
        )

    @functools.lru_cache(maxsize=None)
    def _mod_raise2_fn(self):
        """Sharded double-word ModRaise: centered CRT lift from the composite
        base Q0 = q0*q1 into the full chain (mirror of ct.py
        _mod_raise2_core — same centering comparisons, bit-exact)."""
        from gpufhe_tpu.ciphertext.ct import _dw_modraise_consts

        params, mesh, ctx = self.params, self.mesh, self.ctx
        level = params.num_limbs
        q0inv_m, half1, rem, q0_mod_m, big_mod = _dw_modraise_consts(params)
        t_shared = sh.full_ntt_tables(params)
        idx_q01 = jnp.arange(2, dtype=jnp.int32)
        idx_full = jnp.arange(level, dtype=jnp.int32)
        q1_s = ctx.q[1]
        q1inv_s = ctx.qinv_neg[1]

        def body(comp, t_q01, t_full, q0_mod_m, big_mod):
            q = t_full.q[:, None, None]
            qinv = t_full.qinv[:, None, None]
            coeff = sh.ntt_inv_body(comp, t_q01)  # [2, n1/C, n2]
            x0, x1 = coeff[0], coeff[1]
            x0m1 = barrett_reduce_u32(x0, q1_s)
            diff = sub_mod(x1, x0m1, q1_s)
            t = mont_mul(diff, q0inv_m[0], q1_s, q1inv_s)
            cond = (t > half1) | ((t == half1) & (x0 > rem))
            a = barrett_reduce_u32(x0[None], q)
            b = barrett_reduce_u32(t[None], q)
            v0 = add_mod(a, mont_mul(b, q0_mod_m[:, None, None], q, qinv), q)
            v = jnp.where(cond[None], sub_mod(v0, big_mod[:, None, None], q), v0)
            return sh.ntt_fwd_body(v, t_full)

        spec = P(None, "coeff", None)
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, sh.ShardedNTT.spec(), sh.ShardedNTT.spec(),
                      P(None), P(None)),
            out_specs=spec, check_vma=False,
        )

        def outer(comp, t_shared, idx_q01, idx_full, q0_mod_m, big_mod):
            return fn(comp, sh.gather_ntt_tables(t_shared, idx_q01),
                      sh.gather_ntt_tables(t_shared, idx_full),
                      q0_mod_m, big_mod)

        jit_fn = jax.jit(outer)
        return lambda comp: jit_fn(comp, t_shared, idx_q01, idx_full,
                                   q0_mod_m, big_mod)

    @functools.lru_cache(maxsize=None)
    def _mod_raise_fn(self):
        params, mesh, ctx = self.params, self.mesh, self.ctx
        level = params.num_limbs
        q0 = int(params.q_primes[0])
        t_shared = sh.full_ntt_tables(params)
        idx_q0 = jnp.arange(1, dtype=jnp.int32)
        idx_full = jnp.arange(level, dtype=jnp.int32)
        qlift = barrett_reduce_u32(
            jnp.full((level, 1, 1), jnp.uint32(q0)), ctx.q[:level][:, None, None]
        )

        def body(comp, t_q0, t_full, qlift):
            q = t_full.q[:, None, None]
            coeff = sh.ntt_inv_body(comp, t_q0)  # [1, n1/C, n2]
            r = barrett_reduce_u32(coeff, q)
            lifted = jnp.where(coeff > jnp.uint32(q0 // 2), sub_mod(r, qlift, q), r)
            return sh.ntt_fwd_body(lifted, t_full)

        spec = P(None, "coeff", None)
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, sh.ShardedNTT.spec(), sh.ShardedNTT.spec(),
                      P(None, None, None)),
            out_specs=spec, check_vma=False,
        )

        def outer(comp, t_shared, idx_q0, idx_full, qlift):
            return fn(comp, sh.gather_ntt_tables(t_shared, idx_q0),
                      sh.gather_ntt_tables(t_shared, idx_full), qlift)

        jit_fn = jax.jit(outer)
        return lambda comp: jit_fn(comp, t_shared, idx_q0, idx_full, qlift)

    def decrypt_decode(self, ct):
        from gpufhe_tpu.ciphertext.ct import decrypt_decode

        return decrypt_decode(
            self.to_single(ct), self.params, self.chest.device_sk, self.ctx
        )
