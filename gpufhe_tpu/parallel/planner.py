"""Mesh program planner: enumerate and AOT-lower the sharded bootstrap's
program set WITHOUT keys or data (VERDICT r3 item 4 — prove BASELINE
config 5 at production scale, compile-level).

Two pieces:

* PlanBackend — a GhostBackend (ciphertext/backend.py) extended with the
  full ShardedBackend op surface, recording every distinct MESH PROGRAM the
  orchestration layer (bootstrap.py / fftboot.py / polyeval.py) would
  instantiate: kind, level, fan geometry. Driving the real Bootstrapper
  over it yields the exact program inventory + level schedule of the
  N=2^16 double-word bootstrap — no keygen, no encodes, no device.

* lower_program — builds the real parallel/sharded.py program for one
  inventory entry and AOT-lowers it (jit.lower) with ShapeDtypeStruct
  arguments: key bundles come from jax.eval_shape over the constructor's
  own `prepare`, so ONLY SHAPES exist anywhere. The jitted shard_map fn is
  captured by temporarily wrapping jax.jit during construction (every
  make_sharded_* calls jax.jit exactly once); all big operands (tables,
  keys, ciphertext) are genuine jit ARGUMENTS in those constructors, so
  nothing large lands in the lowered module as a literal.

Used by scripts/lower_n16_mesh.py (full inventory + residency artifact)
and __graft_entry__.dryrun_multichip op #8 (fast subset).
"""

from __future__ import annotations

import contextlib
import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gpufhe_tpu.ciphertext.backend import GhostBackend, GhostCiphertext
from gpufhe_tpu.ops.context import fourstep_split
from gpufhe_tpu.params.params import CKKSParams


@dataclasses.dataclass(frozen=True)
class Program:
    """One distinct mesh program of the bootstrap pipeline."""

    kind: str  # mod_raise2 | eph_ks | fan | mult | rescale | conj
    level: int
    n_offsets: int = 0  # fan only
    n_sets: int = 0  # fan only
    pt0_mask: tuple = ()  # fan only


class _FakeChest:
    """Just enough chest for Bootstrapper to take the encapsulation path."""

    eph = {"to_eph": None, "from_eph": None}


class PlanBackend(GhostBackend):
    """Records the sharded program inventory while ghost-running the
    bootstrap orchestration (level/scale bookkeeping from GhostBackend;
    op semantics mirror parallel/backend.py ShardedBackend exactly)."""

    def __init__(self, params: CKKSParams):
        super().__init__(params)
        self.chest = _FakeChest()
        self.programs: dict[Program, int] = {}  # program -> call count
        self.ctx = None  # parity with ShardedBackend attribute surface

    def _rec(self, p: Program):
        self.programs[p] = self.programs.get(p, 0) + 1

    # -- mesh programs (each records its instantiation) ---------------------
    def mul(self, a, b):
        lvl = min(a.level, b.level)
        self._rec(Program("mult", lvl))
        # make_sharded_mult rescales ONCE; ShardedBackend.mul chains the
        # remaining scale_words-1 rescales as separate programs
        for w in range(1, self.params.scale_words):
            self._rec(Program("rescale", lvl - w))
        return super().mul(GhostCiphertext(lvl, a.scale), GhostCiphertext(lvl, b.scale))

    def rescale(self, ct):
        lvl = ct.level
        for w in range(self.params.scale_words):
            self._rec(Program("rescale", lvl - w))
        return super().rescale(ct)

    def conjugate(self, ct):
        self._rec(Program("conj", ct.level))
        return GhostCiphertext(ct.level, ct.scale)

    def rotate_hoisted(self, ct, steps_list):
        steps = tuple(steps_list)
        self._rec(Program("fan", ct.level, n_offsets=len(steps)))
        return {s: GhostCiphertext(ct.level, ct.scale) for s in steps}

    def key_switch(self, ct, which: str):
        self._rec(Program("eph_ks", ct.level))
        return GhostCiphertext(ct.level, ct.scale)

    def mod_raise(self, ct):
        assert ct.level == self.params.scale_words
        self._rec(Program("mod_raise2" if self.params.scale_words == 2
                          else "mod_raise", ct.level))
        return GhostCiphertext(self.params.num_limbs, ct.scale)

    # -- fused diagonal-fan stages (ShardedBackend.make_fan_plan mirror) ----
    def make_fan_plan(self, diag_sets, level: int, scale: float | None = None):
        scale = self.params.scale if scale is None else scale
        offsets = tuple(sorted({r for d in diag_sets for r in d if r != 0}))
        pt0_mask = tuple(0 in d for d in diag_sets)
        prog = Program("fan", level, n_offsets=len(offsets),
                       n_sets=len(diag_sets), pt0_mask=pt0_mask)
        return (prog, scale)

    def apply_fan(self, ct, plan):
        prog, pt_scale = plan
        assert ct.level == prog.level, (ct.level, prog.level)
        self._rec(prog)
        scale = ct.scale * pt_scale
        lvl = prog.level
        for _ in range(self.params.scale_words):
            scale = scale / self.params.q_primes[lvl - 1]
            lvl -= 1
        return [GhostCiphertext(lvl, scale) for _ in range(prog.n_sets)]


def plan_bootstrap(params: CKKSParams, radix_log: int, k_bound: float,
                   cheb_baby_log: int = 3):
    """Ghost-run the full bootstrap and return its program inventory."""
    from gpufhe_tpu.ciphertext.bootstrap import Bootstrapper

    be = PlanBackend(params)
    bs = Bootstrapper(be, transform="factored", radix_log=radix_log,
                      evalmod="cheb", k_bound=k_bound,
                      cheb_baby_log=cheb_baby_log, fuse_evalmod=False)
    ct = GhostCiphertext(params.scale_words, params.scale)
    out = bs(ct)
    return be.programs, out


# ---------------------------------------------------------------------------
# Shape-only AOT lowering of one inventory entry
# ---------------------------------------------------------------------------


@contextlib.contextmanager
def _capture_jit():
    """Capture the jax.jit objects a make_sharded_* constructor creates.

    NOT reentrant and not thread-safe: jax.jit is monkeypatched globally for
    the duration of the `with` body, so no other code may call jax.jit
    concurrently (the planner only ever runs constructors serially)."""
    captured: list[Any] = []
    real_jit = jax.jit

    def cap(fn, *a, **kw):
        j = real_jit(fn, *a, **kw)
        captured.append(j)
        return j

    jax.jit = cap
    try:
        yield captured
    finally:
        jax.jit = real_jit


def _sds(tree):
    """Concrete pytree -> ShapeDtypeStruct pytree (shapes only)."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype)
        if not isinstance(x, jax.ShapeDtypeStruct) else x,
        tree,
    )


def _fake_ks_key(params: CKKSParams):
    """Zero-filled DeviceKSKey at full gadget rank (shape donor).

    Concrete (not eval_shape): the constructors' `prepare` paths call
    lru-cached host-table builders whose jnp outputs would be built from
    TRACERS under eval_shape and poison the cache for every later caller
    (the CLAUDE.md lazily-populated-cache trap). A zero key is ~150 MB
    transient at N=2^16 on the 125 GB host — cheap and safe."""
    from gpufhe_tpu.keys.keys import DeviceKSKey
    from gpufhe_tpu.primitives.rns import ks_groups

    dnum = len(ks_groups(params, params.num_limbs))
    t = params.num_limbs + len(params.p_primes)
    z = jnp.zeros((dnum, t, params.n), jnp.uint32)
    return DeviceKSKey(z, z)


def lower_program(prog: Program, params: CKKSParams, mesh: Mesh):
    """Build + AOT-lower one mesh program with shape-only inputs.

    Returns (lowered, meta) where meta holds per-device key-bundle /
    plaintext residency bytes for the residency table."""
    from gpufhe_tpu.parallel import sharded as sh

    n1, n2 = fourstep_split(params.n)
    n_limb = mesh.shape["limb"]
    n_coeff = mesh.shape["coeff"]
    k = prog.level
    alpha = len(params.p_primes)
    ct_c = jax.ShapeDtypeStruct((k, n1, n2), jnp.uint32)
    fake_key = _fake_ks_key(params)

    def tree_bytes(tree, frac=1.0):
        return int(sum(
            math.prod(x.shape) * x.dtype.itemsize * frac
            for x in jax.tree_util.tree_leaves(tree)
        ))

    meta = {"kind": prog.kind, "level": k}
    # the constructors are lru_cached: clear so _capture_jit actually sees
    # the jax.jit call (a cache hit would create no new jit object)
    for c in (sh.make_sharded_mult, sh.make_sharded_fan,
              sh.make_sharded_hoisted_fan, sh._make_sharded_galois,
              sh.make_sharded_rotation, sh.make_sharded_conjugation):
        c.cache_clear()
    if prog.kind == "mult":
        with _capture_jit() as caps:
            run, prepare = sh.make_sharded_mult(params, k, mesh)
        ks, gmax = prepare(fake_key)
        alpha_n = len(params.p_primes)
        lowered = caps[-1].lower(
            ct_c, ct_c, ct_c, ct_c,
            jax.ShapeDtypeStruct((k,), jnp.uint32),
            _full_tables_sds(params),
            _idx_sds(k), _idx_sds(k + alpha_n), _idx_sds(k - 1),
            _sds(ks),
        )
        meta["key_bytes_per_device"] = tree_bytes(
            (ks.key_b, ks.key_a), 1 / (n_limb * n_coeff))
    elif prog.kind == "fan":
        n_off = prog.n_offsets
        n_sets = max(prog.n_sets, 1)
        pt0_mask = prog.pt0_mask or (False,) * n_sets
        with _capture_jit() as caps:
            run, prepare = sh.make_sharded_fan(
                params, k, mesh, n_off, n_sets, pt0_mask)
        gks = [fake_key] * n_off
        shared, stacks = prepare(list(gks), gks[0])
        lins = jax.ShapeDtypeStruct((n_off, n1, n2), jnp.int32)
        pt = jax.ShapeDtypeStruct((n_off, k + alpha, n1, n2), jnp.uint32)
        pt0 = tuple(
            jax.ShapeDtypeStruct((k + alpha, n1, n2), jnp.uint32) if has
            else None for has in pt0_mask)
        resc = _fan_resc_sds(params, k)
        lowered = caps[-1].lower(
            ct_c, ct_c, lins, _full_tables_sds(params),
            _idx_sds(k), _idx_sds(k + alpha), _idx_sds(k - params.scale_words),
            _sds(shared), resc,
            _sds(stacks), tuple(pt for _ in range(n_sets)), pt0)
        meta["key_bytes_per_device"] = tree_bytes(
            stacks, 1 / (n_limb * n_coeff))
        meta["pt_bytes_per_device"] = tree_bytes(
            (tuple(pt for _ in range(n_sets)),
             tuple(p for p in pt0 if p is not None)), 1 / n_coeff)
    elif prog.kind in ("conj", "eph_ks", "rotation"):
        g = 2 * params.n - 1 if prog.kind == "conj" else 1
        with _capture_jit() as caps:
            run, prepare = sh._make_sharded_galois(params, k, mesh, g)
        ks, gmax = prepare(fake_key)
        send_idx, src_of, col_idx = sh._perm_route_tables(g, n1, n2, n_coeff)
        lowered = caps[-1].lower(
            ct_c, ct_c, _sds(jnp.asarray(send_idx)),
            _sds(jnp.asarray(src_of)), _sds(jnp.asarray(col_idx)),
            _full_tables_sds(params), _idx_sds(k), _idx_sds(k + alpha),
            _sds(ks))
        meta["key_bytes_per_device"] = tree_bytes(
            (ks.key_b, ks.key_a), 1 / (n_limb * n_coeff))
    elif prog.kind == "rescale":
        from gpufhe_tpu.parallel.backend import ShardedBackend

        be = ShardedBackend(params, mesh, chest=None)
        with _capture_jit() as caps:
            be._rescale_fn(k)
        lowered = caps[-1].lower(
            ct_c, _full_tables_sds(params), _idx_sds(k), _idx_sds(k - 1),
            jax.ShapeDtypeStruct((k - 1,), jnp.uint32),
            jax.ShapeDtypeStruct((k - 1,), jnp.uint32))
    elif prog.kind == "mod_raise2":
        from gpufhe_tpu.parallel.backend import ShardedBackend

        be = ShardedBackend(params, mesh, chest=None)
        with _capture_jit() as caps:
            be._mod_raise2_fn()
        full = params.num_limbs
        lowered = caps[-1].lower(
            jax.ShapeDtypeStruct((2, n1, n2), jnp.uint32),
            _full_tables_sds(params), _idx_sds(2), _idx_sds(full),
            jax.ShapeDtypeStruct((full,), jnp.uint32),
            jax.ShapeDtypeStruct((full,), jnp.uint32))
    elif prog.kind == "mod_raise":
        from gpufhe_tpu.parallel.backend import ShardedBackend

        be = ShardedBackend(params, mesh, chest=None)
        with _capture_jit() as caps:
            be._mod_raise_fn()
        full = params.num_limbs
        lowered = caps[-1].lower(
            jax.ShapeDtypeStruct((1, n1, n2), jnp.uint32),
            _full_tables_sds(params), _idx_sds(1), _idx_sds(full),
            jax.ShapeDtypeStruct((full, 1, 1), jnp.uint32))
    else:
        raise ValueError(prog.kind)
    return lowered, meta


def _full_tables_sds(params):
    """Shape-only stand-in for the ONE shared full-chain ShardedNTT set
    every mesh program now receives (sharded.py full_ntt_tables)."""
    from gpufhe_tpu.parallel import sharded as sh

    return _sds(sh.full_ntt_tables(params))


def _idx_sds(n: int):
    return jax.ShapeDtypeStruct((n,), jnp.int32)


def _fan_resc_sds(params, k):
    from gpufhe_tpu.primitives.rns import make_ks_context

    words = params.scale_words
    resc = []
    for w in range(words):
        ksc_w = make_ks_context(params, k - w)
        lvl = k - w
        resc.append((
            jax.ShapeDtypeStruct((lvl - 1,), jnp.uint32),
            jax.ShapeDtypeStruct((lvl - 1,), jnp.uint32),
            _sds(ksc_w.qlast_mod),
            _sds(ksc_w.qlast_inv_mont),
            jnp.uint32(int(params.q_primes[lvl - 1]) // 2),
        ))
    return tuple(resc)
