"""Attribute the L=30 fused-mult wall time to its pipeline stages.

VERDICT r2 item 1: BENCH_r02 put the N=2^16 L=30 mult at 64.4% of the
traffic-model speed of light while L=48 dw sits at 94.9% — this script
measures where the 0.43 ms goes. Each stage of _mul_full_core is timed as
its own chained one-jit program (bench.py methodology: fori_loop +
optimization_barrier, read-synced wall clock), then compared against its
own HBM traffic under two table-accounting policies:

  * "model"  — x in + out + per-limb twiddle column (3 limb-planes per
    limb-transform): the bench.py traffic model, which counts the n1 x n1 /
    n2 x n2 digit matrices once per stage.
  * "full"   — + the per-limb wl/wr int8 digit matrices the Pallas kernel
    actually maps per grid step (2 more limb-planes at N=2^16): what the
    kernel streams if nothing is cached across grid steps.

Whichever policy's implied bandwidth stays below HBM peak across BOTH the
L=30 and dw presets is the physical one; the stage table shows which stage
is off its roofline. Run on the real chip.
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

from __graft_entry__ import _random_ct, _random_key, _setup
from gpufhe_tpu.ciphertext.ct import _mul_full_core
from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv
from gpufhe_tpu.ops.modops import add_mod, mont_mul, mul_mod
from gpufhe_tpu.primitives.keyswitch import key_rows, key_switch_core, qp_indices
from gpufhe_tpu.primitives.rns import make_ks_context, mod_down, mod_up, rescale

assert jax.devices()[0].platform == "tpu", jax.devices()

PRESET = os.environ.get("PROFILE_PRESET", "config5_boot")
CHAIN = int(os.environ.get("PROFILE_CHAIN", "64"))  # floor noise is ~±0.1 ms
# through the tunnel — the chain must make every stage ≫ that (the alpha=15
# retune shrank per-stage times ~4x below the CHAIN=8 resolution)
ITERS = int(os.environ.get("PROFILE_ITERS", "3"))
HBM = float(os.environ.get("PEAK_HBM_GBPS", 819e9))

params, ctx, level, _ = _setup(PRESET)
k = level
alpha = params.alpha
dnum = params.dnum
w = params.scale_words
n = params.n
kscs = tuple(make_ks_context(params, k - i) for i in range(w))
ksc = kscs[0]
qp_idx = qp_indices(params, k)
rng = np.random.default_rng(0)
rlk = _random_key(params, rng)
a0, a1 = _random_ct(params, k, rng)
b0, b1 = _random_ct(params, k, rng)
PLANE = n * 4  # one u32 limb-plane
print(f"# preset={PRESET} N={n} L={k} alpha={alpha} dnum={dnum} "
      f"scale_words={w}", flush=True)


_floor_cache = {}


def _tie(xs, y):
    """Genuine data dependency: xor-REDUCE every output leaf of y into the
    first input (arbitrary u32 values are safe for every kernel here: no
    data-dependent control flow, Montgomery/Barrett and the signed-digit NTT
    are total on u32). Two traps this avoids, both measured on chip:
    optimization_barrier does NOT serialize — XLA DCEs the unused tuple
    element (barrier chain == empty chain, scripts/chain_truth.py), which is
    how the round-2 bench numbers turned out to be pure dispatch overhead;
    and tying on a single output ELEMENT lets the algebraic simplifier sink
    the slice into the dots and skip the rest of the transform (raw == floor
    for ntt_fwd[30]). The full reduce forces every output element."""
    s = jnp.zeros((), jnp.uint32)
    for leaf in jax.tree_util.tree_leaves(y):
        s = s ^ jax.lax.reduce(
            leaf.astype(jnp.uint32), np.uint32(0), jax.lax.bitwise_xor,
            tuple(range(leaf.ndim)),
        )
    return (xs[0] ^ s,) + tuple(xs[1:])


def timed_chain(name, f, args, consts=(), chain=None):
    """Chained latency of f(*args, *consts): per-call seconds, read-synced
    min-of-ITERS, with the empty-loop floor for the same carry subtracted.

    `chain` overrides CHAIN per stage: cheap leaves (mod_down, rescale) sit
    below the ~±0.1 ms floor-noise resolution at CHAIN=64 and shipped as
    0.0 in the round-3 artifact (VERDICT r3 weak #1) — an 8x longer chain
    scales the per-call noise down 8x and makes them measurable.

    `consts` (e.g. the relin key) enter as jit ARGUMENTS — loop-invariant,
    outside the fori carry — never as closure constants: closed-over device
    arrays lower as HLO literals and the dw relin key (~300 MB) blows the
    tunneled remote-compile request cap (HTTP 413).

    Round 5: poly-shaped args ([L, N]) ride the fori CARRY in the
    kernel-native [L, n1, n2] view — a 2D carry forces a physical relayout
    of every carried component per iteration, +1.06 us/limb-transform of
    pure harness artifact (scripts/ntt_prefetch_probe.py; NTT_N16.json
    siblings). The 2D<->3D reshapes around f cancel against the NTT
    wrapper's own (zero-copy views of the same natural-order data)."""
    chain = CHAIN if chain is None else chain
    from gpufhe_tpu.ops.context import fourstep_split

    n1f, n2f = fourstep_split(n)

    def to3(x):
        return (x.reshape(x.shape[0], n1f, n2f)
                if x.ndim == 2 and x.shape[-1] == n else x)

    def to2(x):
        return (x.reshape(x.shape[0], n)
                if x.ndim == 3 and x.shape[-2:] == (n1f, n2f) else x)

    args = tuple(to3(x) for x in args)

    @jax.jit
    def prog(xs, cs):
        def body(_, xs):
            return _tie(xs, f(*(to2(x) for x in xs), *cs))

        return jax.lax.fori_loop(0, chain, body, tuple(xs))

    shapes = tuple((x.shape, str(x.dtype)) for x in args) + (chain,)

    @jax.jit
    def floor_prog(xs, cs):
        def body(_, xs):
            return _tie(xs, (xs[0],))

        return jax.lax.fori_loop(0, chain, body, tuple(xs))

    def run(prog, args):
        t0 = time.time()
        compiled = prog.lower(tuple(args), tuple(consts)).compile()
        tc = time.time() - t0
        out = compiled(tuple(args), tuple(consts))
        jax.block_until_ready(out)
        _ = np.asarray(out[0].reshape(-1)[:4])  # warm the read-sync program
        dts = []
        for _ in range(ITERS):
            t0 = time.time()
            out = compiled(tuple(out), tuple(consts))
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

# -- 1. bare NTT transforms at the three limb batch sizes -------------------
q_limbs = list(range(k))


def f_ntt_fwd_k(x):
    return ntt_fwd(x, ctx, limbs=q_limbs)


def f_ntt_inv_k(x):
    return ntt_inv(x, ctx, limbs=q_limbs)


def f_ntt_fwd_qp(x):
    return ntt_fwd(x, ctx, limbs=qp_idx)


def f_ntt_inv_qp(x):
    return ntt_inv(x, ctx, limbs=qp_idx)


# Per-stage chain lengths: every leaf must sit ≫ the ~24 ms dispatch+read
# floor's run-to-run noise, so cheap leaves chain LONGER (VERDICT r3: the
# round-3 artifact shipped mod_down/rescale as 0.0 — below resolution at
# CHAIN=64). Targets: wall/pass >= ~10x floor for each stage.
C_NTT = CHAIN * 16      # ~0.15-0.3 ms leaves
C_ELEM = CHAIN * 32     # tensor / ks_mac (~0.1 ms)
C_CHEAP = CHAIN * 64    # mod_down / rescale (~0.05 ms)
C_BIG = CHAIN * 2       # key_switch / mul_full (2-3 ms)

x_k = a0
qp = np.asarray(params.q_primes + params.p_primes, dtype=np.uint32)[
    np.asarray(qp_idx)
]
x_qp = jnp.asarray(
    rng.integers(0, qp[:, None], size=(k + alpha, n), dtype=np.uint32)
)
results["ntt_fwd_k"] = timed_chain(f"ntt_fwd[{k}]", f_ntt_fwd_k, (x_k,),
                                   chain=C_NTT)
results["ntt_inv_k"] = timed_chain(f"ntt_inv[{k}]", f_ntt_inv_k, (x_k,),
                                   chain=C_NTT)
results["ntt_fwd_qp"] = timed_chain(
    f"ntt_fwd[{k + alpha}]", f_ntt_fwd_qp, (x_qp,), chain=C_NTT
)
results["ntt_inv_qp"] = timed_chain(
    f"ntt_inv[{k + alpha}]", f_ntt_inv_qp, (x_qp,), chain=C_NTT
)

for nm, key, nl in (("ntt_fwd_k", "ntt_fwd_k", k), ("ntt_fwd_qp", "ntt_fwd_qp",
                                                    k + alpha)):
    dt = results[key]
    if dt <= 0:
        print(f"#   {nm}: below floor noise — raise PROFILE_CHAIN", flush=True)
        continue
    bw3 = nl * 3 * PLANE / dt
    bw5 = nl * 5 * PLANE / dt
    print(f"#   {nm}: per-limb {dt / nl * 1e6:.1f} us; implied BW "
          f"model(3-plane) {bw3 / 1e9:.0f} GB/s, full(5-plane incl wl/wr) "
          f"{bw5 / 1e9:.0f} GB/s vs peak {HBM / 1e9:.0f}", flush=True)

# -- 2. elementwise stages ---------------------------------------------------


def f_tensor(a0, a1, b0, b1):
    q = ctx.q[:k][:, None]
    qinv = ctx.qinv_neg[:k][:, None]
    r2 = ctx.r2[:k][:, None]
    d0 = mul_mod(a0, b0, q, qinv, r2)
    d1 = add_mod(mul_mod(a0, b1, q, qinv, r2), mul_mod(a1, b0, q, qinv, r2), q)
    d2 = mul_mod(a1, b1, q, qinv, r2)
    return d0, d1, d2


results["tensor"] = timed_chain("tensor(3 mulmod)", f_tensor,
                                (a0, a1, b0, b1), chain=C_ELEM)


def f_modup(x):
    return tuple(mod_up(x, params, k, ctx, ksc))


results["mod_up"] = timed_chain(f"mod_up[{dnum}x{k + alpha}]", f_modup, (x_k,),
                                chain=C_NTT)


def f_mac(r_stack, kb, ka):
    # the key-switch inner product alone: dnum digit polys (NTT domain, QP
    # basis) x the 2-component gadget key, accumulated. The key rides as an
    # ARGUMENT — closed-over device arrays lower as HLO literals, and the dw
    # relin key (~300 MB) blows the tunneled remote-compile cap (HTTP 413)
    qq = ctx.q[np.asarray(qp_idx)][:, None]
    qqinv = ctx.qinv_neg[np.asarray(qp_idx)][:, None]
    acc0 = acc1 = None
    for d in range(dnum):
        r = r_stack[d]
        t0 = mont_mul(r, key_rows(kb[d], params, k), qq, qqinv)
        t1 = mont_mul(r, key_rows(ka[d], params, k), qq, qqinv)
        acc0 = t0 if acc0 is None else add_mod(acc0, t0, qq)
        acc1 = t1 if acc1 is None else add_mod(acc1, t1, qq)
    return acc0, acc1


r_stack = jnp.asarray(
    rng.integers(
        0, qp[None, :, None], size=(dnum, k + alpha, n), dtype=np.uint32
    )
)
results["ks_mac"] = timed_chain(f"ks_mac[{dnum}x{k + alpha}]", f_mac,
                                (r_stack,), consts=(rlk.b_mont, rlk.a_mont),
                                chain=C_ELEM)


def f_moddown(x):
    return mod_down(x, params, k, ctx, ksc)


results["mod_down"] = timed_chain("mod_down", f_moddown, (x_qp,),
                                  chain=C_CHEAP)


def f_rescale_chain(x):
    cc = x
    lvl = k
    for i in range(w):
        cc = rescale(cc, params, lvl, ctx, kscs[i])
        lvl -= 1
    return cc


results["rescale"] = timed_chain(f"rescale x{w}", f_rescale_chain, (x_k,),
                                 chain=C_CHEAP)

# -- 3. composite stages ------------------------------------------------------


if os.environ.get("PROFILE_SEAMS", "0") == "1":
    # seam composites (round 4, dw residual localization): each pair of
    # adjacent key_switch stages chained as ONE program; comparing a seam
    # against the sum of its own two leaves shows WHERE the composite's
    # residual lives (copies/layout between those stages)
    def f_intt_modup(x):
        return tuple(mod_up(ntt_inv(x, ctx, limbs=q_limbs), params, k, ctx,
                            ksc))

    results["seam_intt_modup"] = timed_chain(
        "seam iNTT+mod_up", f_intt_modup, (x_k,), chain=C_NTT)

    def f_modup_ntt(x):
        return tuple(ntt_fwd(r, ctx, limbs=qp_idx)
                     for r in mod_up(x, params, k, ctx, ksc))

    results["seam_modup_ntt"] = timed_chain(
        f"seam mod_up+{dnum}xNTT", f_modup_ntt, (x_k,), chain=C_NTT)

    def f_mac_intt_down(r_stack, kb, ka):
        acc0, acc1 = f_mac(r_stack, kb, ka)
        out = []
        for acc in (acc0, acc1):
            out.append(mod_down(ntt_inv(acc, ctx, limbs=qp_idx), params, k,
                                ctx, ksc))
        return tuple(out)

    results["seam_mac_intt_down"] = timed_chain(
        "seam mac+2iNTT+2down", f_mac_intt_down, (r_stack,),
        consts=(rlk.b_mont, rlk.a_mont), chain=C_NTT)


def f_ks(d2, kb, ka):
    from gpufhe_tpu.keys.keys import DeviceKSKey

    return key_switch_core(d2, params, k, ctx, ksc, DeviceKSKey(kb, ka),
                           eval_out=False)


results["key_switch"] = timed_chain("key_switch(eval_out=F)", f_ks, (x_k,),
                                    consts=(rlk.b_mont, rlk.a_mont),
                                    chain=C_BIG)


def f_mul(a0, a1, b0, b1, kb, ka):
    from gpufhe_tpu.keys.keys import DeviceKSKey

    return _mul_full_core((a0, a1), (b0, b1), ctx, kscs, DeviceKSKey(kb, ka),
                          params)


results["mul_full"] = timed_chain("mul_full (fused)", f_mul, (a0, a1, b0, b1),
                                  consts=(rlk.b_mont, rlk.a_mont),
                                  chain=C_BIG)

# -- attribution (leaf-derived; VERDICT r3 item 2) ----------------------------
# key_switch(eval_out=F) decomposes EXACTLY (keyswitch.py:71-144) into:
#   iNTT[k] (d2 -> coeff) + mod_up + dnum x NTT[k+alpha] + MAC
#   + 2 x iNTT[k+alpha] + 2 x mod_down
# Each term is a leaf measured above; the residual is whatever the composite
# spends that its leaves don't (layout copies between stages, scheduling).
ks_leaf = (
    results["ntt_inv_k"]
    + results["mod_up"]
    + dnum * results["ntt_fwd_qp"]
    + results["ks_mac"]
    + 2 * results["ntt_inv_qp"]
    + 2 * results["mod_down"]
)
ks_residual = results["key_switch"] - ks_leaf

# mult SoL re-derived from LEAVES ONLY (the composite key_switch no longer
# enters the sum, so any slack inside it can't inflate the ceiling):
# mul_full = tensor + key_switch-leaves + 2 iNTT[k] (d0, d1) + 2 rescale
#            + 2 NTT[k-w] back to eval domain.
recon = (
    results["tensor"]
    + ks_leaf
    + 2 * results["ntt_inv_k"]
    + 2 * results["rescale"]
    + 2 * (k - w) / k * results["ntt_fwd_k"]
)
ntt_per_limb = results["ntt_fwd_qp"] / (k + alpha)
ntt_inv_per_limb = results["ntt_inv_qp"] / (k + alpha)

print("#", flush=True)
print(f"# mul_full measured {results['mul_full'] * 1e3:.3f} ms; "
      f"leaf-sum SoL {recon * 1e3:.3f} ms "
      f"(fusion benefit {1 - results['mul_full'] / recon:+.1%})", flush=True)
print(f"# key_switch {results['key_switch'] * 1e3:.3f} ms vs leaf-sum "
      f"{ks_leaf * 1e3:.3f} ms -> residual {ks_residual * 1e3:+.3f} ms "
      f"({ks_residual / results['key_switch']:+.1%} of key_switch)",
      flush=True)
print(f"#   leaves: iNTT[{k}] {results['ntt_inv_k'] * 1e3:.3f} + mod_up "
      f"{results['mod_up'] * 1e3:.3f} + {dnum}xNTT[{k + alpha}] "
      f"{dnum * results['ntt_fwd_qp'] * 1e3:.3f} + mac "
      f"{results['ks_mac'] * 1e3:.3f} + 2xiNTT[{k + alpha}] "
      f"{2 * results['ntt_inv_qp'] * 1e3:.3f} + 2xmod_down "
      f"{2 * results['mod_down'] * 1e3:.3f}", flush=True)

if "seam_intt_modup" in results:
    seams = [
        ("iNTT+modup", "seam_intt_modup",
         results["ntt_inv_k"] + results["mod_up"]),
        ("modup+NTTs", "seam_modup_ntt",
         results["mod_up"] + dnum * results["ntt_fwd_qp"]),
        ("mac+iNTT+down", "seam_mac_intt_down",
         results["ks_mac"] + 2 * results["ntt_inv_qp"]
         + 2 * results["mod_down"]),
    ]
    for nm, key, leafsum in seams:
        d = results[key] - leafsum
        print(f"# seam {nm:<16s} composite {results[key] * 1e3:.3f} vs "
              f"leaf-sum {leafsum * 1e3:.3f} -> {d * 1e3:+.3f} ms",
              flush=True)

n_limb_tf = k + dnum * (k + alpha) + 2 * (k + alpha) + 2 * k + 2 * (k - w)
ntt_total = n_limb_tf * ntt_per_limb
print(f"# NTT share of mult: {n_limb_tf} limb-transforms x "
      f"{ntt_per_limb * 1e6:.1f} us (fwd; inv {ntt_inv_per_limb * 1e6:.1f}) "
      f"= {ntt_total * 1e3:.3f} ms "
      f"({ntt_total / results['mul_full']:.0%} of measured mult)", flush=True)

out = {
    "preset": PRESET,
    "n": n,
    "level": k,
    "stages_ms": {nm: round(dt * 1e3, 4) for nm, dt in results.items()},
    "chains": {"ntt": C_NTT, "elem": C_ELEM, "cheap": C_CHEAP, "big": C_BIG},
    "ntt_us_per_limb_transform": round(ntt_per_limb * 1e6, 2),
    "ntt_inv_us_per_limb_transform": round(ntt_inv_per_limb * 1e6, 2),
    "limb_transforms_per_mult": n_limb_tf,
    "ntt_fraction_of_mult": round(ntt_total / results["mul_full"], 4),
    # key_switch attribution: the composite vs the sum of its own leaves.
    # A residual <= 10% of key_switch means the composite is accounted for;
    # anything larger is copies/layout work hiding between the stages.
    "key_switch_leaf_sum_ms": round(ks_leaf * 1e3, 4),
    "key_switch_residual_ms": round(ks_residual * 1e3, 4),
    # LEAF-derived speed of light for the mult (no composite enters this
    # sum, so internal key_switch slack cannot inflate the ceiling). Each
    # leaf is its own chained one-jit measurement; the fused mult cannot
    # beat their sum except via cross-stage overlap. bench.py reads this
    # as the SoL denominator for vs_baseline.
    "recon_ms": round(recon * 1e3, 4),
    "recon_source": "leaf stages only (key_switch decomposed)",
}
print(json.dumps(out), flush=True)
with open(f"PROFILE_MULT_{PRESET}.json", "w") as f:
    json.dump(out, f, indent=1)
