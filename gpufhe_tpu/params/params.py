"""Parameter / context system for the TPU-native RNS-CKKS stack.

The reference has no parameter system at all — the modulus is a bare function
argument (reference arithmetic.py:3,7,11; SURVEY.md §5 "config system:
absent"). Here parameters are a frozen dataclass plus a preset registry keyed
by the five BASELINE.json:7-11 milestone configs.

Word-size discipline (BASELINE.json:5 "32-bit limb planes"): every RNS prime
is odd, NTT-friendly (q = 1 mod 2N) and < 2^30 so that
  * one residue occupies one uint32 lane,
  * Montgomery REDC with R = 2^32 never overflows,
  * sums a+b < 2^32 need no carry handling,
  * every canonical residue has an exact 4-digit signed-int8 recoding for
    the MXU NTT matmuls (requires q < 2^30, ops/context.py _digits_i8).
"""

from __future__ import annotations

import dataclasses
import functools
import math

from gpufhe_tpu.golden.ntt import find_primitive_root_2n, is_prime

MAX_WORD_PRIME = (1 << 30) - 1


def gen_ntt_primes(bits: int, two_n: int, count: int, skip: int = 0) -> list[int]:
    """`count` distinct primes p = 1 (mod two_n) descending from 2^bits.

    `skip` lets different roles (q-chain vs p-chain vs special primes) draw
    disjoint primes from the same size class.
    """
    assert bits <= 30, "word-size discipline: primes must fit int8-digit recoding"
    primes: list[int] = []
    p = ((1 << bits) - 1) // two_n * two_n + 1
    seen = 0
    while len(primes) < count:
        if p < (1 << (bits - 1)):
            raise ValueError(f"not enough {bits}-bit NTT primes for 2N={two_n}")
        if is_prime(p):
            if seen >= skip:
                primes.append(p)
            seen += 1
        p -= two_n
    return primes


def order_primes_for_circuit(
    cands: list[int], scale_bits: int, ops: list[str], count: int
) -> list[int]:
    """Order a prime chain so rescales track the scale through a KNOWN circuit.

    ops (in drop order) describe what consumes each level:
      'lin'  — plaintext multiply + rescale:        d' = d - e
      'sq'   — ciphertext square + rescale:         d' = 2d - e
      'sq_z' — like 'sq' but also records d_z (the Horner operand)
      'h'    — multiply by the recorded z:          d' = d + d_z - e
    with d = log2(scale/2^scale_bits) and e = log2(q/2^scale_bits). Greedy
    picks the remaining prime minimizing |d'| at every step; leftover levels
    (beyond ops) are filled with the remaining primes balanced by sign.

    Returns the chain segment ordered so its LAST element is dropped first
    (matching rescale, which drops q_primes[level-1]).
    """
    target = float(1 << scale_bits)
    rem = list(cands)
    d = 0.0
    d_z = 0.0
    drop_order = []

    def e_of(q):
        return math.log2(q / target)

    for op in ops[:count]:
        if op == "lin":
            nxt = lambda q: d - e_of(q)
        elif op in ("sq", "sq_z"):
            nxt = lambda q: 2 * d - e_of(q)
        elif op == "h":
            nxt = lambda q: d + d_z - e_of(q)
        else:
            raise ValueError(op)
        best = min(rem, key=lambda q: abs(nxt(q)))
        rem.remove(best)
        d = nxt(best)
        if op == "sq_z":
            d_z = d
        drop_order.append(best)
    # leftover levels: keep the running product balanced
    acc = 0.0
    while len(drop_order) < count:
        best = min(rem, key=lambda q: abs(acc + e_of(q)))
        rem.remove(best)
        acc += e_of(best)
        drop_order.append(best)
    return list(reversed(drop_order))


def gen_balanced_ntt_primes(
    scale_bits: int, two_n: int, count: int, exclude: tuple[int, ...] = ()
) -> list[int]:
    """`count` NTT primes nearest to 2^scale_bits from BOTH sides, ordered so
    that rescales cancel accumulated scale drift.

    At large 2N, primes = 1 mod 2N near a target are sparse; taking them all
    below the target (gen_ntt_primes) drifts the chain down to ~0.7x, and any
    squaring level DOUBLES the accumulated log-drift (d' = 2d - e), which
    overflows the scale after a dozen multiplies (observed at N=2^16
    bootstrapping). Greedy ordering keeps |d| within one candidate gap.

    Ordering is in DROP order reversed: the returned list's last element is
    dropped first by rescale.
    """
    cands = balanced_prime_candidates(scale_bits, two_n, exclude)
    target = 1 << scale_bits
    assert len(cands) >= count, f"only {len(cands)} balanced primes near 2^{scale_bits}"
    cands = cands[: max(count + 4, count)]  # small surplus improves the greedy
    d = 0.0
    order = []
    remaining = list(cands)
    for _ in range(count):
        e_target = 2 * d
        best = min(remaining, key=lambda q: abs(math.log2(q / target) - e_target))
        remaining.remove(best)
        d = 2 * d - math.log2(best / target)
        order.append(best)
    return list(reversed(order))  # reversed: last element dropped first


def balanced_prime_candidates(
    scale_bits: int, two_n: int, exclude: tuple[int, ...] = ()
) -> list[int]:
    """NTT primes within 1.5x of 2^scale_bits, nearest first."""
    target = 1 << scale_bits
    lo, hi = int(target / 1.5), int(target * 1.5)
    cands = []
    p = hi // two_n * two_n + 1
    while p >= lo:
        if p not in exclude and is_prime(p) and p < (1 << 30):
            cands.append(p)
        p -= two_n
    cands.sort(key=lambda q: abs(math.log2(q / target)))
    return cands


@dataclasses.dataclass(frozen=True)
class CKKSParams:
    """Static CKKS parameters. Hashable -> usable as a jit static argument."""

    n: int  # ring degree (power of two); num slots = n // 2
    q_primes: tuple[int, ...]  # ciphertext modulus chain Q = prod q_i (level L = len-1)
    p_primes: tuple[int, ...]  # key-switch raise basis P (the "special" primes)
    scale_bits: int  # log2 of the encoding scale Delta
    sigma: float = 3.2  # discrete gaussian error stddev
    hamming_weight: int = 0  # 0 -> dense uniform ternary secret
    eph_hamming_weight: int = 0  # >0 -> sparse-secret encapsulation for
    #   bootstrapping: ModRaise runs under an ephemeral sparse key of this
    #   weight that only ever exists at the base modulus; the full chain
    #   stays under the (dense) base secret (Bossuat et al. pattern)
    plain_modulus: int = 0  # BGV plaintext modulus t (prime, t = 1 mod 2N); 0 -> CKKS
    scale_words: int = 1  # limbs consumed per rescale (2 -> double-word scale 2^scale_bits)

    def __post_init__(self):
        assert self.n & (self.n - 1) == 0, "ring degree must be a power of two"
        for q in self.q_primes + self.p_primes:
            assert q <= MAX_WORD_PRIME and q % (2 * self.n) == 1, (
                f"prime {q} violates word-size / NTT-friendliness discipline"
            )
        assert len(set(self.q_primes + self.p_primes)) == len(self.q_primes) + len(
            self.p_primes
        ), "q/p primes must be pairwise distinct"

    # -- derived quantities -------------------------------------------------
    @property
    def num_limbs(self) -> int:
        return len(self.q_primes)

    @property
    def alpha(self) -> int:
        """Number of special primes = key-switch decomposition group size."""
        return max(len(self.p_primes), 1)

    @property
    def dnum(self) -> int:
        """Gadget decomposition count at full level."""
        return math.ceil(len(self.q_primes) / self.alpha)

    @property
    def scale(self) -> float:
        return float(2**self.scale_bits)

    @property
    def slots(self) -> int:
        return self.n // 2

    @property
    def big_q(self) -> int:
        return math.prod(self.q_primes)

    @property
    def big_p(self) -> int:
        return math.prod(self.p_primes)

    @functools.cached_property
    def psi(self) -> tuple[int, ...]:
        """Primitive 2N-th roots of unity for every prime (q-chain then p-chain)."""
        return tuple(
            find_primitive_root_2n(q, 2 * self.n) for q in self.q_primes + self.p_primes
        )


# ---------------------------------------------------------------------------
# Preset registry: one preset per BASELINE.json:7-11 milestone config, plus
# tiny variants for fast CI on the 8-virtual-device CPU mesh.
# ---------------------------------------------------------------------------


def _mk(n: int, n_q: int, n_p: int, scale_bits: int, q0_bits: int = 30, qi_bits: int = 28,
        p_bits: int = 30) -> CKKSParams:
    two_n = 2 * n
    q0 = gen_ntt_primes(q0_bits, two_n, 1)
    qi = gen_ntt_primes(qi_bits, two_n, n_q - 1)
    # p-chain primes drawn below the q0 prime from the same 30-bit class
    pp = gen_ntt_primes(p_bits, two_n, n_p, skip=1 if p_bits == q0_bits else 0)
    return CKKSParams(
        n=n,
        q_primes=tuple(q0 + qi),
        p_primes=tuple(pp),
        scale_bits=scale_bits,
    )


@functools.lru_cache(maxsize=None)
def preset(name: str) -> CKKSParams:
    """Named parameter presets.

    BASELINE.json config mapping:
      config1_ntt      — N=2^12 single-prime NTT (word-size TPU variant; the
                         60-bit-prime vectors of config 1 are golden-model
                         artifacts, see gpufhe_tpu/golden/vectors.py)
      config2_rns      — N=2^14, L=10 RNS arithmetic + basis extension
      config3_ckks     — N=2^15 encode/encrypt/mult/relin
      config4_rotation — hybrid key-switching + hoisted rotations
      config5_boot     — N=2^16, L=30 bootstrapping-scale context
      boot_ci          — small full-bootstrap context (CPU CI)
      tiny / tiny2     — fast CI contexts (CPU, seconds)
    """
    if name == "tiny":
        return _mk(n=2**6, n_q=3, n_p=1, scale_bits=28)
    if name == "tiny2":
        return _mk(n=2**8, n_q=4, n_p=2, scale_bits=28)
    if name == "ci_small":
        return _mk(n=2**10, n_q=6, n_p=2, scale_bits=28)
    if name == "fft_ci_small":
        # smallest factored-transform context (sharded-backend CI)
        return _mk(n=2**7, n_q=6, n_p=2, scale_bits=28)
    if name == "fft_ci":
        # factored-FFT CtS/StC round-trip testing: extra levels for 4 stages
        return _mk(n=2**8, n_q=8, n_p=2, scale_bits=28)
    if name == "boot_ci_f":
        # bootstrap with factored transforms: CtS 2 + EvalMod 10 + StC 2
        # + scale-normalize 1
        p = _mk(n=2**7, n_q=17, n_p=3, scale_bits=28)
        return dataclasses.replace(p, hamming_weight=16)
    if name == "boot_dw_ci":
        # double-word scale CI: Delta = 2^56 over 28-bit limb PAIRS; base
        # modulus q0*q1 (two 30-bit primes) for ModRaise
        n = 2**7
        two_n = 2 * n
        q0 = gen_ntt_primes(30, two_n, 2)
        pp = gen_ntt_primes(30, two_n, 4, skip=2)
        qi = gen_ntt_primes(28, two_n, 22)
        return CKKSParams(
            n=n, q_primes=tuple(q0 + qi), p_primes=tuple(pp),
            scale_bits=56, hamming_weight=16, scale_words=2,
        )
    if name == "boot_dw_ci_enc":
        # boot_dw_ci with sparse-secret ENCAPSULATION instead of a sparse
        # base secret — the CI-scale mirror of the flagship/boot_mid_dw
        # configuration (dw scale + eph ModRaise hops on ShardedBackend)
        n = 2**7
        two_n = 2 * n
        q0 = gen_ntt_primes(30, two_n, 2)
        pp = gen_ntt_primes(30, two_n, 4, skip=2)
        qi = gen_ntt_primes(28, two_n, 22)
        return CKKSParams(
            n=n, q_primes=tuple(q0 + qi), p_primes=tuple(pp),
            scale_bits=56, eph_hamming_weight=16, scale_words=2,
        )
    if name == "config5_boot_dw":
        # double-word production bootstrap: N=2^16, Delta=2^56,
        # 2x30-bit base + 46 balanced 28-bit limbs (23 double levels);
        # alpha=10 keeps dnum=5 so the 63 factored-transform Galois keys fit
        # in HBM. DENSE base secret + sparse-secret encapsulation (eph h=32,
        # only ever at the 60-bit base modulus), so the dense HE-standard
        # table governs the chain: log QP ~1647 < 1772 -> 128-bit
        # (utils/security.py; a bare sparse h=64 secret would cap at ~1300)
        n = 2**16
        two_n = 2 * n
        q0 = gen_ntt_primes(30, two_n, 2)
        pp = gen_ntt_primes(30, two_n, 10, skip=2)
        cands = balanced_prime_candidates(28, two_n, exclude=tuple(q0 + pp))
        assert len(cands) >= 46
        picked = cands[:46]
        # pair +e with -e so every PAIR product stays near 2^56 (each
        # double-rescale divides by a pair)
        picked.sort(key=lambda q: math.log2(q / 2**28))
        qi = []
        for i in range(23):
            qi.extend([picked[i], picked[45 - i]])
        return CKKSParams(
            n=n, q_primes=tuple(q0 + qi), p_primes=tuple(pp),
            scale_bits=56, scale_words=2, eph_hamming_weight=32,
        )
    if name == "boot_ci_enc":
        # sparse-secret ENCAPSULATION bootstrap CI: DENSE base secret (the
        # HE-standard dense table governs the chain), ephemeral sparse key
        # (h=16) exists only at the base modulus for ModRaise
        p = _mk(n=2**7, n_q=13, n_p=3, scale_bits=28)
        return dataclasses.replace(p, eph_hamming_weight=16)
    if name == "boot_ci_cheb":
        # Chebyshev-EvalMod bootstrap CI: CtS 2 + cheb ~7 + StC 2 levels
        p = _mk(n=2**7, n_q=13, n_p=3, scale_bits=28)
        return dataclasses.replace(p, hamming_weight=16)
    if name == "bgv_ci":
        # RNS-BGV at CI scale: exact integer slots mod a 16-bit prime t
        p = _mk(n=2**10, n_q=6, n_p=2, scale_bits=28)
        t = gen_ntt_primes(16, 2 * p.n, 1)[0]
        return dataclasses.replace(p, plain_modulus=t)
    if name == "bgv_tiny":
        # smallest BGV context (backend/linalg CI: 128-slot rings)
        p = _mk(n=2**8, n_q=4, n_p=2, scale_bits=28)
        t = gen_ntt_primes(16, 2 * p.n, 1)[0]
        return dataclasses.replace(p, plain_modulus=t)
    if name == "bfv_ci":
        # RNS-BFV at CI scale (golden/bfv.py): scale-invariant integers mod
        # t; same chain shape as bgv_ci so the two integer schemes compare
        p = _mk(n=2**10, n_q=6, n_p=2, scale_bits=28)
        t = gen_ntt_primes(16, 2 * p.n, 1)[0]
        return dataclasses.replace(p, plain_modulus=t)
    if name == "bfv_tiny":
        # smallest BFV context (device-parity CI: 128-slot rings)
        p = _mk(n=2**8, n_q=4, n_p=2, scale_bits=28)
        t = gen_ntt_primes(16, 2 * p.n, 1)[0]
        return dataclasses.replace(p, plain_modulus=t)
    if name == "bfv_n16":
        # production-scale BFV: N=2^16, L=30 (the integer-scheme counterpart
        # of the config5/bench CKKS chain). t = 786433 = 6*2^17 + 1 is the
        # classic 20-bit NTT prime (t = 1 mod 2N for N=2^16).
        # alpha=15/dnum=2 like config5_boot: the relinearization key-switch
        # is the same hybrid-KS core, so the same decomposition retune
        # applies (fewer ModUp NTTs; wide conversions ride the MXU kernel)
        p = _mk(n=2**16, n_q=30, n_p=15, scale_bits=28)
        return dataclasses.replace(p, plain_modulus=786433)
    if name == "bfv_eq":
        # Fermat equality circuits (ciphertext/exact.py): t = 257 is prime
        # with t - 1 = 2^8, so x^(t-1) is 8 squarings; t = 1 mod 2N holds
        # for N = 2^7. The deep chain buys noise budget (BFV multiplies
        # keep the level; only noise grows — ~19 bits per squaring here).
        p = _mk(n=2**7, n_q=12, n_p=3, scale_bits=28)
        return dataclasses.replace(p, plain_modulus=257)
    if name == "boot_ci":
        # CI-scale bootstrapping: 15 levels (CtS 1 + EvalMod 10 + StC 1 +
        # scale-normalize 1 + margin), sparse secret so the ModRaise
        # overflow I stays small (SURVEY §7 cfg 5)
        p = _mk(n=2**7, n_q=15, n_p=3, scale_bits=28)
        return dataclasses.replace(p, hamming_weight=16)
    if name == "boot_ci_deep":
        # bootstrap + compute headroom: the mid-inference-refresh CI preset
        # (models/mlp.py refresh=, models/logreg_train.py) — dense bootstrap
        # consumes 12 levels, leaving 7 post-refresh: one scale-normalize +
        # 5-mult-deep training iteration, or MLP matmul/activation blocks
        p = _mk(n=2**7, n_q=19, n_p=3, scale_bits=28)
        return dataclasses.replace(p, hamming_weight=16)
    if name == "ci_deep":
        # deep-but-small chain for composite-polynomial circuits (sign/relu:
        # 4 levels per degree-7 composition step, compare.py)
        return _mk(n=2**10, n_q=16, n_p=4, scale_bits=28)
    if name == "ci_attn":
        # encrypted attention CI preset (models/attention.py): the full
        # head costs ~21 levels (projections + exp + Goldschmidt softmax +
        # value sum) at the default degree/iteration settings
        return _mk(n=2**8, n_q=24, n_p=4, scale_bits=28)
    if name == "ci_xf":
        # encrypted transformer block CI preset (models/transformer.py):
        # attention head (~21 levels) + two block LayerNorms (~15 each at
        # ln_iters=5) + the square-activation FFN (3). The chain's ~30
        # sequential ct-ct squarings DOUBLE accumulated scale drift each
        # time (d' = 2d - e), so a one-sided 28-bit chain overflows the
        # float scale around level 20 — draw the balanced both-sided chain
        # (gen_balanced_ntt_primes), mandatory for ANY deep circuit
        n = 2**8
        two_n = 2 * n
        q0 = gen_ntt_primes(30, two_n, 1)
        pp = gen_ntt_primes(30, two_n, 6, skip=1)
        qi = gen_balanced_ntt_primes(28, two_n, 59, exclude=tuple(q0 + pp))
        return CKKSParams(
            n=n, q_primes=tuple(q0 + qi), p_primes=tuple(pp), scale_bits=28,
        )
    if name == "boot_mid_dw":
        # mid-scale DOUBLE-WORD bootstrap (N=2^14): the production dw
        # machinery (Delta=2^56 limb pairs, composite 60-bit base, cheb
        # EvalMod, sparse-secret encapsulation ModRaise) at the largest ring
        # an 8-virtual-CPU mesh tolerates — the sharded-bootstrap stress
        # preset for BASELINE config 5's "sharded over a multi-host mesh"
        # (the N=2^16 chest alone exceeds CPU-mesh wall-clock budgets).
        # 17 double levels: CtS 4 + StC 4 (radix_log=4 over 2^13 slots) +
        # cheb EvalMod ~7 + margin
        n = 2**14
        two_n = 2 * n
        q0 = gen_ntt_primes(30, two_n, 2)
        pp = gen_ntt_primes(30, two_n, 6, skip=2)
        cands = balanced_prime_candidates(28, two_n, exclude=tuple(q0 + pp))
        assert len(cands) >= 34
        picked = cands[:34]
        picked.sort(key=lambda q: math.log2(q / 2**28))
        qi = []
        for i in range(17):
            qi.extend([picked[i], picked[33 - i]])
        return CKKSParams(
            n=n, q_primes=tuple(q0 + qi), p_primes=tuple(pp),
            scale_bits=56, scale_words=2, eph_hamming_weight=32,
        )
    if name == "boot_mid":
        # mid-scale bootstrap (N=2^12): the sharded-bootstrap stress preset —
        # big enough that the mesh programs shard real work, small enough for
        # the 8-virtual-device CPU mesh. 2048 slots -> 4 grouped transform
        # stages each way; cos EvalMod burns taylor_m+1+r = 10 -> n_q >= 19.
        p = _mk(n=2**12, n_q=20, n_p=4, scale_bits=28)
        return dataclasses.replace(p, hamming_weight=16)
    if name == "config1_ntt":
        return _mk(n=2**12, n_q=1, n_p=1, scale_bits=28)
    if name == "config2_rns":
        return _mk(n=2**14, n_q=10, n_p=2, scale_bits=28)
    if name == "config3_ckks":
        return _mk(n=2**15, n_q=12, n_p=3, scale_bits=28)
    if name == "config4_rotation":
        return _mk(n=2**15, n_q=12, n_p=3, scale_bits=28)
    if name == "config5_boot":
        # alpha=15/dnum=2 (was 5/6): the mult's limb-transform count is
        # k + dnum(k+alpha) + 2(k+alpha) + 2k + 2(k-1) — 328 vs 428 at
        # alpha=15 — and the wide ModUp/ModDown conversions (S=15) ride the
        # MXU digit kernel (ops/convert_pallas.py). Security headroom is
        # ample: log QP = 45*28 ~ 1260 << 1772 (128-bit at N=2^16, dense
        # secret; tests/test_models_utils.py::test_security_accounting).
        return _mk(n=2**16, n_q=30, n_p=15, scale_bits=28)
    if name == "config5_boot_s29":
        # config5_boot with the WHOLE chain under 2^29 (q0/P drawn from the
        # 29-bit class instead of 30): enables the lazy [0, 4q)-accumulation
        # NTT recombine (ops/ntt_pallas.py _recombine_taps_approx_lazy,
        # gated by ops/context.py NTTTablesLazy — 8q < 2^32 must hold for
        # every prime). Security strictly improves (log QP shrinks ~16
        # bits); the 29-bit q0 costs ~1 bit of decryption margin, irrelevant
        # at Delta=2^28 slot noise. VERDICT r4 item 2.
        return _mk(n=2**16, n_q=30, n_p=15, scale_bits=28, q0_bits=29,
                   p_bits=29)
    if name == "config5_boot_h":
        # bootstrappable config 5: sparse secret keeps the ModRaise overflow
        # small in the EvalMod sine range; BALANCED prime chain so scale
        # drift stays bounded through the deep multiply chain
        n = 2**16
        two_n = 2 * n
        q0 = gen_ntt_primes(30, two_n, 1)
        pp = gen_ntt_primes(30, two_n, 5, skip=1)
        cands = balanced_prime_candidates(28, two_n, exclude=tuple(q0 + pp))
        # op sequence of the factored bootstrap at radix_log=2, r=8, m=3
        # (scripts/bootstrap_n16.py): 8 CtS stages, EvalMod (x^2, const,
        # 2 Horner, 8 doublings), 8 StC stages
        ops = (["lin"] * 8 + ["sq_z", "lin", "h", "h"] + ["sq"] * 8 + ["lin"] * 8)
        qi = order_primes_for_circuit(cands, 28, ops, 29)
        return CKKSParams(
            n=n, q_primes=tuple(q0 + qi), p_primes=tuple(pp),
            scale_bits=28, hamming_weight=64,
        )
    raise KeyError(f"unknown preset {name!r}")


def make_context(name_or_params):
    """Build the full device context (precomputed tables) for params.

    Defined in gpufhe_tpu.ops.context; re-exported here for the public API.
    """
    from gpufhe_tpu.ops.context import make_context as _mc

    if isinstance(name_or_params, str):
        name_or_params = preset(name_or_params)
    return _mc(name_or_params)
