"""Phase/op-level timing of the double-word N=2^16 bootstrap."""
import pathlib, sys, time
import numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax

    from gpufhe_tpu.ciphertext import ct as dct
    from gpufhe_tpu.ciphertext.backend import DeviceBackend
    from gpufhe_tpu.ciphertext.bootstrap import Bootstrapper, bootstrap_rotations
    from gpufhe_tpu.encoding import encoder
    from gpufhe_tpu.keys.device_keygen import device_keygen
    from gpufhe_tpu.ops.context import make_context
    from gpufhe_tpu.params.params import preset

    radix = 3
    params = preset("config5_boot_dw")
    ctx = make_context(params)
    rots = bootstrap_rotations(params, transform="factored", radix_log=radix)
    chest = device_keygen(params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True)
    be = DeviceBackend(params, ctx, chest)
    bs = Bootstrapper(be, transform="factored", radix_log=radix, evalmod="cheb", k_bound=12.0)
    rng = np.random.default_rng(0)
    z = (rng.normal(size=params.slots) + 1j * rng.normal(size=params.slots)) * 0.2
    ct = dct.encrypt(encoder.encode(z, params), params, chest.device_pk, ctx,
                     np.random.default_rng(1), params.scale, level=2)
    out = bs(ct)  # compile everything
    jax.block_until_ready(out.c)
    print("# compiled", flush=True)

    # phase timing (second run, all compiled)
    t0 = time.time(); raised = be.mod_raise(be.drop_to_level(ct, 2)); jax.block_until_ready(raised.c)
    t_mr = time.time() - t0
    t0 = time.time(); p0, p1 = bs.f_cts(raised); jax.block_until_ready(p0.c)
    t_cts = time.time() - t0
    t0 = time.time(); y0 = bs._cheb(p0); jax.block_until_ready(y0.c)
    t_ev = time.time() - t0
    y1 = bs._cheb(p1); jax.block_until_ready(y1.c)
    t0 = time.time(); outp = bs.f_stc(y0, y1); jax.block_until_ready(outp.c)
    t_stc = time.time() - t0
    print(f"# modraise {t_mr:.2f}s  CtS {t_cts:.2f}s  EvalMod(one) {t_ev:.2f}s  StC {t_stc:.2f}s", flush=True)

    # inside one stage: hoist vs per-rotation vs MAC
    plan = bs.f_cts.shared[0]
    ctx2 = plan.be
    steps = [r for r in plan.offsets if r != 0]
    t0 = time.time(); rots_d = be.rotate_hoisted(raised, steps); jax.block_until_ready(rots_d[steps[0]].c)
    t_rot = time.time() - t0
    t0 = time.time()
    acc = None
    for r in plan.offsets:
        src = rots_d[r] if r != 0 else raised
        term = be.mul_plain(src, plan.pt[r])
        acc = term if acc is None else be.add(acc, term)
    acc = be.rescale(acc)
    jax.block_until_ready(acc.c)
    t_mac = time.time() - t0
    print(f"# stage0: {len(steps)} rotations {t_rot:.2f}s  MAC+rescale {t_mac:.2f}s", flush=True)


if __name__ == "__main__":
    main()
