"""Phase-probed N=2^16 bootstrap: decrypt intermediates to localize error."""
import json, pathlib, sys, time
import numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
from gpufhe_tpu.ciphertext import ct as dct
from gpufhe_tpu.ciphertext.backend import DeviceBackend
from gpufhe_tpu.ciphertext.bootstrap import Bootstrapper, bootstrap_rotations
from gpufhe_tpu.ciphertext import fftboot as fb
from gpufhe_tpu.encoding import encoder
from gpufhe_tpu.golden import ckks as gckks
from gpufhe_tpu.keys.device_keygen import device_keygen
from gpufhe_tpu.ops.context import make_context
from gpufhe_tpu.params.params import preset
import math

radix = 2
params = preset("config5_boot_h")
ctx = make_context(params)
rots = bootstrap_rotations(params, transform="factored", radix_log=radix)
chest = device_keygen(params, np.random.default_rng(7), rotations=tuple(rots), conjugation=True)
be = DeviceBackend(params, ctx, chest)
bs = Bootstrapper(be, r=8, taylor_m=3, transform="factored", radix_log=radix)
print("# setup done", flush=True)

rng = np.random.default_rng(0)
z = (rng.normal(size=params.slots) + 1j*rng.normal(size=params.slots)) * 0.2
pt = encoder.encode(z, params)
ct1 = dct.encrypt(pt, params, chest.device_pk, ctx, np.random.default_rng(1), params.scale, level=1)

# phase 0: level-1 decrypt
got0 = be.decrypt_decode(ct1)
print("# lvl1 err:", float(np.abs(got0 - z).max()), flush=True)

raised = be.mod_raise(ct1)
coeff = dct.decrypt_to_coeff(raised, params, chest.device_sk, ctx)
u = gckks.crt_compose_centered(coeff, params.q_primes)  # object ints
u = np.array([int(v) for v in u], dtype=np.float64)
q0 = params.q_primes[0]
m_cent = gckks.crt_compose_centered(pt[:1], params.q_primes[:1]).astype(np.float64)
I = (u - m_cent) / q0
print("# modraise: |I| max", float(np.abs(np.round(I)).max()),
      " residual", float(np.abs(u - m_cent - np.round(I)*q0).max()), flush=True)

t0c, t1c = bs.f_cts(raised)
shift = -math.pi / 2.0**(bs.r+1)
t0c = be.add_plain(t0c, shift); t1c = be.add_plain(t1c, shift)
br = fb.bit_rev_perm(params.slots)
cts_factor = 2.0*math.pi*params.scale/(q0*2.0**bs.r)
exp_t0 = (u[:params.slots][br]/params.scale)*cts_factor + shift
exp_t1 = (u[params.slots:][br]/params.scale)*cts_factor + shift
g_t0 = np.real(be.decrypt_decode(t0c)); g_t1 = np.real(be.decrypt_decode(t1c))
print("# CtS err:", float(np.abs(g_t0-exp_t0).max()), float(np.abs(g_t1-exp_t1).max()),
      " scale t0:", t0c.scale, " level:", t0c.level, flush=True)

y0 = bs._evalmod(t0c); y1 = bs._evalmod(t1c)
exp_y0 = np.sin(2*np.pi*u[:params.slots][br]/q0)
exp_y1 = np.sin(2*np.pi*u[params.slots:][br]/q0)
g_y0 = np.real(be.decrypt_decode(y0)); g_y1 = np.real(be.decrypt_decode(y1))
print("# EvalMod err:", float(np.abs(g_y0-exp_y0).max()), float(np.abs(g_y1-exp_y1).max()),
      " scale:", y0.scale, " level:", y0.level, flush=True)

lvl = bs.f_stc.first_lo.level
out = bs.f_stc(be.drop_to_level(y0, lvl), be.drop_to_level(y1, lvl))
got = be.decrypt_decode(out)
print(json.dumps({"final_err": float(np.abs(got-z).max()), "scale": out.scale, "level": out.level}), flush=True)
