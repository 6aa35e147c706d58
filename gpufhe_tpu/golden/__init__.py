# NOTE: no eager submodule imports here — params.params imports golden.ntt at
# module load, so importing golden.ckks/bgv from this __init__ would create a
# circular import. Import submodules explicitly:
#   from gpufhe_tpu.golden import ckks, bgv, ntt, rns, arithmetic
