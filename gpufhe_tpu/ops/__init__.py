from gpufhe_tpu.ops.context import Context, NTTTables, fourstep_split, make_context  # noqa: F401
from gpufhe_tpu.ops.modops import (  # noqa: F401
    add_mod,
    barrett_reduce_u32,
    from_mont,
    mont_mul,
    mul_mod,
    mulhi32,
    neg_mod,
    sub_mod,
    to_mont,
)
from gpufhe_tpu.ops.ntt import ntt_fwd, ntt_inv  # noqa: F401
