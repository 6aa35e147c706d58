from gpufhe_tpu.primitives.keyswitch import key_switch_core, qp_indices  # noqa: F401
from gpufhe_tpu.primitives.rns import (  # noqa: F401
    KSContext,
    base_convert,
    make_ks_context,
    mod_down,
    mod_up,
    rescale,
)
