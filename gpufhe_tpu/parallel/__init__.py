from gpufhe_tpu.parallel.multihost import (  # noqa: F401
    global_fhe_mesh,
    initialize_multihost,
    scaling_report,
    weak_scaling_report,
)
from gpufhe_tpu.parallel.sharded import (  # noqa: F401
    make_fhe_mesh,
    make_sharded_mult,
    shard_ct_component,
    unshard_ct_component,
)
