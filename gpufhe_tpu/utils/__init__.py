from gpufhe_tpu.utils.profiling import Timer, stage, trace  # noqa: F401
from gpufhe_tpu.utils.serialization import (  # noqa: F401
    load_ciphertext,
    load_keychest,
    save_ciphertext,
    save_keychest,
)
