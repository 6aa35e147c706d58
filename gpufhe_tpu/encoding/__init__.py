from gpufhe_tpu.encoding.encoder import (  # noqa: F401
    decode,
    encode,
    encode_to_device,
    plaintext_to_device,
)
