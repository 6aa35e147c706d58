from gpufhe_tpu.keys.keys import (  # noqa: F401
    DeviceKSKey,
    DevicePublicKey,
    DeviceSecretKey,
    KeyChest,
    keygen,
    upload_ks_key,
    upload_public_key,
    upload_secret_key,
)
