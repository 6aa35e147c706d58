from gpufhe_tpu.models.logreg import EncryptedLogReg, rotations_needed  # noqa: F401
from gpufhe_tpu.models.logreg_train import (  # noqa: F401
    EncryptedLogRegTrainer,
    train_rotations,
)
from gpufhe_tpu.models.mlp import EncryptedMLP, mlp_rotations  # noqa: F401
