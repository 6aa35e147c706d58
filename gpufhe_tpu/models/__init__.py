from gpufhe_tpu.models.logreg import EncryptedLogReg, rotations_needed  # noqa: F401
