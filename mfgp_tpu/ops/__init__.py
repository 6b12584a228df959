from mfgp_tpu.ops import kernels, linalg  # noqa: F401
