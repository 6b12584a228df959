from mfgp_tpu.estimation.kalman import (  # noqa: F401
    kf_predict, kf_update, kf_step, filter_trajectory, KFModel,
)
from mfgp_tpu.estimation import observers  # noqa: F401
