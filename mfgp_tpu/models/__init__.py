from mfgp_tpu.models.gp import GP, GPParams  # noqa: F401
from mfgp_tpu.models.mfgp import MFGP, MFGPParams  # noqa: F401
from mfgp_tpu.models.nigp import NIGP, NIGPParams  # noqa: F401
from mfgp_tpu.models.mfgp_recursive import RecursiveMFGP  # noqa: F401
