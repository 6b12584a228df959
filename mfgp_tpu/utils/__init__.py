"""Configs, checkpointing, and profiling utilities."""

from mfgp_tpu.utils.configs import (DEFAULT_SIM, ExperimentConfig, KFConfig,
                                    SimConfig)
