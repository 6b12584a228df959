"""Closed-loop exploration simulation (the reference's missing sim driver)."""

from mfgp_tpu.sim.explore import (ExplorationResult, ExplorationSim,
                                  ReplanRecord)
