from schwingermodel_tpu.hmc.integrators import leapfrog
from schwingermodel_tpu.hmc.sampler import TrajectoryStats, hmc_trajectory

__all__ = ["leapfrog", "hmc_trajectory", "TrajectoryStats"]
