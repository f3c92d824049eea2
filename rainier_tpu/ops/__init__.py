from .hmc_pallas import fused_hmc

__all__ = ["fused_hmc"]
