from emx.ops.degrade_kernel import fused_poisson_degrade

__all__ = ["fused_poisson_degrade"]
