"""Hand-written TPU kernels (Pallas) for the solver's hot loops.

Kernels live here when XLA's default lowering is insufficient — currently
the fused batched Riccati backward sweep (``riccati_pallas``), which keeps
the whole N-stage recursion VMEM-resident with the batch on vector lanes.
"""

from robot_mpcs_tpu.ops.riccati_pallas import riccati_backward_batched

__all__ = ["riccati_backward_batched"]
