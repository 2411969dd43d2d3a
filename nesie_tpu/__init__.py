"""nesie_tpu: TPU-native (JAX/XLA/Pallas) semi-supervised 3D detection framework.

From-scratch reimplementation of the capabilities of OpenSpaceAI/Nesie
(ICCV'23 "Not Every Side Is Equal" + SAQE journal extension): VoteNet /
PointNet++ indoor 3D object detection on ScanNet & SUN RGB-D with per-side
distribution box regression, side-aware quality estimation, and a
teacher-student EMA semi-supervised training loop.

Design stance (see SURVEY.md section 7):
  * static shapes everywhere (padded GT / pseudo-label arrays + masks)
  * functional state: the EMA teacher is just another params pytree
  * Pallas kernels for FPS / ball query hot paths, XLA for the rest
  * data-parallel scale-out with jax.sharding over a device mesh
"""

__version__ = "0.1.0"
