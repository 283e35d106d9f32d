"""VeloxSeg-TPU: a TPU-native JAX framework for lightweight multimodal 3D
medical image segmentation.

Re-designed from scratch for TPU (JAX/XLA/Pallas) with the capabilities of the
reference VeloxSeg framework (JinPLu/VeloxSeg): the VeloxSeg model family
(JL-guided grouped convolution + Paired Window Attention + dual-decoder
teacher-student distillation), three dataset workloads (AutoPET-II,
Hecktor2022, BraTS2021), JSON config system, patch-based training,
sliding-window whole-volume inference, a throughput benchmark harness and a
baseline model zoo.

Layout convention: all tensors are channels-last ``(B, D, H, W, C)`` — the
native layout for TPU convolutions. Converters to/from the reference's
channels-first layout live in :mod:`veloxseg_tpu.utils.layout`.
"""

__version__ = "0.1.0"
