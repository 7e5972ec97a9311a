"""TPU-native framework for semantic segmentation of StyleGAN2 artifacts.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Sara-H-dev/Semantic_Segmentation_Of_StyleGAN2_Artifacts``: an MS-UNet
(Swin-Transformer U-Net with multi-scale auxiliary decoders) trained with a
Dynamic BCE+Tversky loss on fake/real face images, with Dice/IoU/FPR
validation, composite Score model selection, CSV/TensorBoard logging and
heatmap/overlay visualization.

Design is TPU-first: NHWC layouts, bf16 compute policy, static shapes,
window attention as batched MXU matmuls (with an optional fused Pallas
kernel), data parallelism via ``jax.sharding.Mesh`` + ``psum`` collectives.
"""

__version__ = "0.1.0"
