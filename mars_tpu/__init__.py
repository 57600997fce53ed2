"""mars_tpu — TPU-native few-shot segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the MARS
(Multimodal Alignment and Ranking System for Few-Shot Segmentation) reference
system: training-free few-shot segmentation by ranking class-agnostic mask
proposals with multimodal (visual-visual, visual-text) alignment signals.

Package layout
--------------
- ``core``      episode dataclasses, device-side image/mask ops (fixed-shape).
- ``models``    a single parameterized flax ViT family covering DINOv2 / CLIP /
                AlphaCLIP / SAM-ViT variants, plus SAM prompt encoder/decoder,
                and torch→JAX checkpoint converters.
- ``ops``       Pallas/XLA kernels: Sinkhorn EMD, auction assignment, NMS,
                connected components, k-means++.
- ``pipeline``  the jitted pipeline stages: VVA, VTA (Grad-CAM), PIR,
                filtering/merging, Matcher, AMG, and the MARS orchestrator.
- ``data``      episode datasets (COCO-20i, PASCAL-5i, FSS-1000, LVIS-92i).
- ``text``      prompt templates, WordNet retrieval, VLM interface (host-side).
- ``parallel``  mesh construction and episode/model sharding.
- ``utils``     evaluator, meters, logging, configuration.

Design stance (vs the CUDA/torch reference): everything per-episode is
fixed-shape — proposal counts are padded to buckets with validity masks,
host loops over proposals become batched device kernels, and attention-map
statistics needed by refinement are accumulated inside the forward pass
instead of materializing per-layer attention tensors.
"""

__version__ = "0.1.0"
