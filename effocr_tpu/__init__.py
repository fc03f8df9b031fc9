"""effocr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) OCR framework.

A ground-up rebuild of the capabilities of EffOCR
(dell-research-harvard/effocr, arXiv:2304.02737): OCR as character
detection + metric-learning retrieval, redesigned for TPU hardware:

- fixed-shape, masked, batched compute everywhere (MXU-friendly),
- detection decode + NMS as compiled XLA/Pallas programs,
- kNN retrieval as an on-device matmul + top_k over an HBM-resident
  prototype matrix (replaces FAISS),
- data-parallel training via ``jax.sharding.Mesh`` + jit shardings
  (replaces nn.DataParallel / DDP).

Subpackages
-----------
core        mesh/sharding setup, configs, fixed-shape batching
kernels     letterbox, NMS, YOLO decode, median-pad, ROI crop, retrieval
models      Flax encoders (ConvNeXt/MobileNetV3/ViT/XCiT) + YOLO detector
retrieval   prototype index build/save/load (npz + ref.txt contract)
data        font glyph rendering, COCO tools, samplers, transforms
pipelines   end-to-end OCR inference (en/jp, horizontal/vertical)
train       recognizer (SupCon/CE) and localizer trainers
eval        textline accuracy/CER, COCO mAP
utils       spell check, viz
"""

__version__ = "0.1.0"
