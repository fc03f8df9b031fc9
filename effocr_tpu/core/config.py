"""Dataclass configuration for the whole framework.

The reference uses per-script argparse (e.g. train_effocr_recognizer.py:185-242,
infer_effocr_onnx_multi.py:420-458) plus an implicit artifact-directory contract
(infer_effocr_onnx_multi.py:401-419).  Here every subsystem is configured by a
single typed dataclass tree; CLIs construct these from flags.  The artifact
directory contract (enc_best / ref index / ref.txt / class_map.json) is kept.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

# ImageNet normalization (timm IMAGENET_DEFAULT_MEAN/STD, used by every
# reference transform: utils/datasets_utils.py:10-26,147-172).
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class EncoderConfig:
    """Recognizer encoder (reference: models/encoders.py AutoEncoderFactory)."""

    arch: str = "convnext_tiny"       # see effocr_tpu.models.factory registry
    image_size: int = 224             # utils/datasets_utils.py:166 Resize(224)
    embed_dim: Optional[int] = None   # None -> architecture's native width
    num_classes: Optional[int] = None # not None -> FFNN classifier head
                                      # (train_effocr_recognizer.py:230-231)
    # 1 = grayscale-native encoder (first conv takes one channel); must
    # match the pipeline's input_channels at inference.  Printed documents
    # carry no chroma, and the gray canvas is 3x fewer host->device bytes.
    input_channels: int = 3
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"


@dataclass(frozen=True)
class LocalizerConfig:
    """Character/word detector (reference: YOLOv5-s, onnx_engines/localizer_engine.py)."""

    arch: str = "yolov5s"
    input_size: int = 640             # localizer_engine.py:17 input_shape
    # TPU-first rectangular letterbox: text lines are wide, so a square
    # 640x640 canvas is mostly padding; a (height, input_size) bucket cuts
    # host->device bytes and detector FLOPs ~input_size/height x.  None =
    # square (reference semantics).  Must be a stride-32 multiple.
    input_height: Optional[int] = None
    num_classes: int = 2              # char/word (train_effocr_localizer_d2.py:191-192)
    conf_thresh: float = 0.35         # infer_effocr_onnx_multi.py:443
    iou_thresh: float = 0.01          # infer_effocr_onnx_multi.py:441
    max_det: int = 1000               # localizer_engine.py:62 max_det=1000
    max_nms: int = 1024               # fixed-shape stand-in for max_nms=30000
                                      # (localizer_engine.py:201): masked
                                      # top-K candidate cap; newspaper lines
                                      # have <=~300 real candidates, and the
                                      # NMS IoU matrix is O(max_nms^2) HBM
    class_agnostic: bool = False      # per-class NMS via class offset
                                      # (localizer_engine.py:260-261)
    # 1 = grayscale-native detector (see EncoderConfig.input_channels)
    input_channels: int = 3
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end inference pipeline (reference: infer_effocr_onnx_multi.py:227)."""

    lang: str = "en"                  # {"en", "jp"}
    vertical: bool = False            # --vertical flag
    localizer: LocalizerConfig = field(default_factory=LocalizerConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    line_batch: int = 16              # lines per detector step
    crop_batch: int = 512             # crops per recognizer step (ref pads to
                                      # 64: infer_effocr_onnx_multi.py:143-158)
    max_chars_per_line: int = 256     # fixed-shape cap on per-line detections
    max_words_per_line: int = 64
    anchor_margin: Optional[float] = None   # en_postprocess hyperparameter
    anchor_multiplier: float = 4.0
    # expand char boxes by this many canvas pixels along the reading axis
    # before cropping (x for horizontal, y for vertical).  Measured on the
    # en demo corpus: 0 is optimal (0.5 px costs +10% relative CER, 1 px
    # +84%) — the encoder/prototypes are trained on exact GT-box geometry,
    # so padding shifts the crop distribution more than it recovers from
    # box jitter.  Non-zero only makes sense for encoders trained with
    # loose crops (e.g. heavy --crop_sim / affine augmentation).
    box_pad: float = 0.0
    spell_check: bool = False
    # "word count" frequency list for the spell checker (the reference uses
    # symspell's bundled 82k list, utils/spell_check_utils.py:14-23); build
    # one from any text corpus with `python -m effocr_tpu build-freq-dict`.
    # None = small builtin list (tests only).
    spell_check_dict: Optional[str] = None
    # extra homoglyph pairs ('a b' per line) extending the built-in
    # visual-similarity table; build from a trained index with
    # `python -m effocr_tpu build-homoglyphs` (embedding nearest
    # neighbors = the artifact's actual confusions)
    homoglyphs_path: Optional[str] = None
    # "letterbox": crops cut on-device from the 640-letterboxed line (fully
    # fused, fastest).  "original": crops cut host-side from the original
    # resolution image, byte-matching reference semantics
    # (infer_effocr_onnx_multi.py:307-318).
    crop_source: str = "letterbox"
    # Crop rect geometry along the non-reading axis — MUST match how the
    # recognizer's training crops were built (the artifact contract; the
    # loader resolves it from the recognizer's model.json):
    #   "line":  clip to the full line content height (width if vertical),
    #            the reference's "double-clipped" inference crops
    #            (infer_effocr_onnx_multi.py:313-316) — pair with trees
    #            built `format-dataset --clip_to_top_and_bottom`.
    #   "tight": the detected box itself, matching trees built without
    #            the clip flag (our format-dataset default).  A geometry
    #            mismatch here is catastrophic for en (narrow glyphs in a
    #            full-height frame are far outside the training
    #            distribution: CER 0.06 -> 0.85 measured).
    crop_geometry: str = "line"
    # 1 = grayscale pipeline: 3x fewer host->device bytes (the hot-link
    # bottleneck); printed documents carry no chroma.  Models must be
    # trained with the same channel count.
    input_channels: int = 3
    # "canvas": host letterboxes to the detector canvas and uploads it.
    # "bucket": host uploads raw-size images in a small padded bucket and
    # the letterbox resize runs on the MXU (kernels.image_ops
    # letterbox_device) — fewer bytes over the host->device link.
    transfer: str = "canvas"
    # 8 = raw uint8 canvas upload; 4 = two pixels packed per byte on the
    # host and unpacked on the VPU (nibble-replication v*17) — halves the
    # host->device bytes, the measured wall behind a remote chip; 2 = four
    # pixels per byte MSB-first (Bayer-dithered, v*85: 4 gray levels) —
    # quarters them.  16 gray levels measured CER-neutral on the trained
    # corpora; 2-bit is a speed/accuracy TRADEOFF (~9-13% relative CER
    # cost measured, BENCH_ACCURACY.md) — only for deployments that accept
    # it.  Fused canvas path only.
    transfer_bits: int = 8
    # Device->host packing of the fused path's single result buffer
    # (n_chars | nn_idx | char boxes | word boxes | word validity).
    # "i32": every field rides as int32 (box floats bitcast — exact).
    # "u16": halves the device->host bytes — the d2h pull is a measured
    # wall behind a remote-chip relay.  Boxes are quantized to 1/16 px
    # fixed point (canvases up to 4096 px); counts/indices ride as uint16
    # (needs prototype count and crop caps < 65536 — engine-asserted).
    # The 1/16 px only perturbs host-side word-distance / case-repair
    # thresholds, never the on-device crops, and decodes text-identically
    # on the e2e corpora (tests/test_pipeline_e2e.py); "i32" stays the
    # default for bit-exactness.
    out_quant: str = "i32"
    # Forward-pass dtype for the localizer + encoder inside the fused
    # programs.  "bf16" casts the float32 params and the canvas to
    # bfloat16 so the convs hit the MXU at its bf16 rate (~2x f32);
    # box decode/NMS and the retrieval matmul stay f32 (embeddings are
    # upcast before normalization), so thresholds and top-1 margins are
    # unquantized.  Glyph top-1 retrieval is margin-robust, but bf16 is
    # a numeric change — A/B CER on the trained corpus before pinning
    # (BENCH_ACCURACY.md).  "f32" is exact and the default.
    compute_dtype: str = "f32"
    bucket_hw: Tuple[int, int] = (64, 1024)
    # Adaptive canvas height: per line-chunk, shrink the letterbox canvas
    # height to the smallest stride-32 tier that holds every line's
    # width-bound content height (capped by input_height/input_size).
    # Text lines are ~15-25x wider than tall, so the fixed-height canvas is
    # mostly 114-gray padding; a 64x640 canvas moves 3x fewer bytes over
    # the host->device link and runs the detector on 3x fewer pixels than
    # 192x640 with identical letterbox geometry (the content pixels are the
    # same; r = min(canvas_h/h, canvas_w/w) still binds on width).  Each
    # distinct tier compiles one program variant; tiers are multiples of 32.
    adaptive_height: bool = False
    # Adaptive-height guard: smallest tier adaptive_height may pick.  A
    # detector trained at one fixed height degrades on tiers it never saw
    # (0.059 -> 0.081 CER measured, BENCH_ACCURACY.md "Known interaction");
    # the inference loader sets this to min(trained_heights) from the
    # localizer's model.json so adaptive tiers stay inside the training
    # distribution.  None = unguarded (trust the caller).
    adaptive_height_floor: Optional[int] = None
    # Largest tier adaptive_height may pick (the ceiling twin of the
    # floor): set to max(trained_heights) by the loader.  Content needing
    # a taller canvas is height-bound at this tier instead of escalating
    # to a canvas the detector never saw (e.g. 65-px lines on a 1024-wide
    # canvas "need" 128, but a 64/96-trained detector should get the
    # 96 tier and let letterbox downscale).  None = cap at input_height.
    adaptive_height_cap: Optional[int] = None
    # Adaptive-height tier rule:
    #   "fill":   smallest tier whose height holds the content at the
    #             width-bound scale r = input_size/w — maximizes glyph
    #             resolution (upscales short-and-narrow lines).
    #   "native": tier nearest the chunk's tallest raw line height
    #             (clamped to [floor, cap]) — keeps r ~= 1 instead of
    #             upscaling, cutting canvas pixels/bytes ~2-3x on
    #             newspaper lines.  Both tiers must be in the detector's
    #             trained_heights; "native" trades crop resolution for
    #             throughput, so A/B CER before adopting.
    adaptive_height_mode: str = "fill"
    # Adaptive canvas width (reading-axis length; trims canvas HEIGHT when
    # vertical): shrink the canvas's long axis to the chunk's content
    # extent at the UNCHANGED letterbox scale r = min(input_size/w,
    # canvas_h/h) — r is still computed against the full input_size, so
    # every glyph lands at identical scale/position and the decode is
    # exact; only trailing 114-gray padding columns are dropped.  Wins are
    # largest with chunk_sort="width" (similar-length lines share chunks).
    # Each distinct (height, width) canvas compiles one program variant;
    # widths are bucketed to adaptive_width_stride.  Fused letterbox
    # canvas paths only (transfer "canvas", crop_source "letterbox").
    adaptive_width: bool = False
    adaptive_width_stride: int = 128
    # "width": sort lines by reading-axis length before chunking so
    # adaptive_width tiers bind per chunk (results are keyed by path/index,
    # so order never leaks into the output contract).  "none" preserves
    # input order end to end.
    chunk_sort: str = "none"
    # static ROI slice size; must cover the max crop side in letterbox px
    # (side = max(char width, line content height)); smaller = fewer MXU
    # FLOPs in the crop kernel
    crop_window: int = 256
    # When set, the fused program runs the encoder over crop_batch crops in
    # sequential sub-batches of this size (lax.map) instead of one pass —
    # same FLOPs and one device dispatch, but peak activation memory is
    # bounded by the sub-batch, which lets line_batch/crop_batch grow to
    # amortize per-dispatch link latency without exhausting HBM.
    encoder_sub_batch: Optional[int] = None
    knn_k: int = 1
    # "xla": matmul + lax.top_k (materializes [N, C] sims in HBM — fine to
    # ~1k classes).  "pallas": tiled top-1 kernel streaming prototype tiles
    # through VMEM with a running max (kernels/pallas_retrieval.py) — for
    # jisx0213/adobe-scale indexes (~13k classes); requires knn_k == 1.
    retrieval_kernel: str = "xla"
    # "xla": fixpoint NMS on [B, N, N] suppression matrices in HBM
    # (kernels/nms.py).  "pallas": whole-image-in-VMEM greedy NMS
    # (kernels/pallas_nms.py) — bit-identical keep mask, none of the
    # [N, N] HBM traffic; the win grows with max_nms.
    nms_kernel: str = "xla"
    # chunks of lines whose detect results may be in flight at once
    # (host glue of chunk k overlaps device detect of chunk k+1).
    # Depth 3 measures ~30% over depth 2 behind the remote-chip relay:
    # while the main thread blocks fetching chunk k, the prep worker can
    # finish dispatching k+1 AND start prepping k+2 instead of idling
    # (depth 4 is within noise of 3 — diminishing returns).
    prefetch_chunks: int = 3
    # Wide-line tiling (pipelines/tiling.py): when > 0, a line whose
    # letterboxed content height (width, if vertical) would fall below
    # this many px is split into overlapping tiles that each letterbox at
    # a readable scale; per-tile decodes are merged by ownership span.
    # The reference has no equivalent — extreme-aspect lines just lose
    # resolution (localizer_engine.py:107-138).  0 disables (default:
    # identical behavior to the reference).  Fused letterbox-crop paths.
    tile_min_content_h: int = 0
    # overlap between consecutive tiles = factor * line height (width if
    # vertical); must exceed ~2 glyph widths so every boundary glyph is
    # fully visible in the tile that owns it
    tile_overlap_factor: float = 2.0


@dataclass(frozen=True)
class RecognizerTrainConfig:
    """Recognizer training (reference: train_effocr_recognizer.py)."""

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    batch_size: int = 128             # :196
    lr: float = 2e-6                  # :198
    weight_decay: float = 5e-4        # :200
    num_epochs: int = 5               # :202
    temperature: float = 0.1          # SupCon temp :204
    m_per_class: int = 4              # :208
    num_passes: int = 1               # :238
    lang: str = "en"
    finetune: bool = False            # train only on paired crops :218
    pretrain: bool = False            # train only on renders :220
    high_blur: bool = False           # :222
    no_aug: bool = False              # :240
    hns_txt_path: Optional[str] = None
    infer_hardneg_k: int = 8          # :228
    seed: int = 0
    # --- from-scratch training recipe (beyond reference parity) ---------
    # The reference finetunes ImageNet-pretrained timm encoders at lr 2e-6;
    # training from random init (no pretrained weights in this environment)
    # needs a real schedule and a stronger supervised signal.
    lr_schedule: str = "constant"     # {"constant", "cosine"}
    warmup_frac: float = 0.0          # linear warmup, fraction of total steps
    min_lr_frac: float = 0.0          # cosine floor as a fraction of peak lr
    # Auxiliary cosine-classifier cross-entropy added to SupCon (kNN mode
    # only): logits = l2norm(emb) @ l2norm(W) / aux_ce_temp.  A NormFace-
    # style proxy objective that directly optimizes the cosine geometry the
    # 1-NN retrieval decodes in; 0 disables (reference-parity loss).
    aux_ce_weight: float = 0.0
    aux_ce_temp: float = 0.07
    # Proxy init: "embed" = one render per class embedded by the (random)
    # encoder — at 10k+ classes random proxies update so rarely that the CE
    # stays noise for thousands of steps and drowns SupCon; embedding-
    # seeded proxies make the objective coherent from step one.
    aux_init: str = "embed"           # {"embed", "random"}
    aux_lr_mult: float = 1.0          # proxy-row lr multiplier (ProxyNCA
                                      # practice: 10-100x at large C)
    # Prototype source for eval + ref.npz: "render" = embeddings of the
    # clean prototype-font renders (reference semantics,
    # train_effocr_recognizer.py:47-62); "centroid" = L2-normalized per-class
    # mean embedding over train items (robust when a single clean render
    # sits off-cluster under from-scratch training).
    ref_source: str = "render"
    centroid_cap: int = 32            # max train items embedded per class
    eval_period_epochs: int = 1       # epochs between val evals (centroid
                                      # eval embeds the train set; at 10k+
                                      # classes evaluate less often)
    adam_b2: float = 0.999            # second-moment decay; at 10k+ classes
                                      # each aux proxy row updates only
                                      # every ~C/classes_per_batch steps and
                                      # b2=0.999 keeps stale variance ->
                                      # oversized steps; 0.95-0.98 is stable
    # p of warping a render into paired-crop geometry (glyph scaled
    # 0.45-0.85x, anchored to the line edge) during augmentation — bridges
    # the render->crop distribution gap for classes with no paired data
    # (data/transforms.py augment_batch crop_sim).  0 disables.
    crop_sim: float = 0.0
    # per-sample probability of a small affine jitter on PAIRED crops
    # (scale 0.94-1.06, translate ±5%) — simulates inference-time detector
    # box jitter so the encoder learns invariance to it (the box_pad sweep
    # showed exact-geometry sensitivity is the en residual).  0 disables
    # (reference behavior: paired crops are never augmented).
    paired_jitter: float = 0.0
    # Font file for the AddAdjacentChars neighbor-glyph augmentation
    # (utils/datasets_utils.py:93-144 — defined but unwired in the
    # reference; opt-in here).  None disables.  The font is rendered once
    # into a per-side glyph bank composited on device (data/transforms.py
    # _compose_adjacent).
    adjacent_font_path: Optional[str] = None
    # "resident": upload the whole dataset to HBM once as a gray uint8
    # bank and ship int32 indices per step (train + eval embed).  The
    # TPU-native input pipeline for datasets that fit in HBM (a 110k-item
    # 128-px tree is 1.8 GB), and required for long runs behind the axon
    # transport, which retains every host->device transfer buffer.
    data_device: str = "stream"       # {"stream", "resident"}


@dataclass(frozen=True)
class LocalizerTrainConfig:
    """Localizer training (reference: train_effocr_localizer_d2.py)."""

    localizer: LocalizerConfig = field(default_factory=LocalizerConfig)
    batch_size: int = 16
    lr: float = 1e-3
    weight_decay: float = 5e-4
    warmup_steps: int = 500
    num_epochs: int = 100
    eval_period_epochs: int = 1       # EvalHook cadence (:180-184)
    box_gain: float = 0.05            # YOLOv5 loss gains
    obj_gain: float = 1.0
    cls_gain: float = 0.5
    anchor_match_thresh: float = 4.0  # wh-ratio anchor matching
    seed: int = 0
    # on-device train augmentation (reference D2 mapper augs / --alt_augs,
    # train_effocr_localizer_d2.py:149-166): flip + scale jitter +
    # photometric, kernels/det_augment.py
    augment: bool = False
    aug_flip_p: float = 0.5
    aug_scale: float = 0.25
    aug_translate: float = 0.1


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def replace(cfg, **kwargs):
    return dataclasses.replace(cfg, **kwargs)
