"""End-to-end OCR inference: lines -> boxes -> crops -> embeddings -> text.

This is the TPU redesign of run_effocr (infer_effocr_onnx_multi.py:227-397).
The reference fans work out to CPU thread pools around ONNX sessions; here
the pipeline is two fixed-shape jitted device programs plus thin host glue:

  program A (detect):     uint8 letterboxed lines -> YOLO forward -> decode
                          -> greedy NMS -> padded [L, max_det, 6] + mask
  host glue:              reading-order sort, word boundaries, crop rects
                          (cheap numpy on few hundred boxes/line)
  program B (recognize):  ROI crop kernel -> encoder -> retrieval top-1
                          (crops never leave the device)

Host does only image decode + letterbox; everything from /255 onward is XLA.
Two crop sources are supported: 'letterbox' (fully fused on device) and
'original' (host crops from the original image, byte-matching the
reference's infer_effocr_onnx_multi.py:307-318 semantics).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from effocr_tpu.core.batching import pad_to_multiple
from effocr_tpu.core.config import PipelineConfig
from effocr_tpu.kernels.image_ops import (
    dither_offsets,
    letterbox_device,
    letterbox_host,
    letterbox_params,
    paired_transform_host,
    quantize_2bit,
)
from effocr_tpu.kernels.retrieval import knn_topk, l2_normalize
from effocr_tpu.kernels.roi import crop_lines_to_squares
from effocr_tpu.kernels.yolo_decode import decode_and_nms
from effocr_tpu.pipelines.lang import (
    batch_word_ends,
    en_postprocess,
    en_preprocess,
    insert_spaces,
    jp_preprocess,
    word_end_indices,
)
from effocr_tpu.retrieval.index import PrototypeIndex

logger = logging.getLogger(__name__)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_header(path: str) -> Optional[Tuple[int, int, int, int, int]]:
    """(h, w, color_type, bit_depth, interlace) from a PNG IHDR without
    decoding the pixel data, or None when the file is not a PNG (caller
    falls back to a PIL header probe)."""
    try:
        with open(path, "rb") as f:
            head = f.read(33)
    except OSError:
        return None
    if len(head) < 33 or head[:8] != _PNG_MAGIC or head[12:16] != b"IHDR":
        return None
    w = int.from_bytes(head[16:20], "big")
    h = int.from_bytes(head[20:24], "big")
    return h, w, head[25], head[24], head[28]


class _LazyImage:
    """Deferred image decode for the inference input pipeline.

    The shape comes from the image header (PNG IHDR fast path, PIL probe
    otherwise) so chunk planning (width-sorted chunking, adaptive canvas
    tiers, tiling plans) never forces a decode; the pixels decode on first
    load(), which happens inside the prep worker thread — overlapping PNG
    inflation with device execution of earlier chunks instead of paying it
    serially up front.  Repeated paths share one instance and decode once
    (the reference decodes on its localizer thread pool for the same
    reason, infer_effocr_onnx_multi.py:166-182).

    Common PNGs (8-bit, gray/RGB, non-interlaced) decode through the
    first-party native decoder (native/preproc.cpp decode_png_batch —
    libdeflate inflate + unfilter, ~4x faster than PIL on line corpora);
    everything else falls back to PIL.

    gray=True (grayscale pipelines, input_channels == 1) loads straight to
    [H, W, 1]: gray PNGs decode as-is; RGB sources reduce via the
    truncating channel mean ((r+g+b)//3 — identical to the numpy
    .mean(-1).astype(uint8) the gray pipeline applies, in native code and
    in the PIL fallback alike).
    """

    __slots__ = ("path", "_shape", "_arr", "_native")

    def __init__(self, path: str, gray: bool):
        self.path = path
        self._arr: Optional[np.ndarray] = None
        self._native = False
        hdr = _png_header(path)
        if hdr is not None:
            h, w, color_type, bit_depth, interlace = hdr
            self._native = (
                bit_depth == 8 and color_type in (0, 2) and interlace == 0
            )
            ch = 1 if (gray and (
                self._native or (color_type == 0 and bit_depth == 8)
            )) else 3
        else:
            from PIL import Image

            with Image.open(path) as im:
                w, h = im.size
                ch = 1 if (gray and im.mode == "L") else 3
        self._shape = (h, w, ch)

    @property
    def shape(self) -> Tuple[int, int, int]:
        return self._shape

    def load(self) -> np.ndarray:
        if self._arr is None:
            if self._native:
                from effocr_tpu import native

                if native.available():
                    arr = native.decode_png(self.path, *self._shape)
                    if arr is not None:
                        self._arr = arr
                        return self._arr
            from PIL import Image

            with Image.open(self.path) as im:
                if self._shape[2] == 1:
                    if im.mode == "L":
                        self._arr = np.asarray(im)[..., None]
                    else:
                        rgb = np.asarray(im.convert("RGB"))
                        self._arr = rgb.mean(
                            axis=-1, keepdims=True
                        ).astype(np.uint8)
                else:
                    self._arr = np.asarray(im.convert("RGB"))
        return self._arr


def _materialize(img) -> np.ndarray:
    return img.load() if isinstance(img, _LazyImage) else img


def _materialize_batch(chunk: List) -> List[np.ndarray]:
    """Decode a chunk's lazy images in one native batch call (thread-pool
    PNG decode); repeated paths share one _LazyImage and decode once.
    Non-native formats and failed statuses fall back to PIL per image."""
    todo = {
        id(im): im
        for im in chunk
        if isinstance(im, _LazyImage) and im._arr is None and im._native
    }
    if todo:
        from effocr_tpu import native

        if native.available():
            ims = list(todo.values())
            arrs, _ = native.decode_png_batch(
                [im.path for im in ims], [im.shape for im in ims]
            )
            for im, arr in zip(ims, arrs):
                if arr is not None:
                    im._arr = arr
    return [_materialize(im) for im in chunk]


def build_inference_coco(coco_boxes: Dict) -> Dict:
    """COCO-format prediction output: per-line image entries (with decoded
    text) and per-char box annotations in original-image coordinates
    (the jp COCO output of infer_effocr.py:558-563, utils/coco_utils.py)."""
    from effocr_tpu.data.coco import (
        COCO_JSON_SKELETON,
        create_coco_anno_entry,
        create_coco_image_entry,
    )
    import copy
    import os as _os

    coco = copy.deepcopy(COCO_JSON_SKELETON)
    anno_id = 0
    for image_id, (key, entry) in enumerate(coco_boxes.items()):
        name = _os.path.basename(str(key))
        coco["images"].append(
            create_coco_image_entry(
                name, entry["height"], entry["width"], image_id,
                text=entry["text"],
            )
        )
        for cb in entry["chars"]:
            x, y, w, h = cb["bbox"]
            anno = create_coco_anno_entry(x, y, w, h, anno_id, image_id, 0)
            anno["text"] = cb["char"]
            coco["annotations"].append(anno)
            anno_id += 1
    return coco


class EffOCRInference:
    """OCR engine: localizer + recognizer + prototype index.

    localizer/encoder are (flax module, variables) pairs; index is a
    PrototypeIndex.  See effocr_tpu.cli.infer for artifact-directory loading
    that mirrors the reference's recognizer_dir/localizer_dir contract.
    """

    def __init__(
        self,
        config: PipelineConfig,
        localizer,
        localizer_vars,
        encoder,
        encoder_vars,
        index: Optional[PrototypeIndex] = None,
        class_map: Optional[Dict[int, str]] = None,
        mesh=None,
    ):
        """kNN mode: pass a PrototypeIndex.  FFNN-classifier mode
        (--N_classes, infer_effocr.py:325-333): pass class_map
        (class index -> char, the class_map.json contract) and a
        classifier model whose output is logits.

        mesh: optional jax.sharding.Mesh with a 'data' axis — the fused
        chunk programs run under jax.shard_map with lines sharded over the
        axis (each chip detects/crops/embeds/retrieves its line_batch/N
        slice independently; zero collectives, the serving scale-out for
        the v5e-8 north-star).  Params/prototypes are replicated; the host
        finisher consumes per-device packed segments.  line_batch must be
        divisible by the data-axis size.  Fused paths only ('letterbox'
        crop source)."""
        self.config = config
        # Per-stage wall-clock accumulators (utils/profiling.StageTimer).
        # "prep/*" stages run on the prefetch worker thread, "main/*" on
        # the consumer; on a 1-core host the two contend for the same CPU,
        # so the SUM of host stages bounds throughput, not the max.
        # Populated always (a handful of perf_counter calls per 256-line
        # chunk); reported by callers when --profile_stages is set.
        from effocr_tpu.utils.profiling import StageTimer

        self.timer = StageTimer()
        self.mesh = mesh
        self._n_shards = int(mesh.shape["data"]) if mesh is not None else 1
        if self._n_shards > 1:
            assert tuple(mesh.axis_names) == ("data",), (
                "inference mesh must be a 1-axis ('data',) mesh, got "
                f"{mesh.axis_names}")
            assert config.line_batch % self._n_shards == 0, (
                f"line_batch {config.line_batch} must divide over the "
                f"data axis ({self._n_shards} shards)")
            assert config.crop_batch % self._n_shards == 0, (
                f"crop_batch {config.crop_batch} must divide over the "
                f"data axis ({self._n_shards} shards)")
            assert config.crop_source == "letterbox", (
                "mesh inference supports the fused letterbox path only")
        # per-device crop-slot capacity: the compaction (and therefore the
        # encoder batch, the dominant stage) is per shard — without this
        # every chip would encode the full crop_batch for line_batch/N
        # lines and the mesh would buy no throughput
        self._crop_cap = config.crop_batch // self._n_shards
        self.localizer = localizer
        self.localizer_vars = localizer_vars
        self.encoder = encoder
        self.encoder_vars = encoder_vars
        if config.compute_dtype == "bf16":
            # cast float params (incl. BN stats) to bfloat16 so the convs
            # run at the MXU bf16 rate; decode/NMS/retrieval stay f32
            # (config.py compute_dtype)
            def _bf16(tree):
                return jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x,
                    tree,
                )

            self.localizer_vars = _bf16(self.localizer_vars)
            self.encoder_vars = _bf16(self.encoder_vars)
        else:
            assert config.compute_dtype == "f32", config.compute_dtype
        self.index = index
        self.class_map = class_map
        self.classifier_mode = class_map is not None
        assert self.classifier_mode or index is not None
        # O(1) vectorized char decode for the hot consumer path (a per-
        # char dict/lambda round trip costs real ms at 8k crops/chunk).
        # Entries are pre-reduced to their first character — every
        # consumer applied `x[0] if x else ""` anyway — so the text join
        # needs no per-char conditional.
        if self.classifier_mode:
            hi = max(class_map, default=0) + 1
            raw = [class_map.get(i, "") for i in range(hi)]
        else:
            raw = list(index.chars) or [""]
        self._char_lookup = np.array(
            [c[0] if c else "" for c in raw], dtype=object)
        c = config
        if c.out_quant == "u16":
            # uint16 result packing bounds (config.py out_quant)
            assert len(self._char_lookup) < (1 << 16), (
                f"out_quant='u16' needs < 65536 prototype rows, got "
                f"{len(self._char_lookup)}")
            assert c.localizer.input_size <= 4096, (
                "out_quant='u16' boxes are 1/16-px fixed point: canvas "
                f"must be <= 4096 px, got {c.localizer.input_size}")
        else:
            assert c.out_quant == "i32", c.out_quant

        def _cast_in(x):
            return (x.astype(jnp.bfloat16) if c.compute_dtype == "bf16"
                    else x)

        @jax.jit
        def _detect(images_u8):
            imgs = images_u8.astype(jnp.float32) / 255.0
            (decoded, _raw) = self.localizer.apply(
                self.localizer_vars, _cast_in(imgs), train=False
            )
            decoded = decoded.astype(jnp.float32)
            boxes, scores, classes, valid = decode_and_nms(
                decoded,
                conf_thresh=c.localizer.conf_thresh,
                iou_thresh=c.localizer.iou_thresh,
                max_nms=c.localizer.max_nms,
                max_det=c.localizer.max_det,
                class_agnostic=c.localizer.class_agnostic,
                nms_kernel=c.nms_kernel,
                interpret=c.nms_kernel == "pallas"
                and jax.default_backend() == "cpu",
            )
            return imgs, boxes, scores, classes, valid

        def _classify(emb, protos, row_mask):
            emb = emb.astype(jnp.float32)   # exact retrieval margins
            if self.classifier_mode:
                # emb is logits; top-1 class (infer_effocr.py:325-333)
                idx = jnp.argmax(emb, axis=-1)[:, None]
                return idx, jnp.take_along_axis(emb, idx, axis=-1)
            if c.retrieval_kernel == "pallas" and c.knn_k == 1:
                from effocr_tpu.kernels.pallas_retrieval import pallas_top1

                scores, idx = pallas_top1(
                    l2_normalize(emb), protos, row_mask=row_mask
                )
                return idx[:, None], scores[:, None]
            scores, idx = knn_topk(emb, protos, k=c.knn_k, row_mask=row_mask)
            return idx, scores

        @partial(jax.jit, static_argnames=("window",))
        def _recognize(images_f32, rects, img_idx, valid, protos, row_mask,
                       window=256):
            crops = crop_lines_to_squares(
                images_f32, rects, img_idx, valid,
                out_size=c.encoder.image_size, window=window,
            )
            emb = self.encoder.apply(
                self.encoder_vars, _cast_in(crops), train=False
            )
            return _classify(emb, protos, row_mask)

        @jax.jit
        def _recognize_direct(crops, protos, row_mask):
            emb = self.encoder.apply(
                self.encoder_vars, _cast_in(crops), train=False
            )
            return _classify(emb, protos, row_mask)

        def _ocr_from_canvas(imgs, content_meta, protos, row_mask):
            """Shared fused body: canvas float images -> decoded chars.

            detect -> NMS -> on-device reading-order sort -> stream-compact
            char boxes across the chunk -> ROI crops -> encoder -> retrieval.
            One host->device transfer (uint8 lines) and one device->host pull
            per chunk — essential when the chip sits behind a high-latency
            link, and the reason the reference's thread pools (ONNX session
            round trips per stage) have no equivalent here.

            content_meta [B, 4] int32: (top, left, new_h, new_w).
            """
            imgs = _cast_in(imgs)      # bf16 convs under compute_dtype
            (decoded, _raw) = self.localizer.apply(
                self.localizer_vars, imgs, train=False
            )
            decoded = decoded.astype(jnp.float32)
            boxes, scores, classes, valid = decode_and_nms(
                decoded,
                conf_thresh=c.localizer.conf_thresh,
                iou_thresh=c.localizer.iou_thresh,
                max_nms=c.localizer.max_nms,
                max_det=c.localizer.max_det,
                class_agnostic=c.localizer.class_agnostic,
                nms_kernel=c.nms_kernel,
                interpret=c.nms_kernel == "pallas"
                and jax.default_backend() == "cpu",
            )
            b, m = valid.shape
            # reading-order key = left (or top) edge, matching the host
            # en_preprocess/jp_preprocess sort (infer_effocr_onnx_multi.py:72)
            center = boxes[..., 1] if c.vertical else boxes[..., 0]
            char_mask = valid & (classes == 0)
            n_chars = jnp.sum(char_mask, axis=1)

            # Line-major reading-order compaction in two cheap steps
            # instead of one global [B*max_det] argsort (sorts are the
            # most expensive primitive on TPU; the global key sort was
            # ~16% of the device program at line_batch 512):
            #   1. per-LINE stable sort by the 1/16-px-quantized edge
            #      (invalid slots ride as int32-max, landing last) —
            #      max_det-wide rows, so the sort is B independent tiny
            #      sorts; stability preserves the old composite-key tie
            #      order exactly;
            #   2. compact to crop slots by the inverse line-offset map:
            #      slot t belongs to line b(t) = searchsorted(csum, t),
            #      char j(t) = t - start(b(t)) — pure gathers.
            # Equivalent output to the global argsort (the old key was
            # line-major too); the subpixel-tie e2e test pins order.
            invalid = jnp.iinfo(jnp.int32).max
            edge_q = jnp.where(
                char_mask,
                jnp.clip(jnp.round(center * 16.0), 0, (1 << 18) - 1)
                .astype(jnp.int32),
                invalid,
            )
            row_order = jnp.argsort(edge_q, axis=1)          # [B, m] stable
            boxes_sorted = jnp.take_along_axis(
                boxes, row_order[:, :, None], axis=1
            )
            csum = jnp.cumsum(n_chars)
            # crop-slot count matches the old argsort[:cap] slice shape
            t = jnp.arange(min(self._crop_cap, b * m), dtype=jnp.int32)
            b_t = jnp.searchsorted(csum, t, side="right").astype(jnp.int32)
            flat_valid = b_t < b
            flat_b = jnp.minimum(b_t, b - 1)
            start = csum[flat_b] - n_chars[flat_b]
            j_t = jnp.clip(t - start.astype(jnp.int32), 0, m - 1)
            flat_boxes = boxes_sorted[flat_b, j_t]

            top = content_meta[:, 0][flat_b]
            left = content_meta[:, 1][flat_b]
            nh = content_meta[:, 2][flat_b]
            nw = content_meta[:, 3][flat_b]
            pad = c.box_pad
            rx0 = jnp.round(flat_boxes[:, 0] - pad).astype(jnp.int32)
            rx1 = jnp.round(flat_boxes[:, 2] + pad).astype(jnp.int32)
            ry0 = jnp.round(flat_boxes[:, 1] - pad).astype(jnp.int32)
            ry1 = jnp.round(flat_boxes[:, 3] + pad).astype(jnp.int32)
            if c.crop_geometry == "tight":
                # box-exact crops: match encoders trained on unclipped
                # PAIRED crops (format-dataset default; config.py
                # crop_geometry)
                rects = jnp.stack([rx0, ry0, rx1, ry1], axis=1)
            elif c.vertical:
                rects = jnp.stack([left, ry0, left + nw, ry1], axis=1)
            else:
                rects = jnp.stack([rx0, top, rx1, top + nh], axis=1)

            crops = _cast_in(crop_lines_to_squares(
                imgs, rects, flat_b, flat_valid,
                out_size=c.encoder.image_size,
                window=min(c.localizer.input_size, c.crop_window),
            ))  # the ROI kernel computes in f32; re-cast for bf16 convs
            sub = c.encoder_sub_batch
            n_slots = crops.shape[0]  # min(crop_batch, B*max_det)
            if sub and n_slots > sub:
                assert n_slots % sub == 0, (n_slots, sub)
                emb = jax.lax.map(
                    lambda x: self.encoder.apply(
                        self.encoder_vars, x, train=False
                    ),
                    crops.reshape(n_slots // sub, sub, *crops.shape[1:]),
                )
                emb = emb.reshape(n_slots, emb.shape[-1])
            else:
                emb = self.encoder.apply(
                    self.encoder_vars, crops, train=False
                )
            nn_idx, _ = _classify(emb, protos, row_mask)

            # Pack every output into ONE vector: each device_get is a full
            # round trip on the high-latency relay (~25 ms measured per
            # array), so six separate outputs cost far more in latency
            # than their bytes.  _finish_fused slices the buffer back
            # apart.  out_quant "i32" ships floats bitcast (exact);
            # "u16" ships 1/16-px fixed point at half the bytes
            # (config.py out_quant).
            if c.lang == "en":
                # per-line word boxes, reading-order sorted (en only —
                # jp has no word grouping, so don't compute or ship them)
                word_mask = valid & (classes == 1)
                word_key = jnp.where(word_mask, center, jnp.inf)
                worder = jnp.argsort(
                    word_key, axis=1
                )[:, : c.max_words_per_line]
                word_boxes = jnp.take_along_axis(
                    boxes, worder[:, :, None], axis=1
                )
                word_valid = (
                    jnp.take_along_axis(word_key, worder, axis=1) < jnp.inf
                )
            else:
                word_boxes = word_valid = None
            if c.out_quant == "u16":
                def q16(x):
                    return jnp.clip(
                        jnp.round(x * 16.0), 0, 65535
                    ).astype(jnp.uint16)

                parts = [
                    n_chars.astype(jnp.uint16),
                    nn_idx[:, 0].astype(jnp.uint16),
                    q16(flat_boxes).reshape(-1),
                ]
                if word_boxes is not None:
                    parts.append(q16(word_boxes).reshape(-1))
                    parts.append(word_valid.reshape(-1).astype(jnp.uint16))
            else:
                parts = [
                    n_chars.astype(jnp.int32),
                    nn_idx[:, 0].astype(jnp.int32),
                    jax.lax.bitcast_convert_type(
                        flat_boxes, jnp.int32
                    ).reshape(-1),
                ]
                if word_boxes is not None:
                    parts.append(
                        jax.lax.bitcast_convert_type(
                            word_boxes, jnp.int32
                        ).reshape(-1)
                    )
                    parts.append(word_valid.reshape(-1).astype(jnp.int32))
            return jnp.concatenate(parts)

        def _shard_fused(body, n_data_args):
            """Wrap a fused chunk program for the data mesh: the first
            n_data_args inputs shard over 'data', the rest (prototype
            matrix, row mask) replicate; each device runs the identical
            per-shard program on its line_batch/N lines and emits its own
            packed output row [N_dev, out_len] — no collectives."""
            if self._n_shards == 1:
                return jax.jit(body)
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            def per_device(*args):
                return body(*args)[None]

            def wrapped(*args):
                in_specs = tuple(
                    P("data") if i < n_data_args else P()
                    for i in range(len(args))
                )
                return shard_map(
                    per_device, mesh=mesh, in_specs=in_specs,
                    out_specs=P("data"), check_vma=False,
                )(*args)

            return jax.jit(wrapped)

        _ocr_chunk = _shard_fused(
            lambda images_u8, content_meta, protos, row_mask:
            _ocr_from_canvas(
                images_u8.astype(jnp.float32) / 255.0, content_meta,
                protos, row_mask,
            ),
            n_data_args=2,
        )

        def _ocr_chunk_packed_body(packed_u8, content_meta, protos,
                                   row_mask):
            """Sub-byte transfer variant.  transfer_bits == 4: packed
            [B, H, W/2, C] holds two width-adjacent pixels per byte (hi
            nibble = even px); unpack by nibble replication (v * 17 maps
            0..15 -> 0..255).  transfer_bits == 2: [B, H, W/4, C] holds
            four pixels per byte MSB-first; v * 85 maps 0..3 -> 0..255
            (printed lines are near-binary, so 4 gray levels decode
            identically — tests/test_pipeline_e2e.py)."""
            b, h, wp = packed_u8.shape[:3]
            if c.transfer_bits == 4:
                hi = (packed_u8 >> 4).astype(jnp.uint8)
                lo = (packed_u8 & 0x0F).astype(jnp.uint8)
                pix = jnp.stack([hi * 17, lo * 17], axis=3)  # [B,H,W/2,2,C]
                imgs = pix.reshape(b, h, wp * 2, packed_u8.shape[-1])
            else:
                assert c.transfer_bits == 2, c.transfer_bits
                quads = [
                    ((packed_u8 >> s) & 0x3).astype(jnp.uint8) * 85
                    for s in (6, 4, 2, 0)
                ]
                pix = jnp.stack(quads, axis=3)  # [B,H,W/4,4,C]
                imgs = pix.reshape(b, h, wp * 4, packed_u8.shape[-1])
            return _ocr_from_canvas(
                imgs.astype(jnp.float32) / 255.0, content_meta, protos,
                row_mask,
            )

        _ocr_chunk_packed = _shard_fused(_ocr_chunk_packed_body,
                                         n_data_args=2)

        _bucket_cache: Dict[int, Any] = {}

        def _ocr_chunk_bucket(buckets_u8, src_rect, dst_params,
                              content_meta, protos, row_mask, size_h=None):
            """Bucket-transfer variant: raw-size images arrive in a small
            padded bucket; the letterbox resize runs on the MXU.  One
            compiled (and mesh-wrapped) program per canvas height."""
            size_w = c.localizer.input_size
            sh = size_h or c.localizer.input_height or size_w
            if sh not in _bucket_cache:
                def body(b_u8, sr, dp, cm, pr, rm, _sh=sh):
                    canvas = letterbox_device(
                        b_u8.astype(jnp.float32) / 255.0, sr, dp, _sh,
                        size_w,
                    )
                    return _ocr_from_canvas(canvas, cm, pr, rm)

                _bucket_cache[sh] = _shard_fused(body, n_data_args=4)
            return _bucket_cache[sh](buckets_u8, src_rect, dst_params,
                                     content_meta, protos, row_mask)

        self._detect = _detect
        self._recognize = _recognize
        self._recognize_direct = _recognize_direct
        self._ocr_chunk = _ocr_chunk
        self._ocr_chunk_packed = _ocr_chunk_packed
        self._ocr_chunk_bucket = _ocr_chunk_bucket

    # ------------------------------------------------------------------ I/O
    @staticmethod
    def _load_image(img: Union[str, np.ndarray]) -> np.ndarray:
        if isinstance(img, str):
            from PIL import Image

            return np.asarray(Image.open(img).convert("RGB"))
        return np.asarray(img)

    # ------------------------------------------------------------------ run
    def run(
        self,
        images: Sequence[Union[str, np.ndarray]],
        return_coco: bool = False,
    ) -> Dict:
        """OCR a list of text-line images (paths or HWC uint8 RGB arrays).

        Returns {key: text} where key is the path (or list index), the
        contract of run_effocr (infer_effocr_onnx_multi.py:388-397).
        """
        c = self.config
        results: Dict = {}
        coco_boxes: Dict = {}

        keys = [
            img if isinstance(img, str) else i
            for i, img in enumerate(images)
        ]
        # deferred decode: shapes come from image headers (cheap), pixels
        # decode per chunk inside the prep worker — overlapped with device
        # execution instead of a serial up-front pass.  Repeated paths
        # (e.g. --n_repeats timing runs) share one entry and decode once.
        lazy: Dict[str, _LazyImage] = {}
        raws: List = []
        for img in images:
            if isinstance(img, str):
                if img not in lazy:
                    lazy[img] = _LazyImage(img, gray=c.input_channels == 1)
                raws.append(lazy[img])
            else:
                raws.append(self._load_image(img))

        # wide-line tiling: split extreme-aspect lines into overlapping
        # windows (each rides the pipeline as a normal line; per-tile
        # decodes merge by ownership span in _finalize_tiled)
        tile_ctx = None
        if c.tile_min_content_h > 0 and c.crop_source != "letterbox":
            logger.warning(
                "tile_min_content_h=%d ignored: wide-line tiling needs "
                "crop_source='letterbox' (got %r)",
                c.tile_min_content_h, c.crop_source,
            )
        if c.tile_min_content_h > 0 and c.crop_source == "letterbox":
            from effocr_tpu.pipelines.tiling import TileKey, plan_tiles

            size_w = c.localizer.input_size
            cap_h = c.localizer.input_height or size_w
            exp_raws, exp_keys, tile_ctx = [], [], {}
            for key, raw in zip(keys, raws):
                h, w = raw.shape[:2]
                if c.vertical:
                    plan = plan_tiles(h, w, cap_h, size_w,
                                      c.tile_min_content_h,
                                      c.tile_overlap_factor)
                else:
                    plan = plan_tiles(w, h, size_w, cap_h,
                                      c.tile_min_content_h,
                                      c.tile_overlap_factor)
                if not plan:
                    exp_raws.append(raw)
                    exp_keys.append(key)
                    continue
                tile_ctx[key] = {"n": len(plan), "plan": plan, "h": h,
                                 "w": w, "parts": {}}
                pix = _materialize(raw)
                for t, tile in enumerate(plan):
                    sub = (pix[tile.start : tile.stop] if c.vertical
                           else pix[:, tile.start : tile.stop])
                    exp_raws.append(np.ascontiguousarray(sub))
                    exp_keys.append(TileKey(key, t))
            raws, keys = exp_raws, exp_keys
            if not tile_ctx:
                tile_ctx = None

        # width-sorted chunking: group lines of similar reading-axis
        # length so adaptive_width canvas tiers bind per chunk.  Results
        # are keyed by path/index, so input order never reaches the
        # output contract.  (Runs after tiling — tiles carry their own
        # lengths.)
        if c.chunk_sort == "width" and len(raws) > 1:
            ax = 0 if c.vertical else 1
            order = sorted(
                range(len(raws)),
                key=lambda i: raws[i].shape[ax],
                reverse=True,
            )
            raws = [raws[i] for i in order]
            keys = [keys[i] for i in order]

        # software-pipelined two ways: (1) jax dispatch is async, so the
        # device runs chunk k while the host post-processes k-1; (2) host
        # prep (letterbox + transfer) of chunk k+1 runs on a worker thread,
        # overlapping with both — the host->device link and the host glue
        # would otherwise serialize with device compute.  A single worker
        # preserves device-queue submission order.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pending = deque()

        def _pop_finish():
            with self.timer.stage("main/wait_prep"):
                handle = pending.popleft().result()
            self._finish_chunk(handle, results, coco_boxes, tile_ctx,
                               want_coco=return_coco)

        with self.timer.stage("main/run_wall"), \
                ThreadPoolExecutor(max_workers=1) as prep:
            for start in range(0, len(raws), c.line_batch):
                chunk = raws[start : start + c.line_batch]
                chunk_keys = keys[start : start + c.line_batch]
                pending.append(
                    prep.submit(self._dispatch_chunk, chunk, chunk_keys)
                )
                if len(pending) >= max(c.prefetch_chunks, 1):
                    _pop_finish()
            while pending:
                _pop_finish()

        if tile_ctx:
            for parent, ctx in tile_ctx.items():
                if parent not in results:
                    logger.warning(
                        "tiled line %r: merged with %d/%d tiles decoded",
                        parent, len(ctx["parts"]), ctx["n"],
                    )
                    self._finalize_tiled(parent, ctx, results, coco_boxes)

        if return_coco:
            return results, build_inference_coco(coco_boxes)
        return results

    def _chunk_canvas_height(self, chunk) -> int:
        """Smallest stride-32 canvas height holding every line's width-bound
        content height (see PipelineConfig.adaptive_height).  Lines taller
        than the cap are height-bound at the cap, exactly as with a fixed
        canvas."""
        c = self.config
        size_w = c.localizer.input_size
        cap = c.localizer.input_height or size_w
        if not c.adaptive_height or c.vertical:
            return cap
        if c.adaptive_height_cap:
            # never escalate past the tallest trained tier: letterbox
            # height-binds there instead (config.py adaptive_height_cap)
            cap = min(cap, c.adaptive_height_cap)
        # floor at the smallest canvas height the detector trained on —
        # tiers outside the training distribution cost CER
        # (BENCH_ACCURACY.md "Known interaction")
        need = c.adaptive_height_floor or 32
        if c.adaptive_height_mode == "native":
            # tier nearest the tallest raw line: letterbox scale stays
            # ~1 instead of upscaling to fill the tier (config.py
            # adaptive_height_mode)
            hmax = max((raw.shape[0] for raw in chunk), default=cap)
            tier = max(32, int(np.round(hmax / 32.0)) * 32)
            return int(np.clip(tier, need, cap))
        for raw in chunk:
            h, w = raw.shape[:2]
            need = max(need, min(cap, int(np.ceil(h * size_w / w))))
        return min(cap, -(-need // 32) * 32)

    def _chunk_canvas_dims(self, chunk) -> Tuple[int, int]:
        """(canvas_h, canvas_w) for this chunk: the adaptive height tier
        plus an optional content-trim of the reading axis.

        adaptive_width drops trailing padding columns (rows, if vertical)
        beyond the chunk's content extent at the UNCHANGED letterbox scale
        — r is still computed against the full canvas dims, so glyph
        geometry is identical and the decode is exact (config.py
        adaptive_width)."""
        c = self.config
        full_w = c.localizer.input_size
        size_h = self._chunk_canvas_height(chunk)
        if (
            not c.adaptive_width
            or c.transfer == "bucket"
            or c.crop_source != "letterbox"
            or not chunk
        ):
            return size_h, full_w
        stride = max(32, c.adaptive_width_stride)
        if c.vertical:
            # vertical lines read down the canvas height: trim that axis
            need = 0
            for raw in chunk:
                h, w = raw.shape[:2]
                r = min(full_w / w, size_h / h)
                need = max(need, int(np.ceil(h * r)))
            # +32 slack keeps content off the trimmed edge (train-time
            # canvases padded width-bound lines on both sides)
            trim_h = min(size_h, -(-(need + 32) // stride) * stride)
            return trim_h, full_w
        need = 0
        for raw in chunk:
            h, w = raw.shape[:2]
            r = min(full_w / w, size_h / h)
            need = max(need, int(np.ceil(w * r)))
        trim_w = min(full_w, -(-(need + 32) // stride) * stride)
        return size_h, trim_w

    def _dispatch_chunk(self, chunk, chunk_keys):
        """Host decode + letterbox + transfer + async detect dispatch.

        Runs on the prep worker thread: lazy images decode here, so PNG
        inflation overlaps device execution of the previous chunks."""
        c = self.config
        from effocr_tpu import native

        if (
            c.input_channels == 1
            and c.crop_source == "letterbox"
            and c.transfer != "bucket"
            and c.transfer_bits in (2, 4, 8)
            and native.available()
            and chunk
            and all(
                isinstance(im, _LazyImage) and im._native and im._arr is None
                for im in chunk
            )
        ):
            # fused native fast path: PNG decode -> gray letterbox -> pack
            # straight from file paths into the canvas buffer, one pass
            handle = self._dispatch_gray_decode_fused(chunk, chunk_keys)
            if handle is not None:
                return handle

        with self.timer.stage("prep/decode"):
            chunk = _materialize_batch(chunk)
        size_h, size_w = self._chunk_canvas_dims(chunk)
        n = len(chunk)

        if (
            c.input_channels == 1
            and c.crop_source == "letterbox"
            and c.transfer != "bucket"
            and native.available()
            and chunk
            and all(im.shape[-1] == chunk[0].shape[-1] for im in chunk)
            and chunk[0].shape[-1] in (1, 3)
        ):
            return self._dispatch_gray_native(
                chunk, chunk_keys, size_h, size_w
            )
        if c.input_channels == 1:
            chunk = [
                im.mean(axis=-1, keepdims=True).astype(np.uint8)
                if im.shape[-1] != 1 else im
                for im in chunk
            ]

        if c.transfer == "bucket" and c.crop_source == "letterbox":
            return self._dispatch_bucket(chunk, chunk_keys, size_h, size_w)

        lb_imgs = np.full(
            (c.line_batch, size_h, size_w, c.input_channels), 114, np.uint8
        )
        metas = []
        from effocr_tpu import native

        t_lb = self.timer.stage("prep/letterbox+pack")
        t_lb.__enter__()
        if native.available():
            out, ratios, tops, lefts = native.letterbox_batch(
                [np.ascontiguousarray(im) for im in chunk], size_w,
                out_h=size_h,
            )
            lb_imgs[:n] = out
            for i, raw in enumerate(chunk):
                h, w = raw.shape[:2]
                r = float(ratios[i])
                metas.append(
                    dict(h=h, w=w, r=r, top=int(tops[i]),
                         left=int(lefts[i]), new_h=int(round(h * r)),
                         new_w=int(round(w * r)))
                )
        else:
            for i, raw in enumerate(chunk):
                lb, r, (dw, dh) = letterbox_host(raw, (size_h, size_w))
                lb_imgs[i] = lb
                h, w = raw.shape[:2]
                new_w, new_h = int(round(w * r)), int(round(h * r))
                top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
                metas.append(
                    dict(h=h, w=w, r=r, top=top, left=left, new_h=new_h,
                         new_w=new_w)
                )

        if c.crop_source == "letterbox":
            meta_arr = np.zeros((c.line_batch, 4), np.int32)
            for i, meta in enumerate(metas):
                meta_arr[i] = (meta["top"], meta["left"], meta["new_h"],
                               meta["new_w"])
            if self.classifier_mode:
                protos = jnp.zeros((1, 1), jnp.float32)
                row_mask = jnp.ones((1,), bool)
            else:
                protos = self.index.device_embeddings
                row_mask = self.index.device_mask
            if c.transfer_bits == 4:
                assert size_w % 2 == 0
                packed = (lb_imgs[:, :, 0::2] & 0xF0) | (
                    lb_imgs[:, :, 1::2] >> 4
                )
                t_lb.__exit__(None, None, None)
                with self.timer.stage("prep/h2d+dispatch"):
                    fused_out = self._ocr_chunk_packed(
                        jnp.asarray(packed), jnp.asarray(meta_arr), protos,
                        row_mask,
                    )
                    try:
                        fused_out.copy_to_host_async()
                    except AttributeError:
                        pass
            elif c.transfer_bits == 2:
                assert size_w % 4 == 0
                d = dither_offsets(lb_imgs.shape[1], size_w)
                lv = quantize_2bit(lb_imgs, d[:, :, None])
                packed = (
                    (lv[:, :, 0::4] << 6)
                    | (lv[:, :, 1::4] << 4)
                    | (lv[:, :, 2::4] << 2)
                    | lv[:, :, 3::4]
                ).astype(np.uint8)
                t_lb.__exit__(None, None, None)
                with self.timer.stage("prep/h2d+dispatch"):
                    fused_out = self._ocr_chunk_packed(
                        jnp.asarray(packed), jnp.asarray(meta_arr), protos,
                        row_mask,
                    )
            else:
                t_lb.__exit__(None, None, None)
                with self.timer.stage("prep/h2d+dispatch"):
                    fused_out = self._ocr_chunk(
                        jnp.asarray(lb_imgs), jnp.asarray(meta_arr), protos,
                        row_mask,
                    )
            return dict(chunk=chunk, chunk_keys=chunk_keys, metas=metas,
                        fused_out=fused_out)

        t_lb.__exit__(None, None, None)
        detect_out = self._detect(jnp.asarray(lb_imgs))
        return dict(chunk=chunk, chunk_keys=chunk_keys, metas=metas,
                    detect_out=detect_out)

    def _dispatch_gray_decode_fused(self, chunk, chunk_keys):
        """Fully fused host prep for lazy PNG chunks: ONE native pass does
        decode + gray letterbox + sub-byte pack per image, file path ->
        canvas row (native/preproc.cpp decode_letterbox_gray_batch).  No
        per-image numpy arrays, no second full-frame pass.  Bit-identical
        to _dispatch_gray_native over _materialize_batch.  Returns None if
        any image fails native decode — the caller falls back."""
        c = self.config
        from effocr_tpu import native

        size_h, size_w = self._chunk_canvas_dims(chunk)
        n = len(chunk)
        bits = c.transfer_bits if c.transfer_bits in (2, 4) else 8
        w_out = size_w * bits // 8
        pad_byte = {2: 0x55, 4: 0x77, 8: 114}[bits]
        buf = np.full((c.line_batch, size_h, w_out, 1), pad_byte, np.uint8)
        with self.timer.stage("prep/decode+letterbox"):
            res = native.decode_letterbox_gray_batch(
                [im.path for im in chunk],
                [im.shape[:2] for im in chunk],
                size_w, buf, out_h=size_h, pack_bits=bits,
            )
        if res is None:
            return None                      # odd PNG: two-step fallback
        ratios, tops, lefts = res
        metas = []
        meta_arr = np.zeros((c.line_batch, 4), np.int32)
        for i, im in enumerate(chunk):
            h, w = im.shape[:2]
            r = float(ratios[i])
            new_h, new_w = int(round(h * r)), int(round(w * r))
            metas.append(
                dict(h=h, w=w, r=r, top=int(tops[i]), left=int(lefts[i]),
                     new_h=new_h, new_w=new_w)
            )
            meta_arr[i] = (int(tops[i]), int(lefts[i]), new_h, new_w)
        if self.classifier_mode:
            protos = jnp.zeros((1, 1), jnp.float32)
            row_mask = jnp.ones((1,), bool)
        else:
            protos = self.index.device_embeddings
            row_mask = self.index.device_mask
        fn = self._ocr_chunk_packed if bits in (2, 4) else self._ocr_chunk
        with self.timer.stage("prep/h2d+dispatch"):
            fused_out = fn(jnp.asarray(buf), jnp.asarray(meta_arr), protos,
                           row_mask)
            try:
                fused_out.copy_to_host_async()
            except AttributeError:
                pass
        return dict(chunk=chunk, chunk_keys=chunk_keys, metas=metas,
                    fused_out=fused_out)

    def _dispatch_gray_native(self, chunk, chunk_keys, size_h, size_w):
        """Fused native host prep for the grayscale canvas path: one
        threaded C++ pass (native/preproc.cpp letterbox_gray_batch) does
        RGB->gray, letterbox, and — when transfer_bits == 4 — the nibble
        packing, replacing three full-frame numpy passes on the single
        prep worker.  Output is bit-identical to the numpy path."""
        c = self.config
        from effocr_tpu import native

        n = len(chunk)
        bits = c.transfer_bits if c.transfer_bits in (2, 4) else 8
        w_out = size_w * bits // 8
        # padding byte for unused batch rows: 114 gray packed at each
        # width (4-bit: 114|114 = 0x77; 2-bit: (114>>6) x4 = 0x55)
        pad_byte = {2: 0x55, 4: 0x77, 8: 114}[bits]
        buf = np.full((c.line_batch, size_h, w_out, 1), pad_byte, np.uint8)
        with self.timer.stage("prep/letterbox+pack"):
            out, ratios, tops, lefts = native.letterbox_gray_batch(
                [np.ascontiguousarray(im) for im in chunk], size_w,
                out_h=size_h, pack_bits=bits,
            )
            buf[:n, :, :, 0] = out
        metas = []
        meta_arr = np.zeros((c.line_batch, 4), np.int32)
        for i, raw in enumerate(chunk):
            h, w = raw.shape[:2]
            r = float(ratios[i])
            new_h, new_w = int(round(h * r)), int(round(w * r))
            metas.append(
                dict(h=h, w=w, r=r, top=int(tops[i]), left=int(lefts[i]),
                     new_h=new_h, new_w=new_w)
            )
            meta_arr[i] = (int(tops[i]), int(lefts[i]), new_h, new_w)
        if self.classifier_mode:
            protos = jnp.zeros((1, 1), jnp.float32)
            row_mask = jnp.ones((1,), bool)
        else:
            protos = self.index.device_embeddings
            row_mask = self.index.device_mask
        fn = self._ocr_chunk_packed if bits in (2, 4) else self._ocr_chunk
        with self.timer.stage("prep/h2d+dispatch"):
            fused_out = fn(jnp.asarray(buf), jnp.asarray(meta_arr), protos,
                           row_mask)
            # start the device->host copy now: it completes as soon as the
            # device program does, overlapping the relay transfer with the
            # host's work on earlier chunks instead of serializing inside
            # the consumer's blocking device_get
            try:
                fused_out.copy_to_host_async()
            except AttributeError:
                pass
        return dict(chunk=chunk, chunk_keys=chunk_keys, metas=metas,
                    fused_out=fused_out)

    def _dispatch_bucket(self, chunk, chunk_keys, size_h, size_w):
        """Bucket transfer: ship raw-size images; letterbox on device."""
        c = self.config
        bh, bw = c.bucket_hw
        ch = c.input_channels
        n = len(chunk)
        buckets = np.zeros((c.line_batch, bh, bw, ch), np.uint8)
        src_rect = np.zeros((c.line_batch, 4), np.int32)
        dst_params = np.zeros((c.line_batch, 4), np.int32)
        meta_arr = np.zeros((c.line_batch, 4), np.int32)
        metas = []
        from effocr_tpu import native

        for i, raw in enumerate(chunk):
            h, w = raw.shape[:2]
            if h <= bh and w <= bw:
                buckets[i, :h, :w] = raw
                r0, sy, sx, sh_, sw_ = 1.0, 0, 0, h, w
            elif native.available():
                out, rr, tt, ll = native.letterbox_batch(
                    [np.ascontiguousarray(raw)], bw, pad_val=0, out_h=bh
                )
                buckets[i] = out[0]
                r0 = float(rr[0])
                sy, sx = int(tt[0]), int(ll[0])
                sh_, sw_ = int(round(h * r0)), int(round(w * r0))
            else:
                lb, r0, (dw0, dh0) = letterbox_host(raw, (bh, bw), color=0)
                buckets[i] = lb
                sy, sx = int(round(dh0 - 0.1)), int(round(dw0 - 0.1))
                sh_, sw_ = int(round(h * r0)), int(round(w * r0))
            r1, (nw, nh), (top, _, left, _) = letterbox_params(
                sh_, sw_, (size_h, size_w)
            )
            src_rect[i] = (sy, sx, sh_, sw_)
            dst_params[i] = (top, left, nh, nw)
            meta_arr[i] = (top, left, nh, nw)
            metas.append(
                dict(h=h, w=w, r=r0 * r1, top=top, left=left, new_h=nh,
                     new_w=nw)
            )

        if self.classifier_mode:
            protos = jnp.zeros((1, 1), jnp.float32)
            row_mask = jnp.ones((1,), bool)
        else:
            protos = self.index.device_embeddings
            row_mask = self.index.device_mask
        fused_out = self._ocr_chunk_bucket(
            jnp.asarray(buckets), jnp.asarray(src_rect),
            jnp.asarray(dst_params), jnp.asarray(meta_arr), protos, row_mask,
            size_h=size_h,
        )
        return dict(chunk=chunk, chunk_keys=chunk_keys, metas=metas,
                    fused_out=fused_out)

    def _finish_chunk(self, handle, results, coco_boxes,
                      tile_ctx=None, want_coco=True) -> None:
        if "fused_out" in handle:
            return self._finish_fused(handle, results, coco_boxes, tile_ctx,
                                      want_coco=want_coco)
        c = self.config
        chunk = handle["chunk"]
        chunk_keys = handle["chunk_keys"]
        metas = handle["metas"]
        n = len(chunk)
        imgs_dev, boxes, scores, classes, valid = handle["detect_out"]
        boxes = np.asarray(boxes)
        classes = np.asarray(classes)
        valid = np.asarray(valid)

        # ---- host glue: ordering + rects -----------------------------
        all_rects: List[np.ndarray] = []
        all_img_idx: List[int] = []
        host_crops: List[np.ndarray] = []
        per_line: List[Dict] = []
        for i in range(n):
            meta = metas[i]
            v = valid[i]
            char_boxes = boxes[i][(classes[i] == 0) & v]
            word_boxes = boxes[i][(classes[i] == 1) & v]

            if c.lang == "en":
                if len(char_boxes):
                    char_sorted, word_end_idx = en_preprocess(
                        char_boxes.tolist(), word_boxes.tolist(),
                        vertical=c.vertical,
                    )
                else:
                    char_sorted, word_end_idx = [], []
            else:
                char_sorted = (
                    jp_preprocess(char_boxes.tolist(), vertical=c.vertical)
                    if len(char_boxes) else []
                )
                word_end_idx = []

            heights = [b[3] - b[1] for b in char_sorted]
            bottoms = [b[3] for b in char_sorted]
            per_line.append(
                dict(key=chunk_keys[i], n_chars=len(char_sorted),
                     word_end_idx=word_end_idx, heights=heights,
                     bottoms=bottoms, boxes=char_sorted, meta=meta)
            )

            for b in char_sorted:
                if c.crop_source == "letterbox":
                    if c.crop_geometry == "tight":
                        rect = [
                            int(round(b[0] - c.box_pad)),
                            int(round(b[1] - c.box_pad)),
                            int(round(b[2] + c.box_pad)),
                            int(round(b[3] + c.box_pad)),
                        ]
                    elif c.vertical:
                        rect = [
                            meta["left"], int(round(b[1] - c.box_pad)),
                            meta["left"] + meta["new_w"],
                            int(round(b[3] + c.box_pad)),
                        ]
                    else:
                        rect = [
                            int(round(b[0] - c.box_pad)), meta["top"],
                            int(round(b[2] + c.box_pad)),
                            meta["top"] + meta["new_h"],
                        ]
                    all_rects.append(rect)
                    all_img_idx.append(i)
                else:
                    # original-resolution crop.  The reference divides by
                    # its square 640 canvas (infer_effocr_onnx_multi.py:
                    # 314-316, x_orig = x_lb * w / 640); that is the
                    # left=0, r=canvas_w/w special case of the general
                    # inverse letterbox x_orig = (x_lb - left) / r, which
                    # also holds for rectangular/adaptive canvases (text
                    # lines are width-bound, so left==0 and r==canvas_w/w
                    # and the two formulas agree digit-for-digit there).
                    raw = chunk[i]
                    pad = c.box_pad
                    if c.crop_geometry == "tight":
                        x0 = round((round(b[0] - pad) - meta["left"])
                                   / meta["r"])
                        x1 = round((round(b[2] + pad) - meta["left"])
                                   / meta["r"])
                        y0 = round((round(b[1] - pad) - meta["top"])
                                   / meta["r"])
                        y1 = round((round(b[3] + pad) - meta["top"])
                                   / meta["r"])
                        crop = raw[max(int(y0), 0):max(int(y1), 0),
                                   max(int(x0), 0):max(int(x1), 0), :]
                    elif c.vertical:
                        y0 = round((round(b[1] - pad) - meta["top"])
                                   / meta["r"])
                        y1 = round((round(b[3] + pad) - meta["top"])
                                   / meta["r"])
                        crop = raw[max(int(y0), 0):max(int(y1), 0), :, :]
                    else:
                        x0 = round((round(b[0] - pad) - meta["left"])
                                   / meta["r"])
                        x1 = round((round(b[2] + pad) - meta["left"])
                                   / meta["r"])
                        crop = raw[:, max(int(x0), 0):max(int(x1), 0), :]
                    if crop.size == 0:
                        crop = np.zeros((4, 4, 3), np.uint8)
                    host_crops.append(
                        paired_transform_host(crop, c.encoder.image_size)
                    )

        # ---- recognize ------------------------------------------------
        total = sum(p["n_chars"] for p in per_line)
        nn_indices = (
            self._recognize_crops(total, all_rects, all_img_idx, host_crops,
                                  imgs_dev)
            if total else np.zeros((0,), np.int32)
        )

        # ---- decode + postprocess --------------------------------------
        if self.classifier_mode:
            chars = [self.class_map.get(int(j), "") for j in nn_indices]
        else:
            chars = [self.index.chars[j] for j in nn_indices]
        pos = 0
        for p in per_line:
            lc = chars[pos : pos + p["n_chars"]]
            pos += p["n_chars"]
            text = "".join(x[0] for x in lc).strip() if lc else ""
            if self.config.lang == "en":
                out = en_postprocess(
                    text, p["word_end_idx"], p["heights"], p["bottoms"],
                    anchor_margin=self.config.anchor_margin,
                    anchor_multiplier=self.config.anchor_multiplier,
                )
            else:
                out = text
            if self.config.spell_check and out:
                out = self._spell_check(out)
            results[p["key"]] = out
            # boxes back in original-image space for COCO output
            # (cf. infer_effocr.py:558-563)
            meta = p["meta"]
            orig_boxes = []
            for b, ch in zip(p["boxes"], lc):
                x0 = max((b[0] - meta["left"]) / meta["r"], 0.0)
                y0 = max((b[1] - meta["top"]) / meta["r"], 0.0)
                x1 = min((b[2] - meta["left"]) / meta["r"], meta["w"])
                y1 = min((b[3] - meta["top"]) / meta["r"], meta["h"])
                orig_boxes.append(
                    {"bbox": [x0, y0, x1 - x0, y1 - y0], "char": ch[0]}
                )
            coco_boxes[p["key"]] = {
                "width": meta["w"], "height": meta["h"],
                "text": out, "chars": orig_boxes,
            }

    def _spell_check(self, out: str) -> str:
        """Homoglyph spell check with the configured frequency dictionary
        (config.spell_check_dict; None = small builtin list)."""
        from effocr_tpu.utils.spell_check import (
            default_dicts,
            visual_spell_checker,
        )

        worddict, vsim, abbrevs = default_dicts(
            self.config.spell_check_dict, self.config.homoglyphs_path
        )
        return visual_spell_checker(out, worddict, vsim, abbrevs)

    def _finish_fused(self, handle, results, coco_boxes,
                      tile_ctx=None, want_coco=True) -> None:
        """Host side of the fused path: one device_get, then pure-Python
        word boundaries + postprocess.  Under a data mesh the buffer is
        [n_shards, out_len] — one independent packed segment per device's
        line_batch/N slice — consumed segment by segment."""
        c = self.config
        with self.timer.stage("main/device_get"):
            buf = np.asarray(jax.device_get(handle["fused_out"]))
        nsh = self._n_shards
        segs = buf if nsh > 1 else buf[None]
        ld = c.line_batch // nsh
        chunk = handle["chunk"]
        chunk_keys = handle["chunk_keys"]
        metas = handle["metas"]
        left_chunk: List = []
        left_keys: List = []
        with self.timer.stage("main/postprocess"):
            for d in range(nsh):
                lo = d * ld
                n_d = min(max(len(chunk) - lo, 0), ld)
                if n_d == 0:
                    break
                leftover = self._finish_fused_segment(
                    segs[d], chunk[lo : lo + n_d], chunk_keys[lo : lo + n_d],
                    metas[lo : lo + n_d], ld, results, coco_boxes, tile_ctx,
                    want_coco=want_coco,
                )
                if leftover is not None:
                    left_chunk.extend(leftover[0])
                    left_keys.extend(leftover[1])
        if left_chunk:
            self._finish_chunk(
                self._dispatch_chunk(left_chunk, left_keys),
                results, coco_boxes, tile_ctx, want_coco=want_coco,
            )

    def _finish_fused_segment(self, buf, chunk, chunk_keys, metas, nb,
                              results, coco_boxes, tile_ctx=None,
                              want_coco=True):
        """Decode one device's packed segment (nb line slots, len(chunk)
        real lines).  Returns (lines, keys) to re-dispatch on crop-slot
        overflow, else None."""
        c = self.config
        n = len(chunk)
        # single packed int32 buffer (see _ocr_from_canvas): one
        # device_get = one relay round trip instead of six.  Crop slots
        # are argsort(flat_key)[:crop_cap] over nb*max_det candidate
        # keys (crop_cap = crop_batch / n_shards), so the device ships
        # min(·) rows, not always crop_cap.
        cap = min(self._crop_cap, nb * c.localizer.max_det)
        u16 = buf.dtype == np.uint16

        def _unpack_boxes(seg, *shape):
            if u16:  # 1/16-px fixed point (out_quant "u16")
                return seg.astype(np.float32).reshape(*shape) * 0.0625
            return seg.view(np.float32).reshape(*shape)

        o = 0
        n_chars = buf[o : o + nb].astype(np.int64)
        o += nb
        nn_idx = buf[o : o + cap]
        o += cap
        flat_boxes = _unpack_boxes(buf[o : o + 4 * cap], cap, 4)
        o += 4 * cap
        if c.lang == "en":
            # the device-side [:, :max_words_per_line] slice caps at the
            # NMS max_det column count
            w = min(c.max_words_per_line, c.localizer.max_det)
            word_boxes = _unpack_boxes(buf[o : o + nb * w * 4], nb, w, 4)
            o += nb * w * 4
            word_valid = buf[o : o + nb * w].astype(bool).reshape(nb, w)
            o += nb * w
        assert o == buf.shape[0], (o, buf.shape)

        # Crop slots hold a reading-order (line-major) prefix of the chunk's
        # chars, so when a chunk overflows crop_batch, some suffix of lines
        # is undecoded.  Spill those lines into a fresh dispatch instead of
        # silently truncating them.
        csum = np.cumsum(n_chars[:n])
        leftover = None
        if n and csum[-1] > cap:
            first_bad = int(np.searchsorted(csum, cap, side="right"))
            if first_bad == 0:
                logger.warning(
                    "line %r has %d chars, more than crop_batch=%d; "
                    "truncating its decode (raise crop_batch)",
                    chunk_keys[0], int(n_chars[0]), cap,
                )
                n_chars[0] = cap
                first_bad = 1
            if first_bad < n:
                logger.warning(
                    "chunk overflow: %d chars > crop_batch=%d; "
                    "re-dispatching %d tail lines",
                    int(csum[-1]), cap, n - first_bad,
                )
                leftover = (chunk[first_bad:], chunk_keys[first_bad:])
                n = first_bad

        lookup = self._char_lookup
        # one vectorized char decode for the whole segment; out-of-range
        # ids (classifier-mode argmax can range over a logits width
        # exceeding a sparse class map) mask to "" — never wrap to an
        # arbitrary wrong char
        total = int(csum[n - 1]) if n else 0
        idx_seg = nn_idx[:total]
        seg_chars = np.where(
            idx_seg < len(lookup),
            lookup[np.minimum(idx_seg, len(lookup) - 1)], "")

        from effocr_tpu.pipelines.tiling import TileKey

        if c.lang == "en" and n:
            # one vectorized word-end pass for the whole segment (the
            # per-line word_end_indices calls dominated this thread)
            wend = batch_word_ends(
                flat_boxes[:, 2], n_chars[:n], word_boxes[:n, :, 0],
                word_valid[:n],
            )
            n_words = word_valid[:n].sum(axis=1)

        pos = 0
        for i in range(n):
            k = int(n_chars[i])
            boxes_i = flat_boxes[pos : pos + k]
            chars_i = seg_chars[pos : pos + k]
            pos += k

            if tile_ctx is not None and isinstance(chunk_keys[i], TileKey):
                # tile of a wide line: stash the decode in parent
                # coordinates; text assembly happens at merge time
                key_i = chunk_keys[i]
                ctx = tile_ctx[key_i.parent]
                meta = metas[i]
                ax = 1 if c.vertical else 0
                off = np.zeros(4, np.float32)
                off[[ax, ax + 2]] = ctx["plan"][key_i.index].start

                def to_parent(cb):
                    ob = np.empty_like(cb, dtype=np.float32)
                    ob[:, [0, 2]] = np.clip(
                        (cb[:, [0, 2]] - meta["left"]) / meta["r"],
                        0, meta["w"],
                    )
                    ob[:, [1, 3]] = np.clip(
                        (cb[:, [1, 3]] - meta["top"]) / meta["r"],
                        0, meta["h"],
                    )
                    return ob + off

                part_words = np.zeros((0, 4), np.float32)
                if c.lang == "en" and k:
                    wv = word_valid[i]
                    if wv.any():
                        part_words = to_parent(word_boxes[i][wv])
                ctx["parts"][key_i.index] = {
                    "chars": chars_i,
                    "boxes": to_parent(boxes_i) if k else
                             np.zeros((0, 4), np.float32),
                    "words": part_words,
                }
                if len(ctx["parts"]) == ctx["n"]:
                    self._finalize_tiled(
                        key_i.parent, ctx, results, coco_boxes
                    )
                continue

            text = "".join(chars_i.tolist()).strip() if k else ""

            if c.lang == "en" and k:
                word_end_idx = wend[i, : int(n_words[i])]
                if c.anchor_margin is None:
                    # anchor-free fast path: pure string slicing, no
                    # per-char interleave (lang.insert_spaces)
                    out = insert_spaces(text, word_end_idx)
                else:
                    out = en_postprocess(
                        text, word_end_idx.tolist(),
                        boxes_i[:, 3] - boxes_i[:, 1], boxes_i[:, 3],
                        anchor_margin=c.anchor_margin,
                        anchor_multiplier=c.anchor_multiplier,
                    )
            else:
                out = text
            if c.spell_check and out:
                out = self._spell_check(out)
            results[chunk_keys[i]] = out

            if not want_coco:
                continue
            meta = metas[i]
            orig_boxes = []
            for b, ch in zip(boxes_i.tolist(), chars_i):
                x0 = max((b[0] - meta["left"]) / meta["r"], 0.0)
                y0 = max((b[1] - meta["top"]) / meta["r"], 0.0)
                x1 = min((b[2] - meta["left"]) / meta["r"], meta["w"])
                y1 = min((b[3] - meta["top"]) / meta["r"], meta["h"])
                orig_boxes.append(
                    {"bbox": [x0, y0, x1 - x0, y1 - y0],
                     "char": ch[0] if ch else ""}
                )
            coco_boxes[chunk_keys[i]] = {
                "width": meta["w"], "height": meta["h"],
                "text": out, "chars": orig_boxes,
            }

        return leftover

    def _finalize_tiled(self, parent, ctx, results, coco_boxes) -> None:
        """Merge a wide line's per-tile decodes (ownership spans + jitter
        dedup, pipelines/tiling.py) and run the normal line postprocess on
        the merged char/word stream in parent-pixel coordinates."""
        c = self.config
        from effocr_tpu.pipelines.tiling import merge_tile_parts

        empty = {"chars": [], "boxes": np.zeros((0, 4), np.float32),
                 "words": np.zeros((0, 4), np.float32)}
        parts = [ctx["parts"].get(t, empty) for t in range(ctx["n"])]
        cross = ctx["w"] if c.vertical else ctx["h"]
        margin = max(2.0, 0.05 * cross)
        chars, boxes, words = merge_tile_parts(
            parts, ctx["plan"], c.vertical, margin
        )
        text = "".join(x[0] for x in chars if x).strip()
        if c.lang == "en" and len(chars):
            _, word_end_idx = en_preprocess(
                boxes.tolist(), words.tolist(), vertical=c.vertical
            )
            out = en_postprocess(
                text, word_end_idx,
                (boxes[:, 3] - boxes[:, 1]).tolist(),
                boxes[:, 3].tolist(),
                anchor_margin=c.anchor_margin,
                anchor_multiplier=c.anchor_multiplier,
            )
        else:
            out = text
        if c.spell_check and out:
            out = self._spell_check(out)
        results[parent] = out
        coco_boxes[parent] = {
            "width": ctx["w"], "height": ctx["h"], "text": out,
            "chars": [
                {"bbox": [b[0], b[1], b[2] - b[0], b[3] - b[1]],
                 "char": ch[0] if ch else ""}
                for b, ch in zip(boxes.tolist(), chars)
            ],
        }

    def _recognize_crops(self, total, all_rects, all_img_idx, host_crops,
                         imgs_dev) -> np.ndarray:
        c = self.config
        bs = c.crop_batch
        padded = pad_to_multiple(total, bs)
        if self.classifier_mode:
            protos = jnp.zeros((1, 1), jnp.float32)
            row_mask = jnp.ones((1,), bool)
        else:
            protos = self.index.device_embeddings
            row_mask = self.index.device_mask
        out: List[np.ndarray] = []

        if c.crop_source == "letterbox":
            rects = np.zeros((padded, 4), np.int32)
            rects[:total] = np.asarray(all_rects, np.int32)
            img_idx = np.zeros((padded,), np.int32)
            img_idx[:total] = np.asarray(all_img_idx, np.int32)
            vmask = np.zeros((padded,), bool)
            vmask[:total] = True
            for s in range(0, padded, bs):
                idx, _ = self._recognize(
                    imgs_dev,
                    jnp.asarray(rects[s : s + bs]),
                    jnp.asarray(img_idx[s : s + bs]),
                    jnp.asarray(vmask[s : s + bs]),
                    protos, row_mask,
                    window=min(c.localizer.input_size, c.crop_window),
                )
                out.append(np.asarray(idx)[:, 0])
        else:
            crops = np.zeros(
                (padded, c.encoder.image_size, c.encoder.image_size, 3),
                np.float32,
            )
            if total:
                crops[:total] = np.stack(host_crops)
            for s in range(0, padded, bs):
                idx, _ = self._recognize_direct(
                    jnp.asarray(crops[s : s + bs]), protos, row_mask
                )
                out.append(np.asarray(idx)[:, 0])

        return np.concatenate(out)[:total] if out else np.zeros((0,), np.int32)
