from effocr_tpu.kernels.image_ops import (
    letterbox_params,
    letterbox_host,
    normalize_imagenet,
    resize_bilinear,
    median_pad_square,
    paired_transform_host,
)
from effocr_tpu.kernels.nms import batched_nms, nms_mask
from effocr_tpu.kernels.yolo_decode import decode_and_nms, xywh2xyxy
from effocr_tpu.kernels.roi import crop_lines_to_squares
from effocr_tpu.kernels.retrieval import knn_topk, l2_normalize
from effocr_tpu.kernels.morphology import erode, dilate
