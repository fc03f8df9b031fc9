from effocr_tpu.pipelines.lang import (
    en_preprocess,
    en_postprocess,
    jp_preprocess,
    DISTINCT_LOWERCASE,
    NONDISTINCT_LOWERCASE,
)
from effocr_tpu.pipelines.infer import EffOCRInference
