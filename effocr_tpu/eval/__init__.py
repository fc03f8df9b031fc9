from effocr_tpu.eval.textline import (
    edit_distance,
    string_cleaner,
    textline_evaluation,
)
