from effocr_tpu.data.charsets import load_chars, harmonize_charset
from effocr_tpu.data.fonts import (
    draw_single_char,
    draw_single_char_ascender,
    get_unicode_coverage_from_ttf,
    render_chars,
    paired_chars,
)
from effocr_tpu.data.folder import CharFolderDataset
from effocr_tpu.data.samplers import (
    NoReplacementMPerClassSampler,
    HardNegativeClassSampler,
)
