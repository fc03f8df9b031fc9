from effocr_tpu.models.factory import (
    create_encoder,
    create_classifier,
    create_localizer,
    ENCODER_REGISTRY,
    LOCALIZER_REGISTRY,
)
