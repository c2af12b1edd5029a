from .binaryops import (  # noqa: F401
    decode_image_stub,
    extract_features,
    frame_sample_stub,
    with_media_metadata,
)
