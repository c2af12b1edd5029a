from .binaryops import (  # noqa: F401
    decode_image_stub,
    extract_features,
    frame_sample_stub,
    sample_frames,
    with_media_metadata,
)
