from polkadot_etl_spark.multimodal.media import (
    MEDIA_SCHEMA,
    byte_histogram_features,
    decode_audio,
    decode_image,
    resize_images,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "byte_histogram_features",
    "decode_audio",
    "decode_image",
    "resize_images",
    "sample_frames",
]
