"""Multimodal column plumbing — opaque binary payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` (BASELINE.json north
star). The decode kernels themselves are stubbed (no image/audio libs in
this container); everything Spark-side — schema, batching, partitioning,
UDF signatures — is real and tested."""

from w4h_etl_container_spark.multimodal.media import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_stub,
    extract_features,
    frame_sample,
    synthesize_media,
)
