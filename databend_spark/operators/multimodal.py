"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators. The decode step is STUBBED (image/audio libs
are not in this container): ``decode_features`` computes deterministic
features from the raw bytes so the Spark-side plumbing — schema,
partitioning, batch shape, UDF signature — is real and testable, and
``decode_image`` raises NotImplementedError at the exact point a codec
would plug in.

Scale notes: binary payloads dominate row size → keep them out of
shuffles (extract features first, drop the payload before any join) and
size ``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits
executor memory. mapInPandas streams Arrow batches — no full-partition
materialization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, first_byte int, byte_sum bigint, "
    "width int, height int"
)


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text,
    metadata struct with declared width/height (hash-derived)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            (F.col(id_col) % 1920 + 1).cast("int").alias("width"),
            (F.col(id_col) % 1080 + 1).cast("int").alias("height"),
            F.lit("fake/raw").alias("mime"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real codec plug-point. Not available in this container."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; decode_features provides the deterministic stub path"
    )


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Deterministic stand-in features (length, first byte, byte sum) keep
    the pipeline verifiable end-to-end; a real decoder would replace the
    body of ``extract`` only.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "byte_sum": payloads.map(lambda b: int(sum(b))).astype("int64"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)
