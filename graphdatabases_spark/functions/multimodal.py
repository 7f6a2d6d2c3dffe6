"""Multimodal column conventions: opaque binary payloads + typed metadata.

The engine's convention for image/audio/video at 100 TB (SURVEY §2.2
"LLM-data-pipeline extensions"):

- payload: an opaque ``binary`` column (or a storage path column for
  larger-than-row blobs)
- metadata: a typed struct column (``modality``, ``byte_len``,
  ``content_sha256``, plus modality-specific fields)
- processing: Arrow-batched ``mapInPandas`` kernels — the batch shape
  (columnar, bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``)
  is how decode/resize/frame-sample amortizes per-row Python cost

The decode step itself is STUBBED here (image/audio codecs are not in
this environment): ``decode_stub`` raises ``NotImplementedError`` unless
given ``fake=True``, in which case it produces a deterministic fake
"decoded" feature vector so the Spark-side plumbing (schema, batching,
UDF signature) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_FIELDS = "modality string, byte_len bigint, content_sha256 string"


def attach_binary_payload(df: DataFrame, source_col: str, modality: str) -> DataFrame:
    """Treat a column's bytes as an opaque payload and attach the typed
    metadata struct (JVM-side: cast + sha2 + length, no Python)."""
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(payload).alias("byte_len"),
            F.lower(F.sha2(payload, 256)).alias("content_sha256"),
        ),
    )


def decode_stub(payload: bytes, fake: bool = False) -> list[float]:
    """Decode a binary payload to a feature vector.

    Real decoders (PIL/ffmpeg/torchaudio) are not available in this
    container — the deterministic fake derives 8 floats from the
    payload's sha256 so tests exercise the full plumbing.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs unavailable in this environment; pass fake=True "
            "for the deterministic test decoder"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(
    df: DataFrame, payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each Python worker receives columnar batches, decodes
    per row, emits (id passthrough columns + features array). This is
    the exact shape a real image/audio featurizer plugs into — swap
    ``decode_stub`` for the real codec.
    """
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", features array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(bytes(p), fake=fake) for p in pdf[payload_col]
            ]
            out = pdf.copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(gen, schema=schema)
