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

The GENERAL decode step is stubbed here (PIL/ffmpeg-class codecs are
not in this environment): ``decode_stub`` raises ``NotImplementedError``
unless given ``fake=True``, in which case it produces a deterministic
fake "decoded" feature vector so the Spark-side plumbing (schema,
batching, UDF signature) is real and tested.  The pluggable ``codec``
parameter on each kernel is the drop-in point for real decoders, and
``pnm_codec.PnmCodec`` (dependency-free netpbm PGM/PPM parser, incl.
concatenated-stream frame sampling) proves the interface with a real
format end-to-end in tests.
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
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = True,
    codec=None,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each Python worker receives columnar batches, decodes
    per row, emits (id passthrough columns + features array). ``codec``
    is the pluggable real decoder (any object with
    ``decode(payload) -> list[float]``, e.g. ``pnm_codec.PnmCodec``);
    without one the deterministic fake exercises the same plumbing.
    """
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", features array<double>"
    decode = codec.decode if codec is not None else (
        lambda p: decode_stub(p, fake=fake)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(p)) for p in pdf[payload_col]]
            out = pdf.copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(gen, schema=schema)


def resize_stub(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Resize an image payload to width×height.

    The deterministic fake tiles the payload's sha256 digest to exactly
    ``width·height`` bytes — same output size contract as a real
    grayscale thumbnail, so downstream schema/size assertions hold when
    a real codec (PIL) is swapped in.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic test resizer"
        )
    digest = hashlib.sha256(payload).digest()
    need = width * height
    return (digest * (need // len(digest) + 1))[:need]


def resize_images(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    payload_col: str = "payload",
    fake: bool = True,
    codec=None,
) -> DataFrame:
    """mapInPandas thumbnailing: input columns pass through, plus
    (thumb BINARY, thumb_w INT, thumb_h INT). Arrow-batched; ``codec``
    (``resize(payload, w, h) -> bytes``) plugs a real resizer into the
    identical plan — both paths emit exactly width·height bytes."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", thumb binary, thumb_w int, thumb_h int"
    resize = (
        codec.resize
        if codec is not None
        else (lambda p, w, h: resize_stub(p, w, h, fake=fake))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["thumb"] = [
                resize(bytes(p), width, height) for p in pdf[payload_col]
            ]
            out["thumb_w"] = width
            out["thumb_h"] = height
            yield out

    return df.mapInPandas(gen, schema=schema)


def frame_sample_stub(
    payload: bytes, num_frames: int, fake: bool = False
) -> list[bytes]:
    """Sample ``num_frames`` frames from a video payload.

    The deterministic fake derives frame i's bytes from
    sha256(payload ‖ ascii(i)) — distinct per frame, stable across runs
    (ASCII suffix so the contract is reproducible in engines whose
    sha256 takes strings, not blobs).
    """
    if not fake:
        raise NotImplementedError(
            "video codecs unavailable in this environment; pass fake=True "
            "for the deterministic test sampler"
        )
    return [
        hashlib.sha256(payload + str(i).encode("ascii")).digest()[:16]
        for i in range(num_frames)
    ]


def sample_frames(
    df: DataFrame,
    num_frames: int = 4,
    payload_col: str = "payload",
    id_cols: tuple[str, ...] = ("doc_id",),
    fake: bool = True,
    codec=None,
) -> DataFrame:
    """mapInPandas frame sampling: emits ``num_frames`` rows per input
    row — (id passthroughs, frame_idx INT, frame BINARY). The 1→N fan-out
    inside a single Arrow batch is the shape a real ffmpeg sampler needs
    (one decode, many emitted frames)."""
    keep = [f for f in df.schema.fields if f.name in id_cols]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in keep
    ) + ", frame_idx int, frame binary"

    keep_names = [f.name for f in keep]
    sample = (
        codec.sample_frames
        if codec is not None
        else (lambda p, n: frame_sample_stub(p, n, fake=fake))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            id_iter = (
                zip(*(pdf[c] for c in keep_names))
                if keep_names
                else ((),) * len(pdf)
            )
            for ids, payload in zip(id_iter, pdf[payload_col]):
                for i, fr in enumerate(sample(bytes(payload), num_frames)):
                    rows.append((*ids, i, fr))
            yield pd.DataFrame(rows, columns=keep_names + ["frame_idx", "frame"])

    return df.mapInPandas(gen, schema=schema)
