"""Multimodal columns: opaque binary payloads with typed metadata.

A training-data pipeline at 100 TB carries images/audio/video alongside
text. The engine treats each payload as an opaque ``binary`` column +
typed metadata struct; everything that can be computed WITHOUT decoding
(sizes, container sniffing, content hashes, bucketing) is a built-in
Column expression, and the decode/feature-extract stage is an
Arrow-batched ``mapInPandas`` whose Spark-side plumbing (schema,
batching, partition inheritance) is real while the codec call itself is
stubbed — the sandbox has no image/audio libraries, so the stub either
raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake feature vector (test mode). Swapping in a real codec
changes ONE function.

No multimodal surface exists in the reference (rdf-n3 is text-only);
this module follows the same registry discipline as the §2.8 builtin
table: per-modality transforms keyed by MIME class (SURVEY §2.10).
"""

from __future__ import annotations

import math as _math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic-byte prefixes → container label (pure Column dispatch, no UDF)
MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "494433": "audio/mp3",
    "fff1": "audio/aac",
    "664c6143": "audio/flac",
    "1a45dfa3": "video/webm",
    "00000018": "video/mp4",
}


def sniff_mime(col) -> "F.Column":
    """Container sniff from magic bytes — hex-prefix dispatch, codegen'd."""
    hexhead = F.lower(F.hex(F.substring(col, 1, 4)))
    expr = F.lit("application/octet-stream")
    for prefix, mime in sorted(MAGIC.items(), key=lambda kv: -len(kv[0])):
        expr = F.when(hexhead.startswith(prefix), F.lit(mime)).otherwise(expr)
    return expr


def media_metadata(df: DataFrame, payload: str = "payload") -> DataFrame:
    """Decode-free metadata: byte length, sniffed MIME, content hash,
    storage bucket. Narrow projection — no shuffle, no Python."""
    c = F.col(payload)
    return df.select(
        "*",
        F.octet_length(c).alias("n_bytes"),
        sniff_mime(c).alias("mime"),
        F.sha2(c, 256).alias("content_sha"),
    ).drop(payload)


#: feature-vector width of the (stubbed) encoder
FEATURE_DIM = 8

FEATURE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, ok boolean, err string, "
    "features array<float>, qfeat array<bigint>"
)


def _raw_accumulators(payload: bytes) -> list[int]:
    """Integer feature accumulators: position-weighted byte sums per
    dimension. Exact int arithmetic (all values < 2^53), so any engine
    reproduces them bit-identically — the basis of the oracle check."""
    acc = [0] * FEATURE_DIM
    for i, b in enumerate(payload[:4096]):
        acc[i % FEATURE_DIM] += b * ((i % 97) + 1)
    return acc


def quantize_features(acc: list[int]) -> list[int]:
    """floor(a * 1e6 / ||acc||) per dimension. Every operand is an
    exactly representable double (a ≤ ~1.3e7, a*1e6 < 2^53; the norm is
    a correctly rounded IEEE sqrt), so the floored int64 is identical in
    Python, Spark and DuckDB — unlike round()ed floats, whose half-way
    ties depend on the engine's rounding mode."""
    norm = _math.sqrt(sum(a * a for a in acc)) or 1.0
    return [_math.floor(a * 1e6 / norm) for a in acc]


def _decode_and_embed(payload: bytes, mime: str, fake: bool) -> list[float]:
    """THE codec boundary. Real deployments replace this body with
    PIL/torchvision/ffmpeg calls; the sandbox has none of them.

    fake=True → deterministic pseudo-features from the bytes themselves
    (position-weighted byte sums), so tests exercise the full Arrow
    batch path with stable outputs. fake=False → NotImplementedError,
    surfaced per-row as ok=false (a poisoned corpus row must never kill
    a 100 TB job).
    """
    if not fake:
        raise NotImplementedError("no media codecs in this environment")
    acc = _raw_accumulators(payload)
    norm = _math.sqrt(sum(a * a for a in acc)) or 1.0
    return [round(a / norm, 6) for a in acc]


def extract_features(df: DataFrame, payload: str = "payload",
                     fake_decode: bool = True) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    ``mapInPandas``: one Python worker amortizes codec setup over a
    whole Arrow batch; output inherits input partitioning (no shuffle).
    Batch sizing at scale: ``spark.sql.execution.arrow.maxRecordsPerBatch``
    (payloads are MBs — keep batches small enough that a batch of
    decoded frames fits worker memory).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "mime", "n_bytes", "ok", "err", "features", "qfeat")}
            for row in pdf.itertuples(index=False):
                payload_bytes = bytes(row.payload or b"")
                out["doc_id"].append(int(row.doc_id))
                out["mime"].append(str(getattr(row, "mime", "") or ""))
                out["n_bytes"].append(len(payload_bytes))
                try:
                    feats = _decode_and_embed(payload_bytes, str(getattr(row, "mime", "")),
                                              fake_decode)
                    out["ok"].append(True)
                    out["err"].append("")
                    out["features"].append(feats)
                    out["qfeat"].append(quantize_features(_raw_accumulators(payload_bytes)))
                except NotImplementedError as ex:
                    out["ok"].append(False)
                    out["err"].append(str(ex))
                    out["features"].append(None)
                    out["qfeat"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, n_frames: int = 4,
                      duration: str = "duration_s") -> DataFrame:
    """Deterministic frame-sampling plan for video payloads: N evenly
    spaced timestamps per clip, as rows (the explode shape a real
    frame-decoder UDF consumes). Pure Column math — the plan itself
    never touches the bytes."""
    ts = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (F.col(duration) * (i + F.lit(0.5)) / F.lit(n_frames)),
    )
    return df.select("*", F.posexplode(ts).alias("frame_idx", "frame_ts"))
