"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a `kind` discriminator and
a metadata struct. The Spark-side plumbing (schema, partitioning, Arrow
batch shape, mapInPandas signatures) is real and tested; the codec step is
STUBBED deterministically because no media libraries exist in this
container — `decode_media(..., strict=True)` raises NotImplementedError at
the exact point a real decoder (PIL/torchaudio/ffmpeg) would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synth_assets(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake assets derived from the documents table (payload =
    utf-8 text bytes; kind cycles by doc_id). Stands in for a WARC media
    side-table."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.concat(F.lit("https://ex.org/a/"), F.col("doc_id")).alias("url"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")).alias("meta"),
    )


def decode_media(payload: bytes, kind: str, strict: bool = False):
    """Codec seam. strict=True is the real-decoder path (unavailable here);
    strict=False returns a deterministic fake 'decoded object' so the
    downstream feature plumbing is exercised end-to-end."""
    if strict:
        raise NotImplementedError(
            f"no {kind} codec in this environment; plug PIL/torchaudio/ffmpeg here"
        )
    digest = hashlib.md5(payload or b"").digest()
    return {"kind": kind, "n_bytes": len(payload or b""), "digest": digest}


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape matters at scale: payloads are MB-sized, so Arrow batch
    size (session.py ARROW_BATCH) bounds executor memory; the kernel is
    O(batch) and stateless."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"asset_id": [], "kind": [], "n_bytes": [], "content_hash": [], "features": []}
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                obj = decode_media(bytes(payload) if payload is not None else b"", kind)
                digest = obj["digest"]
                # deterministic fake embedding: dim bytes of the digest -> [0,1)
                feats = [float(digest[i % 16]) / 255.0 for i in range(dim)]
                out["asset_id"].append(aid)
                out["kind"].append(kind)
                out["n_bytes"].append(obj["n_bytes"])
                out["content_hash"].append(digest.hex())
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "kind", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)
