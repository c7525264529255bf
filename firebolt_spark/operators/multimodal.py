"""Multimodal column conventions + processing plumbing.

Convention: media travel as opaque ``binary`` columns with a typed
metadata struct alongside:

    media  BINARY                    -- raw bytes (image/audio/video)
    media_meta STRUCT<
        kind STRING,                 -- 'image' | 'audio' | 'video'
        mime STRING,
        n_bytes BIGINT,
        sha  STRING>                 -- content digest for dedup/caching

Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` —
bytes never pass row-at-a-time through Python, and each batch is one
Arrow buffer. The actual codec step is STUBBED here (no image/audio
libraries in this container): ``decode_stub=True`` produces
deterministic pseudo-features derived from the content digest, and
``decode_stub=False`` raises NotImplementedError where a real pipeline
would call PIL/librosa/ffmpeg. The Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.

At 100 TB: binary columns dominate size, so (a) media is read with
column pruning (select the meta first, media only where the filter
passed), (b) feature extraction repartitions by size buckets so one
task doesn't get all the 4 K videos, (c) outputs (small features) are
written separately from inputs (big bytes) to keep downstream scans
cheap.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4

FEATURE_SCHEMA = (
    "doc_id BIGINT, kind STRING, n_bytes BIGINT, sha STRING, "
    "width INT, height INT, n_frames INT, "
    "feature ARRAY<DOUBLE>"
)


def attach_media(docs: DataFrame, text_col: str = "text", kind: str = "image") -> DataFrame:
    """Build the media convention from a text fixture (deterministic
    fake payloads: the UTF-8 bytes stand in for media bytes)."""
    media = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(f"{kind}/fake").alias("mime"),
            F.length(media).cast("bigint").alias("n_bytes"),
            F.sha2(media, 256).alias("sha"),
        ).alias("media_meta"),
    )


def _stub_decode(payload: bytes) -> dict:
    """Deterministic fake decode: dimensions + features from the
    content digest. A real build replaces this body with PIL/ffmpeg."""
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    n_frames = 1 + digest[2] % 8
    feature = [
        round(int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32, 6)
        for i in range(FEATURE_DIM)
    ]
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "feature": feature,
    }


def extract_features(
    media_df: DataFrame, decode_stub: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Decode + featurize media via Arrow-batched mapInPandas.

    ``decode_stub=False`` marks where a real codec integrates; this
    container has none, so it raises (clearly, per the build contract).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.media)
                meta = rec.media_meta
                if not decode_stub:
                    raise NotImplementedError(
                        "real media decode requires PIL/librosa/ffmpeg — "
                        "not present in this environment; use decode_stub=True"
                    )
                decoded = _stub_decode(payload)
                rows.append(
                    {
                        "doc_id": rec.doc_id,
                        "kind": meta["kind"],
                        "n_bytes": meta["n_bytes"],
                        "sha": meta["sha"],
                        **decoded,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "kind",
                    "n_bytes",
                    "sha",
                    "width",
                    "height",
                    "n_frames",
                    "feature",
                ],
            )

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(features: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling plumbing over decoded video features: emit one row
    per sampled frame index (explode of a generated sequence — the real
    pipeline would slice frames here)."""
    return features.select(
        "doc_id",
        "sha",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
