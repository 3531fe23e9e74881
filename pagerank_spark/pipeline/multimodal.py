"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The image/audio codec libraries are not available in this container,
so the DECODE step is stubbed (deterministic fake keyed off the bytes,
or ``NotImplementedError`` when ``require_real_codecs=True``).  The
Spark-side plumbing — schema, binary Arrow transfer, batch iteration,
partition-preserving mapInPandas, metadata structs — is real and
tested; swapping the stub for PIL/libav is a local change inside one
function.

Schema contract:
    media(doc_id BIGINT, kind STRING, payload BINARY,
          meta STRUCT<format STRING, width INT, height INT,
                      sample_rate INT, n_frames INT>)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("payload_sha", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def synthesize_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text,
    metadata derived from stable hashes.  Gives the plumbing a real
    binary column of realistic size distribution."""
    h = F.abs(F.xxhash64("text"))
    return docs.select(
        "doc_id",
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/" + kind).alias("format"),
            (h % 1920 + 1).cast("int").alias("width"),
            (h % 1080 + 1).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (h % 240 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> "object":
    """STUB decode — replace with PIL.Image.open / soundfile / pyav.

    Returns a deterministic numpy array shaped off the byte content so
    downstream feature extraction is testable.
    """
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr


def extract_features(media: DataFrame, n_features: int = 8,
                     require_real_codecs: bool = False) -> DataFrame:
    """Per-media feature vectors.

    Scalar metadata stays JVM-side (no Python at all): ``n_bytes`` is
    ``F.length(payload)`` and ``payload_sha`` is ``F.sha2(payload,
    256)`` — whole-stage-codegen'd column expressions computed before
    the Arrow transfer and passed through the UDF untouched.  Only the
    decode+featurize step crosses into Python, via mapInPandas (Arrow
    batches): the per-item ``_fake_decode`` is the inherently per-item
    codec stub, and the byte histogram is computed ONCE per batch with
    a single vectorized bincount over the concatenated buffers (no
    per-row numpy calls).  With ``require_real_codecs=True`` raises
    NotImplementedError where the real decoder would run (the
    container has no image/audio libs).

    Histogram bins are ``n_features`` equal byte-value ranges over
    [0, 256) (``np.histogram`` edge semantics, any ``n_features``).
    """
    annotated = media.select(
        "doc_id", "kind", "payload",
        F.length("payload").cast("int").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if require_real_codecs:
                raise NotImplementedError(
                    "real image/audio codecs are not available in this "
                    "environment; install PIL/soundfile/pyav and replace "
                    "_fake_decode")
            n = len(pdf)
            # Decode is per-item by nature (each payload is one media
            # object); everything after is batch-vectorized.
            decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            lens = np.array([d.size for d in decoded], dtype=np.int64)
            if n and lens.sum() > 0:
                concat = np.concatenate(decoded)
                doc_idx = np.repeat(np.arange(n), lens)
                # np.histogram-equivalent equal-width binning over
                # [0, 256), vectorized across the whole batch; works
                # for any n_features (not just divisors of 256).
                bin_edges = np.linspace(0.0, 256.0, n_features + 1)
                bin_idx = np.minimum(
                    np.searchsorted(bin_edges, concat, side="right") - 1,
                    n_features - 1)
                flat = np.bincount(doc_idx * n_features + bin_idx,
                                   minlength=n * n_features)
            else:
                flat = np.zeros(n * n_features, dtype=np.int64)
            hists = flat.reshape(n, n_features).astype("float32")
            feats = hists / np.maximum(lens, 1)[:, None]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "kind": pdf["kind"],
                "n_bytes": pdf["n_bytes"], "payload_sha": pdf["payload_sha"],
                "features": [row.tolist() for row in feats],
            })

    return annotated.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """'Video' frame sampling stub over the binary payload: split the
    payload into meta.n_frames equal chunks and keep every ``every_n``-th
    chunk's digest — the real per-frame decode is the stubbed step, the
    chunk/sample/explode plumbing is the real operator shape."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_sha": []}
            for doc_id, payload, meta in zip(
                    pdf["doc_id"], pdf["payload"], pdf["meta"]):
                buf = bytes(payload)
                n_frames = max(int(meta["n_frames"]), 1)
                step = max(len(buf) // n_frames, 1)
                for f in range(0, n_frames, every_n):
                    chunk = buf[f * step:(f + 1) * step]
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(f)
                    rows["frame_sha"].append(
                        hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=schema)
