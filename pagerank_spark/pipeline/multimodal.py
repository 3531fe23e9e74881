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


def synthesize_media(docs: DataFrame, kind: str = "image",
                     portable_meta: bool = False) -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text,
    metadata derived from stable hashes.  Gives the plumbing a real
    binary column of realistic size distribution.

    ``portable_meta`` derives the metadata from ``length(text)``
    instead of ``xxhash64`` — same distribution class, but
    reproducible in any SQL engine (the DuckDB oracle for the
    ``video_frames`` driver query recomputes it exactly)."""
    h = (F.length("text").cast("bigint") if portable_meta
         else F.abs(F.xxhash64("text")))
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
    """STUB decode — the sandbox fallback (no codec libs installed).

    Returns a deterministic numpy array shaped off the byte content so
    downstream feature extraction is testable.
    """
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr


_CODEC_REGISTRY: dict | None = None


def codec_registry() -> dict:
    """Probe for real codec libraries ONCE per process (executor-side:
    each Python worker probes on its first batch and caches).

    Deploying with PIL / soundfile installed changes ZERO engine code:
    :func:`_decode` dispatches to the real decoder whenever the
    library is importable and falls back to :func:`_fake_decode`
    otherwise (this container has neither, and pip has no network —
    the stub is the documented sandbox path)."""
    global _CODEC_REGISTRY
    if _CODEC_REGISTRY is None:
        reg = {}
        try:
            from PIL import Image  # noqa: F401

            reg["image"] = "pillow"
        except ImportError:
            pass
        try:
            import soundfile  # noqa: F401

            reg["audio"] = "soundfile"
        except ImportError:
            pass
        _CODEC_REGISTRY = reg
    return _CODEC_REGISTRY


def _decode(payload: bytes, kind: str) -> "object":
    """Decode one media payload to a flat uint8 sample array: real
    codec when available (see :func:`codec_registry`), deterministic
    fake otherwise."""
    import numpy as np

    reg = codec_registry()
    if kind == "image" and "image" in reg:
        import io as _io

        from PIL import Image

        img = Image.open(_io.BytesIO(payload))
        return np.asarray(img, dtype=np.uint8).ravel()
    if kind == "audio" and "audio" in reg:
        import io as _io

        import soundfile

        data, _sr = soundfile.read(_io.BytesIO(payload))
        return (np.clip(data, -1.0, 1.0).ravel() * 127.0 + 128.0) \
            .astype(np.uint8)
    return _fake_decode(payload)


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

    Codec dispatch: :func:`_decode` uses the REAL decoder (PIL /
    soundfile) whenever the library is importable on the executor and
    the deterministic fake otherwise, so a production deploy is a
    dependency install, not a code change.  With
    ``require_real_codecs=True`` the batch fails fast when a payload's
    kind has no real codec available instead of silently faking.
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
                missing = sorted(set(pdf["kind"]) - set(codec_registry()))
                if missing:
                    raise NotImplementedError(
                        f"no real codec available for kinds {missing}; "
                        "install PIL (image) / soundfile (audio) — "
                        "_decode dispatches to them automatically")
            n = len(pdf)
            # Decode is per-item by nature (each payload is one media
            # object); everything after is batch-vectorized.
            decoded = [_decode(bytes(p), k)
                       for p, k in zip(pdf["payload"], pdf["kind"])]
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
    """'Video' frame sampling over the binary payload: split the
    payload into ``meta.n_frames`` equal chunks and keep every
    ``every_n``-th chunk's digest.

    Pure JVM expressions end to end — no Python at all: the sampled
    frame index list is ``explode(sequence(0, n_frames-1, every_n))``
    and each chunk is ``substr(payload, frame_no*step+1, step)``
    digested with ``sha2``, all inside whole-stage codegen.  (Unlike
    the codec decode in :func:`extract_features`, chunk slicing is not
    inherently per-item work, so it must not pay the Arrow transfer or
    a per-row Python loop.)  A real video pipeline swaps the ``sha2``
    projection for a per-frame decode UDF; the sampling/explode shape
    — the part that determines shuffle and row volume at 100 TB — is
    unchanged by that swap.

    Chunking semantics (pinned by the equivalence test in
    tests/test_pipeline.py): ``step = max(len(payload)//n_frames, 1)``
    bytes per frame; chunks past the end of the payload are empty and
    digest to sha256(b"").
    """
    n_frames = F.greatest(F.col("meta.n_frames").cast("int"), F.lit(1))
    step = F.greatest(
        F.floor(F.length("payload") / n_frames).cast("int"), F.lit(1))
    base = media.select(
        "doc_id", "payload", step.alias("step"),
        F.explode(F.sequence(F.lit(0), n_frames - F.lit(1),
                             F.lit(every_n))).alias("frame_no"))
    chunk = F.col("payload").substr(
        F.col("frame_no") * F.col("step") + F.lit(1), F.col("step"))
    return base.select(
        "doc_id", F.col("frame_no").cast("int").alias("frame_no"),
        F.sha2(chunk, 256).alias("frame_sha"))
