"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The decode step dispatches on payload format: REAL numpy-only
decoders for binary netpbm images (P6/P5) and PCM RIFF/WAVE audio run
everywhere (numpy is the only dependency), PIL / soundfile extend
coverage to compressed formats when importable (not in this
container; pip has no network), and anything else falls back to a
deterministic fake keyed off the bytes — or fails fast when
``require_real_codecs=True``.  The Spark-side plumbing — schema,
binary Arrow transfer, batch iteration, partition-preserving
mapInPandas, metadata structs — is identical on every branch.

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


def _is_pnm(payload: bytes) -> bool:
    """True for binary PPM/PGM (netpbm P6/P5) payloads."""
    return (len(payload) > 2 and payload[:2] in (b"P6", b"P5")
            and payload[2:3].isspace())


def _is_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" \
        and payload[8:12] == b"WAVE"


def _parse_pnm(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a binary netpbm header: (width, height, maxval,
    data_offset, channels).  Text header = whitespace-separated
    width, height, maxval with ``#`` comments; exactly one whitespace
    byte separates maxval from the sample buffer."""
    magic = payload[:2]
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        fields.append(int(payload[i:j]))
        i = j
    i += 1
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    return w, h, maxval, i, (3 if magic == b"P6" else 1)


def _decode_pnm(payload: bytes) -> "object":
    """REAL image decode, numpy-only: binary netpbm (P6 RGB / P5
    gray, maxval <= 255) — text header (whitespace-separated width,
    height, maxval; ``#`` comments) followed by the raw sample
    buffer.  Returns the flat uint8 pixel array, byte-identical to
    what PIL returns for the same file (tested)."""
    import numpy as np

    w, h, _maxval, off, ch = _parse_pnm(payload)
    n = w * h * ch
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
    if arr.size < n:
        raise ValueError("truncated netpbm payload")
    return arr


def _decode_wav(payload: bytes) -> "object":
    """REAL audio decode, numpy-only: RIFF/WAVE chunk walk, 16-bit or
    8-bit PCM.  Samples are normalized to [-1, 1] floats exactly as
    soundfile does, then mapped to the uint8 feature domain with the
    same transform as the soundfile branch — the two backends produce
    identical features for the same file (tested)."""
    import struct

    import numpy as np

    fmt = None
    data = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off:off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        # Never trust the declared size past the buffer: a lying chunk
        # header must raise (callers map ValueError to the fake-decode
        # fallback), not silently yield a short sample array.
        if off + 8 + size > len(payload):
            raise ValueError(
                f"WAV chunk {cid!r} declares {size} bytes but only "
                f"{len(payload) - off - 8} remain")
        body = payload[off + 8:off + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"WAV fmt chunk too short ({size} bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format, _ch, _rate, _bps, _align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format {audio_format})")
    if bits == 16:
        samples = np.frombuffer(
            data, dtype="<i2", count=len(data) // 2).astype(np.float64) \
            / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, dtype=np.uint8)
                   .astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    return (np.clip(samples, -1.0, 1.0) * 127.0 + 128.0).astype(np.uint8)


_CODEC_REGISTRY: dict | None = None


def codec_registry() -> dict:
    """kind -> preferred real backend, probed ONCE per process
    (executor-side: each Python worker probes on its first batch and
    caches).

    Both kinds always have a real in-process backend: the numpy-only
    netpbm (P6/P5 image) and RIFF/WAVE (PCM audio) decoders above
    need nothing beyond numpy.  When PIL / soundfile ARE importable
    they extend coverage to the compressed formats (PNG/JPEG, FLAC/
    OGG, ...) with ZERO engine change — :func:`_decode` sniffs the
    payload and dispatches."""
    global _CODEC_REGISTRY
    if _CODEC_REGISTRY is None:
        reg = {"image": "ppm-numpy", "audio": "wav-numpy"}
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


def _decode(payload: bytes, kind: str, require_real: bool = False) -> "object":
    """Decode one media payload to a flat uint8 sample array.

    Dispatch order: format-sniffed numpy decoders (netpbm / WAV —
    always available) first, then the optional libraries (PIL /
    soundfile) for formats the built-ins don't cover, then the
    deterministic fake — unless ``require_real`` is set, in which
    case an undecodable payload raises ``NotImplementedError``
    instead of silently faking.

    A payload that SNIFFS as a real format but is malformed inside
    (lying chunk size, truncated header) decodes like any other
    undecodable payload: fake fallback when ``require_real`` is off,
    raise (the decoder's ``ValueError``) when it is on."""
    import numpy as np

    reg = codec_registry()
    if kind == "image":
        if _is_pnm(payload):
            try:
                return _decode_pnm(payload)
            except ValueError:
                if require_real:
                    raise
                return _fake_decode(payload)
        if reg.get("image") == "pillow":
            import io as _io

            from PIL import Image

            img = Image.open(_io.BytesIO(payload))
            return np.asarray(img, dtype=np.uint8).ravel()
    elif kind == "audio":
        if _is_wav(payload):
            try:
                return _decode_wav(payload)
            except ValueError:
                if require_real:
                    raise
                return _fake_decode(payload)
        if reg.get("audio") == "soundfile":
            import io as _io

            import soundfile

            data, _sr = soundfile.read(_io.BytesIO(payload))
            return (np.clip(data, -1.0, 1.0).ravel() * 127.0 + 128.0) \
                .astype(np.uint8)
    if require_real:
        raise NotImplementedError(
            f"no real codec available for this {kind!r} payload "
            f"(backends: {reg}); numpy-only netpbm/WAV are built in — "
            "install PIL (compressed images) / soundfile (compressed "
            "audio) for other formats")
    return _fake_decode(payload)


def extract_features(media: DataFrame, n_features: int = 8,
                     require_real_codecs: bool = False) -> DataFrame:
    """Per-media feature vectors.

    Scalar metadata stays JVM-side (no Python at all): ``n_bytes`` is
    ``F.length(payload)`` and ``payload_sha`` is ``F.sha2(payload,
    256)`` — whole-stage-codegen'd column expressions computed before
    the Arrow transfer and passed through the UDF untouched.  Only the
    decode+featurize step crosses into Python, via mapInPandas (Arrow
    batches): the per-item decode is the inherently per-item codec
    step, and the byte histogram is computed ONCE per batch with a
    single vectorized bincount over the concatenated buffers (no
    per-row numpy calls).

    Histogram bins are ``n_features`` equal byte-value ranges over
    [0, 256) (``np.histogram`` edge semantics, any ``n_features``).

    Codec dispatch (:func:`_decode`): the numpy-only netpbm/WAV
    decoders run in-process for payloads in those formats; PIL /
    soundfile extend coverage when importable (a production deploy is
    a dependency install, not a code change); anything else falls
    back to the deterministic fake — or, with
    ``require_real_codecs=True``, fails fast with
    ``NotImplementedError`` on the first payload no real decoder can
    handle instead of silently faking.
    """
    annotated = media.select(
        "doc_id", "kind", "payload",
        F.length("payload").cast("int").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            # Decode is per-item by nature (each payload is one media
            # object); everything after is batch-vectorized.
            decoded = [_decode(bytes(p), k, require_real_codecs)
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


RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def _resize_nn(arr, w: int, h: int, ch: int, out_w: int, out_h: int):
    """Nearest-neighbor resize with the floor index map
    src = (dst * src_dim) // dst_dim — exact integer arithmetic, so
    the kernel is bit-reproducible on any platform (no float centers,
    no rounding-mode dependence)."""
    import numpy as np

    img = arr.reshape(h, w, ch)
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[ys][:, xs]


def resize_media(media: DataFrame, out_w: int = 32, out_h: int = 32,
                 require_real_codecs: bool = False) -> DataFrame:
    """(doc_id, kind, width, height, channels, n_bytes, payload) —
    every image resized to ``out_w`` × ``out_h`` by deterministic
    nearest-neighbor (:func:`_resize_nn`), re-encoded in its own
    netpbm format (P6 stays RGB, P5 stays gray, canonical
    ``P6\\n{w} {h}\\n255\\n`` header).

    REAL path: payloads that sniff as binary netpbm decode, resize
    and re-encode with the numpy-only codec (no libraries).  Anything
    else takes the deterministic FAKE face — the payload's byte
    stream resampled to ``out_w·out_h`` single-channel samples with
    the same floor index map — or, with ``require_real_codecs=True``,
    raises on the first payload no real decoder handles (the
    extract_features contract).

    Physical shape: one Arrow ``mapInPandas`` pass; the per-item
    decode/re-encode is inherently per-object, the index maps are
    vectorized, and nothing shuffles — at 100 TB this is a pure map
    stage whose parallelism is the scan's.
    """
    import numpy as np

    if out_w <= 0 or out_h <= 0:
        raise ValueError("out_w and out_h must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "kind": [], "width": [], "height": [],
                   "channels": [], "n_bytes": [], "payload": []}
            for doc_id, kind, payload in zip(
                    pdf["doc_id"], pdf["kind"], pdf["payload"]):
                p = bytes(payload)
                if kind == "image" and _is_pnm(p):
                    w, h, _mx, off, ch = _parse_pnm(p)
                    n = w * h * ch
                    arr = np.frombuffer(p, dtype=np.uint8,
                                        count=n, offset=off)
                    if arr.size < n:
                        if require_real_codecs:
                            raise ValueError("truncated netpbm payload")
                        arr, w, h, ch = _fake_decode(p), len(p), 1, 1
                        resized = _resize_nn(
                            arr if arr.size else np.zeros(1, np.uint8),
                            max(w, 1), 1, 1, out_w, out_h)
                        magic = b"P5"
                    else:
                        resized = _resize_nn(arr, w, h, ch, out_w, out_h)
                        magic = b"P6" if ch == 3 else b"P5"
                elif require_real_codecs:
                    raise NotImplementedError(
                        f"no real resize codec for this {kind!r} payload")
                else:
                    flat = _fake_decode(p)
                    ch, magic = 1, b"P5"
                    resized = _resize_nn(
                        flat if flat.size else np.zeros(1, np.uint8),
                        max(flat.size, 1), 1, 1, out_w, out_h)
                body = resized.astype(np.uint8).tobytes()
                enc = magic + b"\n%d %d\n255\n" % (out_w, out_h) + body
                out["doc_id"].append(doc_id)
                out["kind"].append(kind)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["channels"].append(resized.shape[2])
                out["n_bytes"].append(len(body))
                out["payload"].append(enc)
            yield pd.DataFrame(out)

    return media.select("doc_id", "kind", "payload").mapInPandas(
        run, schema=RESIZE_SCHEMA)
