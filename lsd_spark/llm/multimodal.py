"""§2.J multimodal columns — image/audio/video as opaque BinaryType
payloads with typed metadata (LSD's BLOB columns
[lsd:src/lsd/table.py blobs — UNVERIFIED], stored via Parquet's
native var-length binary instead of PyTables VLArray).

The real decode step needs codec libraries absent from this
container, so `decode_image` is a clearly-marked stub: it raises
NotImplementedError unless `fake=True`, in which case it produces a
deterministic fake (dimensions derived from the payload hash). The
Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partition behavior — is real and tested.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from lsd_spark.catalog import load
from lsd_spark.registry import register

MM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def with_binary_payload(docs):
    """Attach an opaque binary column + typed metadata (the ingest
    shape for any multimodal table: payload stays a black box until a
    decode kernel touches it; column pruning skips it otherwise)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB: real image decode (PIL/libjpeg) is unavailable here.

    With fake=True, returns deterministic pseudo-dimensions from the
    payload digest — stable across runs/partitions, so downstream
    plumbing is fully testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic test stub"
        )
    h = hashlib.md5(payload).digest()
    return {"width": 64 + h[0], "height": 64 + h[1], "channels": 3}


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_byte", T.IntegerType()),
        T.StructField("tail_byte", T.IntegerType()),
    ]
)


@register(
    "mm_binary_features",
    oracle=(
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "ascii(substring(text, 1, 1)) AS head_byte, "
        "ascii(substring(text, length(text), 1)) AS tail_byte FROM documents"
    ),
)
def mm_binary_features(spark, sf_dir):
    """Binary-column round trip: build payloads JVM-side, extract
    features in an Arrow-batched kernel. Oracle recomputes the same
    features from the source text (payload is its UTF-8).

    head/tail are CODEPOINTS of the first/last character (matching
    DuckDB `ascii()`, which is codepoint-based, not byte-based — they
    differ on any non-ASCII text), and empty payloads yield 0 exactly
    as `ascii(substring(...))` does on ''."""
    mm = with_binary_payload(load(spark, sf_dir, "documents"))

    def feature_kernel(batches):
        # Nested => cloudpickle ships it by value: workers never need
        # lsd_spark importable. Arrow-batched feature extraction over
        # opaque binary payloads — the exact shape a real
        # decode/resize/embed kernel has.
        import pandas as pd

        def head_cp(b):
            s = bytes(b).decode("utf-8")
            return ord(s[0]) if s else 0

        def tail_cp(b):
            s = bytes(b).decode("utf-8")
            return ord(s[-1]) if s else 0

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "head_byte": payloads.map(head_cp).astype("int32"),
                    "tail_byte": payloads.map(tail_cp).astype("int32"),
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(feature_kernel, schema=_FEAT_SCHEMA)


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


@register("mm_decode_stub", oracle=None)  # rows-only: decode is a stubbed kernel
def mm_decode_stub(spark, sf_dir):
    """Deterministic fake decode over binary payloads (see
    decode_image docstring): proves the decode pipeline's schema,
    batching and distribution without codec libs."""
    mm = with_binary_payload(load(spark, sf_dir, "documents"))

    def fake_decode_kernel(batches):
        # Nested => by-value; re-implements decode_image(fake=True)
        # locally so no lsd_spark reference travels to the worker.
        import hashlib

        import pandas as pd

        def fake_decode(b):
            h = hashlib.md5(bytes(b)).digest()
            return {"width": 64 + h[0], "height": 64 + h[1], "channels": 3}

        for pdf in batches:
            feats = pdf["payload"].map(fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": feats.map(lambda d: d["width"]).astype("int32"),
                    "height": feats.map(lambda d: d["height"]).astype("int32"),
                    "channels": feats.map(lambda d: d["channels"]).astype("int32"),
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(fake_decode_kernel, schema=_DECODE_SCHEMA)


@register(
    "llm_multimodal_join",
    oracle=(
        "SELECT label, count(*) AS n, ROUND(AVG(n_chars), 2) AS avg_chars "
        "FROM documents JOIN embeddings ON doc_id = vec_id "
        "GROUP BY label ORDER BY label"
    ),
)
def llm_multimodal_join(spark, sf_dir):
    """Text ⋈ vectors side-by-side (modalities joined on id)."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("n_chars"), 2).alias("avg_chars"))
        .orderBy("label")
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("out_bytes", T.LongType()),
    ]
)

TARGET_W, TARGET_H = 224, 224


@register("mm_resize_stub", oracle=None)  # rows-only: decode/resize is stubbed
def mm_resize_stub(spark, sf_dir):
    """Image-resize kernel over opaque binary payloads via
    mapInPandas (Arrow batches in/out, column pruning drops the
    payload for any query not touching it). Deterministic stub per
    the brief; the plumbing is real."""
    docs = load(spark, sf_dir, "documents")
    mm = with_binary_payload(docs.filter(F.col("doc_id") < 200))
    tw, th = TARGET_W, TARGET_H  # closure-captured (pickled by value)

    def resize_kernel(batches):
        # STUB resize (nested => shipped by value): real pixel
        # resampling needs an image lib; the deterministic fake
        # derives source dims from the payload digest and models an
        # aspect-preserving fit into tw x th. Batch shape / schema /
        # partition behavior are the real 100 TB plumbing.
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h = hashlib.md5(bytes(payload)).digest()
                w = 64 + h[0] % 192  # fake source dims, deterministic
                ht = 64 + h[1] % 192
                scale = min(tw / w, th / ht, 1.0)
                ow, oh = max(1, int(w * scale)), max(1, int(ht * scale))
                rows.append((doc_id, w, ht, ow, oh, ow * oh * 3))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_width", "out_height", "out_bytes"],
            )

    return mm.select("doc_id", "payload").mapInPandas(resize_kernel, RESIZE_SCHEMA).orderBy(
        "doc_id"
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_sig", T.StringType()),
    ]
)

N_FRAMES = 4


@register("mm_frame_sample_stub", oracle=None)  # rows-only: sampler is stubbed
def mm_frame_sample_stub(spark, sf_dir):
    """Frame sampling for video-like payloads: mapInPandas 1:N
    expansion (doc -> frames), deterministic offsets and signatures.
    At 100 TB the frame rows are orders of magnitude smaller than
    the payloads — the kernel projects payload away immediately."""
    docs = load(spark, sf_dir, "documents")
    mm = with_binary_payload(docs.filter(F.col("doc_id") < 100))
    n_frames = N_FRAMES  # closure-captured (pickled by value)

    def frame_sample_kernel(batches):
        # STUB video frame sampler (nested => shipped by value):
        # emits n_frames evenly-spaced 'frames' per payload (1:N row
        # expansion — the same shape a real ffmpeg keyframe sampler
        # produces), each with a deterministic content signature from
        # the sampled byte window.
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    off = i * step
                    window = b[off : off + 16]
                    if not window:
                        break
                    rows.append((doc_id, i, off, hashlib.md5(window).hexdigest()[:12]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_offset", "frame_sig"]
            )

    return (
        mm.select("doc_id", "payload")
        .mapInPandas(frame_sample_kernel, FRAME_SCHEMA)
        .orderBy("doc_id", "frame_idx")
    )
