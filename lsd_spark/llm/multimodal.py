"""§2.J multimodal columns — image/audio/video as opaque BinaryType
payloads with typed metadata (LSD's BLOB columns
[lsd:src/lsd/table.py blobs — UNVERIFIED], stored via Parquet's
native var-length binary instead of PyTables VLArray).

Decode status by format: PNG and WAV decode are REAL — stdlib-only
codecs implemented in this module (zlib chunk/filter layer, wave
RIFF), exercised end-to-end by mm_decode_png / mm_decode_wav with
full hash-match oracles and unit-tested against handcrafted files
(tests/test_codecs.py). Formats whose spec needs external codec
libraries (JPEG, MP4/video) are not decoded — mm_decode derives
deterministic pseudo-dimensions from the payload digest, and the
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


# md5 digest byte k (0-indexed) of `text`, as the DuckDB expression
_MD5B = "CAST(('0x' || substring(md5(text), 2*{k}+1, 2))::INT AS BIGINT)"
_MD5_LIST = (
    "list_transform(generate_series(0,15), "
    "k -> CAST(('0x' || substring(md5(text), 2*k+1, 2))::INT AS BIGINT))"
)


@register(
    "mm_decode",
    oracle=(
        "WITH d AS (SELECT doc_id, " + _MD5_LIST + " AS L, "
        "4 + " + _MD5B.format(k=0) + " % 13 AS w, "
        "4 + " + _MD5B.format(k=1) + " % 13 AS h, "
        "CASE WHEN doc_id % 3 = 0 THEN 1 WHEN doc_id % 3 = 1 THEN 3 "
        "ELSE 4 END AS nch FROM documents) "
        "SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, "
        "CAST(nch AS INT) AS channels, "
        "CAST((w*h*nch // 16) * list_sum(L) "
        "+ COALESCE(list_sum(L[1:CAST(w*h*nch % 16 AS INT)]), 0) AS BIGINT) "
        "AS px_sum FROM d ORDER BY doc_id"
    ),
)
def mm_decode(spark, sf_dir):
    """REAL image decode over per-document PNG payloads (formerly the
    mm_decode_stub fake — now wired to the stdlib PNG codec below).

    Per document: dimensions (4..16 each axis) come from the first
    two md5 bytes, the color type cycles grey/RGB/RGBA with doc_id,
    pixel bytes are the digest tiled to w*h*nch. The ENCODER applies
    scanline filter y%5 — so every PNG here exercises None/Sub/Up/
    Average/Paeth — and the decode kernel reverses them and emits
    (width, height, channels, px_sum). The oracle recomputes px_sum
    arithmetically from the md5 hex: (N//16)*sum(digest) + sum of the
    first N%16 digest bytes. Exact integers end to end."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    encode, decode = _make_png_codec()  # driver-side; ships by value

    def roundtrip_kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.md5(t.encode("utf-8")).digest()
                w, h = 4 + d[0] % 13, 4 + d[1] % 13
                nch = {0: 1, 1: 3, 2: 4}[int(doc_id) % 3]
                n = w * h * nch
                px = np.frombuffer((d * (n // 16 + 1))[:n], np.uint8).reshape(h, w, nch)
                png = encode(px, filters="cycle")
                dh, dw, dnch, arr = decode(png)
                assert (dh, dw, dnch) == (h, w, nch) and (arr == px).all()
                rows.append((int(doc_id), dw, dh, dnch, int(arr.sum(dtype=np.int64))))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "px_sum"]
            )

    return docs.mapInPandas(
        roundtrip_kernel,
        schema="doc_id bigint, width int, height int, channels int, px_sum bigint",
    ).orderBy("doc_id")


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
        T.StructField("out_sum", T.LongType()),
    ]
)


@register(
    "mm_resize",
    oracle=(
        "WITH d AS (SELECT doc_id, " + _MD5_LIST + " AS L, "
        "2 * (2 + " + _MD5B.format(k=0) + " % 7) AS w, "
        "2 * (2 + " + _MD5B.format(k=1) + " % 7) AS h, "
        "CASE WHEN doc_id % 3 = 0 THEN 1 WHEN doc_id % 3 = 1 THEN 3 "
        "ELSE 4 END AS nch FROM documents), "
        "px AS (SELECT doc_id, w, h, nch, L, "
        "unnest(generate_series(0, w*h*nch - 1)) AS i FROM d), "
        "px2 AS (SELECT doc_id, w, h, "
        "i // (w*nch) AS y, (i % (w*nch)) // nch AS x, i % nch AS c, "
        "L[CAST(i % 16 AS INT) + 1] AS v FROM px), "
        "boxes AS (SELECT doc_id, w, h, y // 2 AS by, x // 2 AS bx, c, "
        "SUM(v) AS s FROM px2 GROUP BY doc_id, w, h, by, bx, c) "
        "SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, "
        "CAST(w // 2 AS INT) AS out_width, CAST(h // 2 AS INT) AS out_height, "
        "CAST(SUM(s // 4) AS BIGINT) AS out_sum "
        "FROM boxes GROUP BY doc_id, w, h ORDER BY doc_id"
    ),
)
def mm_resize(spark, sf_dir):
    """REAL image resize (formerly mm_resize_stub's fake): each
    document becomes a w x h x nch image (even dims 4..16 from the
    first two md5 bytes, channels cycling grey/RGB/RGBA, pixels =
    digest tiled), encoded to an actual PNG (scanline filter y%5),
    decoded back by the stdlib codec, then 2x2 integer BOX-FILTER
    downsampled: out[Y,X,c] = floor(mean of the 2x2 block). Emits
    the output-pixel sum; the oracle re-enumerates every pixel in SQL
    (unnest/generate_series), groups 2x2 blocks and recomputes the
    identical integer arithmetic. Exact end to end."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    encode, decode = _make_png_codec()  # driver-side; ships by value

    def resize_kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.md5(t.encode("utf-8")).digest()
                w, h = 2 * (2 + d[0] % 7), 2 * (2 + d[1] % 7)
                nch = {0: 1, 1: 3, 2: 4}[int(doc_id) % 3]
                n = w * h * nch
                px = np.frombuffer((d * (n // 16 + 1))[:n], np.uint8).reshape(h, w, nch)
                dh, dw, dnch, arr = decode(encode(px, filters="cycle"))
                assert (dh, dw, dnch) == (h, w, nch) and (arr == px).all()
                # 2x2 box filter, integer mean (floor) per block
                a = arr.astype(np.int64)
                boxed = (
                    a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]
                ) // 4
                rows.append(
                    (int(doc_id), w, h, w // 2, h // 2, int(boxed.sum(dtype=np.int64)))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "out_width", "out_height", "out_sum"],
            )

    return docs.mapInPandas(resize_kernel, RESIZE_SCHEMA).orderBy("doc_id")


N_FRAMES = 4


_FRAME_SQL_SAMPLE = (
    "(CAST(('0x' || substring(md5(text), 2*(((f*40)+j)%16)+1, 2))::INT AS DOUBLE)"
    " - 128) * 256"
)


@register(
    "mm_frame_sample",
    oracle=(
        "SELECT doc_id, f AS frame_idx, CAST(f*40 AS BIGINT) AS frame_offset, "
        "ROUND(sqrt(list_avg(list_transform(generate_series(0,39), "
        f"j -> POW({_FRAME_SQL_SAMPLE}, 2)))), 4) AS frame_rms "
        "FROM documents CROSS JOIN (SELECT unnest(generate_series(0,3)) AS f) frames "
        "ORDER BY doc_id, frame_idx"
    ),
)
def mm_frame_sample(spark, sf_dir):
    """REAL frame sampling (formerly mm_frame_sample_stub's fake):
    each document's 160-sample PCM track (md5-derived, the same
    signal as mm_decode_wav) is encoded into an actual RIFF/WAV
    container, decoded back by the stdlib codec, and sliced into 4
    fixed 40-sample frames — a mapInPandas 1:N row expansion (doc ->
    frames) emitting per-frame offset and RMS. The oracle recomputes
    each frame's RMS directly from the md5 hex, so the whole
    encode -> container -> decode -> slice path is hash-checked.
    At 100 TB the frame rows are orders of magnitude smaller than
    the payloads — the kernel projects the payload away immediately."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    encode, decode = _make_wav_codec()  # driver-side; closures ship by value
    n_frames = N_FRAMES  # closure-captured (pickled by value)

    def frame_sample_kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.md5(t.encode("utf-8")).digest()
                s = (np.frombuffer(d, np.uint8).astype(np.int64) - 128) * 256
                wav = encode(np.tile(s, 10).astype("<i2"))
                n, rate, back = decode(wav)
                flen = n // n_frames
                for i in range(n_frames):
                    frame = back[i * flen : (i + 1) * flen].astype(np.float64)
                    rms = float(np.sqrt((frame**2).mean()))
                    rows.append((int(doc_id), i, i * flen, round(rms, 4)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_offset", "frame_rms"]
            )

    return (
        docs.mapInPandas(
            frame_sample_kernel,
            schema="doc_id bigint, frame_idx int, frame_offset bigint, frame_rms double",
        )
        .orderBy("doc_id", "frame_idx")
    )


# ---------------------------------------------------------------------------
# REAL codecs, stdlib-only: PNG (zlib + hand-rolled chunk/filter
# layer) and WAV (wave module). These replace the "decode is blocked
# without codec libs" stub for the two formats whose spec needs
# nothing beyond the standard library — the decode path below is a
# genuine PNG decoder (all five scanline filters), not a fake.
# ---------------------------------------------------------------------------


def _make_png_codec():
    """Returns (encode, decode) closures so kernels ship them by
    value (workers never import lsd_spark).

    encode(arr, filters=0): HxWxC uint8 (C in 1/3/4 -> grey/RGB/RGBA)
    -> PNG bytes. filters=0 writes every scanline unfiltered;
    filters="cycle" filters row y with type y%5, so one image
    exercises all five spec filters (None/Sub/Up/Average/Paeth).
    decode(data): PNG bytes -> (height, width, channels, HxWxC uint8)
    — handles filters 0-4 and color types 0 (grey), 2 (RGB),
    6 (RGBA), the 8-bit baseline."""
    import struct
    import zlib

    import numpy as np

    def _chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def encode(arr, filters=0) -> bytes:
        arr = np.asarray(arr, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, nch = arr.shape
        ctype = {1: 0, 3: 2, 4: 6}[nch]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        flat = arr.reshape(h, w * nch).astype(np.int32)
        stride = w * nch
        zeros = np.zeros(stride, np.int32)
        lead = np.zeros(nch, np.int32)
        parts = []
        for y in range(h):
            f = (y % 5) if filters == "cycle" else int(filters)
            line = flat[y]
            # filter predictors use ORIGINAL (unfiltered) neighbor
            # bytes on the encode side, so each row vectorizes
            left = np.concatenate([lead, line[:-nch]]) if stride > nch else np.concatenate([lead, line])[:stride]
            prev = flat[y - 1] if y > 0 else zeros
            upleft = np.concatenate([lead, prev[:-nch]]) if stride > nch else np.concatenate([lead, prev])[:stride]
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = prev
            elif f == 3:
                pred = (left + prev) // 2
            else:  # Paeth
                p = left + prev - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
                )
            parts.append(bytes([f]) + ((line - pred) & 0xFF).astype(np.uint8).tobytes())
        return (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(parts)))
            + _chunk(b"IEND", b"")
        )

    def decode(data: bytes):
        data = bytes(data)
        assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
        pos, idat, meta = 8, b"", None
        while pos < len(data):
            (ln,) = struct.unpack(">I", data[pos : pos + 4])
            typ = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + ln]
            if typ == b"IHDR":
                w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
                assert depth == 8 and interlace == 0, "8-bit non-interlaced only"
                meta = (w, h, {0: 1, 2: 3, 6: 4}[ctype])
            elif typ == b"IDAT":
                idat += body
            elif typ == b"IEND":
                break
            pos += 12 + ln
        w, h, nch = meta
        stride = w * nch
        raw = zlib.decompress(idat)
        out = np.zeros((h, stride), dtype=np.uint8)
        for y in range(h):
            f = raw[y * (stride + 1)]
            line = np.frombuffer(
                raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], np.uint8
            ).astype(np.int32)
            prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0  # left
                b = prev[x]  # up
                c = prev[x - nch] if x >= nch else 0  # up-left
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
            out[y] = cur.astype(np.uint8)
        return h, w, nch, out.reshape(h, w, nch)

    return encode, decode


def _make_wav_codec():
    """(encode, decode) for 16-bit mono PCM WAV via the stdlib wave
    module — a real RIFF container round trip."""
    import io
    import wave

    import numpy as np

    def encode(samples, rate: int = 8000) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
        return buf.getvalue()

    def decode(data: bytes):
        with wave.open(io.BytesIO(bytes(data)), "rb") as w:
            n, rate = w.getnframes(), w.getframerate()
            samples = np.frombuffer(w.readframes(n), dtype="<i2")
        return n, rate, samples

    return encode, decode


_PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)

# mean of the 16 md5 bytes — equal to every channel mean of the
# tiled 8x8x3 image (each byte position lands on each channel
# exactly 192/48 = 4 times; see test_multimodal round-trip proof)
_MD5_BYTE_AVG = (
    "list_avg(list_transform(generate_series(0,15), "
    "k -> CAST(('0x' || substring(md5(text), 2*k+1, 2))::INT AS DOUBLE)))"
)


@register(
    "mm_decode_png",
    oracle=(
        "SELECT doc_id, 8 AS width, 8 AS height, "
        f"ROUND({_MD5_BYTE_AVG}, 4) AS mean_r, "
        f"ROUND({_MD5_BYTE_AVG}, 4) AS mean_g, "
        f"ROUND({_MD5_BYTE_AVG}, 4) AS mean_b "
        "FROM documents ORDER BY doc_id"
    ),
)
def mm_decode_png(spark, sf_dir):
    """REAL image decode, no codec libraries: per document an 8x8 RGB
    image (pixel bytes = md5(text) digest tiled) is encoded to an
    actual PNG in one Arrow kernel and decoded back by the hand-
    rolled PNG decoder in a second kernel, which emits per-channel
    means. The oracle recomputes the means directly from the md5 hex
    (channel mean == mean of the 16 digest bytes, exactly — the tile
    width is coprime with the channel stride). A fully hash-checked
    encode->decode round trip through a real on-disk format."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # factory called DRIVER-side: the kernels capture the returned
    # closures, which cloudpickle ships by value (a direct reference
    # to the module-level factory would pickle by module path and
    # require lsd_spark importable on workers)
    encode, decode = _make_png_codec()

    def encode_kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for t in pdf["text"]:
                d = hashlib.md5(t.encode("utf-8")).digest()
                arr = np.frombuffer((d * 12)[:192], np.uint8).reshape(8, 8, 3)
                payloads.append(encode(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "png": payloads})

    def decode_kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, png in zip(pdf["doc_id"], pdf["png"]):
                h, w, nch, arr = decode(png)
                m = arr.astype(np.float64)
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        round(float(m[:, :, 0].mean()), 4),
                        round(float(m[:, :, 1].mean()), 4),
                        round(float(m[:, :, 2].mean()), 4),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    encoded = docs.mapInPandas(encode_kernel, schema="doc_id bigint, png binary")
    return encoded.mapInPandas(decode_kernel, schema=_PNG_STATS_SCHEMA).orderBy("doc_id")


_WAV_SQL_SAMPLE = "(CAST(('0x' || substring(md5(text), 2*k+1, 2))::INT AS DOUBLE) - 128) * 256"


@register(
    "mm_decode_wav",
    oracle=(
        "SELECT doc_id, CAST(160 AS BIGINT) AS n_frames, 8000 AS rate, "
        "ROUND(sqrt(list_avg(list_transform(generate_series(0,15), "
        f"k -> POW({_WAV_SQL_SAMPLE}, 2)))), 4) AS rms "
        "FROM documents ORDER BY doc_id"
    ),
)
def mm_decode_wav(spark, sf_dir):
    """REAL audio decode via the stdlib RIFF/WAV codec: 160 16-bit
    PCM samples per document (md5-derived, tiled 10x) encoded to a
    real WAV container and decoded back; emits frame count, rate and
    RMS. Oracle recomputes RMS from the md5 hex."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    encode, decode = _make_wav_codec()  # driver-side; closures ship by value

    def roundtrip_kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.md5(t.encode("utf-8")).digest()
                s = (np.frombuffer(d, np.uint8).astype(np.int64) - 128) * 256
                wav = encode(np.tile(s, 10).astype("<i2"))
                n, rate, back = decode(wav)
                rms = float(np.sqrt((back.astype(np.float64) ** 2).mean()))
                rows.append((int(doc_id), n, rate, round(rms, 4)))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "rate", "rms"])

    return docs.mapInPandas(
        roundtrip_kernel, schema="doc_id bigint, n_frames bigint, rate int, rms double"
    ).orderBy("doc_id")


PHASH_BITS = 60  # signed-BIGINT-safe, the hash60 convention


def _phash_duck() -> str:
    """DuckDB expression for the perceptual hash of doc_id's derived
    image: gray pixel p (p < 60) is digest byte (3p mod 16) — channel
    0 of the md5-tiled RGB image mm_decode_png builds — and bit p
    fires when the pixel exceeds the image mean. The threshold
    compares in INTEGERS (16*byte > sum-of-16-bytes), so no float
    crosses the engine boundary."""
    byte = lambda k: f"('0x' || substring(md5(text), {2 * k + 1}, 2))::BIGINT  "  # noqa: E731
    total = " + ".join(byte(k) for k in range(16))
    bits = " + ".join(
        f"(CASE WHEN 16 * {byte((3 * p) % 16)} > tot THEN {1 << p} ELSE 0 END)"
        for p in range(PHASH_BITS)
    )
    return f"(SELECT {bits} FROM (SELECT ({total}) AS tot) t)"


@register(
    "mm_phash_dedup",
    oracle=(
        "WITH ph AS (SELECT doc_id, " + _phash_duck() + " AS phash FROM documents) "
        "SELECT CAST(phash AS BIGINT) AS phash, count(*) AS n_images, "
        "CAST(min(doc_id) AS BIGINT) AS keep_id "
        "FROM ph GROUP BY phash HAVING count(*) > 1 ORDER BY phash"
    ),
)
def mm_phash_dedup(spark, sf_dir):
    """Perceptual-hash image dedup — the standard near-dup pass for
    image corpora: encode each doc's derived 8x8 RGB image to a REAL
    PNG, decode it back (the same stdlib codec mm_decode_png
    exercises), threshold the 60 leading gray pixels against the
    image mean into a 60-bit pHash, then group-by-hash keep-first.
    The Spark side computes the hash from DECODED pixels, the oracle
    recomputes it from the md5 derivation — so a decoder bug breaks
    the hash match, making this an end-to-end codec + dedup check.
    At 100 TB: decode+hash is a map-only Arrow kernel; the dedup is
    one 8-byte-key groupBy (near-dup banding would reuse the simhash
    band join; exact pHash grouping is the common first pass)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    encode, decode = _make_png_codec()  # driver-side; ships by value

    def kernel(batches):
        import hashlib as _hl

        import numpy as np

        for pdf in batches:
            ids, hashes = [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                d = _hl.md5(t.encode("utf-8")).digest()
                arr = np.frombuffer((d * 12)[:192], np.uint8).reshape(8, 8, 3)
                h, w, nch, dec = decode(encode(arr))
                gray = dec[:, :, 0].reshape(-1).astype(np.int64)  # channel 0
                tot = int(gray[: 16].copy().astype(np.int64).sum())  # noqa: E203
                # image mean over the tiled image == mean of the
                # first 16 gray pixels (one full digest cycle)
                ph = 0
                for p in range(PHASH_BITS):
                    if 16 * int(gray[p]) > tot:
                        ph |= 1 << p
                ids.append(int(doc_id))
                hashes.append(ph)
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    ph = docs.mapInPandas(kernel, schema="doc_id bigint, phash bigint")
    return (
        ph.groupBy("phash")
        .agg(F.count("*").alias("n_images"), F.min("doc_id").cast("long").alias("keep_id"))
        .filter(F.col("n_images") > 1)
        .orderBy("phash")
    )
