"""Multimodal column plumbing — north-star extension (SURVEY.md §2.2).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, exactly like the reference's opaque Kinesis record payload
(`/root/reference/src/lib.rs:69`: the engine never interprets bytes;
the user decode step does). The *Spark-side plumbing* here is real and
tested — schemas, Arrow batch shapes, mapInPandas signatures,
partitioning — and so (r10) is the container decode for the formats a
pure-Python parser can own:

- ``decode_image`` natively parses 24-bit uncompressed BMP, binary
  PPM (P6), and (r12) 8-bit-RGB non-interlaced PNG — zlib is stdlib,
  so the DEFLATE stream needs no external codec; the chunk walk, CRC
  checks, and all five scanline filters (None/Sub/Up/Average/Paeth)
  are hand-parsed from the public spec. It raises a LOUD
  NotImplementedError only for formats/variants that need a real
  codec library this container lacks (JPEG/GIF/WebP/RLE-BMP;
  non-8-bit, non-RGB, or Adam7-interlaced PNG);
  ``multimodal_decode_image`` hash-grades the round trip
- ``fake_decode_features`` is the deterministic stand-in used by the
  byte-level pipelines and tests: features derived from payload bytes

Because no binary test table exists, payloads are synthesized from
``documents.text`` (utf-8 encode) — at 100 TB the same pipeline reads
parquet binary columns directly.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, feature_sums string"
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct — the
    multimodal storage model (binary + metadata, never decoded by the
    engine)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col("text")).alias("n_bytes"),
            # fake modality assignment — deterministic from content size
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.octet_length(F.col("text")) % 3 + 1).cast("int"),
            ).alias("modality"),
            F.sha2(F.col("text"), 256).alias("content_sha"),
        ).alias("meta"),
    )


class DecodedImage:
    """Decoded raster: ``pixels`` is an H×W×3 uint8 numpy array in
    top-down row order with RGB channel order, whatever the container
    format stored (BMP keeps bottom-up BGR rows on disk; the decoder
    normalizes)."""

    __slots__ = ("width", "height", "channels", "pixels")

    def __init__(self, width: int, height: int, pixels) -> None:
        self.width = int(width)
        self.height = int(height)
        self.channels = 3
        self.pixels = pixels


_COMPRESSED_MAGICS = (
    # PNG left this list in r12: its only entropy coder is DEFLATE,
    # which stdlib zlib provides — see _decode_png
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "webp/riff"),
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9, public): nearest of left a,
    up b, up-left c to the linear estimate a + b − c, ties preferring
    a, then b."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> DecodedImage:
    """8-bit RGB (color type 2), non-interlaced PNG — the one
    compressed format a pure-Python parser can own because its
    entropy coder is stdlib ``zlib``. Chunk CRCs are verified (a
    corrupt chunk is a ValueError, not silent garbage); bit depths
    other than 8, color types other than truecolor RGB, and Adam7
    interlacing stay LOUD NotImplementedError (VERDICT r11 #4: real
    corpora carry 8-bit RGB overwhelmingly; the rest belongs to a
    real codec). Defiltering implements all five scanline filters.

    Scale note: the per-pixel Python loop in the Sub/Average/Paeth
    paths is fine for the tiny synthetic rasters the oracle grades
    (≤ 8×6); production-size frames want a numpy-vectorized or real
    codec — the mapInPandas plumbing around this function is
    identical either way."""
    import struct
    import zlib

    import numpy as np

    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while True:
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG (no IEND)")
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        end = pos + 8 + ln
        if end + 4 > len(payload):
            raise ValueError(f"truncated PNG chunk {typ!r}")
        data = payload[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", payload, end)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped
        pos = end + 4
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing/malformed IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or ctype != 2:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {ctype} unsupported "
            f"(8-bit truecolor RGB only)"
        )
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if comp != 0 or filt != 0:
        raise ValueError(
            f"PNG compression/filter method {comp}/{filt} invalid "
            f"(spec allows only 0/0)"
        )
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from None
    stride = w * 3
    if w <= 0 or h <= 0 or len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    bpp = 3
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = bytearray(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        )
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ft == 0:  # None
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + int(prev[i])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG scanline filter {ft} invalid")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return DecodedImage(w, h, out.reshape(h, w, 3))


def decode_image(payload: bytes) -> DecodedImage:
    """Pure-Python image decode for the formats a hand parser can own
    outright — 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up
    or top-down), binary PPM (P6, maxval ≤ 255, comment-tolerant
    header), and (r12) 8-bit-RGB non-interlaced PNG (stdlib zlib
    inflate + all five scanline filters; see ``_decode_png``). Runs
    inside ``mapInPandas`` batches (see ``multimodal_decode_image``)
    so bytes never leave the executor; only derived features flow on.

    Formats needing a real entropy codec (JPEG/GIF/WebP, RLE BMP) and
    PNG variants beyond 8-bit RGB stay a LOUD NotImplementedError:
    those coders belong to a real media library, not a hand parser —
    the decode *plumbing* is identical either way (same batch shape,
    same schema), so swapping a library in touches nothing
    downstream."""
    import numpy as np

    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(payload)
    for magic, fmt in _COMPRESSED_MAGICS:
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"compressed image format ({fmt}) requires a real codec "
                f"(PIL/opencv — not in this container); uncompressed "
                f"BMP/PPM decode natively"
            )
    if payload[:2] == b"BM":
        import struct

        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_ofs = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        # bpp/biCompression live at fixed offsets 28/30 ONLY for
        # BITMAPINFOHEADER (hdr_size ≥ 40); a BITMAPCOREHEADER
        # (hdr_size = 12, 16-bit w/h, no compression field) would be
        # misparsed from garbage offsets — fail loudly instead
        # (ADVICE r10)
        if hdr_size < 40:
            raise NotImplementedError(
                f"BMP header size {hdr_size} unsupported "
                f"(BITMAPINFOHEADER, >= 40 bytes, only)"
            )
        bpp, comp = struct.unpack_from("<HI", payload, 28)
        if comp != 0:
            raise NotImplementedError(
                "compressed BMP (biCompression != 0) requires a real codec"
            )
        if bpp != 24:
            raise NotImplementedError(f"{bpp}-bit BMP unsupported (24 only)")
        height, top_down = (-h, True) if h < 0 else (h, False)
        row_bytes = (w * 3 + 3) // 4 * 4  # rows pad to 4-byte boundary
        need = data_ofs + row_bytes * height
        if w <= 0 or height <= 0 or len(payload) < need:
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            payload, np.uint8, count=row_bytes * height, offset=data_ofs
        ).reshape(height, row_bytes)
        pix = rows[:, : w * 3].reshape(height, w, 3)[..., ::-1]  # BGR→RGB
        if not top_down:
            pix = pix[::-1]  # bottom-up on disk → top-down out
        return DecodedImage(w, height, np.ascontiguousarray(pix))
    if payload[:2] == b"P6":
        # header = magic + 3 ints (w, h, maxval) separated by
        # whitespace, '#' comments running to end-of-line; ONE
        # whitespace byte after maxval, then raw RGB
        pos, vals = 2, []
        while len(vals) < 3:
            if pos >= len(payload):
                raise ValueError("truncated PPM header")
            c = payload[pos : pos + 1]
            if c == b"#":
                nl = payload.find(b"\n", pos)
                pos = len(payload) if nl < 0 else nl + 1
            elif c.isspace():
                pos += 1
            elif c.isdigit():
                end = pos
                while end < len(payload) and payload[end : end + 1].isdigit():
                    end += 1
                vals.append(int(payload[pos:end]))
                pos = end
            else:
                raise ValueError(f"bad PPM header byte {c!r}")
        w, height, maxval = vals
        if maxval > 255:
            raise NotImplementedError("16-bit PPM unsupported (maxval > 255)")
        pos += 1  # the single whitespace after maxval
        n = w * height * 3
        if w <= 0 or height <= 0 or len(payload) < pos + n:
            raise ValueError("truncated PPM pixel data")
        pix = np.frombuffer(payload, np.uint8, count=n, offset=pos).reshape(
            height, w, 3
        )
        return DecodedImage(w, height, pix)
    raise ValueError(
        f"unrecognized image container (magic {payload[:4]!r}); "
        f"BMP ('BM') and PPM ('P6') decode natively"
    )


def encode_bmp(pixels) -> bytes:
    """24-bit uncompressed BMP writer (the synthesis twin of
    ``decode_image``): H×W×3 uint8 RGB in, bottom-up BGR rows with
    4-byte padding out — the layout every BMP reader must handle."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    head = struct.pack(
        "<2sIHHI", b"BM", 54 + body.size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, body.size, 2835, 2835, 0, 0)
    return head + body.tobytes()


def encode_ppm(pixels) -> bytes:
    """Binary PPM (P6) writer with a comment line in the header, so
    round-trips exercise the parser's comment handling."""
    h, w, _ = pixels.shape
    return (
        f"P6\n# synthetic test raster\n{w} {h}\n255\n".encode()
        + pixels.tobytes()
    )


def encode_png(pixels) -> bytes:
    """8-bit RGB non-interlaced PNG writer (the synthesis twin of
    ``_decode_png``). Each scanline is filtered with type
    ``row % 5`` — None, Sub, Up, Average, Paeth in rotation — so any
    raster ≥ 5 rows exercises every defilter path in the reader; an
    ancillary tEXt chunk sits between the IDATs' IHDR and IDAT so the
    chunk walk's skip path is exercised too."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = pixels.shape
    bpp = 3
    flat = pixels.reshape(h, w * bpp).astype(np.int16)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = bytearray()
    zero = np.zeros(w * bpp, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else zero
        left = np.concatenate([zero[:bpp], cur[:-bpp]])
        upleft = np.concatenate([zero[:bpp], prev[:-bpp]])
        ft = y % 5
        if ft == 0:
            out = cur
        elif ft == 1:
            out = cur - left
        elif ft == 2:
            out = cur - prev
        elif ft == 3:
            out = cur - (left + prev) // 2
        else:
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prev),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, upleft),
            )
            out = cur - pred
        raw.append(ft)
        raw += (out % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"tEXt", b"Comment\x00synthetic test raster")
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[int]:
    """Deterministic stand-in for a media feature extractor: a strided
    byte accumulation (channel i sums bytes at positions ≡ i mod dim).
    Vectorized via ``np.frombuffer``; integer sums keep the output
    exactly reproducible by the SQL oracle (a mean-pool variant would
    add a division — the sums carry the same information)."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    pad = (-arr.size) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.int64)])
    acc = arr.reshape(-1, dim).sum(axis=0) if arr.size else np.zeros(dim, dtype=np.int64)
    return [int(v) for v in acc]


def multimodal_features_pipeline(docs: DataFrame) -> DataFrame:
    """The real Spark plumbing: binary payloads → Arrow batches →
    per-batch vectorized feature extraction via ``mapInPandas``.
    Partition-parallel; batch-shaped exactly like a GPU decode stage."""
    src = with_payload(docs).select(
        "doc_id", "payload", F.col("meta.modality").alias("modality")
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    # comma-joined integer channel sums: a scalar the
                    # driver canonicalizer can hash (raw arrays are
                    # unhashable in its pandas sort)
                    "feature_sums": pdf["payload"].map(
                        lambda p: ",".join(map(str, fake_decode_features(p)))
                    ),
                }
            )

    return src.mapInPandas(extract, schema=FEATURES_SCHEMA)


def multimodal_arrow_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document byte statistics computed with ``mapInArrow`` — the
    Arrow-NATIVE Python execution surface (completing the trio beside
    ``mapInPandas`` above and the pandas_udf sites in udf_surface.py):
    batches arrive as ``pyarrow.RecordBatch``, the binary column's
    values are read straight from its offsets + data buffers with
    numpy (no pandas conversion, no per-row Python), and per-row sums
    come from one cumulative-sum subtraction over the flat buffer —
    the zero-copy path a media pipeline uses when even the
    Arrow→pandas hop is too expensive.

    Emits per doc: byte count, byte-value sum, and high-bit count
    (≥0x80 — 0 for the ASCII corpus, the claim the oracle restates
    from codepoints; same ASCII-pinned equivalence as
    ``multimodal_features``, guarded by
    tests/test_multimodal_skew.py::test_documents_text_is_pure_ascii_all_sfs).

    Scale: embarrassingly parallel single scan, no shuffle; the
    rollup below is a broadcast-free keyed aggregate on modality."""
    import pyarrow as pa

    docs = load_table(spark, sf_dir, "documents")
    src = with_payload(docs).select(
        "doc_id", "payload", F.col("meta.modality").alias("modality")
    )

    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("modality", pa.string()),
            pa.field("n_bytes", pa.int64()),
            pa.field("byte_sum", pa.int64()),
            pa.field("n_high", pa.int64()),
        ]
    )

    def byte_stats(batches):
        import numpy as np

        for batch in batches:
            if batch.num_rows == 0:
                continue
            col = batch.column(batch.schema.get_field_index("payload"))
            # normalize offset-sliced batches to a fresh array so the
            # buffer math below starts at offset 0
            arr = pa.concat_arrays([col]).slice(0, len(col))
            if arr.offset != 0 or isinstance(arr, pa.LargeBinaryArray):
                arr = pa.array(arr.to_pylist(), type=pa.binary())
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                : len(arr) + 1
            ].astype(np.int64)
            data = np.frombuffer(
                arr.buffers()[2] or b"", dtype=np.uint8
            ).astype(np.int64)
            # prefix sums make per-row reductions a subtraction — and
            # empty payloads naturally yield 0 (reduceat would not)
            cs = np.concatenate([[0], np.cumsum(data)])
            hs = np.concatenate([[0], np.cumsum(data >= 128)])
            yield pa.record_batch(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    batch.column(batch.schema.get_field_index("modality")),
                    pa.array(offs[1:] - offs[:-1], type=pa.int64()),
                    pa.array(cs[offs[1:]] - cs[offs[:-1]], type=pa.int64()),
                    pa.array(hs[offs[1:]] - hs[offs[:-1]], type=pa.int64()),
                ],
                schema=out_schema,
            )

    per_doc = src.mapInArrow(
        byte_stats,
        schema="doc_id bigint, modality string, n_bytes bigint, "
        "byte_sum bigint, n_high bigint",
    )
    return per_doc.groupBy("modality").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("byte_sum").alias("total_byte_sum"),
        F.sum("n_high").alias("total_high"),
        F.min("doc_id").alias("min_doc_id"),
    )


# --- driver-checkable queries ------------------------------------------


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque payloads — engine-side, no decode:
    byte length, content hash, modality tag (all codegen'd)."""
    docs = load_table(spark, sf_dir, "documents")
    wp = with_payload(docs)
    return wp.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.modality").alias("modality"),
        F.col("meta.content_sha").alias("content_sha"),
    )


def multimodal_modality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-style rollup per modality (the 'how much of each media
    type' scan a training pipeline runs before sampling)."""
    docs = load_table(spark, sf_dir, "documents")
    wp = with_payload(docs)
    return wp.groupBy(F.col("meta.modality").alias("modality")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("meta.n_bytes").cast("bigint")).alias("total_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction (deterministic fake decode). The
    corpus text is pure ASCII, so the payload bytes equal the char
    codes and the SQL oracle rebuilds the exact strided channel sums —
    the Python batch stage is hash-verified, not just rows-counted."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal_features_pipeline(docs)


N_FRAMES = 4  # frames sampled per video payload
FRAME_LEN = 32  # bytes per sampled frame
RESIZE_DIM = 16  # downsampled frame representation length

FRAMES_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_offset int, frame_len int, "
    "frame_sha string, resized string"
)


def sample_frames(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Deterministic frame sampler: N_FRAMES evenly-strided FRAME_LEN
    byte slices (the video-keyframe-sampling access pattern; a real
    decoder would seek keyframes the same way)."""
    n = len(payload)
    if n == 0:
        return []
    k = min(N_FRAMES, max(n // FRAME_LEN, 1))
    stride = max((n - FRAME_LEN) // max(k - 1, 1), 1) if k > 1 else 0
    out = []
    for i in range(k):
        off = min(i * stride, max(n - FRAME_LEN, 0))
        out.append((i, off, payload[off : off + FRAME_LEN]))
    return out


def resize_frame(frame: bytes, dim: int = RESIZE_DIM) -> list[int]:
    """Deterministic 'resize': box-filter the byte sequence down to
    ``dim`` buckets (stand-in for image resize — same access pattern;
    integer bucket *sums* rather than means so the SQL oracle
    reproduces the output exactly)."""
    if not frame:
        return [0] * dim
    buckets = [0] * dim
    for i, b in enumerate(frame):
        buckets[i * dim // len(frame)] += b
    return buckets


def multimodal_frame_pipeline(docs: DataFrame) -> DataFrame:
    """Frame-sample + resize over video payloads via ``mapInPandas`` —
    one Arrow batch in, a frames-exploded batch out (the batch shape a
    GPU decode stage consumes). Only 'video'-modality payloads are
    scanned (predicate applied before the Python stage)."""
    src = with_payload(docs).filter(F.col("meta.modality") == "video").select(
        "doc_id", "payload"
    )

    def frames(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, off, fb in sample_frames(bytes(payload)):
                    rows.append(
                        (
                            doc_id,
                            idx,
                            off,
                            len(fb),
                            hashlib.sha256(fb).hexdigest(),
                            ",".join(map(str, resize_frame(fb))),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "frame_offset",
                    "frame_len",
                    "frame_sha",
                    "resized",
                ],
            )

    return src.mapInPandas(frames, schema=FRAMES_SCHEMA)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling + resize plumbing (deterministic byte-slice
    frames). ASCII payloads make every frame a text substring, so the
    SQL oracle reproduces offsets, lengths, sha256 digests, and the
    box-filter bucket sums — full hash verification of the Python
    batch stage."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal_frame_pipeline(docs)


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_modality_stats": multimodal_modality_stats,
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_arrow_hist": multimodal_arrow_hist,
}

ORACLE = {
    # byte stats restated from codepoints — exact because the corpus is
    # ASCII-pinned (see multimodal_features' identical guard)
    "multimodal_arrow_hist": """
        WITH per_doc AS (
            SELECT doc_id,
                   CASE octet_length(encode(text)) % 3
                        WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   CAST(coalesce(list_sum(list_transform(split(text, ''),
                        c -> ascii(c))), 0) AS BIGINT) AS byte_sum,
                   CAST(coalesce(list_sum(list_transform(split(text, ''),
                        c -> CASE WHEN ascii(c) >= 128 THEN 1 ELSE 0 END)),
                        0) AS BIGINT) AS n_high
            FROM documents
        )
        SELECT modality, count(*) AS n_docs,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               CAST(sum(byte_sum) AS BIGINT) AS total_byte_sum,
               CAST(sum(n_high) AS BIGINT) AS total_high,
               min(doc_id) AS min_doc_id
        FROM per_doc GROUP BY 1
    """,
    "multimodal_meta": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
               sha256(text) AS content_sha
        FROM documents
    """,
    "multimodal_modality_stats": """
        SELECT CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
               count(*) AS n_items,
               CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
               max(octet_length(encode(text))) AS max_bytes
        FROM documents
        GROUP BY 1
    """,
    # the corpus text is pure ASCII (verified: max codepoint 121), so
    # payload bytes == ascii(char) and both Python batch stages are
    # reproducible in SQL exactly
    "multimodal_features": f"""
        WITH base AS (
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   CASE octet_length(encode(text)) % 3
                        WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   list_transform(split(text, ''), c -> ascii(c)) AS bs
            FROM documents
        )
        SELECT doc_id, modality, CAST(n_bytes AS INTEGER) AS n_bytes,
               concat_ws(',', {", ".join(
                   "CAST(list_sum(list_transform("
                   "generate_series(1, len(bs)), "
                   f"p -> CASE WHEN (p - 1) % {FEATURE_DIM} = {i} "
                   "THEN bs[p] ELSE 0 END)) AS BIGINT)"
                   for i in range(FEATURE_DIM)
               )}) AS feature_sums
        FROM base
    """,
    "multimodal_frame_sample": f"""
        WITH vids AS (
            SELECT doc_id, text, octet_length(encode(text)) AS n
            FROM documents
            WHERE octet_length(encode(text)) % 3 = 2
        ),
        par AS (
            SELECT doc_id, text, n,
                   least({N_FRAMES}, greatest(n // {FRAME_LEN}, 1)) AS k,
                   greatest(n - {FRAME_LEN}, 0) AS maxoff
            FROM vids
        ),
        fr0 AS (
            SELECT doc_id, text, n, k, maxoff,
                   unnest(generate_series(0, k - 1)) AS frame_idx
            FROM par
        ),
        fr AS (
            SELECT doc_id, text, CAST(frame_idx AS INTEGER) AS frame_idx,
                   CAST(least(frame_idx * (CASE WHEN k > 1
                        THEN greatest((n - {FRAME_LEN}) // (k - 1), 1)
                        ELSE 0 END), maxoff) AS INTEGER) AS frame_offset,
                   n
            FROM fr0
        ),
        sliced AS (
            SELECT doc_id, frame_idx, frame_offset,
                   substring(text, frame_offset + 1, {FRAME_LEN}) AS fb
            FROM fr
        ),
        bytes_ AS (
            SELECT doc_id, frame_idx, frame_offset, fb,
                   CAST(length(fb) AS INTEGER) AS frame_len,
                   list_transform(split(fb, ''), c -> ascii(c)) AS fbs
            FROM sliced
        )
        SELECT doc_id, frame_idx, frame_offset, frame_len,
               sha256(fb) AS frame_sha,
               concat_ws(',', {", ".join(
                   "CAST(list_sum(list_transform("
                   "generate_series(1, len(fbs)), "
                   f"p -> CASE WHEN ((p - 1) * {RESIZE_DIM}) // len(fbs) = {j} "
                   "THEN fbs[p] ELSE 0 END)) AS BIGINT)"
                   for j in range(RESIZE_DIM)
               )}) AS resized
        FROM bytes_
    """,
}


# --- perceptual-hash-style binary dedup ---------------------------------

PHASH_BLOCKS = 16


def phash_bytes(payload: bytes) -> int:
    """Deterministic perceptual-hash stand-in over an opaque payload:
    split into 16 contiguous blocks, bit j = (block-sum_j > mean) via
    the integer-exact comparison 16·b_j > total. A real pHash swaps
    this for DCT-of-decoded-pixels inside the same mapInPandas batch;
    the clustering semantics downstream are identical."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    if arr.size == 0:
        return 0
    blk = -(-arr.size // PHASH_BLOCKS)  # ceil
    pad = blk * PHASH_BLOCKS - arr.size
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.int64)])
    sums = arr.reshape(PHASH_BLOCKS, blk).sum(axis=1)
    total = int(sums.sum())
    bits = (PHASH_BLOCKS * sums) > total
    return int((bits << np.arange(PHASH_BLOCKS)).sum())


def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering of binary payloads by perceptual-hash-style
    block signature — the media twin of dedup_simhash: identical
    signatures form a cluster with a canonical representative. The
    signature runs batch-wise in mapInPandas (bytes never leave the
    executors); the rollup is one small keyed aggregate."""
    from collections.abc import Iterator as _It

    docs = load_table(spark, sf_dir, "documents")
    src = with_payload(docs).select("doc_id", "payload")

    def sig(batches: _It) -> _It:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": pdf["payload"].map(phash_bytes).astype("int64"),
                }
            )

    hashed = src.mapInPandas(sig, schema="doc_id bigint, phash bigint")
    return hashed.groupBy("phash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("n_members"),
    )


QUERIES["multimodal_phash_clusters"] = multimodal_phash_clusters

# ASCII-payload equivalence (guarded by the corpus ASCII test): byte i
# of the utf-8 payload is ascii(substring(text, i, 1)), so the oracle
# restates the block-sum signature in pure SQL.
_PH_N = "length(text)"
_PH_BLK = f"(({_PH_N} + {PHASH_BLOCKS - 1}) // {PHASH_BLOCKS})"
_PH_BSUM = (
    "list_sum(list_transform(generate_series("
    f"CAST(j * {_PH_BLK} + 1 AS BIGINT), "
    f"CAST(least((j + 1) * {_PH_BLK}, {_PH_N}) AS BIGINT)), "
    "i -> ascii(substring(text, CAST(i AS INT), 1))))"
)

ORACLE["multimodal_phash_clusters"] = f"""
    WITH blocks AS (
        SELECT doc_id, j,
               coalesce({_PH_BSUM}, 0) AS bsum
        FROM documents, (SELECT unnest(generate_series(0, {PHASH_BLOCKS - 1})) AS j)
    ),
    tot AS (
        SELECT doc_id, CAST(sum(bsum) AS BIGINT) AS total FROM blocks GROUP BY doc_id
    ),
    sigs AS (
        SELECT b.doc_id,
               CAST(sum(CASE WHEN {PHASH_BLOCKS} * b.bsum > t.total
                             THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                   AS phash
        FROM blocks b JOIN tot t USING (doc_id)
        GROUP BY b.doc_id
    )
    SELECT phash,
           min(doc_id) AS canonical_id,
           count(*) AS n_members
    FROM sigs
    GROUP BY phash
"""


# --- r10: real container decode (BMP/PPM round-trip, driver-graded) ------

DECODE_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, pos_checksum bigint"
)


def synth_raster(doc_id: int):
    """Deterministic tiny test raster for ``doc_id``: w = 4 + id%5,
    h = 3 + id%4, value at linear RGB index i = (31·id + i) mod 256 —
    pure integer arithmetic a SQL oracle restates without touching
    bytes."""
    import numpy as np

    w, h = 4 + doc_id % 5, 3 + doc_id % 4
    idx = np.arange(w * h * 3, dtype=np.int64)
    return ((31 * doc_id + idx) % 256).astype(np.uint8).reshape(h, w, 3)


def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL container decode, driver-graded: every document
    synthesizes a deterministic raster, serializes it through a real
    image container (id % 3: 0 → 24-bit bottom-up padded BMP, 1 →
    binary PPM with a header comment, 2 → r12's zlib-DEFLATE PNG with
    the scanline filter rotating per row and an ancillary tEXt chunk),
    and ``decode_image`` parses the bytes back inside ``mapInPandas``.
    Output = per-channel pixel sums plus a position-weighted checksum
    Σ i·v_i over the decoded top-down RGB stream; the DuckDB oracle
    recomputes all four from the generator arithmetic alone, so ANY
    decode defect — header offsets, 4-byte row padding, bottom-up row
    order, BGR channel order, PPM comment/whitespace handling, PNG
    inflate/defilter (every raster is ≥ 3 rows tall, and heights 3-6
    exercise filters None/Sub/Up/Average/Paeth across the corpus) —
    breaks the hash match. (Channel swap flips sum_r/sum_b; row-order
    mistakes flip pos_checksum; padding/filter mistakes shear
    everything.)

    Reference analog: the reference hands opaque payload bytes to the
    user's processor (`/root/reference/src/lib.rs:69`); decoding is
    exactly such a per-record user map (T1), here in its
    Arrow-batched form. Scale: per-row Python over ~150-byte rasters,
    partition-parallel, no shuffle at all — output is one row per
    input row and every aggregate the query emits is per-document."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def decode_batch(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                pix = synth_raster(d)
                enc = (encode_bmp, encode_ppm, encode_png)[d % 3]
                img = decode_image(enc(pix))
                flat = img.pixels.astype(np.int64).ravel()
                i = np.arange(flat.size, dtype=np.int64)
                rows.append(
                    (
                        d,
                        ("bmp", "ppm", "png")[d % 3],
                        img.width,
                        img.height,
                        int(flat[0::3].sum()),
                        int(flat[1::3].sum()),
                        int(flat[2::3].sum()),
                        int((i * flat).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "fmt",
                    "width",
                    "height",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                    "pos_checksum",
                ],
            )

    return docs.mapInPandas(decode_batch, schema=DECODE_SCHEMA)


QUERIES["multimodal_decode_image"] = multimodal_decode_image

ORACLE["multimodal_decode_image"] = """
    WITH base AS (
        SELECT doc_id,
               CAST(4 + doc_id % 5 AS INTEGER) AS w,
               CAST(3 + doc_id % 4 AS INTEGER) AS h
        FROM documents
    ),
    px AS (
        SELECT doc_id, w, h,
               unnest(generate_series(0, w * h * 3 - 1)) AS i
        FROM base
    ),
    v AS (
        SELECT doc_id, w, h, i, (31 * doc_id + i) % 256 AS val FROM px
    )
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                ELSE 'png' END AS fmt,
           max(w) AS width, max(h) AS height,
           CAST(sum(CASE WHEN i % 3 = 0 THEN val ELSE 0 END) AS BIGINT)
               AS sum_r,
           CAST(sum(CASE WHEN i % 3 = 1 THEN val ELSE 0 END) AS BIGINT)
               AS sum_g,
           CAST(sum(CASE WHEN i % 3 = 2 THEN val ELSE 0 END) AS BIGINT)
               AS sum_b,
           CAST(sum(i * val) AS BIGINT) AS pos_checksum
    FROM v GROUP BY doc_id
"""
