"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, Arrow batch shape, mapInPandas
signatures, partitioning — is real and tested; the actual codec work is
stubbed (the sandbox has no image/audio libraries): ``decode_stub``
raises NotImplementedError, ``fake_features`` produces deterministic
pseudo-features from the bytes (crc32-derived), so downstream plumbing
can be exercised end-to-end.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),      # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),       # fake-decoded
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: utf-8 bytes as the
    opaque payload (stands in for real image/audio blobs)."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def png_media_from_documents(
    docs: DataFrame,
    id_offset: int = 0,
    variant_pixel0: int | None = None,
) -> DataFrame:
    """Deterministic synthetic PNG media table (fixtures for the real
    codec path): one grayscale PNG per document, dimensions and pixels
    pure functions of doc_id, so a SQL oracle can re-derive the decoded
    width/height/pixel-sum from first principles.

        width  = doc_id % 16 + 1
        height = doc_id % 12 + 1
        pixel[i] = (doc_id * 7 + i) % 256

    ``id_offset`` / ``variant_pixel0`` plant near-duplicate variants:
    the media_id shifts by the offset while the pixels stay those of
    the BASE doc_id except pixel[0], which is overwritten — the planted
    fixture for perceptual-hash dedup (one-pixel edit ⇒ tiny or zero
    aHash hamming distance, re-derivable by the SQL oracle).
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for did in ids:
                w = int(did) % 16 + 1
                h = int(did) % 12 + 1
                pix = [(int(did) * 7 + i) % 256 for i in range(w * h)]
                if variant_pixel0 is not None:
                    pix[0] = variant_pixel0
                payloads.append(encode_png_gray(w, h, bytes(pix)))
            yield pd.DataFrame(
                {
                    "media_id": ids + id_offset,
                    "kind": "image",
                    "mime": "image/png",
                    "payload": payloads,
                    "meta": [{"codec": "png"}] * len(ids),
                }
            )

    return docs.select("doc_id").mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_stub(payload: bytes, mime: str):
    """Codec dispatch.  PNG is REAL (pure-stdlib zlib path below); other
    formats require PIL/ffmpeg, absent in this sandbox — wire them here
    in production."""
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return decode_png(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "media decoding beyond PNG/WAV requires image/video libraries not "
        "present in this environment; wire PIL/torchaudio/ffmpeg here in "
        "production"
    )


# ------------------------------------------------------------ real PNG codec
# One honest codec with zero new deps: PNG is zlib-deflate + per-scanline
# byte filters, both expressible with the stdlib.  The encoder exists for
# deterministic fixtures; the decoder is the production-shaped path that
# runs inside the Arrow feature-extraction batches.
PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (fixtures only).  Rows cycle
    through ALL five scanline filter types (None/Sub/Up/Average/Paeth),
    so a round-trip exercises every de-filter branch of the decoder."""
    import struct

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = bytes(width)
    for y in range(height):
        line = pixels[y * width : (y + 1) * width]
        f = y % 5
        raw.append(f)
        for i in range(width):
            a = line[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if f == 0:
                enc = line[i]
            elif f == 1:
                enc = line[i] - a
            elif f == 2:
                enc = line[i] - b
            elif f == 3:
                enc = line[i] - (a + b) // 2
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = line[i] - pr
            raw.append(enc & 0xFF)
        prev = line
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes, keep_pixels: bool = False) -> dict:
    """Real PNG decode, stdlib only: chunk walk with CRC verification,
    IHDR parse, zlib inflate, all five scanline de-filters.  Returns
    width/height/bit_depth/color_type plus two checksums over the
    reconstructed RAW PIXELS: crc32 and the plain byte sum (the latter
    is re-derivable in ANSI SQL, putting the de-filter arithmetic under
    the cross-engine oracle)."""
    import struct

    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(PNG_SIG)
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in chunk {tag!r}")
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", data[:10]
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    if bit_depth != 8:
        raise ValueError("only 8-bit PNGs supported")
    bpp = channels
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(height):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown scanline filter {f}")
        out += line
        prev = line
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "pixel_crc32": zlib.crc32(bytes(out)) & 0xFFFFFFFF,
        "pixel_sum": sum(out),
        **({"pixels": bytes(out)} if keep_pixels else {}),
    }


def _feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per-batch feature extraction.  PNG payloads take the REAL decode
    path (width/height from IHDR, checksum = byte sum of the decoded
    raw pixels); other formats keep the deterministic crc32 stand-in —
    the sandbox has no PIL/ffmpeg for them."""
    for pdf in batches:
        payload = pdf["payload"]
        n_bytes = payload.map(len).astype("int32")
        checksum = payload.map(lambda b: zlib.crc32(bytes(b))).astype("int64")
        width = (checksum % 1920 + 1).astype("int32")
        height = (checksum % 1080 + 1).astype("int32")
        is_png = payload.map(
            lambda b: bytes(b)[: len(PNG_SIG)] == PNG_SIG
        )
        if is_png.any():
            decoded = payload[is_png].map(lambda b: decode_png(bytes(b)))
            width = width.where(
                ~is_png, decoded.map(lambda d: d["width"]).astype("int32")
            ).astype("int32")
            height = height.where(
                ~is_png, decoded.map(lambda d: d["height"]).astype("int32")
            ).astype("int32")
            checksum = checksum.where(
                ~is_png, decoded.map(lambda d: d["pixel_sum"]).astype("int64")
            ).astype("int64")
        n_frames = ((checksum % 240) + 1).astype("int32")
        n_frames = n_frames.where(pdf["kind"] == "video", 1).astype("int32")
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": n_bytes,
                "checksum": checksum,
                "width": width,
                "height": height,
                "n_frames": n_frames,
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.  PNG
    rows decode for real (pure-stdlib codec above); further codecs slot
    into `_feature_batches` with the same Spark plumbing (schema,
    batching, partitioning)."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _feature_batches, schema=FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, max_frames: int = 8) -> DataFrame:
    """Frame sampling plumbing: one row per sampled frame, the frame
    payload a contiguous byte slice of the media blob.

    This is the real Spark shape of a frame sampler — row-expanding
    fan-out (posexplode over a sequence), byte-offset arithmetic, binary
    slicing — all JVM-side Catalyst expressions, no Python.  A real
    video codec replaces the byte-slice with decoded frames at the same
    (media_id, frame_idx, payload) schema; frame COUNT here is a
    deterministic stand-in (n_bytes mod max_frames + 1 for video,
    1 otherwise) so the fan-out is verifiable cross-engine."""
    n_bytes = F.octet_length("payload")
    n_frames = F.when(
        F.col("kind") == "video", F.pmod(n_bytes, F.lit(max_frames)) + 1
    ).otherwise(F.lit(1))
    step = F.floor(n_bytes / n_frames).cast("int")
    ex = media.select(
        "media_id",
        "kind",
        "payload",
        n_bytes.alias("n_bytes"),
        step.alias("step"),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("pos", "frame_idx"),
    )
    frame = F.expr("substring(payload, frame_idx * step + 1, step)")
    return ex.select(
        "media_id",
        "kind",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx") * F.col("step")).cast("long").alias("byte_offset"),
        frame.alias("frame_payload"),
        F.octet_length(frame).cast("long").alias("frame_bytes"),
    )


def thumbnail(media: DataFrame, width: int = 64, height: int = 64,
              head_bytes: int = 16) -> DataFrame:
    """Resize/thumbnail plumbing: per-media fixed-size derived payload.
    The codec is stubbed (head-byte slice stands in for the resized
    pixel buffer — the sandbox has no PIL/ffmpeg); schema, dimensions
    metadata, and the binary column shape are the production contract."""
    return media.select(
        "media_id",
        "kind",
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.expr(f"substring(payload, 1, {head_bytes})").alias("thumb_payload"),
        F.least(F.octet_length("payload"), F.lit(head_bytes))
        .cast("long")
        .alias("thumb_bytes"),
    )


# ------------------------------------------------------------ real WAV codec
# Second honest codec, zero new deps: RIFF/WAVE PCM is a pure-struct
# format.  Encoder exists for deterministic fixtures; decoder is the
# production-shaped path inside the Arrow audio-feature batches.
WAV_SIG = b"RIFF"


def encode_wav_pcm16(sample_rate: int, samples: list[int], n_channels: int = 1) -> bytes:
    """Minimal PCM-16 mono/stereo WAV encoder (fixtures only)."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      n_channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE PCM-16 decoder: chunk walk (fmt /data, odd-size
    padding honored), sample decode via array('h').  Returns rate,
    channels, bit depth, per-channel sample count, and the integer
    abs-sum of all samples (the exactly-verifiable feature)."""
    import array
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM-16 supported (fmt={audio_fmt}, bits={bits})")
    a = array.array("h")
    a.frombytes(data[: len(data) - (len(data) % 2)])
    return {
        "sample_rate": int(rate),
        "n_channels": int(n_ch),
        "bits": int(bits),
        "n_samples": len(a) // n_ch,
        "sample_abs_sum": int(sum(abs(x) for x in a)),
    }


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_abs_sum", T.LongType()),
    ]
)


def wav_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic WAV media table: one PCM-16 mono clip per
    document, rate and samples pure functions of doc_id so a SQL oracle
    re-derives every decoded value from first principles.

        sample_rate = 8000 + (doc_id % 4) * 4000
        n           = doc_id % 50 + 10
        sample[i]   = (doc_id * 131 + i * 17) % 2003 - 1001
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for did in ids:
                did = int(did)
                rate = 8000 + (did % 4) * 4000
                n = did % 50 + 10
                samples = [(did * 131 + i * 17) % 2003 - 1001 for i in range(n)]
                payloads.append(encode_wav_pcm16(rate, samples))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "audio",
                    "mime": "audio/wav",
                    "payload": payloads,
                    "meta": [{"codec": "wav"}] * len(ids),
                }
            )

    return docs.select("doc_id").mapInPandas(gen, schema=MEDIA_SCHEMA)


def _audio_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = pdf["payload"].map(lambda b: decode_wav(bytes(b)))
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "sample_rate": decoded.map(lambda d: d["sample_rate"]).astype("int32"),
                "n_channels": decoded.map(lambda d: d["n_channels"]).astype("int32"),
                "bits": decoded.map(lambda d: d["bits"]).astype("int32"),
                "n_samples": decoded.map(lambda d: d["n_samples"]).astype("int32"),
                "sample_abs_sum": decoded.map(lambda d: d["sample_abs_sum"]).astype("int64"),
            }
        )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction — the REAL WAV decode path
    (pure-stdlib codec above) with the same plumbing shape as
    extract_features."""
    return media.select("media_id", "payload").mapInPandas(
        _audio_feature_batches, schema=AUDIO_FEATURES_SCHEMA
    )


# --------------------------------------------- perceptual image dedup (aHash)
def ahash_bits(width: int, height: int, pixels: bytes, grid: int = 8) -> str:
    """Average-hash over decoded grayscale pixels, ALL-INTEGER: the
    image is partitioned into a grid×grid block grid (block (r,c) spans
    rows ⌊r·h/g⌋..⌊(r+1)·h/g⌋−1, the standard box-downsample), and bit
    (r,c) is 1 iff the block's mean exceeds the image mean — compared
    cross-multiplied (``block_sum·(w·h) > total_sum·block_n``) so no
    float ever decides a bit and a SQL oracle reproduces the hash
    exactly.  Returns the 64 bits as a '0'/'1' string (row-major), which
    sidesteps signed-long edge cases and makes banding a substring.

    Requires width ≥ grid and height ≥ grid (every block non-empty);
    production thumbnails always are — filter smaller images first."""
    if width < grid or height < grid:
        raise ValueError(f"image {width}x{height} smaller than grid {grid}")
    total = sum(pixels)
    tn = width * height
    bits = []
    for r in range(grid):
        y0, y1 = r * height // grid, (r + 1) * height // grid
        for c in range(grid):
            x0, x1 = c * width // grid, (c + 1) * width // grid
            bs = sum(
                pixels[y * width + x]
                for y in range(y0, y1)
                for x in range(x0, x1)
            )
            bn = (y1 - y0) * (x1 - x0)
            bits.append("1" if bs * tn > total * bn else "0")
    return "".join(bits)


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual hash column over the media table: decode each PNG
    payload (the REAL stdlib codec) and emit its aHash bitstring.
    Arrow-batched mapInPandas — the decode+hash is per-row Python by
    necessity (it's a codec), but batches move as Arrow and nothing
    shuffles.  Columns: (media_id, ahash)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for b in pdf["payload"]:
                d = decode_png(bytes(b), keep_pixels=True)
                hashes.append(
                    ahash_bits(d["width"], d["height"], d["pixels"], grid)
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "ahash": hashes}
            )

    return media.select("media_id", "payload").mapInPandas(
        gen, schema="media_id long, ahash string"
    )


def ahash_pairs(
    hashes: DataFrame, max_hamming: int = 2, bands: int = 8
) -> DataFrame:
    """Near-duplicate image pairs by aHash hamming distance — banded
    candidate generation exactly like SimHash text dedup: the 64-bit
    hash splits into ``bands`` substrings, pairs collide on an equi-join
    over (band_idx, band_value), and the refine computes the exact
    hamming distance JVM-side (bit_count over XOR of the two 32-bit
    halves — never per-char Python).  Pigeonhole: two hashes within
    ``bands − 1`` hamming distance MUST share an intact band, so recall
    is guaranteed for ``max_hamming < bands``.  Never all-pairs; the
    fan-out per band bucket is bounded by how many images genuinely
    share 8 identical hash bits.

    Columns: (media_a, media_b, hamming)."""
    assert max_hamming < bands, "pigeonhole guarantee needs bands > max_hamming"
    width = 64 // bands
    banded = hashes.select(
        "media_id",
        "ahash",
        F.posexplode(
            F.array(
                *[
                    F.substring("ahash", i * width + 1, width)
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band") == F.col("b.band")),
        )
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.ahash").alias("_ha"),
            F.col("b.ahash").alias("_hb"),
        )
        .distinct()
    )

    def _half(col: Column, start: int) -> Column:
        return F.conv(F.substring(col, start, 32), 2, 10).cast("long")

    ham = F.bit_count(
        _half(F.col("_ha"), 1).bitwiseXOR(_half(F.col("_hb"), 1))
    ) + F.bit_count(
        _half(F.col("_ha"), 33).bitwiseXOR(_half(F.col("_hb"), 33))
    )
    return (
        cand.select(
            "media_a", "media_b", ham.cast("long").alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
    )
