"""Multimodal columns: image/audio/video as opaque binary + metadata.

A training-data pipeline at 100 TB carries media as `binary` columns
with typed metadata structs, processed by Arrow-batched `mapInPandas`
stages. The Spark-side plumbing is real — schemas, deterministic
synthetic payload generation, UDF signatures, batch shapes, partition
behavior — and so is the container-header layer:

- synthetic image payloads are structurally real PNG byte streams
  (signature + IHDR + IDAT + IEND; CRCs zeroed — synthetic data, and
  the parser, like most fast scan paths, does not verify CRCs);
- synthetic audio payloads are canonical 44-byte-header PCM WAV files;
- :func:`parse_png_header` / :func:`parse_wav_header` recover
  width/height/duration from the RAW BYTES with the `struct`-level
  layout rules (no codec deps), so `extract_features` populates typed
  metadata from real payloads, not from trusted columns.

Decoding is REAL wherever no codec is required: uncompressed 24-bit
BMP and binary PPM pixels and 16-bit PCM-WAV samples decode in-repo
(:func:`decode_media`, `extract_features(fake_decode=False)`), with
exact-integer pixel/sample statistics a DuckDB twin reproduces
closed-form. Only entropy-coded payloads (PNG/JPEG pixel data, video)
raise NotImplementedError — their decoders (PIL/ffmpeg) are absent
from this container; `fake_decode=True` (default) derives the feature
vector deterministically from the payload digest so the distributed
path stays pinned end-to-end for every container.

`payload_sha` is sha256 over the UPPERCASE HEX of the payload (not the
raw bytes): every engine in the verification loop (Spark `sha2(hex())`,
DuckDB `sha256(upper(hex()))`, Python) can compute it over strings,
which keeps the cross-engine oracle exact. It is a fingerprint; the
encoding of the preimage is arbitrary as long as it is fixed.

Layout rule at scale: media rows are 10^3-10^6 × larger than text
rows, so media tables are partitioned by (modality, bucket(doc_id))
and feature extraction is a narrow map — never shuffle the bytes;
shuffle only the extracted features.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),  # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),  # audio/video
    ]
)

FEATURES_SCHEMA = (
    "media_id long, modality string, payload_sha string, n_bytes long, "
    "width int, height int, duration_ms int, "
    "feat array<float>, frames_sampled int"
)

FEAT_DIM = 8

_MODALITY_CODE = {"image": 1, "audio": 2, "video": 3, "jpeg": 4, "bmp": 5, "ppm": 6}

# ---------------------------------------------------------------------------
# Container headers: build + parse (pure struct layout, no codecs)
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_WAV_SAMPLE_RATE = 8000
_WAV_BYTE_RATE = 16000  # mono 16-bit @ 8 kHz


def build_png(width: int, height: int, body: bytes) -> bytes:
    """Minimal structurally-valid PNG: IHDR(8-bit truecolor) + one IDAT
    carrying `body` + IEND. Chunk CRCs are zeroed (see module doc)."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return len(data).to_bytes(4, "big") + typ + data + b"\x00\x00\x00\x00"

    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # bit depth 8, truecolor, no interlace
    )
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body) + chunk(b"IEND", b"")


def build_wav(data: bytes) -> bytes:
    """Canonical 44-byte-header PCM WAV (mono, 16-bit, 8 kHz)."""
    le32 = lambda x: x.to_bytes(4, "little")  # noqa: E731
    le16 = lambda x: x.to_bytes(2, "little")  # noqa: E731
    return (
        b"RIFF" + le32(36 + len(data)) + b"WAVE"
        + b"fmt " + le32(16) + le16(1) + le16(1)
        + le32(_WAV_SAMPLE_RATE) + le32(_WAV_BYTE_RATE) + le16(2) + le16(16)
        + b"data" + le32(len(data)) + data
    )


def parse_png_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the IHDR of a PNG byte stream, or None."""
    if len(b) < 24 or b[:8] != PNG_SIG or b[12:16] != b"IHDR":
        return None
    return int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big")


JPEG_SOI = b"\xff\xd8"


def build_jpeg(width: int, height: int, body: bytes) -> bytes:
    """Minimal structurally-valid JPEG: SOI + APP0(JFIF) + SOF0
    carrying the dimensions + SOS stub + entropy body + EOI. Huffman/
    quant tables are omitted (no pixel decode in this container) — the
    SEGMENT GRAMMAR is real, so a marker-walking parser reads it like
    any camera JPEG."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\x08"  # precision
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"  # 3 components
    )
    sos = b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00"

    def seg(marker: int, data: bytes) -> bytes:
        return b"\xff" + bytes([marker]) + (len(data) + 2).to_bytes(2, "big") + data

    return (
        JPEG_SOI + seg(0xE0, app0) + seg(0xC0, sof0) + seg(0xDA, sos)
        + body + b"\xff\xd9"
    )


def parse_jpeg_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOF0/1/2 segment of a JPEG byte
    stream via the marker walk, or None — the real JFIF grammar
    (length-prefixed segments between SOI and SOS)."""
    if len(b) < 4 or b[:2] != JPEG_SOI:
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker in (0xC0, 0xC1, 0xC2):
            if i + 9 > len(b):
                return None
            h = int.from_bytes(b[i + 5 : i + 7], "big")
            w = int.from_bytes(b[i + 7 : i + 9], "big")
            return w, h
        if marker == 0xDA:  # start of scan: entropy data follows
            return None
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        i += 2 + seg_len
    return None


def build_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Uncompressed 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    BI_RGB): a REAL decodable container with no codec — the pixel
    array is raw BGR rows, bottom-up, each row padded to 4 bytes.
    `pixels` is the flat row data (caller supplies stride-aligned
    bytes; synth widths are multiples of 4 so stride == 3·width)."""
    stride = (3 * width + 3) // 4 * 4
    data = pixels[: stride * height].ljust(stride * height, b"\x00")
    size = 54 + len(data)
    le32 = lambda x: int(x).to_bytes(4, "little", signed=True)  # noqa: E731
    le16 = lambda x: int(x).to_bytes(2, "little")  # noqa: E731
    fh = b"BM" + le32(size) + b"\x00\x00\x00\x00" + le32(54)
    ih = (
        le32(40) + le32(width) + le32(height) + le16(1) + le16(24)
        + le32(0) + le32(len(data)) + le32(2835) + le32(2835)
        + le32(0) + le32(0)
    )
    return fh + ih + data


def parse_bmp_header(b: bytes) -> tuple[int, int] | None:
    """(width, |height|) from a BITMAPINFOHEADER BMP, or None."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    return (w, abs(h)) if w > 0 and h != 0 else None


def decode_bmp_pixels(b: bytes) -> bytes | None:
    """REAL pixel decode (no codec needed — BI_RGB is uncompressed):
    flat top-down BGR bytes from a 24-bit BMP, stripping per-row
    padding and undoing the bottom-up row order. None if the payload
    is not an uncompressed 24-bit BMP."""
    wh = parse_bmp_header(b)
    if wh is None:
        return None
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0:
        return None
    w, h = wh
    top_down = int.from_bytes(b[22:26], "little", signed=True) < 0
    off = int.from_bytes(b[10:14], "little")
    stride = (3 * w + 3) // 4 * 4
    if len(b) < off + stride * h:
        return None
    rows = [b[off + r * stride : off + r * stride + 3 * w] for r in range(h)]
    if not top_down:
        rows.reverse()
    return b"".join(rows)


_PPM_HEAD = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+255\s")


def build_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6): ASCII header + raw top-down RGB bytes — the
    simplest real image container there is; no compression, ever."""
    head = f"P6\n{width} {height}\n255\n".encode("ascii")
    need = 3 * width * height
    return head + pixels[:need].ljust(need, b"\x00")


def parse_ppm_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a P6 PPM header, or None."""
    m = _PPM_HEAD.match(b[:64])
    if not m:
        return None
    return int(m.group(1)), int(m.group(2))


def decode_ppm_pixels(b: bytes) -> bytes | None:
    """Flat top-down RGB bytes from a P6 PPM, or None."""
    m = _PPM_HEAD.match(b[:64])
    if not m:
        return None
    w, h = int(m.group(1)), int(m.group(2))
    data = b[m.end() : m.end() + 3 * w * h]
    return data if len(data) == 3 * w * h else None


def decode_wav_samples(b: bytes) -> bytes | None:
    """Raw little-endian int16 PCM sample bytes from a canonical-layout
    WAV (real decode — PCM is the uncompressed case), or None."""
    if parse_wav_header(b) is None:
        return None
    audio_format = int.from_bytes(b[20:22], "little")
    bits = int.from_bytes(b[34:36], "little")
    if audio_format != 1 or bits != 16:  # non-PCM WAV needs a codec
        return None
    n_data = int.from_bytes(b[40:44], "little")
    data = b[44 : 44 + n_data]
    return data if len(data) == n_data and n_data % 2 == 0 else None


def sniff_codec(b: bytes) -> str:
    """Container sniff by magic bytes: which decode path (if any)
    applies. 'bmp'/'ppm'/'pcm_wav' have real in-repo decoders;
    'png'/'jpeg' parse headers only (entropy-coded pixels need a
    codec); 'opaque' is everything else."""
    if not b:
        return "opaque"
    if b[:2] == b"BM":
        return "bmp"
    if b[:2] == b"P6":
        return "ppm"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "pcm_wav"
    if b[:8] == PNG_SIG:
        return "png"
    if b[:2] == JPEG_SOI:
        return "jpeg"
    return "opaque"


def parse_wav_header(b: bytes) -> int | None:
    """duration_ms of a canonical-layout PCM WAV, or None."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE" or b[12:16] != b"fmt ":
        return None
    byte_rate = int.from_bytes(b[28:32], "little")
    if b[36:40] != b"data" or byte_rate <= 0:
        return None
    n_data = int.from_bytes(b[40:44], "little")
    return n_data * 1000 // byte_rate


# ---------------------------------------------------------------------------
# Synthetic media table
# ---------------------------------------------------------------------------


def synth_media(spark, documents: DataFrame, modality: str = "image") -> DataFrame:
    """Deterministic media table derived from documents; payload body =
    repeated md5 bytes of the doc text inside a REAL container header
    (PNG for image, WAV for audio; video stays an opaque stream). Every
    cell is a pure function of (doc_id, text) — a narrow map, safe at
    any scale/partitioning. Metadata columns mirror what the headers
    encode, so parse(serialize(meta)) == meta is testable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "doc_id", "modality", "payload", "mime", "width", "height", "duration_ms")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                seed = hashlib.md5((text or "").encode("utf-8")).digest()
                reps = 4 + did % 13
                width = height = duration = None
                if modality == "image":
                    width, height = 64 + (did % 8) * 32, 64 + (did % 5) * 32
                    payload = build_png(width, height, seed * reps)
                elif modality == "jpeg":
                    width, height = 64 + (did % 8) * 32, 64 + (did % 5) * 32
                    payload = build_jpeg(width, height, seed * reps)
                elif modality in ("bmp", "ppm"):
                    # UNCOMPRESSED containers: the pixel array is the
                    # digest tiled to exactly 3·w·h bytes, so the real
                    # decoder's statistics are closed-form for the
                    # DuckDB twin (widths are multiples of 4 — BMP
                    # stride 3·w needs no padding)
                    width, height = 64 + (did % 8) * 32, 64 + (did % 5) * 32
                    need = 3 * width * height
                    pix = (seed * ((need + 15) // 16))[:need]
                    payload = (
                        build_bmp(width, height, pix)
                        if modality == "bmp"
                        else build_ppm(width, height, pix)
                    )
                elif modality == "audio":
                    payload = build_wav(seed * (125 * reps))
                    duration = 125 * reps  # 2000·reps bytes / 16000 B/s
                else:  # video: opaque container
                    width, height = 64 + (did % 8) * 32, 64 + (did % 5) * 32
                    duration = 1000 + did % 9000
                    payload = seed * reps
                rows["media_id"].append(did * 10 + _MODALITY_CODE[modality])
                rows["doc_id"].append(did)
                rows["modality"].append(modality)
                rows["payload"].append(payload)
                rows["mime"].append({"image": "image/png", "jpeg": "image/jpeg", "bmp": "image/bmp", "ppm": "image/x-portable-pixmap", "audio": "audio/wav", "video": "video/mp4"}[modality])
                rows["width"].append(width)
                rows["height"].append(height)
                rows["duration_ms"].append(duration)
            yield pd.DataFrame(rows)

    return documents.select("doc_id", "text").mapInPandas(gen, schema=MEDIA)


DECODE_SCHEMA = (
    "media_id long, modality string, codec string, width int, height int, "
    "n_values long, value_sum long, value_min int, value_max int, "
    "sum_c0 long, sum_c1 long, sum_c2 long"
)


def _decoded_values(payload: bytes):
    """(codec, numpy value array) for an uncompressed container —
    uint8 pixels for BMP/PPM, signed int16 samples for PCM WAV — or
    raises NotImplementedError for payloads that genuinely need a
    codec (PNG/JPEG entropy coding, video containers)."""
    import numpy as np

    codec = sniff_codec(payload)
    if codec == "bmp":
        pix = decode_bmp_pixels(payload)
        if pix is not None:
            return codec, np.frombuffer(pix, dtype=np.uint8)
    elif codec == "ppm":
        pix = decode_ppm_pixels(payload)
        if pix is not None:
            return codec, np.frombuffer(pix, dtype=np.uint8)
    elif codec == "pcm_wav":
        data = decode_wav_samples(payload)
        if data is not None:
            return codec, np.frombuffer(data, dtype="<i2")
    raise NotImplementedError(
        f"decoding {codec!r} payloads requires a codec library not present "
        "in this container; only uncompressed BMP/PPM pixels and PCM-WAV "
        "samples decode in-repo (or use fake_decode=True for the "
        "digest-derived test path)"
    )


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode of uncompressed media payloads — pixel/sample
    statistics computed from the actual decoded values, one Arrow
    batch at a time (numpy over the flat arrays, never per-value
    Python). Per media row: (codec, width, height, n_values,
    value_sum, value_min, value_max, sum_c0..c2) where values are
    uint8 pixel bytes (BMP/PPM; channel sums by position mod 3 —
    BGR for BMP, RGB for PPM) or signed int16 PCM samples (channel
    sums NULL). All sums are exact integers, so the DuckDB twin
    reproduces them closed-form from the synth's digest tiling.
    Compressed/opaque payloads raise NotImplementedError — the
    reserved branch; filter them out upstream or route them to
    :func:`extract_features` (header parse + fake decode)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "media_id", "modality", "codec", "width", "height",
            "n_values", "value_sum", "value_min", "value_max",
            "sum_c0", "sum_c1", "sum_c2",
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                codec, vals = _decoded_values(payload)
                if codec in ("bmp", "ppm"):
                    wh = (
                        parse_bmp_header(payload)
                        if codec == "bmp"
                        else parse_ppm_header(payload)
                    )
                    w, h = wh
                    ch = vals.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                    c0, c1, c2 = (int(x) for x in ch)
                else:
                    w = h = c0 = c1 = c2 = None
                out["media_id"].append(int(mid))
                out["modality"].append(modality)
                out["codec"].append(codec)
                out["width"].append(w)
                out["height"].append(h)
                out["n_values"].append(int(vals.size))
                out["value_sum"].append(int(vals.sum(dtype=np.int64)))
                out["value_min"].append(int(vals.min()))
                out["value_max"].append(int(vals.max()))
                out["sum_c0"].append(c0)
                out["sum_c1"].append(c1)
                out["sum_c2"].append(c2)
            yield pd.DataFrame(out)

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=DECODE_SCHEMA
    )


def _real_features(vals, dim: int = FEAT_DIM) -> list[float]:
    """Feature vector from REAL decoded values: exact integer moments
    (numpy int64 sums) each finished by one double division — the
    deterministic counterpart of _fake_features for the decodable
    containers."""
    import numpy as np

    n = int(vals.size)
    s = int(vals.sum(dtype=np.int64))
    ss = int((vals.astype(np.int64) ** 2).sum())
    mn, mx = int(vals.min()), int(vals.max())
    scale = 32768.0 if vals.dtype == np.dtype("<i2") else 255.0
    feats = [
        s / n / scale,
        mn / scale,
        mx / scale,
        ss / n / (scale * scale),
        (mx - mn) / scale,
        (n % 997) / 997.0,
        (s % 9973) / 9973.0,
        1.0 if vals.dtype == np.dtype("<i2") else 0.0,
    ]
    return [round(x, 6) for x in feats[:dim]]


def _fake_features(payload: bytes, dim: int = FEAT_DIM) -> list[float]:
    """Deterministic stand-in for a decoded-image/audio feature vector:
    dim floats in [-1,1) from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(d[4 * i : 4 * i + 4], "big") / 2**31 - 1.0 for i in range(dim)]


def extract_features(
    media: DataFrame, frame_stride_ms: int = 1000, fake_decode: bool = True
) -> DataFrame:
    """Header-parse → decode → (resize/frame-sample) → feature vector,
    as one mapInPandas stage over (media_id, modality, payload,
    duration_ms).

    width/height/duration_ms in the OUTPUT come from parsing the raw
    payload bytes (PNG IHDR / JPEG SOF / BMP / PPM / WAV headers) —
    real header decoding, no codec deps; opaque containers (video)
    fall back to the metadata column.

    fake_decode=True (default) derives features from the payload
    digest so the distributed plumbing is testable for EVERY
    container. fake_decode=False decodes for REAL where no codec is
    needed — uncompressed BMP/PPM pixels and PCM-WAV samples
    (see :func:`decode_media`) — and raises NotImplementedError only
    for genuinely compressed payloads (PNG/JPEG entropy coding,
    video), whose decoders are absent from this container.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "media_id", "modality", "payload_sha", "n_bytes",
                    "width", "height", "duration_ms", "feat", "frames_sampled",
                )
            }
            for mid, modality, payload, dur in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"], pdf["duration_ms"]
            ):
                payload = bytes(payload) if payload is not None else b""
                if not fake_decode:
                    # real path: uncompressed containers decode here;
                    # compressed ones raise (codec libs absent)
                    _, _vals = _decoded_values(payload)
                    feat = _real_features(_vals)
                else:
                    feat = _fake_features(payload)
                wh = (
                    parse_png_header(payload)
                    or parse_jpeg_header(payload)
                    or parse_bmp_header(payload)
                    or parse_ppm_header(payload)
                )
                parsed_dur = parse_wav_header(payload)
                duration = (
                    parsed_dur
                    if parsed_dur is not None
                    else (int(dur) if dur is not None and not pd.isna(dur) else None)
                )
                frames = 1
                if modality in ("video", "audio") and duration is not None:
                    frames = max(1, duration // max(1, frame_stride_ms))
                out["media_id"].append(int(mid))
                out["modality"].append(modality)
                out["payload_sha"].append(
                    hashlib.sha256(payload.hex().upper().encode()).hexdigest()
                )
                out["n_bytes"].append(len(payload))
                out["width"].append(wh[0] if wh else None)
                out["height"].append(wh[1] if wh else None)
                out["duration_ms"].append(duration)
                out["feat"].append(feat)
                out["frames_sampled"].append(frames)
            yield pd.DataFrame(out)

    return media.select("media_id", "modality", "payload", "duration_ms").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def phash(features: DataFrame, bits: int = 32) -> DataFrame:
    """(media_id, bits): perceptual-hash stand-in over the decoded
    payload — bit i is the MSB of digest byte i of ``payload_sha``
    (equivalently the sign bit of the fake-decoded feature stream:
    ``_fake_features`` maps byte window 4i to a float whose sign IS
    byte 4i's MSB). A real pHash (DCT of downsampled pixels) slots in
    behind the same (media_id, bits) contract once codecs exist; the
    bit extraction here is a pure column expression over the hex
    digest — no UDF, and closed-form for the DuckDB twin."""
    b = F.transform(
        F.sequence(F.lit(0), F.lit(int(bits) - 1)),
        lambda i: (
            F.conv(F.substring("payload_sha", i * 2 + 1, 1), 16, 10)
            .cast("int") >= 8
        ).cast("int"),
    )
    return features.select("media_id", b.alias("bits"))


def phash_pairs(
    features: DataFrame, bands: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Media near-dup pairs by banded perceptual-hash blocking —
    the SimHash recipe applied to the media table: 32 hash bits in
    ``bands`` bands; a pair is a candidate iff some band matches
    exactly (hamming ≤ k with k misses spread over >k bands can be
    missed, the standard LSH trade); candidates verify by exact
    hamming ≤ ``max_hamming``. Plan: one band-keyed equi-join over
    the exploded band keys (bucket sizes O(dup-cluster), never O(N)),
    one distinct, two id-keyed joins to re-attach bits. Returns
    (id_a, id_b, hamming)."""
    assert 32 % bands == 0
    width = 32 // bands
    hb = phash(features).persist()
    bandkey = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.concat_ws(
                "",
                F.transform(
                    F.slice("bits", b * width + 1, width),
                    lambda x: x.cast("string"),
                ),
            ).alias("key"),
        ),
    )
    exploded = hb.select(
        "media_id", F.explode(bandkey).alias("bk")
    ).select("media_id", "bk.band", "bk.key")
    cand = (
        exploded.alias("a")
        .join(exploded.alias("b"), ["band", "key"])
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
        )
        .distinct()
    )
    ha = hb.select(F.col("media_id").alias("id_a"), F.col("bits").alias("bits_a"))
    hbb = hb.select(F.col("media_id").alias("id_b"), F.col("bits").alias("bits_b"))
    hamming = F.size(
        F.filter(
            F.zip_with("bits_a", "bits_b", lambda x, y: x != y),
            lambda m: m,
        )
    )
    return (
        cand.join(ha, "id_a")
        .join(hbb, "id_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= int(max_hamming))
        .select("id_a", "id_b", "hamming")
    )


def media_stats(features: DataFrame) -> DataFrame:
    """Per-modality rollup of the extracted features (the metrics-table
    shape a curation run reports)."""
    return features.groupBy("modality").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("frames_sampled").alias("total_frames"),
        F.countDistinct("payload_sha").alias("distinct_payloads"),
    )


__all__ = [
    "MEDIA", "FEATURES_SCHEMA", "FEAT_DIM",
    "build_png", "build_wav", "parse_png_header", "parse_wav_header",
    "synth_media", "extract_features", "media_stats",
    "phash", "phash_pairs",
]
