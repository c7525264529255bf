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
Arrow buffer.

Two decode paths exist (round 4 — VERDICT r3 "Next #3"):

* **Real BMP codec, no dependencies.** ``bmp_encode`` emits valid
  24-bpp BMP payloads (the standard 54-byte little-endian header +
  raw BGR pixel rows); ``bmp_decode`` parses them back with pure
  Spark built-ins — hex-nibble arithmetic over the binary column, a
  single higher-order ``aggregate`` fold for the pixel statistics —
  and ``extract_features(decode_stub=False)`` parses the same bytes
  in the Arrow/pandas path with ``struct.unpack``. The three
  implementations (builtin, pandas, and the DuckDB oracle's analytic
  expectation) are cross-checked in tests and the driver gate.
* **Real PNG codec, stdlib-only (round 12).** ``png_encode`` emits
  valid 8-bit truecolor PNGs (chunk CRCs, zlib IDAT, per-row filters
  cycling all five types); ``_png_decode_py`` walks chunks, verifies
  CRCs, inflates, and unfilters (None/Sub/Up/Average/Paeth) in the
  Arrow/pandas path. There is deliberately NO builtin-SQL PNG decode
  — zlib can't be expressed in SQL — so the oracle checks the decoded
  STATISTICS against the analytic expectation over the deterministic
  fixture bytes instead.
* **Stub decode** (``decode_stub=True``) keeps the original
  digest-derived pseudo-features for formats this container genuinely
  can't decode (JPEG/audio/video need PIL/librosa/ffmpeg).

At 100 TB: binary columns dominate size, so (a) media is read with
column pruning (select the meta first, media only where the filter
passed), (b) feature extraction repartitions by byte budget ahead of
the codec (``balance_media_bytes`` — byte-contiguous bins via the
two-phase global cumsum, oversized payloads isolated) so one task
doesn't get all the 4 K videos, (c) outputs (small features) are
written separately from inputs (big bytes) to keep downstream scans
cheap. The mapInPandas path is the real-codec scale shape (numpy over
Arrow buffers); the builtin path exists so the BMP decode is
oracle-checkable and shuffle-free.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Callable, Iterator

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


def _le_hex(expr: str, n_bytes: int) -> str:
    """SQL: little-endian hex string (2*n_bytes chars) of an int expr."""
    return "concat(" + ", ".join(
        f"lpad(hex(shiftright({expr}, {8 * i}) & 255), 2, '0')"
        for i in range(n_bytes)
    ) + ")"


# width ∈ {4,8,12,16}: 3*width ≡ 0 (mod 4), so BMP rows need no pad
# bytes and the pixel array is exactly 3*w*h bytes.
_BMP_W_SQL = "cast(4 * (1 + doc_id % 4) as int)"
_BMP_H_SQL = "cast(1 + doc_id % 5 as int)"


def bmp_encode(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic VALID 24-bpp BMP payloads from a text fixture.

    Dimensions derive from doc_id (width 4/8/12/16 × height 1..5) and
    pixel bytes from ``repeat(md5(text))`` — every byte of the output
    is reproducible from the row alone, in any engine, so a downstream
    decoder can be oracle-checked analytically. The payload is a real
    BMP: 14-byte file header ('BM', size, data offset 54), 40-byte
    BITMAPINFOHEADER (width/height/planes/24 bpp), then bottom-up BGR
    rows. Built entirely from string/hex expressions + ``unhex`` — no
    UDF, scan-only.
    """
    npix = f"(3 * ({_BMP_W_SQL}) * ({_BMP_H_SQL}))"
    # md5 hex = 32 chars; max npix = 3*16*5 = 240 bytes = 480 chars
    pix_hex = (
        f"substr(repeat(md5(coalesce({text_col}, '')), 15), 1, 2 * {npix})"
    )
    header_hex = "concat(" + ", ".join(
        [
            "'424d'",                       # magic 'BM'
            _le_hex(f"54 + {npix}", 4),     # file size
            "'00000000'",                   # reserved
            "'36000000'",                   # pixel data offset = 54
            "'28000000'",                   # DIB header size = 40
            _le_hex(_BMP_W_SQL, 4),
            _le_hex(_BMP_H_SQL, 4),
            "'0100'",                       # planes = 1
            "'1800'",                       # bpp = 24
            "'00000000'",                   # compression = none
            _le_hex(npix, 4),               # image size
            "'0b130000'", "'0b130000'",     # 2835 ppm (~72 dpi)
            "'00000000'", "'00000000'",     # palette counts
        ]
    ) + ")"
    media = F.unhex(F.expr(f"concat({header_hex}, {pix_hex})"))
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("image/bmp").alias("mime"),
            F.length(media).cast("bigint").alias("n_bytes"),
            F.sha2(media, 256).alias("sha"),
        ).alias("media_meta"),
    )


def _nib(hx: str, pos: str) -> str:
    """SQL: value 0-15 of the hex char of ``hx`` at 1-based ``pos`` —
    instr-based, portable to DuckDB (same trick as the simhash oracle,
    dedup._hexval)."""
    return f"(instr('0123456789abcdef', substr({hx}, {pos}, 1)) - 1)"


def _byte(hx: str, idx: str) -> str:
    """SQL: byte value at 0-based byte index ``idx`` of hex string."""
    return f"(16 * {_nib(hx, f'2 * ({idx}) + 1')} + {_nib(hx, f'2 * ({idx}) + 2')})"


def _le_int(hx: str, off: int, n_bytes: int) -> str:
    """SQL: little-endian unsigned int from byte offset ``off``."""
    return "(" + " + ".join(
        f"{256 ** i} * {_byte(hx, str(off + i))}" for i in range(n_bytes)
    ) + ")"


def bmp_decode(media_df: DataFrame, media_col: str = "media") -> DataFrame:
    """Parse 24-bpp BMP headers + pixel statistics with pure built-ins.

    Everything is per-row hex-nibble arithmetic: header fields are
    little-endian reads at the fixed BMP offsets, and the B/G/R channel
    sums come from ONE higher-order ``aggregate`` fold over the pixel
    byte indices (channel = index mod 3; bottom-up row order doesn't
    affect channel phase because rows are a multiple of 3 bytes). No
    UDF, no explode, no shuffle — a scan-only operator whose output is
    reproducible in the DuckDB oracle.

    Returns doc_id, width, height, bpp, n_pixel_bytes, mean_b/g/r,
    mean_all (ROUND 6 — sums of ≤2^53 integers are exact in double, so
    the division is engine-identical). Non-BMP payloads (bad magic)
    yield NULL fields rather than an error.
    """
    hx = "hx"
    d = media_df.select(
        "doc_id",
        F.expr(f"lower(hex({media_col}))").alias("hx"),
        F.expr(f"octet_length({media_col})").alias("n_total"),
    )
    width = _le_int(hx, 18, 4)
    height = _le_int(hx, 22, 4)
    bpp = _le_int(hx, 28, 2)
    off = _le_int(hx, 10, 4)
    comp = _le_int(hx, 30, 4)
    d = d.select(
        "doc_id",
        "hx",
        F.expr(f"substr(hx, 1, 4) = '424d'").alias("has_magic"),
        F.expr(width).cast("int").alias("width"),
        F.expr(height).cast("int").alias("height"),
        F.expr(bpp).cast("int").alias("bpp"),
        F.expr(off).cast("int").alias("data_off"),
        F.expr(comp).cast("int").alias("compression"),
        F.col("n_total"),
    ).withColumn(
        "n_pixel_bytes", F.expr("cast(n_total - data_off as int)")
    ).withColumn(
        # Magic alone is not enough: a truncated or header-only payload
        # must NULL out here exactly like _bmp_decode_py rejects it,
        # and an empty pixel array would make sequence(0, -1) descend.
        # biCompression != 0 (BI_RLE/BI_BITFIELDS) would make the pixel
        # array something other than raw BGR rows — refuse, don't
        # mis-decode (same gate in _bmp_decode_py keeps the paths
        # bit-identical).
        "is_bmp",
        F.expr(
            "has_magic AND n_total >= 54 AND compression = 0"
            " AND data_off BETWEEN 54 AND n_total AND n_pixel_bytes > 0"
        ),
    )
    # one fold: struct accumulator of the three channel sums
    byte_at = _byte(hx, "(data_off + i)")
    sums = F.expr(
        "aggregate("
        "  sequence(0, n_pixel_bytes - 1),"
        "  named_struct('b', cast(0 as bigint), 'g', cast(0 as bigint),"
        "               'r', cast(0 as bigint)),"
        "  (acc, i) -> named_struct("
        f"    'b', acc.b + if(i % 3 = 0, {byte_at}, 0),"
        f"    'g', acc.g + if(i % 3 = 1, {byte_at}, 0),"
        f"    'r', acc.r + if(i % 3 = 2, {byte_at}, 0))"
        ")"
    )
    d = d.withColumn("s", F.when(F.col("is_bmp"), sums))
    n_ch = F.col("n_pixel_bytes") / 3
    return d.select(
        "doc_id",
        F.when(F.col("is_bmp"), F.col("width")).alias("width"),
        F.when(F.col("is_bmp"), F.col("height")).alias("height"),
        F.when(F.col("is_bmp"), F.col("bpp")).alias("bpp"),
        F.when(F.col("is_bmp"), F.col("n_pixel_bytes")).alias("n_pixel_bytes"),
        F.round(F.col("s.b") / n_ch, 6).alias("mean_b"),
        F.round(F.col("s.g") / n_ch, 6).alias("mean_g"),
        F.round(F.col("s.r") / n_ch, 6).alias("mean_r"),
        F.round(
            (F.col("s.b") + F.col("s.g") + F.col("s.r"))
            / F.col("n_pixel_bytes"),
            6,
        ).alias("mean_all"),
    )


def _bmp_decode_py(payload: bytes) -> dict | None:
    """Pure-Python BMP parse for the Arrow/pandas path — the shape a
    real codec (PIL/ffmpeg) would slot into. struct.unpack only."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    # Same guard as the SQL path's is_bmp: pixel data must start after
    # the header and be non-empty, else both decoders return NULL/None.
    # A non-zero biCompression (BI_RLE8/BI_BITFIELDS/...) means the
    # pixel array is NOT raw BGR rows — refuse rather than mis-decode.
    if struct.unpack_from("<I", payload, 30)[0] != 0:
        return None
    if data_off < 54 or data_off > len(payload):
        return None
    pix = payload[data_off:]
    if not pix:
        return None
    import numpy as np

    # exact integer channel sums (stride views, int64 — bit-identical
    # to the former per-byte loop, ~100x less Python time per MB)
    a = np.frombuffer(pix, np.uint8)
    sums = [int(a[c::3].sum(dtype=np.int64)) for c in range(3)]
    n_ch = len(pix) / 3
    return {
        "width": width,
        "height": height,
        "bpp": bpp,
        "n_pixel_bytes": len(pix),
        "mean_b": round(sums[0] / n_ch, 6),
        "mean_g": round(sums[1] / n_ch, 6),
        "mean_r": round(sums[2] / n_ch, 6),
        "mean_all": round(sum(sums) / len(pix), 6),
    }


# WAV fixture dimensions from doc_id: mono/stereo, three common rates,
# 16..40 samples per channel. Total PCM bytes = 2*nch*nsamp <= 160,
# within the 240-byte md5-repeat capacity shared with the BMP fixture.
_WAV_NCH_SQL = "cast(1 + doc_id % 2 as int)"
_WAV_RATE_SQL = "cast(element_at(array(8000, 16000, 44100), cast(doc_id % 3 as int) + 1) as int)"
_WAV_NSAMP_SQL = "cast(16 + doc_id % 25 as int)"


def wav_encode(
    docs: DataFrame, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Deterministic VALID PCM WAV payloads from a text fixture
    — the AUDIO modality made real (round 12), same construction idea
    as :func:`bmp_encode`: a RIFF/WAVE container is fixed-offset
    little-endian, so the whole file (12-byte RIFF header, 24-byte fmt
    chunk, 8-byte data chunk header, PCM samples) is hex/string
    expressions + ``unhex`` — no UDF, scan-only. Channels (1/2),
    sample rate (8/16/44.1 kHz) and per-channel sample count derive
    from doc_id; the interleaved sample bytes are the
    ``repeat(md5(text))`` stream, so a decoder's output is
    analytically oracle-checkable from the row alone. ``bits=8``
    (round 13) emits the legacy unsigned width — one md5 byte per
    sample — with the same header arithmetic at width 1."""
    if bits not in (8, 16):
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    step = bits // 8
    nch, rate, nsamp = _WAV_NCH_SQL, _WAV_RATE_SQL, _WAV_NSAMP_SQL
    data_bytes = f"({step} * ({nch}) * ({nsamp}))"
    pcm_hex = (
        f"substr(repeat(md5(coalesce({text_col}, '')),"
        f" 15), 1, 2 * {data_bytes})"
    )
    header_hex = "concat(" + ", ".join(
        [
            "'52494646'",                          # 'RIFF'
            # riff size counts the word-alignment pad after an odd
            # data chunk (reachable only at 8-bit mono)
            _le_hex(f"36 + {data_bytes} + ({data_bytes} % 2)", 4),
            "'57415645'",                          # 'WAVE'
            "'666d7420'",                          # 'fmt '
            "'10000000'",                          # fmt chunk size = 16
            "'0100'",                              # audio format = PCM
            _le_hex(nch, 2),
            _le_hex(rate, 4),
            _le_hex(f"({rate}) * ({nch}) * {step}", 4),  # byte rate
            _le_hex(f"({nch}) * {step}", 2),             # block align
            _le_hex(str(bits), 2),                       # bits per sample
            "'64617461'",                                # 'data'
            _le_hex(data_bytes, 4),
        ]
    ) + ")"
    pad_hex = f"if(({data_bytes}) % 2 = 1, '00', '')"
    media = F.unhex(
        F.expr(f"concat({header_hex}, {pcm_hex}, {pad_hex})")
    )
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.lit("audio").alias("kind"),
            F.lit("audio/wav").alias("mime"),
            F.length(media).cast("bigint").alias("n_bytes"),
            F.sha2(media, 256).alias("sha"),
        ).alias("media_meta"),
    )


def wav_decode(media_df: DataFrame, media_col: str = "media") -> DataFrame:
    """Parse PCM WAV headers + sample statistics with pure
    built-ins — the audio twin of :func:`bmp_decode`. Header fields
    are little-endian reads at the fixed canonical-layout offsets
    (RIFF + fmt at 12 + data chunk at 36 — the layout
    :func:`wav_encode` and most PCM writers emit); samples are folded
    in ONE higher-order ``aggregate`` (sum + sum of squares, exact
    integer arithmetic well under 2^53), so mean and RMS divide
    exactly the same in any engine. Both common PCM widths decode:
    signed 16-bit, and unsigned 8-bit (round 13 — the legacy width;
    samples read as ``byte - 128`` per the format's midpoint
    convention). No UDF, no explode, no shuffle.

    Returns doc_id, n_channels, sample_rate, n_samples (per channel),
    mean_pcm (round 6), rms_pcm (round 6). Non-WAV / truncated /
    non-PCM / other-bit-depth payloads yield NULL fields rather than
    an error — and bit-identically to :func:`_wav_decode_py`, the
    module's cross-path contract."""
    d = media_df.select(
        "doc_id",
        F.expr(f"lower(hex({media_col}))").alias("hx"),
        F.expr(f"octet_length({media_col})").alias("n_total"),
    )
    hx = "hx"
    nch = _le_int(hx, 22, 2)
    rate = _le_int(hx, 24, 4)
    bits = _le_int(hx, 34, 2)
    fmt = _le_int(hx, 20, 2)
    dsz = _le_int(hx, 40, 4)
    d = d.select(
        "doc_id",
        "hx",
        F.expr(
            "substr(hx, 1, 8) = '52494646'"          # RIFF
            " AND substr(hx, 17, 8) = '57415645'"    # WAVE
            " AND substr(hx, 25, 8) = '666d7420'"    # 'fmt ' @ offset 12
            " AND substr(hx, 73, 8) = '64617461'"    # data @ offset 36
        ).alias("has_magic"),
        F.expr(nch).cast("int").alias("n_channels"),
        F.expr(rate).cast("int").alias("sample_rate"),
        F.expr(bits).cast("int").alias("bits"),
        F.expr(fmt).cast("int").alias("fmt"),
        F.expr(dsz).cast("int").alias("data_bytes"),
        F.col("n_total"),
    ).withColumn(
        "is_wav",
        F.expr(
            "has_magic AND fmt = 1 AND (bits = 16 OR bits = 8)"
            " AND n_channels >= 1 AND data_bytes > 0"
            " AND data_bytes % ((bits DIV 8) * n_channels) = 0"
            # an odd-sized data chunk (reachable only at 8-bit mono)
            # carries an optional RIFF word-alignment pad byte after it
            " AND (n_total = 44 + data_bytes"
            "      OR (data_bytes % 2 = 1"
            "          AND n_total = 45 + data_bytes))"
        ),
    )
    # signed int16 sample k lives at data offset 2k (file offset 44+2k)
    lo = _byte(hx, "(44 + 2 * k)")
    hi = _byte(hx, "(45 + 2 * k)")
    sample = f"(({lo}) + 256 * ({hi}))"
    signed = f"(if({sample} >= 32768, {sample} - 65536, {sample}))"
    def _wav_sums(last_k: str, sample_expr: str):
        # ONE copy of the exact-integer fold scaffolding — both widths
        # must keep identical accumulator shape for cross-path parity
        return F.expr(
            "aggregate("
            f"  sequence(0, {last_k}),"
            "  named_struct('s', cast(0 as bigint), 'q', cast(0 as bigint)),"
            f"  (acc, k) -> named_struct("
            f"    's', acc.s + {sample_expr},"
            f"    'q', acc.q + cast({sample_expr} as bigint) * {sample_expr})"
            ")"
        )

    sums16 = _wav_sums("cast(data_bytes / 2 as int) - 1", signed)
    # unsigned 8-bit sample k at data offset k: midpoint-128 signed
    signed8 = f"(({_byte(hx, '(44 + k)')}) - 128)"
    sums8 = _wav_sums("data_bytes - 1", signed8)
    d = d.withColumn(
        "agg",
        F.when(F.col("is_wav") & (F.col("bits") == 16), sums16).when(
            F.col("is_wav") & (F.col("bits") == 8), sums8
        ),
    )
    n = F.col("data_bytes") / (F.col("bits") / 8)
    return d.select(
        "doc_id",
        F.when(F.col("is_wav"), F.col("n_channels")).alias("n_channels"),
        F.when(F.col("is_wav"), F.col("sample_rate")).alias("sample_rate"),
        F.when(
            F.col("is_wav"),
            (
                F.col("data_bytes")
                / ((F.col("bits") / 8) * F.col("n_channels"))
            ).cast("int"),
        ).alias("n_samples"),
        F.round(F.col("agg.s") / n, 6).alias("mean_pcm"),
        F.round(F.sqrt(F.col("agg.q") / n), 6).alias("rms_pcm"),
    )


def _wav_decode_py(payload: bytes) -> dict | None:
    """Pure-Python WAV parse for the Arrow/pandas path — mirrors
    :func:`wav_decode`'s canonical-layout contract and statistics
    bit-for-bit (struct.unpack + exact integer sums)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    if payload[12:16] != b"fmt " or payload[36:40] != b"data":
        return None
    fmt, nch = struct.unpack_from("<HH", payload, 20)
    rate = struct.unpack_from("<I", payload, 24)[0]
    bits = struct.unpack_from("<H", payload, 34)[0]
    dsz = struct.unpack_from("<I", payload, 40)[0]
    if (
        fmt != 1
        or bits not in (8, 16)
        or nch < 1
        or dsz <= 0
        or dsz % ((bits // 8) * nch) != 0
        # spec-compliant writers pad an odd data chunk to a word
        # boundary; accept both the padded and unpadded forms, exactly
        # like the SQL path
        or len(payload) not in (
            {44 + dsz, 45 + dsz} if dsz % 2 else {44 + dsz}
        )
    ):
        return None
    n = dsz // (bits // 8)
    import numpy as np

    if bits == 16:
        arr = np.frombuffer(payload, "<i2", count=n, offset=44)
    else:  # unsigned 8-bit PCM: midpoint-128 signed, like the SQL path
        arr = (
            np.frombuffer(payload, np.uint8, count=dsz, offset=44)
            .astype(np.int16) - 128
        )
    # exact int64 sums (|v| <= 32768, v^2 <= 2^30; even 2^32 samples
    # stay far under 2^63) — bit-identical to the former Python sums.
    # 'samples' stays the numpy int16 array: materializing n Python
    # ints per payload was the remaining per-byte cost in the decode
    # hot path (review r14), and the only consumer (_wav_resample_py)
    # indexes it vectorized.
    a64 = arr.astype(np.int64)
    s = int(a64.sum())
    q = int((a64 * a64).sum())
    samples = arr
    import math

    # math.sqrt is the IEEE correctly-rounded square root — identical
    # to Spark's and DuckDB's sqrt; pow(x, 0.5) may differ in the last
    # ulp on some platforms, which a cross-engine hash would catch
    return {
        "n_channels": nch,
        "sample_rate": rate,
        "n_samples": n // nch,
        "bits": bits,
        "mean_pcm": round(s / n, 6),
        "rms_pcm": round(math.sqrt(q / n), 6),
        "samples": samples,  # interleaved, for resample_audio
    }


def _wav_encode_py(
    samples, nch: int, rate: int, bits: int = 16
) -> bytes:
    """Minimal VALID PCM WAV from interleaved midpoint-signed samples —
    the canonical layout :func:`wav_decode` parses (RIFF + fmt at 12 +
    data at 36). ``bits=16`` packs signed int16; ``bits=8`` packs the
    unsigned legacy width (sample + 128)."""
    if bits == 16:
        body = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        body = bytes(v + 128 for v in samples)
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    step = bits // 8
    pad = b"\x00" if len(body) % 2 else b""  # RIFF word alignment
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body) + len(pad)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, nch, rate, rate * nch * step, nch * step, bits
    )
    hdr += b"data" + struct.pack("<I", len(body))
    return hdr + body + pad


def _wav_resample_py(payload: bytes, target_rate: int) -> bytes | None:
    """Nearest-neighbor sample-rate conversion of a PCM WAV (8- or
    16-bit, re-encoded at the SOURCE width) — the audio analogue of
    :func:`_bmp_resize_py`'s pixel selection: output frame ``j``
    copies input frame ``(j * n_in) // n_out`` whole (all channels),
    with ``n_out = max(1, n_in * target // source)``. Real decode,
    deterministic selection, real re-encode; None for anything the
    decoder refuses."""
    parsed = _wav_decode_py(payload)
    if parsed is None:
        return None
    import numpy as np

    nch = parsed["n_channels"]
    n_in = parsed["n_samples"]
    src = np.asarray(parsed["samples"], dtype=np.int16)
    n_out = max(1, (n_in * target_rate) // parsed["sample_rate"])
    # vectorized frame selection: output frame j copies input frame
    # (j * n_in) // n_out whole (all channels)
    idx = (np.arange(n_out, dtype=np.int64) * n_in) // n_out
    out = src.reshape(n_in, nch)[idx].reshape(-1)
    return _wav_encode_py(out, nch, target_rate, bits=parsed["bits"])


def resample_audio(
    media_df: DataFrame, target_rate: int, decode_stub: bool = True
) -> DataFrame:
    """Resample audio media to ``target_rate`` via Arrow-batched
    mapInPandas — the audio face of :func:`resize_media`, emitting the
    (media, media_meta) convention back out (new bytes, refreshed
    ``n_bytes``/``sha``) plus the output geometry, so resamples compose
    with decode / feature-extract / frame-sample on the same contract.

    ``decode_stub=False`` runs the REAL dependency-free WAV
    nearest-neighbor converter (``_wav_resample_py``); identity-rate
    resamples round-trip the sample array byte-for-byte and outputs
    re-parse under both decoders. Non-WAV formats raise ValueError
    (MP3/AAC need external codecs); the stub path keeps the plumbing
    real for them, sized as the real output would be."""
    if target_rate < 1:
        raise ValueError(f"target_rate must be >= 1, got {target_rate}")

    schema = (
        "doc_id BIGINT, media BINARY, "
        "media_meta STRUCT<kind: STRING, mime: STRING, n_bytes: BIGINT, "
        "sha: STRING>, n_channels INT, sample_rate INT, n_samples INT"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.media)
                meta = rec.media_meta
                if decode_stub:
                    digest = hashlib.sha256(
                        payload + struct.pack("<i", target_rate)
                    ).digest()
                    n = 44 + 2 * (1 + digest[0] % 64)
                    resampled = (digest * (n // len(digest) + 1))[:n]
                    mime = meta["mime"]
                    nch = n_out = None
                else:
                    maybe = _wav_resample_py(payload, target_rate)
                    if maybe is None:
                        raise ValueError(
                            "unsupported media format (only 8/16-bit "
                            "PCM WAV resamples dependency-free; "
                            "MP3/AAC need external codecs)"
                        )
                    resampled = maybe
                    mime = "audio/wav"
                    d = _wav_decode_py(resampled)
                    nch, n_out = d["n_channels"], d["n_samples"]
                rows.append(
                    {
                        "doc_id": rec.doc_id,
                        "media": resampled,
                        "media_meta": {
                            "kind": meta["kind"],
                            "mime": mime,
                            "n_bytes": len(resampled),
                            "sha": hashlib.sha256(resampled).hexdigest(),
                        },
                        "n_channels": nch,
                        "sample_rate": target_rate,
                        "n_samples": n_out,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media", "media_meta",
                    "n_channels", "sample_rate", "n_samples",
                ],
            )

    return media_df.mapInPandas(run, schema=schema)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    """One PNG chunk: big-endian length, type, data, CRC32(type+data)."""
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9, filter type 4): the neighbor
    (left, above, upper-left) closest to the linear estimate a+b-c,
    ties broken left → above → upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_row(
    ftype: int, raw: bytes, prev: bytes, bpp: int = 3
) -> bytes:
    """Apply PNG filter ``ftype`` to one raw scanline (encoder side).
    ``prev`` is the previous RAW (unfiltered) row — zeros for the first
    row, per spec."""
    out = bytearray(len(raw))
    for i in range(len(raw)):
        a = raw[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        x = raw[i]
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return bytes(out)


def _png_unfilter_row(
    ftype: int, filt: bytes, prev: bytes, bpp: int = 3
) -> bytes | None:
    """Reverse one scanline's filter (decoder side). None (0) is a
    copy; Up (2) is a wrapping uint8 add of the prior row; Sub (1) is
    a per-channel mod-256 prefix sum (``np.add.accumulate`` at uint8
    wraps exactly the filter's arithmetic) — all three vectorized
    (round 14, found by the media_throughput bench row). Average (3)
    and Paeth (4) stay plain loops: each byte needs the RECONSTRUCTED
    byte ``bpp`` back through a nonlinear step, so reconstruction is
    inherently sequential within the row; the PARALLELISM for those
    lives a level up — one Arrow batch of payloads per mapInPandas
    task. None for an undefined filter type."""
    if ftype > 4:
        return None
    if ftype == 0:
        return bytes(filt)
    import numpy as np

    if ftype == 2:
        return (
            np.frombuffer(filt, np.uint8) + np.frombuffer(prev, np.uint8)
        ).tobytes()
    if ftype == 1:
        f = np.frombuffer(filt, np.uint8).copy()
        for c in range(bpp):
            np.add.accumulate(f[c::bpp], dtype=np.uint8, out=f[c::bpp])
        return f.tobytes()
    out = bytearray(len(filt))
    for i in range(len(filt)):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        f = filt[i]
        if ftype == 3:
            out[i] = (f + (a + b) // 2) & 0xFF
        else:
            out[i] = (f + _paeth(a, b, c)) & 0xFF
    return bytes(out)


def _png_encode_py(
    pixels: bytes, w: int, h: int, filters: list[int] | None = None
) -> bytes:
    """Minimal VALID 8-bit truecolor (color type 2) PNG from raw RGB
    rows (top-down, 3*w*h bytes): signature, IHDR, one zlib IDAT, IEND,
    correct CRCs. ``filters`` picks the per-row filter type (default
    all 0) — the fixture varies it so decoders must implement the full
    unfilter set, while the RECONSTRUCTED pixels stay byte-identical
    whatever the filter choice."""
    if len(pixels) != 3 * w * h:
        raise ValueError(f"need {3 * w * h} pixel bytes, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    prev = bytes(3 * w)
    scan = bytearray()
    for j in range(h):
        row = pixels[3 * w * j : 3 * w * (j + 1)]
        ft = filters[j] if filters is not None else 0
        scan.append(ft)
        scan += _png_filter_row(ft, row, prev)
        prev = row
    idat = zlib.compress(bytes(scan), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


# Adam7 pass geometry (PNG spec §8.2): (x_start, y_start, x_step,
# y_step) per pass — each pass is filtered as its own sub-image
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_deinterlace(
    raw: bytes, w: int, h: int, bpp: int
) -> bytes | None:
    """Reassemble an Adam7-interlaced IDAT stream: each non-empty pass
    carries its own filtered scanlines (one filter byte per PASS row,
    unfiltered against the pass's previous row), whose pixels scatter
    onto the canvas at (x0 + i*dx, y0 + j*dy). None on a length
    mismatch or an undefined filter byte."""
    import numpy as np

    canvas = np.zeros((h, w, bpp), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = bpp * pw
        prev = bytes(stride)
        for j in range(ph):
            if pos + 1 + stride > len(raw):
                return None
            row = _png_unfilter_row(
                raw[pos], raw[pos + 1 : pos + 1 + stride], prev, bpp=bpp
            )
            if row is None:
                return None
            pos += 1 + stride
            # one strided numpy assignment per pass row (the unfilter
            # itself is inherently sequential; the scatter is not)
            canvas[y0 + j * dy, x0::dx] = np.frombuffer(
                row, np.uint8
            ).reshape(pw, bpp)
            prev = row
    if pos != len(raw):
        return None  # trailing bytes the pass geometry cannot explain
    return canvas.tobytes()


def _png_decode_py(payload: bytes) -> dict | None:
    """Real dependency-free PNG decode (round 12 — VERDICT r11 Next
    #3): chunk walk with CRC verification, IHDR parse, IDAT concat,
    stdlib ``zlib`` inflate, full per-row unfilter (None/Sub/Up/
    Average/Paeth), then the same channel statistics the BMP decoder
    computes. Returns the raw reconstructed pixel bytes too, so resize
    can reuse the parse.

    Scope: 8-bit truecolor (color type 2 — the format
    :func:`png_encode` emits and the common ML-corpus storage shape),
    8-bit GRAYSCALE (color type 0, round 13) and 8-bit PALETTE (color
    type 3 + PLTE, round 13), plain or ADAM7-interlaced (round 13 —
    each pass unfiltered as its own sub-image, pixels scattered back
    through the §8.2 geometry); grayscale and palette pixels are
    expanded to RGB so the statistics, the ``pixels`` buffer, and
    resize share one shape. Alpha / 16-bit / a palette index past
    PLTE return None (the codec refuses rather than mis-decodes), as
    does any CRC or length corruption.
    Channel order is RGB per the PNG spec (the BMP twin is BGR — the
    shared feature convention keeps the [b, g, r, all] slot
    order)."""
    import numpy as np

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        return None
    pos = 8
    idat = bytearray()
    plte = None
    w = h = None
    bit_depth = color_type = interlace = None
    seen_end = False
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + ln > len(payload):
            return None  # truncated chunk (data or CRC cut short)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if crc != zlib.crc32(typ + data) & 0xFFFFFFFF:
            return None
        if typ == b"IHDR":
            if ln != 13:
                return None
            w, h, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif typ == b"PLTE":
            if ln == 0 or ln % 3 or ln > 768:
                return None
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            seen_end = True
            break
        pos += 12 + ln
    if (
        not seen_end
        or w is None
        or w <= 0
        or h <= 0
        or bit_depth != 8
        or color_type not in (0, 2, 3)
        or interlace not in (0, 1)
        or (color_type == 3 and plte is None)
    ):
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    bpp = 3 if color_type == 2 else 1
    if interlace == 1:
        deinterlaced = _png_deinterlace(raw, w, h, bpp)
        if deinterlaced is None:
            return None
        planes = bytearray(deinterlaced)
    else:
        stride = bpp * w
        if len(raw) != (stride + 1) * h:
            return None
        planes = bytearray()
        prev = bytes(stride)
        for j in range(h):
            off = j * (stride + 1)
            row = _png_unfilter_row(
                raw[off], raw[off + 1 : off + 1 + stride], prev, bpp=bpp
            )
            if row is None:
                return None
            planes += row
            prev = row
    if color_type == 2:
        pixels = bytes(planes)
    elif color_type == 0:  # grayscale: r = g = b = v
        pixels = bytes(
            np.repeat(np.frombuffer(bytes(planes), np.uint8), 3)
        )
    else:  # palette lookup, refusing out-of-range indices
        idx = np.frombuffer(bytes(planes), np.uint8)
        n_colors = len(plte) // 3
        if idx.size and int(idx.max()) >= n_colors:
            return None
        pixels = bytes(
            np.frombuffer(plte, np.uint8).reshape(-1, 3)[idx].reshape(-1)
        )
    arr = np.frombuffer(pixels, np.uint8).reshape(-1, 3)
    sums = [int(s) for s in arr.sum(axis=0, dtype=np.int64)]
    n_ch = arr.shape[0]
    return {
        "width": w,
        "height": h,
        "bpp": 24,
        "n_pixel_bytes": len(pixels),
        "mean_r": round(sums[0] / n_ch, 6),
        "mean_g": round(sums[1] / n_ch, 6),
        "mean_b": round(sums[2] / n_ch, 6),
        "mean_all": round(sum(sums) / len(pixels), 6),
        "pixels": pixels,
    }


def png_encode(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic VALID PNG payloads from a text fixture — the PNG
    twin of :func:`bmp_encode`, same dimensions (width 4/8/12/16 ×
    height 1..5 from doc_id) and the SAME md5-derived pixel byte
    stream, so the analytic oracle for the decoded statistics is shared
    arithmetic. Each row's filter type cycles ``(doc_id + row) % 5``,
    so the corpus exercises every PNG filter (None/Sub/Up/Average/
    Paeth) and a decoder that shortcuts the unfilter cannot match.

    PNG needs zlib + CRC32, which SQL built-ins can't express, so the
    encoder runs as Arrow-batched ``mapInPandas`` (unlike the
    hex-expression BMP encoder) — map-only, no shuffle; the payloads
    it emits are what the REAL decode path is certified against."""
    src = docs.select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("ptext")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                doc_id = int(rec.doc_id)
                w = 4 * (1 + doc_id % 4)
                h = 1 + doc_id % 5
                digest = hashlib.md5(rec.ptext.encode("utf-8")).digest()
                pixels = (digest * 15)[: 3 * w * h]
                filters = [(doc_id + j) % 5 for j in range(h)]
                payload = _png_encode_py(pixels, w, h, filters)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media": payload,
                        "media_meta": {
                            "kind": "image",
                            "mime": "image/png",
                            "n_bytes": len(payload),
                            "sha": hashlib.sha256(payload).hexdigest(),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media", "media_meta"])

    schema = (
        "doc_id BIGINT, media BINARY, "
        "media_meta STRUCT<kind: STRING, mime: STRING, n_bytes: BIGINT, "
        "sha: STRING>"
    )
    return src.mapInPandas(run, schema=schema)


# ---- GIF (round 13): the multi-frame image modality, stdlib-only ----------

# fixed 256-entry palette (r, g, b) = (37i, 59i, 83i) mod 256 — affine
# in the palette index, so an analytic SQL oracle can recompute channel
# statistics from the index stream without ever decoding a GIF
_GIF_PALETTE = bytes(
    v for i in range(256) for v in ((37 * i) % 256, (59 * i) % 256, (83 * i) % 256)
)


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """GIF-flavor LZW compress (GIF89a spec appendix F): variable-width
    codes LSB-first, clear/EOI codes, width grows when the just-assigned
    code reaches 2^width (the encoder side of the 'early change'
    off-by-one — the decoder bumps one code earlier, at 2^width - 1,
    because it learns each entry one code later), hard reset via a
    CLEAR code when the table hits 4096."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    buf = nbits = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    emit(clear)
    if indices:
        cur = indices[:1]
        for ch in indices[1:]:
            nxt = cur + bytes([ch])
            if nxt in table:
                cur = nxt
                continue
            emit(table[cur])
            if next_code < 4096:
                table[nxt] = next_code
                if next_code == (1 << width) and width < 12:
                    width += 1
                next_code += 1
            else:
                emit(clear)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = mcs + 1
            cur = bytes([ch])
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, max_out: int) -> bytes | None:
    """GIF-flavor LZW decompress: the exact inverse of
    :func:`_lzw_encode`, plus the KwKwK case (a code equal to the next
    unassigned entry decodes as prev + prev[0]) any conformant encoder
    may emit. None on a malformed stream (bad code, no EOI before the
    bits run out, or more than ``max_out`` bytes — the pixel count from
    the image descriptor bounds the output, so a corrupt stream cannot
    balloon memory)."""
    if not 2 <= mcs <= 8:
        return None
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    # the base table is immutable bytes objects — a shallow list copy
    # per CLEAR instead of re-minting 2^mcs bytes objects (the
    # media_throughput row showed LZW as the GIF floor; this and the
    # local-variable caching below are allocation-level only, the
    # code-by-code algorithm is untouched)
    base: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = base.copy()
    n_table = len(table)
    out = bytearray()
    out_len = 0
    prev: bytes | None = None
    buf = nbits = pos = 0
    data_len = len(data)
    mask = (1 << width) - 1
    while True:
        while nbits < width:
            if pos >= data_len:
                return None  # bits exhausted before EOI
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = buf & mask
        buf >>= width
        nbits -= width
        if code >= n_table:
            if code == n_table and prev is not None:
                entry = prev + prev[:1]  # KwKwK
            else:
                return None
        elif code == clear:
            table = base.copy()
            n_table = len(table)
            width = mcs + 1
            mask = (1 << width) - 1
            prev = None
            continue
        elif code == eoi:
            return bytes(out)
        else:
            entry = table[code]
        if prev is not None and n_table < 4096:
            table.append(prev + entry[:1])
            n_table += 1
            # just-assigned code == 2^width - 1: the decoder bumps
            # one code EARLIER than the encoder (it learns each
            # entry one code later), so the next read fits
            if n_table == (1 << width) and width < 12:
                width += 1
                mask = (1 << width) - 1
        out += entry
        out_len += len(entry)
        if out_len > max_out:
            return None
        prev = entry


def _gif_interlace_order(h: int) -> list[int]:
    """GIF89a appendix E interlace row order: pass 1 every 8th row from
    0, pass 2 every 8th from 4, pass 3 every 4th from 2, pass 4 every
    2nd from 1 — the order interlaced frames STORE their rows in."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def _gif_pad_palette(palette: bytes) -> tuple[bytes, int]:
    """Pad an RGB palette to the next power-of-two entry count (>= 2,
    the GIF encoding's only legal sizes) and return (padded bytes, the
    size-field exponent n where entries = 2^(n+1)). Palettes beyond
    the format's 256-entry ceiling raise — the 3-bit size field cannot
    express them, and ORing a larger exponent in would silently emit a
    corrupt header."""
    if len(palette) > 768:
        raise ValueError(
            f"GIF palettes hold at most 256 entries (768 bytes), got "
            f"{len(palette)} bytes"
        )
    entries = max(2, (len(palette) + 2) // 3)
    n = max(0, (entries - 1).bit_length() - 1)
    if (1 << (n + 1)) < entries:
        n += 1
    full = 3 * (1 << (n + 1))
    return palette + bytes(full - len(palette)), n


def _gif_encode_py(
    frames: list[bytes],
    w: int,
    h: int,
    palette: bytes | None = _GIF_PALETTE,
    frame_palettes: list[bytes | None] | None = None,
    interlace: bool = False,
    frame_rects: list[tuple[int, int, int, int]] | None = None,
    disposals: list[int] | None = None,
    transparent_idxs: list[int | None] | None = None,
    bg: int = 0,
) -> bytes:
    """Minimal VALID multi-frame GIF89a from per-frame palette-index
    rows (top-down, fw*fh bytes per frame): header, logical screen
    descriptor (background color index ``bg``), the global color table
    (default the fixed :data:`_GIF_PALETTE`; padded to a legal
    power-of-two size; None omits the GCT entirely, in which case
    every frame needs its own entry in ``frame_palettes``), one
    graphic-control extension + image descriptor + real LZW-compressed
    data per frame, trailer. A frame whose entry in ``frame_palettes``
    differs from the global palette is written with a LOCAL color
    table; ``interlace=True`` stores rows in the appendix-E pass order
    with the interlace flag set.

    Animation controls (round 14 — the sub-canvas compositing
    surface): ``frame_rects[fi] = (left, top, fw, fh)`` places frame
    ``fi`` on the canvas (default full-canvas); ``disposals[fi]``
    writes the GCE disposal method (0 unspecified / 1 keep / 2 restore
    to background / 3 restore to previous); ``transparent_idxs[fi]``
    sets the GCE transparency flag + transparent color index (None =
    opaque)."""
    if not frames:
        raise ValueError("need at least one frame")
    out = bytearray(b"GIF89a")
    if palette is None:
        out += struct.pack("<HHBBB", w, h, 0x70, bg, 0)  # no GCT
    else:
        gct, gn = _gif_pad_palette(palette)
        # packed: global color table present, 8-bit color resolution
        out += struct.pack("<HHBBB", w, h, 0xF0 | gn, bg, 0)
        out += gct
    for fi, f in enumerate(frames):
        left, top, fw, fh = (
            frame_rects[fi] if frame_rects else (0, 0, w, h)
        )
        if not (
            left >= 0 and top >= 0 and fw >= 1 and fh >= 1
            and left + fw <= w and top + fh <= h
        ):
            raise ValueError(
                f"frame {fi} rect {(left, top, fw, fh)} exceeds the "
                f"{w}x{h} canvas"
            )
        if len(f) != fw * fh:
            raise ValueError(
                f"frame {fi} needs {fw * fh} index bytes, got {len(f)}"
            )
        disposal = disposals[fi] if disposals else 0
        if not 0 <= disposal <= 3:
            raise ValueError(f"frame {fi} disposal must be 0..3")
        trans = transparent_idxs[fi] if transparent_idxs else None
        gpk = ((disposal & 0x07) << 2) | (1 if trans is not None else 0)
        # GCE: disposal/transparency per the args, 4cs delay
        out += bytes(
            [0x21, 0xF9, 0x04, gpk, 0x04, 0x00, trans or 0, 0x00]
        )
        fpal = frame_palettes[fi] if frame_palettes else None
        if palette is None and fpal is None:
            raise ValueError(
                f"frame {fi} has no palette (no global color table and "
                f"no frame_palettes entry)"
            )
        packed = 0x40 if interlace else 0
        lct = b""
        if fpal is not None and (palette is None or fpal != palette):
            lct, ln = _gif_pad_palette(fpal)
            packed |= 0x80 | ln
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, packed)
        out += lct
        if interlace:
            f = b"".join(
                f[r * fw : (r + 1) * fw] for r in _gif_interlace_order(fh)
            )
        out.append(8)  # LZW minimum code size (256-color indices)
        data = _lzw_encode(f, 8)
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def _gif_decode_py(payload: bytes, frame_stride: int = 1) -> dict | None:
    """Real dependency-free GIF decode (round 13; compositing round
    14): header + logical screen descriptor parse, global color table,
    full LZW decompress per frame (variable-width codes, clear/EOI,
    KwKwK, table-full behavior), palette mapping, and the shared
    channel statistics — overall AND per frame, so frame-level
    operators read real frames.

    Two shapes, detected per payload:

    * INDEPENDENT — every frame full-canvas and opaque (the shape
      :func:`gif_encode` emits and the common corpus-thumbnail storage
      shape). Returned ``frames`` are palette-index planes with their
      ``frame_palettes``; ``rgb`` is False. Interlaced frames are
      de-interlaced (appendix-E pass order) and per-frame LOCAL color
      tables honored over the global one.
    * COMPOSITE (round 14 — the real-world animated-GIF shape): any
      sub-canvas frame or any GCE transparency flag switches to full
      canvas compositing — each frame is drawn at its (left, top)
      rect over the persistent canvas, pixels equal to the GCE
      transparent index show the canvas beneath, and the GCE disposal
      method (0 unspecified / 1 keep / 2 restore the frame's rect to
      the background color / 3 restore the canvas to its pre-frame
      state) runs between frames. The canvas starts as the logical
      screen's background color, which requires a global color table
      with a valid background index — refused otherwise (no silent
      black/transparent guess). Returned ``frames`` are the COMPOSITED
      w*h RGB planes (what a viewer shows for that frame);
      ``frame_palettes`` is None and ``rgb`` is True. Statistics are
      over the composited canvases.

    Any structural corruption (bad magic, truncated blocks, a rect
    exceeding the canvas, disposal > 3, LZW output != fw*fh, an opaque
    index past the frame's palette) returns None — the codec refuses
    rather than mis-decodes, like its PNG twin.

    ``frame_stride`` keeps frames 0, n, 2n, ... at PARSE time.
    ``n_frames`` always counts every frame; ``frame_idxs`` records
    which ones the returned planes/means belong to. The parse pass
    records sub-block (offset, length) ranges only — no frame's bytes
    are copied unless its LZW decompress actually runs. In the
    independent shape dropped frames are never decompressed; in the
    composite shape a dropped frame still has to be decoded IF its
    pixels persist into a later kept frame (disposal 0/1) — disposal
    2/3 dropped frames and everything after the last kept frame are
    skipped entirely."""
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if w <= 0 or h <= 0:
        return None
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        if pos + 3 * n > len(payload):
            return None
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    # ---- parse pass: structure + compressed bytes, no LZW yet ----
    recs: list[dict] = []
    disposal = 0
    trans: int | None = None  # pending GCE state for the NEXT image
    while True:
        if pos >= len(payload):
            return None  # ran out before the trailer
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                return None
            label = payload[pos]
            if (
                label == 0xF9
                and pos + 6 <= len(payload)
                and payload[pos + 1] == 4
            ):
                # graphic control: disposal bits 2-4, transparency bit 0
                gpk = payload[pos + 2]
                disposal = (gpk >> 2) & 0x07
                trans = payload[pos + 5] if gpk & 0x01 else None
            pos += 1
            while True:  # generic sub-block walk (all extensions)
                if pos >= len(payload):
                    return None
                ln = payload[pos]
                pos += 1 + ln
                if ln == 0:
                    break
            continue
        if block != 0x2C:
            return None
        if pos + 9 > len(payload):
            return None
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if fw < 1 or fh < 1 or left + fw > w or top + fh > h:
            return None  # rect exceeds the canvas
        if disposal > 3:
            return None  # undefined disposal method
        pal = gct
        if fpacked & 0x80:  # local color table overrides the global
            n = 2 ** ((fpacked & 0x07) + 1)
            if pos + 3 * n > len(payload):
                return None
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            return None  # no palette for this frame at all
        if pos >= len(payload):
            return None
        mcs = payload[pos]
        pos += 1
        # record (offset, length) ranges only — zero byte copying at
        # parse time; a frame's sub-blocks are joined lazily iff its
        # LZW decompress is actually needed (review r14: the old
        # eager copy bought nothing for frames the stride never reads)
        ranges: list[tuple[int, int]] = []
        while True:
            if pos >= len(payload):
                return None
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            if pos + ln > len(payload):
                return None
            ranges.append((pos, ln))
            pos += ln
        recs.append(
            {
                "left": left, "top": top, "fw": fw, "fh": fh,
                "interlace": bool(fpacked & 0x40), "pal": bytes(pal),
                "mcs": mcs, "ranges": ranges, "disposal": disposal,
                "trans": trans,
            }
        )
        disposal = 0
        trans = None  # a GCE governs exactly one image
    if not recs:
        return None
    import numpy as np

    n_frames = len(recs)
    keep_idxs = list(range(0, n_frames, frame_stride))

    def decode_idx(r: dict) -> bytes | None:
        data = b"".join(payload[a : a + ln] for a, ln in r["ranges"])
        idx = _lzw_decode(data, r["mcs"], r["fw"] * r["fh"])
        if idx is None or len(idx) != r["fw"] * r["fh"]:
            return None
        if r["interlace"]:  # interlaced: rows arrive in pass order
            fw = r["fw"]
            out = bytearray(len(idx))
            for stored, actual in enumerate(_gif_interlace_order(r["fh"])):
                out[actual * fw : (actual + 1) * fw] = idx[
                    stored * fw : (stored + 1) * fw
                ]
            idx = bytes(out)
        return idx

    independent = all(
        r["left"] == 0 and r["top"] == 0 and r["fw"] == w and r["fh"] == h
        and r["trans"] is None
        for r in recs
    )
    sums = [0, 0, 0]
    frame_means: list[list[float]] = []
    frames: list[bytes] = []
    frame_idxs: list[int] = []
    if independent:
        frame_palettes: list[bytes] | None = []
        for i in keep_idxs:
            r = recs[i]
            idx = decode_idx(r)
            if idx is None:
                return None
            a = np.frombuffer(idx, np.uint8)
            if a.size and int(a.max()) >= len(r["pal"]) // 3:
                return None  # index past the frame's palette
            rgb = np.frombuffer(r["pal"], np.uint8).reshape(-1, 3)[a]
            fsums = [int(s) for s in rgb.sum(axis=0, dtype=np.int64)]
            frame_means.append(
                [round(s / (w * h), 6) for s in fsums]  # [r, g, b]
            )
            for c in range(3):
                sums[c] += fsums[c]
            frames.append(idx)
            frame_palettes.append(r["pal"])
            frame_idxs.append(i)
        palette = bytes(gct) if gct is not None else frame_palettes[0]
    else:
        # composite: the canvas seeds from the background color, which
        # only the global color table can define
        frame_palettes = None
        if gct is None or bg >= len(gct) // 3:
            return None
        bg_rgb = np.frombuffer(gct, np.uint8).reshape(-1, 3)[bg]
        canvas = np.empty((h, w, 3), np.uint8)
        canvas[:] = bg_rgb
        for i, r in enumerate(recs):
            if i > keep_idxs[-1]:
                break  # nothing after the last kept frame matters
            kept = i % frame_stride == 0
            prev = None
            if kept or r["disposal"] in (0, 1):
                idx = decode_idx(r)
                if idx is None:
                    return None
                a = np.frombuffer(idx, np.uint8).reshape(r["fh"], r["fw"])
                pal = np.frombuffer(r["pal"], np.uint8).reshape(-1, 3)
                mask = (
                    a != r["trans"] if r["trans"] is not None
                    else np.ones(a.shape, bool)
                )
                opaque = a[mask]
                if opaque.size and int(opaque.max()) >= len(pal):
                    return None  # opaque index past the frame's palette
                if r["disposal"] == 3:
                    prev = canvas.copy()
                canvas[
                    r["top"] : r["top"] + r["fh"],
                    r["left"] : r["left"] + r["fw"],
                ][mask] = pal[opaque]
            # (disposal 2/3 dropped frames: pixels never persist — the
            # LZW decompress is skipped entirely)
            if kept:
                fsums = [
                    int(s)
                    for s in canvas.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                ]
                frame_means.append(
                    [round(s / (w * h), 6) for s in fsums]  # [r, g, b]
                )
                for c in range(3):
                    sums[c] += fsums[c]
                frames.append(canvas.tobytes())
                frame_idxs.append(i)
            if r["disposal"] == 2:  # restore the rect to background
                canvas[
                    r["top"] : r["top"] + r["fh"],
                    r["left"] : r["left"] + r["fw"],
                ] = bg_rgb
            elif r["disposal"] == 3 and prev is not None:
                canvas = prev
        palette = bytes(gct)
    n = w * h * len(frames)
    return {
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "mean_r": round(sums[0] / n, 6),
        "mean_g": round(sums[1] / n, 6),
        "mean_b": round(sums[2] / n, 6),
        "mean_all": round(sum(sums) / (3 * n), 6),
        "frame_means": frame_means,
        "frames": frames,
        "frame_idxs": frame_idxs,
        "palette": palette,
        "frame_palettes": frame_palettes,
        "rgb": not independent,
    }


def gif_encode(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic VALID multi-frame GIF payloads from a text fixture
    — the animated sibling of :func:`png_encode`: same width/height
    convention (4/8/12/16 × 1..5 from doc_id), 1 + doc_id % 3 frames,
    frame ``f``'s palette indices = the repeated md5 of ``text + '#f'
    + f``. The palette is the fixed affine :data:`_GIF_PALETTE`, so an
    analytic oracle recomputes every channel statistic from the md5
    byte stream and the palette arithmetic — never decoding a GIF —
    while the engine runs the REAL decode (LZW and all).

    Arrow-batched ``mapInPandas`` like the PNG encoder (LZW is not
    expressible in SQL built-ins); map-only, no shuffle."""
    src = docs.select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("ptext")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                doc_id = int(rec.doc_id)
                w = 4 * (1 + doc_id % 4)
                h = 1 + doc_id % 5
                n_frames = 1 + doc_id % 3
                frames = []
                for f in range(n_frames):
                    digest = hashlib.md5(
                        (rec.ptext + f"#f{f}").encode("utf-8")
                    ).digest()
                    frames.append((digest * 5)[: w * h])
                payload = _gif_encode_py(frames, w, h)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media": payload,
                        "media_meta": {
                            "kind": "video",
                            "mime": "image/gif",
                            "n_bytes": len(payload),
                            "sha": hashlib.sha256(payload).hexdigest(),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media", "media_meta"])

    schema = (
        "doc_id BIGINT, media BINARY, "
        "media_meta STRUCT<kind: STRING, mime: STRING, n_bytes: BIGINT, "
        "sha: STRING>"
    )
    return src.mapInPandas(run, schema=schema)


def gif_anim_encode(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic VALID *animated* GIF payloads exercising the
    real-world sub-canvas shape (round 14): frame 0 is a full-canvas
    opaque plane; every later frame is a SUB-CANVAS rect with the GCE
    transparency flag set (transparent index 7) — both with disposal
    method 2 (restore to background), so before each frame after the
    first the canvas is exactly the background color and the
    composited statistics stay analytic:

    * canvas w/h: the :func:`gif_encode` convention
      (``4 * (1 + doc_id % 4)`` x ``1 + doc_id % 5``)
    * ``n_frames = 2 + doc_id % 3`` (always at least one sub-canvas
      frame), background index ``doc_id % 256``
    * frame f >= 1 rect: ``fw = 1 + (doc_id + 3f) % w``,
      ``fh = 1 + (doc_id + f) % h``, ``left = (doc_id + 5f) %
      (w - fw + 1)``, ``top = (doc_id + 7f) % (h - fh + 1)``
    * frame f's palette indices = repeated md5 of ``text + '#a' + f``
      over the fixed affine :data:`_GIF_PALETTE`

    so the oracle recomputes each COMPOSITED frame's channel means
    without decoding a GIF: rect pixels contribute ``pal[idx]`` when
    ``idx != 7`` and the background color when transparent, and the
    ``w*h - fw*fh`` pixels outside the rect are all background.
    Arrow-batched ``mapInPandas``; map-only, no shuffle."""
    src = docs.select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("ptext")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                doc_id = int(rec.doc_id)
                w = 4 * (1 + doc_id % 4)
                h = 1 + doc_id % 5
                n_frames = 2 + doc_id % 3
                frames, rects, disposals, trans = [], [], [], []
                for f in range(n_frames):
                    if f == 0:
                        fw, fh, left, top = w, h, 0, 0
                        trans.append(None)
                    else:
                        fw = 1 + (doc_id + 3 * f) % w
                        fh = 1 + (doc_id + f) % h
                        left = (doc_id + 5 * f) % (w - fw + 1)
                        top = (doc_id + 7 * f) % (h - fh + 1)
                        trans.append(7)
                    digest = hashlib.md5(
                        (rec.ptext + f"#a{f}").encode("utf-8")
                    ).digest()
                    frames.append((digest * 5)[: fw * fh])
                    rects.append((left, top, fw, fh))
                    disposals.append(2)
                payload = _gif_encode_py(
                    frames, w, h, frame_rects=rects, disposals=disposals,
                    transparent_idxs=trans, bg=doc_id % 256,
                )
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media": payload,
                        "media_meta": {
                            "kind": "video",
                            "mime": "image/gif",
                            "n_bytes": len(payload),
                            "sha": hashlib.sha256(payload).hexdigest(),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media", "media_meta"])

    schema = (
        "doc_id BIGINT, media BINARY, "
        "media_meta STRUCT<kind: STRING, mime: STRING, n_bytes: BIGINT, "
        "sha: STRING>"
    )
    return src.mapInPandas(run, schema=schema)


def _gif_resize_py(payload: bytes, out_w: int, out_h: int) -> bytes | None:
    """Nearest-neighbor resample of EVERY frame of a GIF: real decode
    (:func:`_gif_decode_py` — LZW and all), the shared source-pixel
    selection arithmetic (``src = (dst * src_dim) // dst_dim``) over
    the palette-index planes (palette untouched — NN resampling of an
    indexed image is index selection), then a real re-encode. None for
    anything the decoder refuses, and for COMPOSITE-shape animations
    (sub-canvas rects / transparency): their decoded planes are
    composited RGB, and re-encoding RGB as GIF needs palette
    quantization — the same modeling choice transcode_media refuses."""
    parsed = _gif_decode_py(payload)
    if parsed is None or parsed["rgb"]:
        return None
    w, h = parsed["width"], parsed["height"]
    frames_out = []
    for idx in parsed["frames"]:
        out = bytearray(out_w * out_h)
        for j in range(out_h):
            src_base = (j * h // out_h) * w
            dst_base = j * out_w
            for i in range(out_w):
                out[dst_base + i] = idx[src_base + i * w // out_w]
        frames_out.append(bytes(out))
    # re-encode with the SOURCE's palettes (global + any per-frame
    # locals) — an index plane is only meaningful against its own
    # color table, so a fixed fixture palette here would recolor any
    # non-fixture GIF
    return _gif_encode_py(
        frames_out,
        out_w,
        out_h,
        palette=parsed["palette"],
        frame_palettes=parsed["frame_palettes"],
    )


_GIF_FRAME_SCHEMA = (
    "doc_id BIGINT, sha STRING, frame_idx INT, width INT, height INT, "
    "mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE"
)


def gif_frames(
    media_df: DataFrame,
    every_nth: int = 1,
    decoder_backend: Callable[[bytes, int], dict | None] | None = None,
) -> DataFrame:
    """REAL frame extraction over the multi-frame GIF codec: one row
    per (kept) frame with its own channel statistics — the
    frame-sample operation the brief lists, now over genuinely decoded
    frames rather than :func:`frame_sample`'s index plumbing.
    ``every_nth`` keeps frames 0, n, 2n, ... (the classic video
    frame-sampling stride) at PARSE time — dropped frames are never
    LZW-decompressed, never featurized, and never cross the Arrow
    boundary (``_gif_decode_py``'s ``frame_stride``); only their block
    lengths are walked. Arrow-batched ``mapInPandas``; map-only, no
    shuffle — parallelism is the partition layout of the media frame
    (see :func:`balance_media_bytes`).

    ``decoder_backend`` (round 15 — the codec swap seam made real):
    an optional ``(payload, frame_stride) -> dict | None`` callable
    replacing the stdlib GIF decode inside the same seam (a real
    cluster passes an ffmpeg/PIL-backed frame extractor here). It
    must return the stdlib decoder's dict shape: width/height/
    frame_idxs/frame_means (means as (r, g, b) triples); None =
    unsupported -> ValueError. Schema, batching, and refusal
    semantics are unchanged."""
    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")
    if decoder_backend is not None:
        decode = lambda p: decoder_backend(p, every_nth)  # noqa: E731
    else:
        decode = lambda p: _gif_decode_py(p, frame_stride=every_nth)  # noqa: E731
    return _frames_runner(
        media_df,
        decode,
        "unsupported media format (gif_frames needs a "
        "structurally valid GIF — sub-canvas animations "
        "composite for real as of round 14; corruption, "
        "rects past the canvas, and composite shapes "
        "with no global color table are refused)",
    )


def _frames_runner(media_df: DataFrame, decode, err_msg: str) -> DataFrame:
    """The shared per-frame-row emitter behind :func:`gif_frames` and
    :func:`video_frames` (round-15 review dedup): Arrow-batched
    ``mapInPandas`` turning ``decode(payload) -> {width, height,
    frame_idxs, frame_means}`` into one row per kept frame. media
    from a non-encode source may carry a NULL or sha-less media_meta;
    fall back to hashing the payload rather than dying with an opaque
    error inside the Arrow batch — and guard by TYPE, not truthiness:
    pandas can surface a null struct as float NaN, which is truthy
    and has no .get (round-15 ADVICE). None from ``decode`` raises
    ``err_msg`` (the refusal contract); map-only, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.media)
                meta = rec.media_meta
                sha = (
                    meta.get("sha") if isinstance(meta, dict) else None
                ) or hashlib.sha256(payload).hexdigest()
                parsed = decode(payload)
                if parsed is None:
                    raise ValueError(err_msg)
                for f, fm in zip(
                    parsed["frame_idxs"], parsed["frame_means"]
                ):
                    rows.append(
                        {
                            "doc_id": rec.doc_id,
                            "sha": sha,
                            "frame_idx": f,
                            "width": parsed["width"],
                            "height": parsed["height"],
                            "mean_r": fm[0],
                            "mean_g": fm[1],
                            "mean_b": fm[2],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sha", "frame_idx", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return media_df.mapInPandas(run, schema=_GIF_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# AVI video container (round 15): the video boundary narrows to real
# demuxing. AVI is RIFF — the same chunk grammar the WAV codec already
# walks — and its two classic video payloads are both exactly
# decodable dependency-free: '00db' uncompressed DIB frames (bottom-up
# padded BGR rows, the BMP body layout) and '00dc' MJPG frames (each a
# complete JPEG, which the round-14/15 decoder handles including
# 4:2:0 and progressive). Modern codecs (H.264/VP9/AV1) remain the
# documented ffmpeg boundary — refusal, never approximation.


def _le32(v: int) -> bytes:
    return struct.pack("<I", v)


def _avi_encode_py(
    frames: list, w: int, h: int, codec: str = "DIB ", fps: int = 10
) -> bytes:
    """Minimal VALID AVI writer (RIFF 'AVI ': LIST hdrl with
    avih/strh/strf, LIST movi, idx1). ``codec='DIB '``: each frame is
    raw RGB bytes (3*w*h) stored as a bottom-up 4-byte-padded BGR DIB
    ('00db' chunks, biCompression 0). ``codec='MJPG'``: each frame is
    a complete pre-encoded JPEG payload ('00dc' chunks, biCompression
    'MJPG'). One video stream; headers carry the real frame count,
    dims, and rate so the decoder's cross-checks hold."""
    import numpy as np

    if codec not in ("DIB ", "MJPG"):
        raise ValueError(f"codec must be 'DIB ' or 'MJPG', got {codec!r}")
    if not frames:
        raise ValueError("need at least one frame")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    pad = (-3 * w) % 4
    stride = 3 * w + pad
    chunks = []
    for f in frames:
        if codec == "DIB ":
            if len(f) != 3 * w * h:
                raise ValueError(
                    f"DIB frame needs {3 * w * h} RGB bytes, got {len(f)}"
                )
            px = np.frombuffer(bytes(f), np.uint8).reshape(h, w, 3)
            body = np.zeros((h, stride), np.uint8)
            body[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)
            chunks.append((b"00db", body.tobytes()))
        else:
            if bytes(f[:2]) != b"\xff\xd8":
                raise ValueError("MJPG frame must be a JPEG payload")
            chunks.append((b"00dc", bytes(f)))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + _le32(len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def lst(typ: bytes, body: bytes) -> bytes:
        return b"LIST" + _le32(len(body) + 4) + typ + body

    n = len(frames)
    biCompression = 0 if codec == "DIB " else struct.unpack("<I", b"MJPG")[0]
    strf = struct.pack(
        "<IiihhIIiiII",
        40, w, h, 1, 24, biCompression,
        stride * h if codec == "DIB " else 0,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + (b"DIB " if codec == "DIB " else b"MJPG")
        + _le32(0)               # flags
        + struct.pack("<HH", 0, 0)  # priority, language
        + _le32(0)               # initial frames
        + _le32(1)               # scale
        + _le32(fps)             # rate (fps = rate/scale)
        + _le32(0)               # start
        + _le32(n)               # length in frames
        + _le32(max(len(b) for _t, b in chunks))
        + _le32(0xFFFFFFFF)      # quality (default)
        + _le32(0)               # sample size (varies)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    avih = struct.pack(
        "<IIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10, n, 0, 1, 0, w, h,
    ) + b"\x00" * 16
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(t, b) for t, b in chunks)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per chunk, offsets relative to the 'movi' fourcc
    idx = bytearray()
    off = 4
    for t, b in chunks:
        idx += t + _le32(0x10) + _le32(off) + _le32(len(b))
        off += 8 + len(b) + (len(b) % 2)
    payload = hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + _le32(len(payload) + 4) + b"AVI " + payload


def _avi_decode_py(payload: bytes, frame_stride: int = 1) -> dict | None:
    """Real dependency-free AVI demux + frame decode: RIFF walk
    (hdrl: avih + the video strh/strf, movi chunk scan), then per
    KEPT frame (``frame_stride`` drops frames at demux time — their
    chunks are never pixel-decoded, the gif_frames economy) either
    the bottom-up padded-BGR DIB read or the full JPEG decode for
    MJPG (baseline AND progressive, any supported sampling). Returns
    the gif-decoder dict shape: width/height/n_frames (TOTAL),
    frame_idxs/frame_means (kept), overall channel means over kept
    frames.

    Refusals (None, never approximation): non-'AVI ' RIFF forms,
    >1 stream, non-'vids' stream, codecs beyond DIB/MJPG (modern
    H.264/VP9 need ffmpeg — README boundary), frame-count mismatch
    between avih/strh and the movi chunks, dim mismatch between strf
    and an MJPG frame's own SOF header, truncated chunks, frames
    above the _JPEG_MAX_PIXELS allocation cap."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    if frame_stride < 1:
        return None
    riff_len = struct.unpack_from("<I", payload, 4)[0]
    if riff_len + 8 > len(payload) or riff_len < 4:
        return None
    end = 8 + riff_len

    def walk(pos, stop):
        """Yield (fourcc, body_start, body_len, list_type|None)."""
        while pos + 8 <= stop:
            tag = payload[pos : pos + 4]
            ln = struct.unpack_from("<I", payload, pos + 4)[0]
            body = pos + 8
            if body + ln > stop:
                return
            if tag == b"LIST" and ln >= 4:
                yield tag, body + 4, ln - 4, payload[body : body + 4]
            else:
                yield tag, body, ln, None
            pos = body + ln + (ln % 2)

    w = h = None
    n_declared = None
    strh_frames = None
    codec = None
    movi = None
    for tag, body, ln, ltyp in walk(12, end):
        if tag == b"LIST" and ltyp == b"hdrl":
            if n_declared is not None:
                return None  # duplicate hdrl: refuse, not last-wins
            for t2, b2, l2, lt2 in walk(body, body + ln):
                if t2 == b"avih" and l2 >= 40:
                    (_us, _mb, _pg, _fl, n_declared, _init, streams,
                     _buf, w, h) = struct.unpack_from("<IIIIIIIIII", payload, b2)
                    if streams != 1:
                        return None  # audio/multi-stream: out of scope
                elif t2 == b"LIST" and lt2 == b"strl":
                    for t3, b3, l3, _ in walk(b2, b2 + l2):
                        if t3 == b"strh" and l3 >= 48:
                            if payload[b3 : b3 + 4] != b"vids":
                                return None
                            if strh_frames is not None:
                                return None  # second stream header
                            strh_frames = struct.unpack_from(
                                "<I", payload, b3 + 32
                            )[0]
                        elif t3 == b"strf" and l3 >= 40:
                            (_sz, bw_, bh_, _pl, bits, comp) = (
                                struct.unpack_from("<IiihhI", payload, b3)
                            )
                            if (bw_, abs(bh_)) != (w, h):
                                return None  # strf dims contradict avih
                            if comp == 0:
                                if bits != 24 or bh_ < 0:
                                    return None  # top-down DIB: out of scope
                                codec = "DIB"
                            elif comp == struct.unpack("<I", b"MJPG")[0]:
                                codec = "MJPG"
                            else:
                                return None  # modern codecs: ffmpeg boundary
        elif tag == b"LIST" and ltyp == b"movi":
            if movi is not None:
                return None  # duplicate movi: refuse, not last-wins
            movi = (body, ln)
    if None in (w, h, n_declared, strh_frames, codec) or movi is None:
        return None
    if w < 1 or h < 1 or w * h > _JPEG_MAX_PIXELS:
        return None
    if n_declared != strh_frames:
        return None
    pad = (-3 * w) % 4
    stride = 3 * w + pad
    frame_idxs = []
    frame_means = []
    sums = np.zeros(3, np.float64)
    count = 0
    body, ln = movi
    idx = 0
    for tag, b2, l2, _ in walk(body, body + ln):
        if tag not in (b"00db", b"00dc"):
            return None  # interleaved audio ('01wb') etc.: out of scope
        if (tag == b"00db") != (codec == "DIB"):
            return None  # chunk kind must match the declared codec
        # O(1) structural validation runs for EVERY frame, kept or
        # dropped — refusal must not depend on the sampling stride
        # (round-15 review); only the PIXEL decode is stride-skipped
        if codec == "DIB":
            if l2 != stride * h:
                return None
        elif payload[b2 : b2 + 2] != b"\xff\xd8":
            return None  # MJPG chunk without a JPEG magic
        if idx % frame_stride == 0:
            if codec == "DIB":
                rows = np.frombuffer(
                    payload, np.uint8, count=stride * h, offset=b2
                ).reshape(h, stride)
                px = rows[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1]
                means = px.reshape(-1, 3).mean(axis=0)
                fm = tuple(round(float(v), 6) for v in means)
            else:
                j = _jpeg_decode_py(payload[b2 : b2 + l2])
                if j is None or (j["width"], j["height"]) != (w, h):
                    return None
                fm = (j["mean_r"], j["mean_g"], j["mean_b"])
            frame_idxs.append(idx)
            frame_means.append(fm)
            sums += np.asarray(fm)
            count += 1
        idx += 1
    if idx != n_declared or count == 0:
        return None
    mr, mg, mb = (round(float(v / count), 6) for v in sums)
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": idx,
        "frame_idxs": frame_idxs,
        "frame_means": frame_means,
        "mean_r": mr,
        "mean_g": mg,
        "mean_b": mb,
        "mean_all": round((mr + mg + mb) / 3, 6),
    }


def video_frames(
    media_df: DataFrame,
    every_nth: int = 1,
    decoder_backend: Callable[[bytes, int], dict | None] | None = None,
) -> DataFrame:
    """Per-frame statistics over REAL demuxed video (round 15): one
    row per kept frame of each AVI payload — the video twin of
    :func:`gif_frames`, sharing its schema, its parse-time
    frame-sampling economy (dropped frames' chunks are never
    pixel-decoded), and its ``decoder_backend`` injection seam (a
    real cluster passes an ffmpeg-backed ``(payload, stride) ->
    dict | None`` here for H.264/VP9; the stdlib demuxer covers
    DIB and MJPG AVI). Arrow-batched ``mapInPandas``; map-only."""
    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")
    if decoder_backend is not None:
        decode = lambda p: decoder_backend(p, every_nth)  # noqa: E731
    else:
        decode = lambda p: _avi_decode_py(p, frame_stride=every_nth)  # noqa: E731
    return _frames_runner(
        media_df,
        decode,
        "unsupported media format (video_frames demuxes "
        "single-stream DIB/MJPG AVI dependency-free; "
        "modern codecs and other containers need ffmpeg "
        "via decoder_backend)",
    )


def avi_encode(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic VALID AVI payloads from a text fixture: doc_id
    alternates the two classic payload kinds. EVEN doc_ids are
    uncompressed DIB — ``2 + doc_id % 3`` frames of 4x2 RGB whose
    pixel bytes are the md5(text + '#avN') stream (exact, so the
    oracle recomputes per-frame means from the digest bytes). ODD
    doc_ids are MJPG — each frame a baseline grayscale flat-tile JPEG
    (width ``8 * (1 + doc_id % 2)``, height 8; tile k of frame f =
    byte k of md5(text + '#avjF') with the all-8s quantization), so
    every decoded pixel is exactly its digest byte and the oracle
    stays analytic through the REAL per-frame JPEG decode.
    Arrow-batched ``mapInPandas``; map-only."""
    src = docs.select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("ptext")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                doc_id = int(rec.doc_id)
                nf = 2 + doc_id % 3
                if doc_id % 2 == 0:
                    frames = [
                        (hashlib.md5(
                            (rec.ptext + f"#av{f}").encode("utf-8")
                        ).digest() * 2)[: 3 * 4 * 2]
                        for f in range(nf)
                    ]
                    payload = _avi_encode_py(frames, 4, 2, codec="DIB ")
                else:
                    # doc_id is odd here, so vary width on doc_id//2
                    # (a bare doc_id % 2 would be constant — round-15
                    # review), covering both 1- and 2-tile-wide frames
                    tx = 1 + (doc_id // 2) % 2
                    frames = [
                        _jpeg_encode_py(
                            hashlib.md5(
                                (rec.ptext + f"#avj{f}").encode("utf-8")
                            ).digest()[: tx * 1],
                            tx,
                            1,
                        )
                        for f in range(nf)
                    ]
                    payload = _avi_encode_py(
                        frames, 8 * tx, 8, codec="MJPG"
                    )
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media": payload,
                        "media_meta": {
                            "kind": "video",
                            "mime": "video/x-msvideo",
                            "n_bytes": len(payload),
                            "sha": hashlib.sha256(payload).hexdigest(),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media", "media_meta"])

    schema = (
        "doc_id BIGINT, media BINARY, "
        "media_meta STRUCT<kind: STRING, mime: STRING, n_bytes: BIGINT, "
        "sha: STRING>"
    )
    return src.mapInPandas(run, schema=schema)


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
    media_df: DataFrame,
    decode_stub: bool = True,
    batch_hint: int | None = None,
    decoder_backend: Callable[[bytes], dict | None] | None = None,
) -> DataFrame:
    """Decode + featurize media via Arrow-batched mapInPandas.

    ``decode_stub=False`` runs the REAL dependency-free codecs,
    dispatched on the payload magic: 24-bpp BMP (``_bmp_decode_py``),
    8-bit truecolor PNG (``_png_decode_py`` — full chunk/CRC/
    inflate/unfilter, round 12), and multi-frame GIF
    (``_gif_decode_py`` — real LZW, round 13). Width/height come from
    the parsed header; n_frames is the REAL frame count for GIF and
    = height (one frame per pixel row, the fixture convention) for the
    single-frame formats; feature = the four channel/total byte means
    in the shared [b, g, r, all] slot order. JPEG decodes via
    ``_jpeg_decode_py``: baseline sequential (grayscale, 4:4:4,
    4:2:0, 4:2:2; restart intervals honored) AND progressive SOF2
    (spectral selection + successive approximation — round 15).
    Single-stream DIB/MJPG AVI demuxes for real (round 15,
    ``_avi_decode_py``; n_frames = the true frame count, means over
    the decoded frames). What remains — modern video codecs
    (H.264/VP9/AV1) and other containers — raises ValueError:
    those need ffmpeg, absent in this container.

    ``decoder_backend`` (round 15 — the codec swap seam made real):
    an optional ``payload -> dict | None`` callable that REPLACES the
    stdlib image-codec dispatch inside the same Arrow-batched
    ``mapInPandas`` seam. A real cluster passes a PIL/ffmpeg-backed
    callable here; everything around it — schema, batching,
    partitioning, the WAV dispatch, refusal semantics (return None =
    unsupported -> ValueError) — is unchanged. The callable must
    return the stdlib decoders' dict shape: width/height/mean_r/
    mean_g/mean_b/mean_all and optionally n_frames. Passing a backend
    IMPLIES the real-decode path: it overrides ``decode_stub`` (which
    defaults to True for the digest stub), so
    ``extract_features(media, decoder_backend=pil)`` does what it
    reads as — without the override the injected decoder would be
    silently ignored (round-15 review).
    """
    if decoder_backend is not None:
        decode_stub = False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.media)
                meta = rec.media_meta
                if decode_stub:
                    decoded = _stub_decode(payload)
                else:
                    is_avi = (
                        payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
                    )
                    if payload[:4] == b"RIFF" and not is_avi:
                        parsed = _wav_decode_py(payload)
                        if parsed is None:
                            raise ValueError(
                                "unsupported media format (RIFF payload "
                                "is not canonical 8/16-bit PCM WAV)"
                            )
                        # audio mapping into the shared feature schema:
                        # width = channels, height/n_frames = samples
                        # per channel, feature = [mean, rms, rate,
                        # duration_s]
                        decoded = {
                            "width": parsed["n_channels"],
                            "height": parsed["n_samples"],
                            "n_frames": parsed["n_samples"],
                            "feature": [
                                parsed["mean_pcm"],
                                parsed["rms_pcm"],
                                float(parsed["sample_rate"]),
                                round(
                                    parsed["n_samples"]
                                    / parsed["sample_rate"],
                                    6,
                                ),
                            ],
                        }
                        rows.append(
                            {
                                "doc_id": rec.doc_id,
                                "kind": meta["kind"],
                                "n_bytes": meta["n_bytes"],
                                "sha": meta["sha"],
                                **decoded,
                            }
                        )
                        continue
                    if decoder_backend is not None:
                        parsed = decoder_backend(payload)
                    elif is_avi:
                        # real video demux (round 15): DIB/MJPG AVI
                        parsed = _avi_decode_py(payload)
                    elif payload[:8] == _PNG_SIG:
                        parsed = _png_decode_py(payload)
                    elif payload[:6] in (b"GIF87a", b"GIF89a"):
                        parsed = _gif_decode_py(payload)
                    elif payload[:2] == b"\xff\xd8":
                        parsed = _jpeg_decode_py(payload)
                    else:
                        parsed = _bmp_decode_py(payload)
                    if parsed is None:
                        raise ValueError(
                            "unsupported media format (only BMP, 8-bit "
                            "truecolor/grayscale/palette PNG — plain or "
                            "Adam7 — multi-frame GIF, baseline AND "
                            "progressive JPEG at sampling factors 1-2, "
                            "8/16-bit PCM WAV, and single-stream "
                            "DIB/MJPG AVI decode dependency-free; "
                            "modern video codecs and other containers "
                            "need ffmpeg via decoder_backend)"
                        )
                    decoded = {
                        "width": parsed["width"],
                        "height": parsed["height"],
                        # GIF frames are real; single-frame formats keep
                        # the one-frame-per-pixel-row fixture convention
                        "n_frames": parsed.get(
                            "n_frames", parsed["height"]
                        ),
                        "feature": [
                            parsed["mean_b"],
                            parsed["mean_g"],
                            parsed["mean_r"],
                            parsed["mean_all"],
                        ],
                    }
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


def _byte_bins(media_df: DataFrame, num_partitions: int, id_col: str):
    """The bin assignment behind :func:`balance_media_bytes`, exposed
    for testing: returns (binned_df_with ``_bin``, budget). Bins are
    byte-contiguous windows of ``~total/num_partitions`` bytes over the
    id-ordered running byte total (two-phase ``global_cumsum`` — no
    SinglePartition window), EXCEPT oversized payloads (n_bytes ≥
    budget), which each get a unique bin of their own — a 2 GB video
    must not absorb a budget's worth of neighbors into its task.
    Every bin therefore totals ≤ budget + its largest regular payload,
    and an oversized payload sits alone."""
    import math

    from firebolt_spark.functions import global_cumsum

    sized = media_df.withColumn(
        "_nb", F.col("media_meta.n_bytes").cast("bigint")
    )
    total = sized.agg(F.sum("_nb").alias("t")).first()["t"] or 0
    budget = max(1, math.ceil(total / num_partitions))
    cum = global_cumsum(sized, "_nb", [id_col], out_col="_cum")
    binned = cum.withColumn(
        "_bin",
        F.when(
            F.col("_nb") >= budget,
            -F.abs(F.xxhash64(F.col(id_col).cast("string"))) - F.lit(1),
        )
        .otherwise(
            F.floor((F.col("_cum") - F.col("_nb")) / F.lit(float(budget)))
        )
        .cast("bigint"),
    )
    return binned, budget


def balance_media_bytes(
    media_df: DataFrame, num_partitions: int, id_col: str = "doc_id"
) -> DataFrame:
    """Byte-balanced repartition ahead of an expensive codec stage —
    the module docstring's point (b) made real. ``repartition(n)``
    balances row COUNTS; under heavy payload-size skew the straggler
    task is the one that got the one 2 GB video PLUS a full row share
    of the corpus. This packs rows into byte-contiguous bins of
    ``~total/num_partitions`` bytes (oversized payloads get dedicated
    bins) and repartitions on the bin id, so downstream
    ``mapInPandas`` codec tasks see comparable byte volumes.

    Costs one metadata aggregate, one extra shuffle, and
    ``global_cumsum``'s eager localCheckpoint of the media rows —
    worth it only when the downstream per-byte Python/codec work
    dominates (real decode), not for the cheap builtin paths.
    """
    if num_partitions < 1:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    binned, _budget = _byte_bins(media_df, num_partitions, id_col)
    return binned.repartition(num_partitions, "_bin").drop(
        "_nb", "_cum", "_bin"
    )


RESIZE_SCHEMA = (
    "doc_id BIGINT, media BINARY, "
    "media_meta STRUCT<kind: STRING, mime: STRING, n_bytes: BIGINT, "
    "sha: STRING>, width INT, height INT"
)


def _bmp_header(w: int, h: int, body_len: int) -> bytes:
    """The standard 54-byte 24-bpp BMP header (file header +
    BITMAPINFOHEADER) — ONE copy of the header contract, shared by the
    resize and transcode encoders."""
    return struct.pack("<2sIHHI", b"BM", 54 + body_len, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, body_len, 2835, 2835, 0, 0
    )


def _bmp_resize_py(payload: bytes, out_w: int, out_h: int) -> bytes | None:
    """Nearest-neighbor resample of a 24-bpp BMP, pure struct.unpack —
    the dependency-free real-codec path (PIL's ``Image.resize(...,
    NEAREST)`` analogue). Returns a VALID BMP with proper 4-byte row
    padding (the fixture's widths need none, arbitrary output widths
    do); None for anything that is not a positive-dimension
    bottom-up 24-bpp BMP."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24 or width <= 0 or height <= 0:
        return None
    # compressed pixel arrays (biCompression != 0) are not raw BGR rows
    if struct.unpack_from("<I", payload, 30)[0] != 0:
        return None
    if data_off < 54 or data_off > len(payload):
        return None
    src_row = (3 * width + 3) // 4 * 4
    pix = payload[data_off:]
    if len(pix) < src_row * height:
        return None
    dst_row = (3 * out_w + 3) // 4 * 4
    out = bytearray(dst_row * out_h)  # pad bytes stay zero
    for j in range(out_h):
        src_base = (j * height // out_h) * src_row
        dst_base = j * dst_row
        for i in range(out_w):
            s = src_base + 3 * (i * width // out_w)
            d = dst_base + 3 * i
            out[d : d + 3] = pix[s : s + 3]
    return _bmp_header(out_w, out_h, len(out)) + bytes(out)


def _png_resize_py(payload: bytes, out_w: int, out_h: int) -> bytes | None:
    """Nearest-neighbor resample of any PNG the decoder accepts (8-bit
    truecolor/grayscale/palette, plain or Adam7 — grayscale/palette
    arrive RGB-expanded, so the output is truecolor): real decode
    (:func:`_png_decode_py` — CRC check, inflate, unfilter), the SAME
    source-pixel selection arithmetic as :func:`_bmp_resize_py`
    (``src = (dst * src_dim) // dst_dim``), then a real re-encode
    (filter 0 rows, one zlib IDAT). None for anything the decoder
    refuses. Output pixel bytes are deterministic in the input; the
    compressed container is deterministic for a given zlib version."""
    parsed = _png_decode_py(payload)
    if parsed is None:
        return None
    w, h, pix = parsed["width"], parsed["height"], parsed["pixels"]
    out = bytearray(3 * out_w * out_h)
    for j in range(out_h):
        src_base = (j * h // out_h) * 3 * w
        dst_base = j * 3 * out_w
        for i in range(out_w):
            s = src_base + 3 * (i * w // out_w)
            d = dst_base + 3 * i
            out[d : d + 3] = pix[s : s + 3]
    return _png_encode_py(bytes(out), out_w, out_h)


def _stub_resize(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Deterministic fake resize for formats this container can't
    decode: payload bytes derive from the source digest + target dims,
    sized exactly as the real output would be. A real build replaces
    this body with PIL/ffmpeg scaling."""
    digest = hashlib.sha256(
        payload + struct.pack("<ii", out_w, out_h)
    ).digest()
    n = 54 + ((3 * out_w + 3) // 4 * 4) * out_h
    return (digest * (n // len(digest) + 1))[:n]


def resize_media(
    media_df: DataFrame,
    out_w: int,
    out_h: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize media to (``out_w`` × ``out_h``) via Arrow-batched
    mapInPandas — the third brief-listed multimodal operation beside
    decode / feature-extract / frame-sample. Emits the media
    convention back out (new bytes, refreshed ``media_meta`` with
    recomputed ``n_bytes``/``sha``) plus the output dimensions, so
    resizes compose: attach → resize → extract_features → ... all stay
    on the same (media, media_meta) contract.

    ``decode_stub=False`` runs the REAL dependency-free
    nearest-neighbor resamplers, dispatched on the payload magic:
    24-bpp BMP (``_bmp_resize_py``), 8-bit truecolor PNG
    (``_png_resize_py``), and multi-frame GIF (``_gif_resize_py`` —
    every frame resampled on the palette-index plane, real re-encode).
    Both are bit-exact reference-checked; identity-dimension resizes
    round-trip the pixel array byte-for-byte, and outputs re-parse
    under their decoders. Other formats raise ValueError (PIL /
    ffmpeg are absent in this container); the stub path keeps the
    plumbing — schema, batching, meta refresh — real for them.
    """
    if out_w < 1 or out_h < 1:
        raise ValueError(f"target dims must be >= 1, got {out_w}x{out_h}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.media)
                meta = rec.media_meta
                if decode_stub:
                    resized = _stub_resize(payload, out_w, out_h)
                    mime = meta["mime"]
                else:
                    if payload[:8] == _PNG_SIG:
                        maybe = _png_resize_py(payload, out_w, out_h)
                        mime = "image/png"
                    elif payload[:6] in (b"GIF87a", b"GIF89a"):
                        maybe = _gif_resize_py(payload, out_w, out_h)
                        mime = "image/gif"
                    else:
                        maybe = _bmp_resize_py(payload, out_w, out_h)
                        mime = "image/bmp"
                    if maybe is None:
                        raise ValueError(
                            "unsupported media format (only BMP, 8-bit "
                            "truecolor/grayscale/palette PNG — plain or "
                            "Adam7 — and GIF resize dependency-free; "
                            "16-bit/alpha PNG and JPEG/audio/video need "
                            "PIL/librosa/ffmpeg)"
                        )
                    resized = maybe
                rows.append(
                    {
                        "doc_id": rec.doc_id,
                        "media": resized,
                        "media_meta": {
                            "kind": meta["kind"],
                            "mime": mime,
                            "n_bytes": len(resized),
                            "sha": hashlib.sha256(resized).hexdigest(),
                        },
                        "width": out_w,
                        "height": out_h,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media", "media_meta", "width", "height"],
            )

    return media_df.mapInPandas(run, schema=RESIZE_SCHEMA)


def _decode_rgb_py(payload: bytes) -> tuple[int, int, bytes] | None:
    """(width, height, top-down RGB bytes) from any still image the
    real codecs accept — the common pixel form the transcoder works
    in. PNG arrives RGB already (grayscale/palette expanded); GIF
    contributes frame 0 through its palette (single-frame target
    formats take the first frame); BMP's bottom-up BGR rows (with
    4-byte padding) flip and channel-swap. None when the respective
    decoder refuses."""
    import numpy as np

    if payload[:8] == _PNG_SIG:
        p = _png_decode_py(payload)
        if p is None:
            return None
        return p["width"], p["height"], p["pixels"]
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        # only frame 0 is wanted: a huge stride makes the parser skip
        # every later frame's LZW decompress (composite shapes decode
        # only what frame 0's canvas needs — nothing, for frame 0)
        g = _gif_decode_py(payload, frame_stride=1 << 30)
        if g is None:
            return None
        if g["rgb"]:  # composite shape: frame 0 arrives as RGB already
            return g["width"], g["height"], g["frames"][0]
        pal = np.frombuffer(g["frame_palettes"][0], np.uint8).reshape(-1, 3)
        idx = np.frombuffer(g["frames"][0], np.uint8)
        return g["width"], g["height"], pal[idx].tobytes()
    if payload[:2] == b"\xff\xd8":
        j = _jpeg_decode_py(payload)
        if j is None:
            return None
        if j["bpp"] == 24:  # color (4:4:4/4:2:0/4:2:2) arrives as RGB
            return j["width"], j["height"], j["pixels"]
        # grayscale: r = g = b = the decoded plane
        return j["width"], j["height"], np.repeat(
            np.frombuffer(j["pixels"], np.uint8), 3
        ).tobytes()
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24 or w <= 0 or h <= 0 or not 54 <= data_off <= len(payload):
        return None
    # refuse compressed (BI_RLE/BI_BITFIELDS) pixel arrays: a 24-bpp
    # header with biCompression != 0 is not raw BGR rows
    if struct.unpack_from("<I", payload, 30)[0] != 0:
        return None
    src_row = (3 * w + 3) // 4 * 4
    pix = payload[data_off:]
    if len(pix) < src_row * h:
        return None
    rows = np.frombuffer(pix[: src_row * h], np.uint8).reshape(h, src_row)
    # drop padding, flip rows bottom-up -> top-down, swap BGR -> RGB
    rgb = rows[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1]
    return w, h, rgb.tobytes()


def _encode_bmp_py(rgb: bytes, w: int, h: int) -> bytes:
    """Minimal VALID 24-bpp BMP from top-down RGB bytes: the standard
    54-byte header + bottom-up BGR rows with 4-byte padding — the
    inverse of :func:`_decode_rgb_py`'s BMP branch."""
    import numpy as np

    if len(rgb) != 3 * w * h:
        raise ValueError(f"need {3 * w * h} pixel bytes, got {len(rgb)}")
    dst_row = (3 * w + 3) // 4 * 4
    arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    out = np.zeros((h, dst_row), np.uint8)  # pad bytes stay zero
    out[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)
    body = out.tobytes()
    return _bmp_header(w, h, len(body)) + body


_TRANSCODE_MIMES = {"png": "image/png", "bmp": "image/bmp"}


def transcode_media(media_df: DataFrame, to: str) -> DataFrame:
    """Convert still images between the real dependency-free codecs
    via Arrow-batched ``mapInPandas``: decode whatever the magic says
    (BMP / any supported PNG / baseline grayscale JPEG, expanded to
    r = g = b / GIF, whose first frame is taken — the
    single-frame target cannot hold an animation), re-encode as
    ``to`` ('png' or 'bmp'), and emit the (media, media_meta)
    convention back out with refreshed n_bytes/sha so transcodes
    compose with resize / feature extraction. Channel-faithful: the
    decoded RGB plane is what gets re-encoded, so statistics survive
    the format change bit-for-bit (the oracle certifies exactly
    that).

    ``to='gif'`` is refused by design: encoding arbitrary RGB as GIF
    needs color QUANTIZATION to a <=256-entry palette (median-cut or
    similar) — a lossy modeling choice, not a container rewrite — so
    the operator won't do it silently. Undecodable payloads raise
    (same contract as resize_media's real path)."""
    to = to.lower()
    if to not in _TRANSCODE_MIMES:
        raise ValueError(
            f"transcode target must be one of {sorted(_TRANSCODE_MIMES)} "
            f"(gif needs palette quantization — refused by design), "
            f"got {to!r}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.media)
                decoded = _decode_rgb_py(payload)
                if decoded is None:
                    raise ValueError(
                        "unsupported media format (transcode decodes "
                        "BMP, 8-bit PNG — truecolor/grayscale/palette, "
                        "plain or Adam7 — and GIF; JPEG/audio/video "
                        "need PIL/librosa/ffmpeg)"
                    )
                w, h, rgb = decoded
                if to == "png":
                    out = _png_encode_py(rgb, w, h)
                else:
                    out = _encode_bmp_py(rgb, w, h)
                rows.append(
                    {
                        "doc_id": rec.doc_id,
                        "media": out,
                        "media_meta": {
                            # the target formats are stills: a GIF
                            # animation (kind='video') transcodes to
                            # its first frame AS an image — carrying
                            # the source kind would contradict the
                            # mime and misroute kind-dispatched stages
                            "kind": "image",
                            "mime": _TRANSCODE_MIMES[to],
                            "n_bytes": len(out),
                            "sha": hashlib.sha256(out).hexdigest(),
                        },
                        "width": w,
                        "height": h,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media", "media_meta", "width", "height"],
            )

    return media_df.mapInPandas(run, schema=RESIZE_SCHEMA)


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


# ---------------------------------------------------------------------------
# JPEG (round 14: baseline grayscale + 4:4:4; round 15: 4:2:0/4:2:2
# AND full progressive SOF2 — the codec boundary narrowed to video
# containers).
#
# A full baseline JPEG pipeline IS stdlib-implementable: marker parse,
# DQT/DHT table load, canonical Huffman entropy decode (DC difference
# categories + AC run/size with ZRL and EOB), MCU interleaving at
# arbitrary {1,2} sampling factors, dequantization, zigzag, the 8x8
# type-III DCT (float math, numpy matmul), and sample-replication
# chroma upsampling. What is NOT reasonably stdlib-implementable stays
# documented in README: video demuxing (progressive SOF2 decodes for
# real as of round 15 — see _jpeg_decode_prog_py).
# Replication upsampling is itself a convention — libjpeg's triangular
# "fancy" upsample differs on non-flat chroma — so the oracle fixtures
# keep chroma flat per block, where every correct convention agrees;
# non-flat chroma placement is certified by a literal-definition
# reference in pytest, not by the SQL oracle.
#
# The fixture keeps the oracle analytic: flat 8x8 tiles with the
# all-8s quantization table make every decoded pixel EXACTLY its tile
# byte (DC = 8*(v-128), quantized by 8 = v-128, IDCT of a DC-only
# block is flat DC/8 — the float products land within 1 ulp of the
# integer and round exactly; pinned over all 256 values in tests), so
# DuckDB recomputes the statistics from the md5 tile stream without
# ever touching a JPEG. The general paths (AC coefficients, ZRL,
# multi-category DC diffs) are exercised by hand-assembled bitstreams
# against a literal-definition IDCT in the tests.

# custom canonical Huffman tables declared in the DHT segment (JPEG
# permits any valid tables; declaring small ones avoids baking in the
# Annex-K tables the encoder would never use — it only emits DC
# categories and EOB/ZRL)
_JPEG_DC_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 3, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_AC_VALS = [0x00, 0x01, 0x11, 0xF0, 0x02, 0x21, 0x31, 0x12]

# Decode allocation cap (round-15 review): coefficient state is sized
# from the SOF header BEFORE any entropy data is validated, so an
# attacker-controlled 65535x65535 header would OOM an executor with a
# 20-byte payload instead of hitting the refuse-with-None contract.
# 16.7 MP (4096x4096) bounds the state to ~135 MB of Python ints per
# component — beyond it, refuse. Real >16 MP corpora use the
# decoder_backend seam (PIL/libjpeg-turbo) anyway.
_JPEG_MAX_PIXELS = 1 << 24

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_huffman_codes(bits: list[int]) -> list[tuple[int, int]]:
    """Canonical JPEG code assignment (ITU T.81 C.2): symbols ordered
    by length; within a length, consecutive codes; (code+1)<<1 when
    the length grows. Returns [(length, code), ...] in symbol order."""
    out = []
    code = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((ln, code))
            code += 1
        code <<= 1
    return out


def _jpeg_decoder_table(bits: list[int], vals: bytes):
    """Decode structures for one canonical table (round 15 — the
    entropy-hot-path rewrite, PERF.md): an 8-bit direct LUT resolving
    every code of length <= 8 in one list index, plus the
    mincode/maxcode/valptr arrays for the T.81 F.2.2.3 compare walk
    over 9..16-bit codes. maxc16 is left-aligned to 16 bits so the
    walk compares against a single 16-bit peek with no bit reads."""
    codes = _jpeg_huffman_codes(bits)
    lut: list = [None] * 256
    maxc16 = [-1] * 17
    minc = [0] * 17
    valptr = [0] * 17
    i = 0
    for ln in range(1, 17):
        cnt = bits[ln - 1]
        if cnt:
            valptr[ln] = i
            minc[ln] = codes[i][1]
            maxc16[ln] = ((codes[i + cnt - 1][1] + 1) << (16 - ln)) - 1
            i += cnt
    for sym, (ln, code) in zip(vals, codes):
        if ln <= 8:
            base = code << (8 - ln)
            for j in range(1 << (8 - ln)):
                lut[base + j] = (sym, ln)
    return lut, maxc16, minc, valptr, list(vals)


# (bits bytes, vals bytes) -> decode structures.  Real corpora reuse a
# handful of table sets per encoder (most emit the T.81 Annex K tables
# verbatim), so across an Arrow batch of payloads the same DHT bytes
# recur thousands of times — and building the 256-entry LUT costs
# ~18 us/table, ~1/3 of a small payload's whole decode (round 16,
# PERF.md).  The cache is per-worker module state, read-only after
# build (callers never mutate the tuple), and bounded: overflow
# evicts the NEWEST insertion (popitem) rather than clearing, so the
# common table sets — which appear within the first payloads of any
# real corpus and thus insert early — stay resident even when a
# pathological corpus interleaves >256 distinct one-off table sets
# (ADVICE r16 #4 — clear() periodically rebuilt even the hottest
# entries; the one-off churn now lands on the single newest slot).
_JPEG_TABLE_CACHE: dict[tuple[bytes, bytes], tuple] = {}


def _jpeg_decoder_table_cached(bits: bytes, vals: bytes):
    key = (bits, vals)
    tab = _JPEG_TABLE_CACHE.get(key)
    if tab is None:
        if len(_JPEG_TABLE_CACHE) >= 256:
            _JPEG_TABLE_CACHE.popitem()
        tab = _jpeg_decoder_table(list(bits), vals)
        _JPEG_TABLE_CACHE[key] = tab
    return tab


class _JpegBitWriter:
    """MSB-first bit emitter with the 0xFF00 byte stuffing the entropy
    segment requires; flush pads the final byte with 1-bits (T.81
    F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> bytes:
        if self._n:
            self._acc = (self._acc << (8 - self._n)) | ((1 << (8 - self._n)) - 1)
            self.out.append(self._acc)
            if self._acc == 0xFF:
                self.out.append(0x00)
            self._acc = 0
            self._n = 0
        return bytes(self.out)


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jpeg_encode_py(
    tiles: bytes,
    tiles_x: int,
    tiles_y: int,
    q: int = 8,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Minimal VALID baseline JPEG from FLAT tiles: SOI, DQT (uniform
    ``q``), SOF0, two DHT segments (the custom canonical tables
    above), SOS, real entropy-coded data (DC difference categories +
    magnitude bits, EOB per block), EOI.

    ``subsampling='444'`` (default): tiles are 8x8 MCUs. ``tiles`` of
    length ``tiles_x * tiles_y`` encodes GRAYSCALE (one gray byte per
    tile); length ``3 * tiles_x * tiles_y`` encodes 4:4:4 COLOR
    ((Y, Cb, Cr) triplet per tile, interleaved MCUs with
    per-component DC predictors).

    ``subsampling='420'`` (round 15): tiles are 16x16 MCUs — Y at
    2x2 sampling, Cb/Cr at 1x1. ``tiles`` carries SIX bytes per MCU:
    four flat 8x8 luma quadrant values in raster order (Y00 Y01 Y10
    Y11), then Cb, then Cr for the whole MCU. Flat chroma per MCU is
    what keeps the fixture analytic under the decoder's
    sample-replication upsampling (ANY correct upsampler is exact on
    a flat plane).

    Each block's DC quantizes to round(8*(v-128)/q) — exactly v-128
    at the default q=8, which is what keeps the fixture's oracle
    analytic. ``restart_interval`` counts MCUs. Flat tiles only: a
    general encoder needs the forward DCT + AC run-length coding,
    which nothing here consumes."""
    n_tiles = tiles_x * tiles_y
    if subsampling == "420":
        if len(tiles) != 6 * n_tiles:
            raise ValueError(
                f"4:2:0 needs 6 bytes per MCU tile "
                f"({6 * n_tiles}), got {len(tiles)}"
            )
        ncomp = 3
        # (component, blocks-per-MCU, SOF sampling byte)
        mcu_blocks = [(0, 4, 0x22), (1, 1, 0x11), (2, 1, 0x11)]
        w, h = 16 * tiles_x, 16 * tiles_y
    elif subsampling == "444":
        if len(tiles) == n_tiles:
            ncomp = 1
        elif len(tiles) == 3 * n_tiles:
            ncomp = 3
        else:
            raise ValueError(
                f"need {n_tiles} (gray) or {3 * n_tiles} (YCbCr) tile "
                f"bytes, got {len(tiles)}"
            )
        mcu_blocks = [(ci, 1, 0x11) for ci in range(ncomp)]
        w, h = 8 * tiles_x, 8 * tiles_y
    else:
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    if not 1 <= q <= 255:
        raise ValueError(f"q must be 1..255, got {q}")
    out = bytearray(b"\xff\xd8")  # SOI
    out += _jpeg_seg(0xDB, bytes([0x00]) + bytes([q] * 64))  # DQT Pq=0 Tq=0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, _, samp in mcu_blocks:
        sof += bytes([ci + 1, samp, 0])  # quant table 0
    out += _jpeg_seg(0xC0, sof)
    out += _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    out += _jpeg_seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    if restart_interval:
        out += _jpeg_seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    out += _jpeg_seg(0xDA, sos + bytes([0, 63, 0]))
    dc_codes = _jpeg_huffman_codes(_JPEG_DC_BITS)  # symbol i = category i
    ac_codes = _jpeg_huffman_codes(_JPEG_AC_BITS)
    eob_ln, eob_code = ac_codes[_JPEG_AC_VALS.index(0x00)]
    bytes_per_tile = sum(nb for _, nb, _ in mcu_blocks)
    bw = _JpegBitWriter()
    prev_dc = [0] * ncomp
    for t in range(n_tiles):
        if restart_interval and t and t % restart_interval == 0:
            # close the segment (byte-align), emit the cycling RST
            # marker, reset every component's DC predictor
            out += bw.flush()
            out += bytes([0xFF, 0xD0 + ((t // restart_interval - 1) & 7)])
            bw = _JpegBitWriter()
            prev_dc = [0] * ncomp
        boff = 0
        for ci, nblocks, _ in mcu_blocks:
            for _ in range(nblocks):
                v = tiles[bytes_per_tile * t + boff]
                boff += 1
                dcq = round(8 * (v - 128) / q)
                diff = dcq - prev_dc[ci]
                prev_dc[ci] = dcq
                s = abs(diff).bit_length()
                ln, code = dc_codes[s]
                bw.put(code, ln)
                if s:
                    bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                bw.put(eob_code, eob_ln)  # all 63 ACs zero
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# Annex-K-style FULL Huffman tables for the general (forward-DCT)
# encoder below: every DC category 0..11 and every AC (run, size)
# symbol with size 1..10 plus EOB/ZRL, laid out in the T.81 Table
# K.3/K.5 shape. Validity does not depend on byte-matching the spec's
# typical tables — the decoder reads whatever canonical tables the
# DHT declares — but the layout keeps code lengths realistic.
_JPEG_FULL_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_FULL_DC_VALS = list(range(12))
_JPEG_FULL_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_JPEG_FULL_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _jpeg_photo_like_py(seed: str, size: int = 128):
    """Deterministic photo-LIKE RGB content (uint8 (size, size, 3))
    for the DCT encoder: coarse md5 noise upsampled (smooth regions)
    plus low-amplitude dither (real AC coefficients). Pure per-pixel
    noise would be an adversarial worst case for entropy coding, flat
    tiles a DC-only best case; this sits between. Shared by the
    media_throughput bench row and the roundtrip test so the measured
    content and the certified content stay the same by construction
    (round-15 review)."""
    import numpy as np

    if size % 8:
        raise ValueError(f"size must be a multiple of 8, got {size}")
    coarse = size // 8

    def noise(tag: str, nbytes: int) -> bytes:
        blocks = []
        for j in range((nbytes + 15) // 16):
            blocks.append(hashlib.md5(f"{seed}#{tag}#{j}".encode()).digest())
        return b"".join(blocks)[:nbytes]

    base = np.frombuffer(
        noise("base", 3 * coarse * coarse), np.uint8
    ).reshape(coarse, coarse, 3)
    dither = (
        np.frombuffer(noise("dither", size * size), np.uint8)
        .reshape(size, size, 1)
        .astype(np.int16)
        % 13
        - 6
    )
    return np.clip(
        np.repeat(np.repeat(base, 8, 0), 8, 1).astype(np.int16) + dither,
        0,
        255,
    ).astype(np.uint8)


# AC table for the PROGRESSIVE encoder: progressive AC scans need the
# EOB-run symbols (r<<4 for r 0..14) the sequential Annex-K layout
# does not define. All 176 symbols (EOB0..EOB14, ZRL, run 0..15 x
# size 1..10) at a uniform 8 bits is a VALID canonical table
# (176 <= 256) that the decoder resolves entirely through its 8-bit
# LUT; compression is secondary to exercising every decode path.
_JPEG_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_PROG_AC_VALS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


def _jpeg_quantized_coefs(
    rgb: bytes, w: int, h: int, q: int, subsampling: str
):
    """The shared front half of the general encoders: JFIF color
    conversion, edge-replicated MCU padding, optional 2x2 box chroma
    downsample, batched forward DCT, uniform-q quantization. Returns
    ([(qz_int64 (nblocks, 64) in ZIGZAG order, block_h, block_w)] per
    component, sub420) — the coefficient state both the baseline
    (sequential) and progressive writers entropy-code."""
    import numpy as np

    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    if not 1 <= q <= 255:
        raise ValueError(f"q must be 1..255, got {q}")
    n = w * h
    if len(rgb) == n:
        ncomp_in = 1
        planes = [np.frombuffer(rgb, np.uint8).reshape(h, w).astype(np.float64)]
    elif len(rgb) == 3 * n:
        ncomp_in = 3
        px = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(np.float64)
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        raise ValueError(f"need {n} (gray) or {3 * n} (RGB) bytes, got {len(rgb)}")
    sub420 = ncomp_in == 3 and subsampling == "420"
    mcu_px = 16 if sub420 else 8
    pw = (w + mcu_px - 1) // mcu_px * mcu_px
    ph = (h + mcu_px - 1) // mcu_px * mcu_px

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    planes = [pad(p) for p in planes]
    if sub420:
        # 2x2 box-average chroma downsample (the encode-side twin of
        # the decoder's replication upsample)
        planes[1:] = [
            p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            for p in planes[1:]
        ]

    M = _jpeg_idct_matrix()
    zz = np.array(_JPEG_ZIGZAG)

    def block_coefs(plane):
        """Quantized zigzag coefficient rows, blocks in raster order."""
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        ) - 128.0
        F = M @ blocks @ M.T  # forward DCT: the IDCT basis transposed
        qz = np.rint(F.reshape(-1, 64)[:, zz] / q).astype(np.int64)
        return qz, bh, bw

    return [block_coefs(p) for p in planes], sub420


def _jpeg_encode_dct_py(
    rgb: bytes, w: int, h: int, q: int = 8, subsampling: str = "420"
) -> bytes:
    """GENERAL baseline JPEG encoder (round 15): real forward DCT +
    quantization + full run/size AC entropy coding over arbitrary
    RGB (3 bytes/px) or grayscale (1 byte/px) content — the generator
    the media_throughput bench row needs for HONEST decode rates
    (the flat-tile `_jpeg_encode_py` emits DC-only streams, which
    measure the IDCT, not the entropy decode real-world payloads pay).
    Lossy like any JPEG: the roundtrip contract is tolerance, not
    identity, so ORACLE fixtures keep using the flat encoder.

    JFIF RGB -> YCbCr, edge-replicated MCU padding, 2x2 box chroma
    downsample for 4:2:0 ('444' keeps full chroma; gray input emits a
    single-component frame), batched forward DCT (the IDCT basis
    transposed), uniform-q quantization, Annex-K-style full canonical
    tables declared in DHT."""
    import numpy as np

    comp_coefs, sub420 = _jpeg_quantized_coefs(rgb, w, h, q, subsampling)
    ncomp = len(comp_coefs)

    out = bytearray(b"\xff\xd8")
    out += _jpeg_seg(0xDB, bytes([0x00]) + bytes([q] * 64))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        samp = 0x22 if (sub420 and ci == 0) else 0x11
        sof += bytes([ci + 1, samp, 0])
    out += _jpeg_seg(0xC0, sof)
    out += _jpeg_seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_FULL_DC_BITS) + bytes(_JPEG_FULL_DC_VALS),
    )
    out += _jpeg_seg(
        0xC4,
        bytes([0x10]) + bytes(_JPEG_FULL_AC_BITS) + bytes(_JPEG_FULL_AC_VALS),
    )
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    out += _jpeg_seg(0xDA, sos + bytes([0, 63, 0]))

    dc_codes = _jpeg_huffman_codes(_JPEG_FULL_DC_BITS)
    ac_code_of = {
        v: c
        for v, c in zip(
            _JPEG_FULL_AC_VALS, _jpeg_huffman_codes(_JPEG_FULL_AC_BITS)
        )
    }
    bw_ = _JpegBitWriter()
    prev_dc = [0] * ncomp

    def put_block(row, ci):
        diff = int(row[0]) - prev_dc[ci]
        prev_dc[ci] = int(row[0])
        s = abs(diff).bit_length()
        ln, code = dc_codes[s]
        bw_.put(code, ln)
        if s:
            bw_.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        nz = np.nonzero(row[1:])[0]
        k = 0  # last written zigzag index
        for pos in nz:
            run = int(pos) - k  # zeros since the previous nonzero
            k = int(pos) + 1
            while run >= 16:
                ln, code = ac_code_of[0xF0]
                bw_.put(code, ln)
                run -= 16
            v = int(row[1 + pos])
            sz = abs(v).bit_length()
            ln, code = ac_code_of[(run << 4) | sz]
            bw_.put(code, ln)
            bw_.put(v if v >= 0 else v + (1 << sz) - 1, sz)
        if k <= 62:
            ln, code = ac_code_of[0x00]
            bw_.put(code, ln)

    if sub420:
        qy, ybh, ybw = comp_coefs[0]
        qcb, cbh, cbw = comp_coefs[1]
        qcr = comp_coefs[2][0]
        for mr in range(cbh):
            for mc in range(cbw):
                for byy in range(2):
                    for bxx in range(2):
                        put_block(qy[(2 * mr + byy) * ybw + 2 * mc + bxx], 0)
                put_block(qcb[mr * cbw + mc], 1)
                put_block(qcr[mr * cbw + mc], 2)
    else:
        qs = [c[0] for c in comp_coefs]
        nblocks = comp_coefs[0][1] * comp_coefs[0][2]
        for t in range(nblocks):
            for ci in range(ncomp):
                put_block(qs[ci][t], ci)
    out += bw_.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_encode_prog_py(
    rgb: bytes,
    w: int,
    h: int,
    q: int = 8,
    subsampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """PROGRESSIVE JPEG encoder (round 15 — T.81 Annex G, the
    jcphuff-shaped twin of ``_jpeg_decode_prog_py``): the SAME
    quantized coefficients as ``_jpeg_encode_dct_py`` (shared
    `_jpeg_quantized_coefs` front half — so a progressive payload and
    its baseline twin decode to BIT-IDENTICAL pixels, the cross-check
    `test_jpeg_progressive_equals_baseline` pins), emitted over a
    libjpeg-like scan script exercising every progressive decode
    path: interleaved DC first at Al=1, spectrally-split luma AC first
    scans at Al=2 (1..5 then 6..63), chroma AC first at Al=1, the AC
    refinement correction-bit walk down to Al=0 (two passes for
    luma), and the DC refinement bit plane. EOB runs fold trailing
    empty bands across blocks (the r<<4 symbols of the dedicated
    uniform-8-bit AC table above); ``restart_interval`` inserts
    cycling RST markers per scan with predictor/EOB-run/correction
    state reset, like the sequential encoder."""
    comp_coefs, sub420 = _jpeg_quantized_coefs(rgb, w, h, q, subsampling)
    ncomp = len(comp_coefs)
    if sub420:
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # padded block grids from the coefficient arrays; MCU + real grids
    pad_bh = [c[1] for c in comp_coefs]
    pad_bw = [c[2] for c in comp_coefs]
    mcux, mcuy = pad_bw[0] // samp[0][0], pad_bh[0] // samp[0][1]
    real = []
    for hi, vi in samp:
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        real.append(((ch + 7) // 8, (cw + 7) // 8))

    out = bytearray(b"\xff\xd8")
    out += _jpeg_seg(0xDB, bytes([0x00]) + bytes([q] * 64))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += _jpeg_seg(0xC2, sof)
    out += _jpeg_seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_FULL_DC_BITS) + bytes(_JPEG_FULL_DC_VALS),
    )
    out += _jpeg_seg(
        0xC4,
        bytes([0x10]) + bytes(_JPEG_PROG_AC_BITS) + bytes(_JPEG_PROG_AC_VALS),
    )
    if restart_interval:
        out += _jpeg_seg(0xDD, struct.pack(">H", restart_interval))

    dc_codes = _jpeg_huffman_codes(_JPEG_FULL_DC_BITS)
    ac_code_of = {
        v: c
        for v, c in zip(
            _JPEG_PROG_AC_VALS, _jpeg_huffman_codes(_JPEG_PROG_AC_BITS)
        )
    }

    def rst_marker(entropy, bw, u):
        """Byte-align, emit the cycling RST marker, hand back a fresh
        bit writer — the shared restart tail of all four scan
        emitters (round-15 review dedup; per-scan state resets stay
        at the call sites that own the state)."""
        entropy += bw.flush()
        entropy += bytes([0xFF, 0xD0 + ((u // restart_interval - 1) & 7)])
        return _JpegBitWriter()

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            body += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
        return _jpeg_seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_blocks(comp_ids):
        """Unit -> [(ci, block_index)] for a DC scan (interleaved MCU
        order when several components, real-raster when one)."""
        if len(comp_ids) > 1:
            units = mcux * mcuy
            def blocks(u):
                mr, mc = divmod(u, mcux)
                out = []
                for ci in comp_ids:
                    hi, vi = samp[ci]
                    for byy in range(vi):
                        for bxx in range(hi):
                            out.append(
                                (ci, (mr * vi + byy) * pad_bw[ci]
                                 + (mc * hi + bxx))
                            )
                return out
        else:
            ci = comp_ids[0]
            bhr, bwr = real[ci]
            units = bhr * bwr
            def blocks(u):
                br, bc = divmod(u, bwr)
                return [(ci, br * pad_bw[ci] + bc)]
        return units, blocks

    def dc_first(comp_ids, al):
        units, blocks = dc_blocks(comp_ids)
        entropy = bytearray()
        bw = _JpegBitWriter()
        pred = {ci: 0 for ci in comp_ids}
        for u in range(units):
            if restart_interval and u and u % restart_interval == 0:
                bw = rst_marker(entropy, bw, u)
                pred = {ci: 0 for ci in comp_ids}
            for ci, bidx in blocks(u):
                v = int(comp_coefs[ci][0][bidx, 0]) >> al
                diff = v - pred[ci]
                pred[ci] = v
                s = abs(diff).bit_length()
                ln, code = dc_codes[s]
                bw.put(code, ln)
                if s:
                    bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        entropy += bw.flush()
        return bytes(entropy)

    def dc_refine(comp_ids, al):
        units, blocks = dc_blocks(comp_ids)
        entropy = bytearray()
        bw = _JpegBitWriter()
        for u in range(units):
            if restart_interval and u and u % restart_interval == 0:
                bw = rst_marker(entropy, bw, u)
            for ci, bidx in blocks(u):
                bw.put((int(comp_coefs[ci][0][bidx, 0]) >> al) & 1, 1)
        entropy += bw.flush()
        return bytes(entropy)

    def ac_first(ci, ss, se, al):
        qz = comp_coefs[ci][0]
        bhr, bwr = real[ci]
        units = bhr * bwr
        entropy = bytearray()
        bw = _JpegBitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                ln, code = ac_code_of[r << 4]
                bw.put(code, ln)
                if r:
                    bw.put(eobrun - (1 << r), r)
                eobrun = 0

        for u in range(units):
            if restart_interval and u and u % restart_interval == 0:
                flush_eob()
                bw = rst_marker(entropy, bw, u)
            br, bc = divmod(u, bwr)
            row = qz[br * pad_bw[ci] + bc]
            r = 0
            for k in range(ss, se + 1):
                v = int(row[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    ln, code = ac_code_of[0xF0]
                    bw.put(code, ln)
                    r -= 16
                s = t.bit_length()
                ln, code = ac_code_of[(r << 4) | s]
                bw.put(code, ln)
                x = t if v > 0 else -t
                bw.put(x if x >= 0 else x + (1 << s) - 1, s)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        entropy += bw.flush()
        return bytes(entropy)

    def ac_refine(ci, ss, se, ah, al):
        qz = comp_coefs[ci][0]
        bhr, bwr = real[ci]
        units = bhr * bwr
        entropy = bytearray()
        bw = _JpegBitWriter()
        eobrun = 0
        # TWO correction-bit buffers (jcphuff's BE vs BR split — the
        # round-15 desync lesson): `pending` holds bits from COMPLETED
        # blocks' tails, emitted right after the EOB symbol that
        # covers them; `cur` holds bits since the last symbol of the
        # CURRENT block, emitted after that block's next symbol (the
        # decoder reads them during the advance following the symbol)
        pending: list[int] = []
        cur: list[int] = []

        def drain_cur():
            for b in cur:
                bw.put(b, 1)
            cur.clear()

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                ln, code = ac_code_of[r << 4]
                bw.put(code, ln)
                if r:
                    bw.put(eobrun - (1 << r), r)
                eobrun = 0
                for b in pending:
                    bw.put(b, 1)
                pending.clear()

        for u in range(units):
            if restart_interval and u and u % restart_interval == 0:
                flush_eob()
                bw = rst_marker(entropy, bw, u)
            br, bc = divmod(u, bwr)
            row = qz[br * pad_bw[ci] + bc]
            tvals = [abs(int(row[k])) >> al for k in range(ss, se + 1)]
            eobpos = ss - 1  # last newly-significant position
            for k in range(ss, se + 1):
                if tvals[k - ss] == 1:
                    eobpos = k
            r = 0
            for k in range(ss, se + 1):
                t = tvals[k - ss]
                if t == 0:
                    r += 1
                    continue
                # ZRLs only when a newly-significant coef still
                # follows; otherwise the zeros fold into the EOB run
                while r > 15 and k <= eobpos:
                    flush_eob()
                    ln, code = ac_code_of[0xF0]
                    bw.put(code, ln)
                    r -= 16
                    drain_cur()
                if t > 1:
                    # already significant: buffer the correction bit
                    cur.append(t & 1)
                    continue
                flush_eob()
                ln, code = ac_code_of[(r << 4) | 1]
                bw.put(code, ln)
                bw.put(1 if int(row[k]) > 0 else 0, 1)
                drain_cur()
                r = 0
            if r > 0 or cur:
                # the block's tail folds into an EOB run; its pending
                # correction bits ride with the run's flush
                eobrun += 1
                pending.extend(cur)
                cur.clear()
                if eobrun == 0x7FFF or len(pending) > 900:
                    flush_eob()
        flush_eob()
        entropy += bw.flush()
        return bytes(entropy)

    all_ids = list(range(ncomp))
    out += sos_header(all_ids, 0, 0, 0, 1) + dc_first(all_ids, 1)
    out += sos_header([0], 1, 5, 0, 2) + ac_first(0, 1, 5, 2)
    out += sos_header([0], 6, 63, 0, 2) + ac_first(0, 6, 63, 2)
    for ci in range(1, ncomp):
        out += sos_header([ci], 1, 63, 0, 1) + ac_first(ci, 1, 63, 1)
    out += sos_header([0], 1, 63, 2, 1) + ac_refine(0, 1, 63, 2, 1)
    out += sos_header(all_ids, 0, 0, 1, 0) + dc_refine(all_ids, 0)
    out += sos_header([0], 1, 63, 1, 0) + ac_refine(0, 1, 63, 1, 0)
    for ci in range(1, ncomp):
        out += sos_header([ci], 1, 63, 1, 0) + ac_refine(ci, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


_JPEG_IDCT_M = None


def _jpeg_idct_matrix():
    global _JPEG_IDCT_M
    if _JPEG_IDCT_M is None:
        import math

        import numpy as np

        _JPEG_IDCT_M = np.array(
            [
                [
                    (math.sqrt(0.5) if u == 0 else 1.0) / 2
                    * math.cos((2 * x + 1) * u * math.pi / 16)
                    for x in range(8)
                ]
                for u in range(8)
            ]
        )
    return _JPEG_IDCT_M


def _jpeg_decode_py(payload: bytes) -> dict | None:
    """Real dependency-free baseline JPEG decode (round 14): marker
    walk (APPn/COM skipped), DQT / DHT loads (any number of segments,
    any valid canonical tables — not just the encoder's), SOF0 frame
    header, then the full entropy decode per 8x8 block: Huffman DC
    category + difference bits with the running predictor, Huffman AC
    run/size symbols (EOB, ZRL, magnitude bits), dequantization,
    zigzag ordering, and the type-III DCT via one numpy matmul per
    block, level shift, clamp, edge crop.

    Scope: baseline sequential (SOF0), 8-bit, grayscale OR color with
    per-component sampling factors in {1, 2} per axis — 4:4:4 (all
    1x1), 4:2:0 (Y 2x2, chroma 1x1 — the dominant real-world shape,
    round 15), and 4:2:2 (Y 2x1). Interleaved MCUs carry Hi x Vi
    blocks per component in raster order (T.81 A.2.3); each component
    keeps its own quantization + Huffman table selection and DC
    predictor across ALL its blocks in the scan. Subsampled chroma
    upsamples by SAMPLE REPLICATION (each chroma sample covers its
    Hmax/Hi x Vmax/Vi pixel block — the box/nearest convention;
    smooth-upsampling decoders diverge only on non-flat chroma, which
    is why the oracle fixtures keep chroma flat per block). The JFIF
    YCbCr -> RGB conversion runs as floor(x + 0.5) so an SQL oracle
    replays the identical IEEE expression. Restart intervals are
    honored (DRI + cycling RST0-7 markers: per-segment byte-aligned
    bit reading, DC predictors reset — the error-resilience framing
    real-world encoders emit; DRI counts MCUs). Sampling factors of
    3/4, progressive scans (SOF2), and 12-bit precision return None —
    refusal, never approximation, like the module's other decoders.
    Any structural corruption (truncated segment, undefined Huffman
    code, coefficient index past 63, missing table, out-of-order or
    DRI-less restart markers, wrong restart cadence) also returns
    None."""
    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, list[int]] = {}
    # (table class, table id) -> the (lut, maxc16, minc, valptr, vals)
    # decode structure from _jpeg_decoder_table
    huff: dict[tuple[int, int], tuple] = {}
    w = h = None
    comps = None
    data = None
    dri = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes; real-world encoders emit them for alignment.
        # Skip the run so fill padding is decoded, not refused
        # (round-15 ADVICE).
        while payload[pos + 1] == 0xFF and pos + 5 <= len(payload):
            pos += 1
        marker = payload[pos + 1]
        if marker == 0x01:  # TEM: standalone, no length segment
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            return None
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            return None
        pos += 2 + seglen
        if marker == 0xDB:  # DQT: one or more tables
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0 or b + 65 > len(body):
                    return None  # 16-bit tables: not baseline-8
                qt[tq] = list(body[b + 1 : b + 65])
                b += 65
        elif marker == 0xC4:  # DHT: one or more tables
            b = 0
            while b + 17 <= len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = body[b + 1 : b + 17]
                n = sum(bits)
                vals = body[b + 17 : b + 17 + n]
                if len(vals) != n:
                    return None
                huff[(tc, th)] = _jpeg_decoder_table_cached(bits, vals)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6 or body[0] != 8:
                return None
            h, w = struct.unpack_from(">HH", body, 1)
            nf = body[5]
            # 1 component (grayscale) or 3 components with sampling
            # factors in {1, 2} per axis: 4:4:4 (all 1x1), 4:2:0
            # (Y 2x2, chroma 1x1), 4:2:2 (Y 2x1) — the shapes
            # real-world encoders emit (round 15). Subsampled chroma
            # upsamples by SAMPLE REPLICATION (each chroma sample
            # covers its Hmax/Hi x Vmax/Vi pixel block — the
            # box/nearest convention, exact for the flat fixtures);
            # smooth-upsampling decoders differ on non-flat content,
            # which is why the oracle fixtures stay flat per chroma
            # block. Sampling factors of 3/4 refuse.
            if nf not in (1, 3) or w < 1 or h < 1:
                return None
            if w * h > _JPEG_MAX_PIXELS:
                return None  # allocation cap, see _JPEG_MAX_PIXELS
            if len(body) != 6 + 3 * nf:
                return None
            comps = []
            for ci in range(nf):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if nf == 1:
                    # single-component frames carry no interleaving;
                    # any declared factor decodes block-by-block
                    hi = vi = 1
                elif not (1 <= hi <= 2 and 1 <= vi <= 2):
                    return None
                # (id, H, V, quant tbl)
                comps.append((cid, hi, vi, body[8 + 3 * ci]))
        elif marker == 0xC2:
            # progressive DCT (round 15): its multi-scan structure
            # gets a dedicated walk — re-dispatch on the full payload
            return _jpeg_decode_prog_py(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended / lossless / arithmetic frames
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            if len(body) != 2:
                return None
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            if comps is None:
                return None  # scan before frame header
            ns = body[0] if body else 0
            if len(body) != 1 + 2 * ns + 3 or ns != len(comps):
                return None  # interleaved full scan only
            scan_tabs = {}
            for ci in range(ns):
                cid = body[1 + 2 * ci]
                sel = body[2 + 2 * ci]
                scan_tabs[cid] = (sel >> 4, sel & 0x0F)  # (Td, Ta)
            off = 1 + 2 * ns
            if body[off] != 0 or body[off + 1] != 63 or body[off + 2] != 0:
                return None  # not a baseline full scan
            # entropy data runs to EOI; RST0-7 markers are part of the
            # stream (segment separators), and 0xFF FILL-BYTE runs
            # before a marker are spec-legal padding (T.81 B.1.1.2 —
            # round-15 review: the pre-SOS walk tolerated them but
            # this walk refused them). An FF followed by FF is fill:
            # keep walking — trailing fill bytes land at a segment
            # tail where the bit reader never consumes them, because
            # the MCU count bounds the read. Anything else ends the
            # scan and must be EOI.
            end = pos
            while end + 1 < len(payload):
                nxt = payload[end + 1]
                if payload[end] == 0xFF and nxt not in (0x00, 0xFF) and not (
                    0xD0 <= nxt <= 0xD7
                ):
                    break
                end += 1
            if payload[end : end + 2] != b"\xff\xd9":
                return None
            data = payload[pos:end]
            break
        # APPn / COM / others: skipped
    if data is None or w is None or comps is None:
        return None
    # resolve each component's quant + Huffman tables up front; the
    # quant vector is pre-permuted into DE-ZIGZAG order so the batched
    # dequant at the end is one broadcast multiply
    zz = np.array(_JPEG_ZIGZAG)
    plan = []
    for cid, hi, vi, tq in comps:
        if cid not in scan_tabs or tq not in qt:
            return None
        td, ta = scan_tabs[cid]
        if (0, td) not in huff or (1, ta) not in huff:
            return None
        qdezz = np.empty(64, np.float64)
        qdezz[zz] = qt[tq]
        plan.append((qdezz, huff[(0, td)], huff[(1, ta)], hi, vi))
    hmax = max(p[3] for p in plan)
    vmax = max(p[4] for p in plan)
    # every component's upsample factor must be integral (automatic
    # for factors in {1, 2}, kept explicit for the invariant)
    if any(hmax % p[3] or vmax % p[4] for p in plan):
        return None

    # MCU geometry (T.81 A.2.3): an interleaved MCU spans
    # 8*Hmax x 8*Vmax pixels and carries Hi x Vi blocks per component
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    total_mcus = mcux * mcuy
    # split the scan at RST0-7 markers with cycling + cadence checks
    # (shared with the progressive decoder — round-15 review dedup)
    segs = _jpeg_split_restart_segs(data, dri, total_mcus)
    if segs is None:
        return None

    # entropy decode over each segment's de-stuffed bytes. Round 15
    # replaced the per-BIT reader with a buffered integer window (one
    # 16-bit canonical-Huffman peek + O(1) magnitude reads); round 16
    # INLINES those reader closures into the MCU loop — at ~2 closure
    # calls per symbol the call overhead was ~30% of a coefficient-
    # dense entropy pass (PERF.md). The inlined bodies are the
    # identical expression sequence (refill, left-aligned peek, 8-bit
    # LUT hit or T.81 F.2.2.3 mincode/maxcode walk, overrun refusal,
    # T.81 F.2.2.1 EXTEND), so results are bit-identical — pinned by
    # the randomized parity tests against the literal-definition
    # reference decoder. bp tracks real bits consumed so zero-padded
    # peeks past the segment end refuse exactly like the old reader.
    stream = segs[0].replace(b"\xff\x00", b"\xff")
    sl = len(stream)  # hoisted out of the refill loops
    nb = 8 * sl  # total real bits in the segment
    bp = 0  # bits consumed
    bi = 0  # next byte to pull into the window
    win = 0  # lookahead window, wn valid low bits
    wn = 0

    zz_list = _JPEG_ZIGZAG
    # per-component coefficient accumulators in PLANE-RASTER block
    # order: a flat Python list (fast scalar writes for the sparse
    # nonzero coefficients) reshaped once for the batched dequant +
    # IDCT below. bw/bh = the component's block-grid dimensions.
    comp_bw = [mcux * hi for (_, _, _, hi, _) in plan]
    comp_bh = [mcuy * vi for (_, _, _, _, vi) in plan]
    coefs = [
        [0.0] * (comp_bw[ci] * comp_bh[ci] * 64)
        for ci in range(len(plan))
    ]
    prev_dc = [0] * len(plan)
    for mcu in range(total_mcus):
        if dri and mcu and mcu % dri == 0:
            # restart: next segment, byte-aligned, DC predictors reset
            stream = segs[mcu // dri].replace(b"\xff\x00", b"\xff")
            sl = len(stream)
            nb = 8 * sl
            bp = bi = win = wn = 0
            prev_dc = [0] * len(plan)
        mr, mc = mcu // mcux, mcu % mcux
        # interleaved MCU: Hi x Vi blocks per component in raster
        # order within the MCU (T.81 A.2.3), components in scan order
        for ci, (q, dc_tab, ac_tab, hi, vi) in enumerate(plan):
            cc = coefs[ci]
            bw_ci = comp_bw[ci]
            dlut, dmaxc, dminc, dvalptr, dvals = dc_tab
            alut, amaxc, aminc, avalptr, avals = ac_tab
            for byy in range(vi):
                for bxx in range(hi):
                    base = 64 * ((mr * vi + byy) * bw_ci + (mc * hi + bxx))
                    # DC category symbol (inlined read_sym)
                    while wn < 16 and bi < sl:
                        win = (win << 8) | stream[bi]
                        bi += 1
                        wn += 8
                    pk = (win << (16 - wn)) if wn < 16 else (win >> (wn - 16))
                    e = dlut[pk >> 8]
                    if e is not None:
                        s, ln = e
                    else:
                        ln = 9
                        while ln <= 16 and pk > dmaxc[ln]:
                            ln += 1
                        if ln > 16:
                            return None  # undefined code
                        s = dvals[dvalptr[ln] + (pk >> (16 - ln)) - dminc[ln]]
                    if bp + ln > nb:
                        return None  # code ran past the real bits
                    wn -= ln
                    win &= (1 << wn) - 1
                    bp += ln
                    if s > 11:
                        return None
                    if s:
                        # DC difference bits + EXTEND (inlined)
                        if bp + s > nb:
                            return None
                        while wn < s:
                            win = (win << 8) | stream[bi]
                            bi += 1
                            wn += 8
                        wn -= s
                        v = win >> wn
                        win &= (1 << wn) - 1
                        bp += s
                        prev_dc[ci] += (
                            v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                        )
                    cc[base] = float(prev_dc[ci])
                    k = 1
                    while k <= 63:
                        # AC run/size symbol (inlined read_sym)
                        while wn < 16 and bi < sl:
                            win = (win << 8) | stream[bi]
                            bi += 1
                            wn += 8
                        pk = (
                            (win << (16 - wn))
                            if wn < 16
                            else (win >> (wn - 16))
                        )
                        e = alut[pk >> 8]
                        if e is not None:
                            rs, ln = e
                        else:
                            ln = 9
                            while ln <= 16 and pk > amaxc[ln]:
                                ln += 1
                            if ln > 16:
                                return None  # undefined code
                            rs = avals[
                                avalptr[ln] + (pk >> (16 - ln)) - aminc[ln]
                            ]
                        if bp + ln > nb:
                            return None  # code ran past the real bits
                        wn -= ln
                        win &= (1 << wn) - 1
                        bp += ln
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL: 16 zeros
                            k += 16
                            continue
                        k += rs >> 4
                        sz = rs & 0x0F
                        if k > 63 or sz == 0:
                            return None
                        # magnitude bits + EXTEND (inlined read_bits)
                        if bp + sz > nb:
                            return None
                        while wn < sz:
                            win = (win << 8) | stream[bi]
                            bi += 1
                            wn += 8
                        wn -= sz
                        v = win >> wn
                        win &= (1 << wn) - 1
                        bp += sz
                        cc[base + zz_list[k]] = float(
                            v - (1 << sz) + 1 if v < (1 << (sz - 1)) else v
                        )
                        k += 1
    # batched dequant + IDCT per component: ONE broadcast multiply and
    # ONE stacked matmul pair replace the per-block numpy round trips
    # (bit-identical results — np.matmul applies the same kernel per
    # stacked slice, verified 0.0 max diff against the per-block
    # path). NOTE a dc/8 algebraic shortcut for DC-only planes was
    # tried and REJECTED: at half-integer ties (dc*q = odd multiple
    # of 4, impossible at the oracle fixtures' q=8 but reachable at
    # other q) rint(dc/8) rounds half-even while the matmul's 1-ulp
    # accumulation rounds away — 33 of the 2048 reachable dequantized
    # DCs diverge by 1. Same floats or nothing.
    dequant = [
        np.asarray(coefs[ci], np.float64).reshape(-1, 64) * qdezz
        for ci, (qdezz, _, _, _, _) in enumerate(plan)
    ]
    geom = [
        (comp_bh[ci], comp_bw[ci], hi, vi)
        for ci, (_, _, _, hi, vi) in enumerate(plan)
    ]
    return _jpeg_render(dequant, geom, hmax, vmax, w, h)


def _jpeg_render(dequant, geom, hmax, vmax, w, h) -> dict:
    """The shared back half of BOTH JPEG decoders (baseline and
    progressive use the IDENTICAL float path — the round-15 dc/8
    lesson generalized): stacked-matmul IDCT over dequantized
    DE-ZIGZAG coefficient rows, block-grid assembly, replication
    upsample, crop, and the grayscale / floor(x+0.5) JFIF YCbCr->RGB
    statistics. ``dequant``: per-component float64 (nblocks, 64);
    ``geom``: per-component (block_h, block_w, Hi, Vi)."""
    import numpy as np

    M = _jpeg_idct_matrix()
    MT = M.T.copy()
    planes = []
    for arr, (bh_ci, bw_ci, hi, vi) in zip(dequant, geom):
        spatial = MT @ arr.reshape(-1, 8, 8) @ M + 128.0
        blocks = np.clip(np.rint(spatial), 0, 255).astype(np.uint8)
        plane = (
            blocks.reshape(bh_ci, bw_ci, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_ci * 8, bw_ci * 8)
        )
        # upsample subsampled components by SAMPLE REPLICATION (each
        # chroma sample covers its Hmax/Hi x Vmax/Vi pixel block),
        # then crop the MCU padding
        if hi != hmax or vi != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        planes.append(plane[:h, :w])
    n = w * h
    if len(planes) == 1:
        img = planes[0]
        mean = round(int(img.sum(dtype=np.int64)) / n, 6)
        return {
            "width": w,
            "height": h,
            "bpp": 8,
            "n_pixel_bytes": n,
            # grayscale: one plane feeds all three channel slots
            "mean_r": mean,
            "mean_g": mean,
            "mean_b": mean,
            "mean_all": mean,
            "pixels": img.tobytes(),
        }
    # color: JFIF YCbCr -> RGB on the (upsampled) full-resolution
    # planes.
    # floor(x + 0.5) (not rint) so a SQL oracle replays the SAME
    # IEEE expression — no round-half-even vs half-away divergence.
    Y = planes[0].astype(np.float64)
    Cb = planes[1].astype(np.float64) - 128.0
    Cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            np.floor(Y + 1.402 * Cr + 0.5),
            np.floor(Y - 0.344136 * Cb - 0.714136 * Cr + 0.5),
            np.floor(Y + 1.772 * Cb + 0.5),
        ],
        axis=-1,
    )
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    sums = [int(s) for s in rgb.reshape(-1, 3).sum(axis=0, dtype=np.int64)]
    return {
        "width": w,
        "height": h,
        "bpp": 24,
        "n_pixel_bytes": 3 * n,
        "mean_r": round(sums[0] / n, 6),
        "mean_g": round(sums[1] / n, 6),
        "mean_b": round(sums[2] / n, 6),
        "mean_all": round(sum(sums) / (3 * n), 6),
        "pixels": rgb.tobytes(),
    }


class _JpegScanReader:
    """De-stuffed entropy-segment bit reader for the PROGRESSIVE
    decoder — the baseline reader's buffered-window design in class
    form (progressive is not the bench hot path; the baseline keeps
    its closure-local variant). bits()/sym() return None on overrun
    or undefined codes, like the baseline reader."""

    __slots__ = ("s", "nb", "bp", "bi", "win", "wn")

    def __init__(self, seg: bytes) -> None:
        self.s = seg.replace(b"\xff\x00", b"\xff")
        self.nb = 8 * len(self.s)
        self.bp = 0
        self.bi = 0
        self.win = 0
        self.wn = 0

    def bits(self, n: int):
        if self.bp + n > self.nb:
            return None
        while self.wn < n:
            self.win = (self.win << 8) | self.s[self.bi]
            self.bi += 1
            self.wn += 8
        self.wn -= n
        v = self.win >> self.wn
        self.win &= (1 << self.wn) - 1
        self.bp += n
        return v

    def sym(self, tab):
        while self.wn < 16 and self.bi < len(self.s):
            self.win = (self.win << 8) | self.s[self.bi]
            self.bi += 1
            self.wn += 8
        pk = (
            (self.win << (16 - self.wn))
            if self.wn < 16
            else (self.win >> (self.wn - 16))
        )
        lut, maxc16, minc, valptr, vals = tab
        e = lut[pk >> 8]
        if e is not None:
            sym, ln = e
        else:
            ln = 9
            while ln <= 16 and pk > maxc16[ln]:
                ln += 1
            if ln > 16:
                return None
            sym = vals[valptr[ln] + (pk >> (16 - ln)) - minc[ln]]
        if self.bp + ln > self.nb:
            return None
        self.wn -= ln
        self.win &= (1 << self.wn) - 1
        self.bp += ln
        return sym


def _jpeg_split_restart_segs(data: bytes, dri: int, units: int):
    """Split one scan's entropy data at RST0-7 markers with the
    cycling-sequence and cadence checks the baseline decoder applies
    (T.81 F.2.1.3.1 / G restart semantics). Returns the segment list
    or None on violation."""
    segs: list[bytes] = []
    seg_start = 0
    i = 0
    next_rst = 0
    n = len(data)
    # jump between 0xFF bytes with C-speed find() instead of a
    # per-byte Python walk (r18: the walk was ~12% of a whole baseline
    # decode under cProfile; 0xFF is rare in entropy data — stuffing
    # and markers only — so find() visits a handful of positions).
    # Identical decision sequence: positions without 0xFF could never
    # match the old loop's condition.
    while True:
        i = data.find(b"\xff", i)
        if i < 0 or i + 1 >= n:
            break
        if 0xD0 <= data[i + 1] <= 0xD7:
            if dri == 0 or (data[i + 1] - 0xD0) != (next_rst & 7):
                return None
            segs.append(data[seg_start:i])
            seg_start = i + 2
            next_rst += 1
            i += 2
        else:
            i += 1
    segs.append(data[seg_start:])
    if dri and len(segs) != (units + dri - 1) // dri:
        return None
    if not dri and len(segs) != 1:
        return None
    return segs


def _jpeg_decode_prog_py(payload: bytes) -> dict | None:
    """PROGRESSIVE JPEG decode (round 15 — T.81 Annex G, the web's
    other dominant JPEG shape beside 4:2:0): SOF2 frames whose
    coefficients arrive over MULTIPLE scans — spectral selection
    (Ss..Se coefficient bands per scan) and successive approximation
    (Ah/Al bit-plane passes). All four scan kinds decode: DC first
    (interleaved or single-component, predictors on the Al-shifted
    values), DC refinement (one raw bit per block ORed at bit Al), AC
    first (EOB-run coding: symbol r<<4 means a run of 1<<r + extra
    end-of-band blocks), and AC refinement (the G.1.2.3 correction-bit
    walk: ±1<<Al insertions whose zero-runs count only zero-history
    positions, with correction bits appended for every already-nonzero
    coefficient crossed, including through ZRLs and EOB runs).

    Sampling factors in {1, 2} per axis like the baseline decoder; AC
    scans are single-component NON-interleaved over the component's
    REAL block grid (ceil(ceil(w*Hi/Hmax)/8) wide — the MCU-padded
    dummy blocks of interleaved DC scans are never AC-coded, exactly
    the T.81 A.2.2 geometry split). DRI/RST honored per scan (DC
    predictors and EOB run reset per segment; DRI may change between
    scans). Successive-approximation LEGALITY is enforced per
    coefficient index: a band's first scan must have Ah=0, refinements
    must step Al down by exactly 1 from the current precision, and at
    EOI every coefficient of every component must have reached Al=0 —
    a partially-transmitted progressive stream REFUSES rather than
    rendering an approximation (the module contract). Reconstruction
    (dequant, stacked-matmul IDCT, replication upsample, floor(x+0.5)
    color) is the SAME code path as the baseline decoder
    (_jpeg_render), so a stream encoded progressively and its
    baseline twin decode to bit-identical pixels — pinned by
    test_jpeg_progressive_equals_baseline."""
    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], tuple] = {}
    w = h = None
    comps = None  # [(cid, hi, vi, tq)]
    dri = 0
    hmax = vmax = mcux = mcuy = 0
    coefs: list[list[int]] = []  # per comp, padded-grid blocks x 64 (ZIGZAG order)
    cur_al: list[list] = []  # per comp, per zigzag index: None | int
    real_grid: list[tuple[int, int]] = []  # (bhr, bwr) non-interleaved grids
    pad_bw: list[int] = []
    # quantization tables LATCH at each component's first scan (T.81:
    # a table must be defined before first use; a mid-stream DQT
    # redefinition must not retroactively re-dequantize earlier
    # scans — round-15 review)
    latched_q: list = []
    saw_eoi = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        while payload[pos + 1] == 0xFF and pos + 3 <= len(payload):
            pos += 1
        marker = payload[pos + 1]
        if marker == 0x01:  # TEM: standalone
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if pos + 4 > len(payload):
            return None
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            return None
        pos += 2 + seglen
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0 or b + 65 > len(body):
                    return None
                qt[tq] = list(body[b + 1 : b + 65])
                b += 65
        elif marker == 0xC4:
            b = 0
            while b + 17 <= len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = body[b + 1 : b + 17]
                nv = sum(bits)
                vals = body[b + 17 : b + 17 + nv]
                if len(vals) != nv:
                    return None
                huff[(tc, th)] = _jpeg_decoder_table_cached(bits, vals)
                b += 17 + nv
        elif marker == 0xC2:
            if comps is not None or len(body) < 6 or body[0] != 8:
                return None
            h, w = struct.unpack_from(">HH", body, 1)
            nf = body[5]
            if nf not in (1, 3) or w < 1 or h < 1:
                return None
            if w * h > _JPEG_MAX_PIXELS:
                return None  # allocation cap, see _JPEG_MAX_PIXELS
            if len(body) != 6 + 3 * nf:
                return None
            comps = []
            for ci in range(nf):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if nf == 1:
                    hi = vi = 1
                elif not (1 <= hi <= 2 and 1 <= vi <= 2):
                    return None
                comps.append((cid, hi, vi, body[8 + 3 * ci]))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for _, hi, vi, _tq in comps:
                bw_c, bh_c = mcux * hi, mcuy * vi
                coefs.append([0] * (bw_c * bh_c * 64))
                cur_al.append([None] * 64)
                cw = (w * hi + hmax - 1) // hmax
                ch = (h * vi + vmax - 1) // vmax
                real_grid.append(((ch + 7) // 8, (cw + 7) // 8))
                pad_bw.append(bw_c)
                latched_q.append(None)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # a second/incompatible frame header
        elif marker == 0xDD:
            if len(body) != 2:
                return None
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if comps is None:
                return None
            ns = body[0] if body else 0
            if not 1 <= ns <= 4 or len(body) != 1 + 2 * ns + 3:
                return None
            cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
            scomps = []
            seen = set()
            for si in range(ns):
                cid = body[1 + 2 * si]
                sel = body[2 + 2 * si]
                if cid not in cid_to_idx or cid in seen:
                    return None
                seen.add(cid)
                scomps.append((cid_to_idx[cid], sel >> 4, sel & 0x0F))
            off = 1 + 2 * ns
            ss, se, a = body[off], body[off + 1], body[off + 2]
            ah, al = a >> 4, a & 0x0F
            # locate the scan's entropy data (fill-byte tolerant)
            end = pos
            while end + 1 < len(payload):
                nxt = payload[end + 1]
                if payload[end] == 0xFF and nxt not in (0x00, 0xFF) and not (
                    0xD0 <= nxt <= 0xD7
                ):
                    break
                end += 1
            data = payload[pos:end]
            pos = end
            for ci, _td, _ta in scomps:
                if latched_q[ci] is None:
                    tq = comps[ci][3]
                    if tq not in qt:
                        return None  # table undefined at first use
                    latched_q[ci] = list(qt[tq])
            if not _jpeg_prog_scan(
                coefs, cur_al, comps, scomps, huff, ss, se, ah, al,
                data, dri, mcux, mcuy, real_grid, pad_bw,
            ):
                return None
        # APPn / COM: skipped
    if not saw_eoi or comps is None:
        return None
    # completeness: every coefficient of every component refined to
    # full precision — partial progressive streams refuse
    for ca in cur_al:
        if any(v != 0 for v in ca):
            return None
    zz = np.array(_JPEG_ZIGZAG)
    dequant = []
    geom = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        if latched_q[ci] is None:
            return None  # component never scanned (completeness also catches)
        arr_zz = np.asarray(coefs[ci], np.float64).reshape(-1, 64)
        arr_zz *= np.asarray(latched_q[ci], np.float64)
        dz = np.empty_like(arr_zz)
        dz[:, zz] = arr_zz  # zigzag -> natural order
        dequant.append(dz)
        geom.append((mcuy * vi, mcux * hi, hi, vi))
    return _jpeg_render(dequant, geom, hmax, vmax, w, h)


def _jpeg_prog_scan(
    coefs, cur_al, comps, scomps, huff, ss, se, ah, al,
    data, dri, mcux, mcuy, real_grid, pad_bw,
) -> bool:
    """Decode ONE progressive scan into the coefficient state.
    Returns False on any structural or successive-approximation
    violation. scomps: [(comp_idx, Td, Ta)]."""
    if se > 63 or al > 13 or ah > 13:
        return False
    is_dc = ss == 0
    if is_dc:
        if se != 0:
            return False
        # DC scans may interleave ANY subset of the frame's
        # components (custom scan scripts emit e.g. chroma-only DC
        # scans); MCU geometry stays the FRAME grid, only the scan's
        # components contribute blocks. A single-component DC scan is
        # non-interleaved over its real block grid (T.81 A.2.2).
    else:
        if ss > se or len(scomps) != 1:
            return False
    if ah != 0 and al != ah - 1:
        return False
    band = range(ss, se + 1) if not is_dc else range(0, 1)
    # successive-approximation legality per coefficient index, then
    # record the band's new precision
    for ci, _td, _ta in scomps:
        ca = cur_al[ci]
        for k in band:
            if ah == 0:
                if ca[k] is not None:
                    return False  # band double-coded
            elif ca[k] != ah:
                return False  # refinement out of order
        if not is_dc and ca[0] is None:
            return False  # AC before the component's DC scan
        for k in band:
            ca[k] = al
    # units + per-unit block lists
    interleaved = is_dc and len(scomps) > 1
    if interleaved:
        units = mcux * mcuy
    else:
        ci0 = scomps[0][0]
        bhr, bwr = real_grid[ci0]
        units = bhr * bwr
    segs = _jpeg_split_restart_segs(data, dri, units)
    if segs is None:
        return False
    tabs = []
    for ci, td, ta in scomps:
        if is_dc and ah == 0:
            if (0, td) not in huff:
                return False
            tabs.append(huff[(0, td)])
        elif not is_dc:
            if (1, ta) not in huff:
                return False
            tabs.append(huff[(1, ta)])
        else:
            tabs.append(None)  # DC refinement: raw bits, no table
    rd = _JpegScanReader(segs[0])
    pred = [0] * len(scomps)
    eobrun = 0
    p1 = 1 << al

    def refine_nonzero(cc, base, k, se):
        """Append correction bits for already-nonzero coefs in
        base+k..base+se (G.1.2.3 EOB-run / tail handling)."""
        while k <= se:
            c = cc[base + k]
            if c != 0:
                b = rd.bits(1)
                if b is None:
                    return None
                if b and (c & p1) == 0:
                    cc[base + k] = c + (p1 if c >= 0 else -p1)
            k += 1
        return True

    for u in range(units):
        if dri and u and u % dri == 0:
            rd = _JpegScanReader(segs[u // dri])
            pred = [0] * len(scomps)
            eobrun = 0
        # the blocks this unit covers: (comp_idx, tab_idx, base)
        blocks = []
        if interleaved:
            mr, mc = divmod(u, mcux)
            for ti, (ci, _td, _ta) in enumerate(scomps):
                _cid, hi, vi, _tq = comps[ci]
                for byy in range(vi):
                    for bxx in range(hi):
                        base = 64 * (
                            (mr * vi + byy) * pad_bw[ci] + (mc * hi + bxx)
                        )
                        blocks.append((ci, ti, base))
        else:
            ci = scomps[0][0]
            bhr, bwr = real_grid[ci]
            br, bc = divmod(u, bwr)
            blocks.append((ci, 0, 64 * (br * pad_bw[ci] + bc)))
        for ci, ti, base in blocks:
            cc = coefs[ci]
            if is_dc and ah == 0:
                s = rd.sym(tabs[ti])
                if s is None or s > 11:
                    return False
                diff = 0
                if s:
                    v = rd.bits(s)
                    if v is None:
                        return False
                    diff = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                pred[ti] += diff
                cc[base] = pred[ti] << al
            elif is_dc:
                b = rd.bits(1)
                if b is None:
                    return False
                if b:
                    cc[base] |= p1
            elif ah == 0:
                # AC first scan (G.1.2.2) with EOB-run coding
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = rd.sym(tabs[ti])
                    if rs is None:
                        return False
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            x = rd.bits(r)
                            if x is None:
                                return False
                            eobrun += x
                        break
                    k += r
                    if k > se:
                        return False
                    v = rd.bits(s)
                    if v is None:
                        return False
                    v = v - (1 << s) + 1 if v < (1 << (s - 1)) else v
                    cc[base + k] = v << al
                    k += 1
            else:
                # AC refinement scan (G.1.2.3, the jdphuff walk)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = rd.sym(tabs[ti])
                        if rs is None:
                            return False
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    x = rd.bits(r)
                                    if x is None:
                                        return False
                                    eobrun += x
                                break
                            val = 0  # r == 15: ZRL, 16 zero-history skips
                        else:
                            if s != 1:
                                return False  # refinement codes only ±1
                            b = rd.bits(1)
                            if b is None:
                                return False
                            val = p1 if b else -p1
                        # advance: correction bits over nonzero
                        # history, run counts only zero positions
                        placed = False
                        while k <= se:
                            c = cc[base + k]
                            if c != 0:
                                b = rd.bits(1)
                                if b is None:
                                    return False
                                if b and (c & p1) == 0:
                                    cc[base + k] = c + (
                                        p1 if c >= 0 else -p1
                                    )
                            else:
                                if r == 0:
                                    if val:
                                        cc[base + k] = val
                                    placed = True
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                        if not placed and val:
                            return False  # run overran the band
                    else:
                        # band walked to completion without EOB
                        continue
                # EOB-run (or post-EOB tail): refine the remaining
                # nonzero coefficients of the band, then count down
                if eobrun:
                    if refine_nonzero(cc, base, k, se) is None:
                        return False
                    eobrun -= 1
    return True


def jpeg_encode(
    docs: DataFrame, text_col: str = "text", subsampling: str = "mixed"
) -> DataFrame:
    """Deterministic VALID baseline JPEG payloads from a text fixture.

    ``subsampling='mixed'`` (default, round 14): width
    ``8 * (1 + doc_id % 3)``, height ``8 * (1 + doc_id % 2)`` (1..6
    tiles). EVEN doc_ids are grayscale (tile ``k``'s flat gray value =
    byte ``k`` of md5(text + '#j')); ODD doc_ids are 4:4:4 COLOR
    (tile ``k``'s flat (Y, Cb, Cr) = bytes ``3k..3k+2`` of the
    repeated digest).

    ``subsampling='420'`` (round 15): every doc is a 4:2:0
    chroma-subsampled color JPEG — width ``16 * (1 + doc_id % 2)``,
    height ``16 * (1 + doc_id % 3)`` (1..6 MCUs), MCU ``k`` carrying
    four flat luma quadrants + one (Cb, Cr) pair = bytes
    ``6k..6k+5`` of md5(text + '#j420') repeated; restart interval
    ``doc_id % 3`` MCUs (0 = no DRI), so the cycling-RST framing is
    driver-exercised too.

    ``subsampling='prog'`` (round 15, registered as a driver query in
    round 16 per the rotation budget): every doc is a PROGRESSIVE
    grayscale JPEG — the round-14 flat-tile geometry (``8 * (1 +
    doc_id % 3)`` x ``8 * (1 + doc_id % 2)``, tile ``k`` = byte ``k``
    of md5(text + '#jp')) rendered to pixels and pushed through the
    real multi-scan progressive encoder (spectral selection +
    successive approximation + EOB runs; restart interval
    ``doc_id % 3``). A flat tile's forward DCT is DC-only and its DC
    quantizes exactly at q=8, so the decode reproduces the tile bytes
    EXACTLY and the grayscale oracle arithmetic carries over
    unchanged.

    Quantization all-8s in both modes — the combination that makes
    every decoded component sample EXACTLY its tile byte, so the
    oracle recomputes the statistics (including the floor(x+0.5) JFIF
    YCbCr -> RGB conversion and, for 4:2:0, the flat-chroma
    replication upsample) from the md5 byte stream and never decodes
    a JPEG while the engine runs the real entropy decode + IDCT.
    Arrow-batched ``mapInPandas``; map-only."""
    if subsampling not in ("mixed", "420", "prog"):
        raise ValueError(
            f"subsampling must be 'mixed', '420', or 'prog', got {subsampling!r}"
        )
    src = docs.select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("ptext")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                doc_id = int(rec.doc_id)
                if subsampling == "prog":
                    tx = 1 + doc_id % 3
                    ty = 1 + doc_id % 2
                    digest = hashlib.md5(
                        (rec.ptext + "#jp").encode("utf-8")
                    ).digest()
                    tiles = np.frombuffer(
                        digest[: tx * ty], np.uint8
                    ).reshape(ty, tx)
                    pixels = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
                    payload = _jpeg_encode_prog_py(
                        pixels.tobytes(),
                        8 * tx,
                        8 * ty,
                        restart_interval=doc_id % 3,
                    )
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media": payload,
                            "media_meta": {
                                "kind": "image",
                                "mime": "image/jpeg",
                                "n_bytes": len(payload),
                                "sha": hashlib.sha256(payload).hexdigest(),
                            },
                        }
                    )
                    continue
                if subsampling == "420":
                    tx = 1 + doc_id % 2
                    ty = 1 + doc_id % 3
                    digest = hashlib.md5(
                        (rec.ptext + "#j420").encode("utf-8")
                    ).digest()
                    payload = _jpeg_encode_py(
                        (digest * 3)[: 6 * tx * ty],
                        tx,
                        ty,
                        restart_interval=doc_id % 3,
                        subsampling="420",
                    )
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media": payload,
                            "media_meta": {
                                "kind": "image",
                                "mime": "image/jpeg",
                                "n_bytes": len(payload),
                                "sha": hashlib.sha256(payload).hexdigest(),
                            },
                        }
                    )
                    continue
                tx = 1 + doc_id % 3
                ty = 1 + doc_id % 2
                digest = hashlib.md5(
                    (rec.ptext + "#j").encode("utf-8")
                ).digest()
                if doc_id % 2:  # color: YCbCr triplet per tile
                    payload = _jpeg_encode_py(
                        (digest * 2)[: 3 * tx * ty], tx, ty
                    )
                else:
                    payload = _jpeg_encode_py(digest[: tx * ty], tx, ty)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media": payload,
                        "media_meta": {
                            "kind": "image",
                            "mime": "image/jpeg",
                            "n_bytes": len(payload),
                            "sha": hashlib.sha256(payload).hexdigest(),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media", "media_meta"])

    schema = (
        "doc_id BIGINT, media BINARY, "
        "media_meta STRUCT<kind: STRING, mime: STRING, n_bytes: BIGINT, "
        "sha: STRING>"
    )
    return src.mapInPandas(run, schema=schema)
