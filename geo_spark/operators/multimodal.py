"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes,
``mapInPandas`` fan-out, partition sizing — and since round 3 the image
decode is REAL for five library-free formats: uncompressed 24-bit BMP,
binary PPM, PNG (full chunk-walking decoder over stdlib zlib with CRC
verification and all five scanline filters, plus a matching encoder),
GIF87a/89a (real LZW with growing code widths and dictionary resets,
interlace, local/global palettes), and baseline JPEG
(operators/jpeg.py: DCT, quality-scaled quantization, frequency-built
canonical Huffman — lossy, so its contract is bounded error +
bit-exact determinism) — all pure numpy/struct codecs (round-trip
tested per variant).  AUDIO and VIDEO are real too: RIFF/WAVE PCM
parsing and MJPEG-AVI container walking with per-frame JPEG decode
(stride sampling never decodes unsampled frames).  The fixture media
table carries actual encoded BMP/PNG/JPEG images, WAV audio, and
MJPEG-AVI video.  The deterministic fake remains only as the fallback
for unrecognized raw byte blobs (and the :data:`HAVE_CODECS` guard
marks where a PIL/ffmpeg-backed path would slot in for formats beyond
this set, e.g. H.264) — the downstream pipeline (feature-extract ->
resize / frame-sample -> aggregate) is identical either way.

Batch discipline: media rows are fat (MBs), so operators re-partition by
byte budget, not row count — ``partitions_for_bytes`` — and every UDF
streams record batches (constant memory per task).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_CODECS = True
except Exception:  # pragma: no cover
    HAVE_CODECS = False

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int"
)


def synth_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fixture media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds = np.where(ids % 3 == 0, "image", np.where(ids % 3 == 1, "audio", "video"))
            rows = []
            for i, kind in zip(ids, kinds):
                rng = np.random.default_rng(int(i) + 1000)
                if kind == "image":
                    # REAL encoded payload: a seeded 32x24 RGB raster
                    # as an actual BMP, PNG, or JPEG file (rotating;
                    # PNG cycles filter types), so the decode path is
                    # a genuine parser, not a fake
                    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
                    rot = (int(i) // 3) % 3
                    if rot == 0:
                        payload = encode_bmp(img)
                    elif rot == 1:
                        payload = encode_png(
                            img, filter_type=(int(i) // 9) % 5
                        )
                    else:
                        from geo_spark.operators.jpeg import encode_jpeg

                        payload = encode_jpeg(img, quality=95)
                elif kind == "audio":
                    # REAL RIFF/WAVE payload: 256 seeded int16 samples
                    payload = encode_wav(
                        rng.integers(-32768, 32768, 256).astype(np.int16),
                        16000,
                    )
                else:
                    # REAL MJPEG AVI payload: 12 seeded 16x16 frames
                    payload = encode_avi_mjpeg(
                        [
                            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                            for _ in range(12)
                        ],
                        fps=10,
                    )
                rows.append(
                    (
                        int(i),
                        str(kind),
                        payload,
                        32 if kind == "image" else 0,
                        24 if kind == "image" else 0,
                        16000 if kind == "audio" else 0,
                        12 if kind == "video" else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "payload",
                    "width",
                    "height",
                    "sample_rate",
                    "n_frames",
                ],
            )

    return spark.range(n).repartition(partitions).mapInPandas(gen, MEDIA_SCHEMA)


def partitions_for_bytes(total_bytes: int, target_mb: int = 128) -> int:
    """Partition count sized by payload bytes (fat-row discipline)."""
    return max(1, int(np.ceil(total_bytes / (target_mb * 1024 * 1024))))


def _decode_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image decode: bytes -> (H,W) uint8."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = max(width * height, 1)
    reps = int(np.ceil(need / len(raw)))
    return np.tile(raw, reps)[:need].reshape(max(height, 1), max(width, 1))


def encode_bmp(img: np.ndarray) -> bytes:
    """(H,W,3) uint8 RGB -> uncompressed 24-bit BI_RGB BMP bytes
    (bottom-up rows, 4-byte-padded strides — the classic Windows
    layout).  Pure numpy/struct: no codec libraries involved, so the
    REAL decode path below is exercisable in any container."""
    import struct

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    row = w * 3
    pad = (4 - row % 4) % 4
    stride = row + pad
    header = struct.pack("<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    bgr = img[..., ::-1]
    body = bytearray()
    zeros = b"\x00" * pad
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + zeros
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> (H,W,3) uint8 RGB.  Handles
    bottom-up (height>0) and top-down (height<0) row order and padded
    strides; anything else raises (this is a codec for the engine's
    own fixtures plus the overwhelmingly common 24-bit case, not a
    full BMP suite)."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR -> RGB


def encode_ppm(img: np.ndarray) -> bytes:
    """(H,W,3) uint8 RGB -> binary PPM (P6)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) -> (H,W,3) uint8 RGB."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = three whitespace-separated tokens after the magic
    # (comments unsupported — fixture-grade)
    parts = data[2:].split(None, 3)
    w, h, maxval = int(parts[0]), int(parts[1]), int(parts[2])
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    body = parts[3] if len(parts) > 3 else b""
    raw = np.frombuffer(body, dtype=np.uint8, count=w * h * 3)
    return raw.reshape(h, w, 3).copy()


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9, filter type 4)."""
    p = a.astype(np.int64) + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(H,W,3) uint8 RGB / (H,W) grayscale -> PNG bytes, pure
    numpy + stdlib zlib (no codec libraries): 8-bit, color type 2 or
    0, non-interlaced, one IDAT.  ``filter_type`` picks the per-row
    PNG filter (0..4) — any choice yields a valid file; non-zero types
    exist mainly so the decoder's unfilter paths can be round-trip
    tested against ground truth."""
    import struct
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2}[ch]
    bpp = ch
    raw = img.reshape(h, w * ch).astype(np.int64)
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = (cur - left) % 256
        elif filter_type == 2:
            filt = (cur - prev) % 256
        elif filter_type == 3:
            filt = (cur - (left + prev) // 2) % 256
        elif filter_type == 4:
            filt = (cur - _paeth_predict(left, prev, upleft)) % 256
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines += bytes([filter_type]) + filt.astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 9))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (H,W,3) uint8 RGB (grayscale replicated to 3 channels,
    alpha dropped).  Pure numpy + stdlib zlib: chunk walk with CRC
    verification, multi-IDAT concatenation, and ALL FIVE scanline
    filters unfiltered (None/Up/Sub vectorized — Sub is a per-lane
    cumsum mod 256; Average/Paeth sequential per row, fine at
    fixture/thumbnail sizes).  8-bit color types 0/2/6 only,
    non-interlaced; anything else raises (same fixture-grade scope
    statement as decode_bmp)."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} interlace={interlace}"
        )
    ch = {0: 1, 2: 3, 6: 4}.get(color)
    if ch is None:
        raise ValueError(f"unsupported color type {color}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline data size mismatch")
    raw = raw.reshape(h, stride + 1)
    bpp = ch
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = int(raw[y, 0])
        cur = raw[y, 1:].astype(np.int64)
        if ft == 0:
            recon = cur
        elif ft == 2:
            recon = (cur + prev) % 256
        elif ft == 1:
            # per byte lane: recon[x] = cur[x] + recon[x-bpp] -> cumsum
            recon = cur.reshape(-1, bpp).cumsum(axis=0).ravel() % 256
        elif ft in (3, 4):
            recon = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                up = prev[x]
                if ft == 3:
                    pred = (left + up) // 2
                else:
                    upleft = prev[x - bpp] if x >= bpp else 0
                    pred = int(
                        _paeth_predict(
                            np.array([left]), np.array([up]), np.array([upleft])
                        )[0]
                    )
                recon[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad filter byte {ft}")
        out[y] = recon
        prev = recon
    px = out.astype(np.uint8).reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    return px[..., :3].copy()


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/EOI codes, code
    width grows at dictionary size, dictionary reset at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def fresh():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    out_bits.append((clear, width))
    seq: tuple[int, ...] = ()
    for px in indices.tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        out_bits.append((table[seq], width))
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            out_bits.append((clear, width))
            table, next_code, width = fresh()
        seq = (px,)
    if seq:
        out_bits.append((table[seq], width))
    out_bits.append((eoi, width))
    # LSB-first packing
    acc = 0
    nbits = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, min_code_size: int, n_px: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode` (tolerates any conformant GIF
    stream, incl. deferred clear codes)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    prev: tuple[int, ...] | None = None
    out: list[int] = []
    while len(out) < n_px:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        out.extend(entry)
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return np.array(out[:n_px], dtype=np.uint8)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(
    img: np.ndarray, interlace: bool = False
) -> bytes:
    """(H,W,3) uint8 RGB -> single-frame GIF89a with an adaptive
    palette (exact if the image has <= 256 distinct colors, else
    raises — this codec is for fixture/thumbnail payloads, matching
    the BMP/PNG scope statements).  Real LZW compression
    (:func:`_lzw_encode`) and optional interlaced row order, so the
    decoder's deinterlace path is round-trip testable."""
    import struct

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("more than 256 distinct colors")
    bits = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    table_size = 1 << bits
    pal_bytes = palette.tobytes() + b"\x00" * (3 * (table_size - len(palette)))
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = [
            y for start, step in _GIF_INTERLACE_PASSES
            for y in range(start, h, step)
        ]
        idx = idx[order]
    head = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0
    )
    imgd = struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    lzw = _lzw_encode(idx.ravel(), bits)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return (
        head + pal_bytes + imgd + bytes([bits]) + bytes(blocks) + b"\x3b"
    )


def decode_gif(data: bytes) -> np.ndarray:
    """Single-frame GIF87a/89a -> (H,W,3) uint8 RGB.  Real parser:
    logical screen + color tables, extension blocks skipped, LZW
    decompression (:func:`_lzw_decode`) with growing code widths and
    dictionary resets, interlaced row reorder.  First image frame
    only; anything structurally off raises (fixture-grade scope, like
    the other codecs here)."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(lzw), min_code, w * h).reshape(h, w)
            if ipacked & 0x40:  # interlaced
                order = [
                    y for start, step in _GIF_INTERLACE_PASSES
                    for y in range(start, h, step)
                ]
                out = np.zeros_like(idx)
                out[order] = idx
                idx = out
            return table[idx]
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("no image frame found")


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """payload -> (H,W) uint8 grayscale.  REAL decoders for the two
    library-free formats (BMP via :func:`decode_bmp`, PPM via
    :func:`decode_ppm` — dispatched on magic bytes, grayscaled by
    integer channel mean); other formats fall back to the
    deterministic fake so the pipeline stays runnable where PIL/ffmpeg
    are absent."""
    if payload[:2] == b"BM":
        rgb = decode_bmp(payload)
    elif payload[:2] == b"P6":
        rgb = decode_ppm(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        rgb = decode_png(payload)
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        rgb = decode_gif(payload)
    elif payload[:2] == b"\xff\xd8":
        from geo_spark.operators.jpeg import decode_jpeg

        rgb = decode_jpeg(payload)
    else:
        return _decode_fake(payload, width, height)
    return (rgb.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)


def image_features(media: DataFrame, resize_to: int = 8) -> DataFrame:
    """image rows -> (media_id, mean_px, std_px_x1000, thumb array<int>).

    One mapInPandas stage: decode, global stats, area-resample to a
    resize_to x resize_to thumbnail.  Column-pruned at the scan (only
    payload + dims read)."""
    src = media.where(F.col("kind") == "image").select(
        "media_id", "payload", "width", "height"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                img = decode_image(r.payload, r.width, r.height)
                h, w = img.shape
                bh, bw = max(h // resize_to, 1), max(w // resize_to, 1)
                thumb = (
                    img[: bh * resize_to, : bw * resize_to]
                    .reshape(resize_to, bh, resize_to, bw)
                    .mean(axis=(1, 3))
                    .astype(np.int64)
                )
                out.append(
                    (
                        r.media_id,
                        float(img.mean()),
                        int(img.std() * 1000),
                        thumb.ravel().tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "mean_px", "std_px_x1000", "thumb"]
            )

    return src.mapInPandas(
        fn, "media_id long, mean_px double, std_px_x1000 long, thumb array<bigint>"
    )


def audio_features(media: DataFrame, n_bands: int = 4) -> DataFrame:
    """audio rows -> coarse band energies.  RIFF/WAVE payloads get a
    REAL PCM decode (:func:`decode_wav`); raw byte payloads keep the
    deterministic fallback interpretation."""
    src = media.where(F.col("kind") == "audio").select(
        "media_id", "payload", "sample_rate"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                if r.payload[:4] == b"RIFF" and r.payload[8:12] == b"WAVE":
                    _, samples = decode_wav(r.payload)
                    wave = samples.astype(np.float64)
                else:
                    wave = (
                        np.frombuffer(r.payload, dtype=np.uint8).astype(
                            np.float64
                        )
                        - 128.0
                    )
                spec = np.abs(np.fft.rfft(wave))
                bands = np.array_split(spec, n_bands)
                out.append(
                    (r.media_id, [float(b.mean()) for b in bands], len(wave))
                )
            yield pd.DataFrame(out, columns=["media_id", "band_energy", "n_samples"])

    return src.mapInPandas(
        fn, "media_id long, band_energy array<double>, n_samples long"
    )


def video_frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """video rows -> one exploded row per sampled frame index.  MJPEG
    AVI payloads get REAL container walking + per-frame JPEG decode
    (:func:`decode_avi_mjpeg` — unsampled frames are never decoded,
    which is the point of stride sampling at scale); raw byte payloads
    keep the deterministic stat fallback."""
    src = media.where(F.col("kind") == "video").select(
        "media_id", "payload", "n_frames"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                if r.payload[:4] == b"RIFF" and r.payload[8:12] == b"AVI ":
                    for fi, frame in decode_avi_mjpeg(r.payload, every=every):
                        out.append(
                            (r.media_id, fi, float(frame.mean()))
                        )
                    continue
                raw = np.frombuffer(r.payload, dtype=np.uint8)
                for fi in range(0, int(r.n_frames), every):
                    chunk = raw[fi::every]
                    out.append((r.media_id, fi, float(chunk.mean())))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_mean"])

    return src.mapInPandas(fn, "media_id long, frame_idx int, frame_mean double")


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono PCM -> RIFF/WAVE bytes (the canonical uncompressed
    audio container — parsing it IS real audio decode)."""
    import struct

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM -> (sample_rate, int16 mono samples).  16-bit
    mono PCM only (what the engine emits; stereo/float raise)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos = 12
    rate = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only 16-bit mono PCM supported")
        elif tag == b"data":
            pcm = np.frombuffer(payload, dtype="<i2")
        pos += 8 + ln + (ln & 1)  # RIFF even padding
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return int(rate), pcm


def encode_avi_mjpeg(frames: list, fps: int = 10) -> bytes:
    """List of (H,W,3) uint8 frames -> minimal MJPEG AVI (each frame a
    real baseline JPEG from operators/jpeg.py inside '00dc' chunks) —
    a genuine video container + codec path with zero external libs."""
    import struct

    from geo_spark.operators.jpeg import encode_jpeg

    h, w = frames[0].shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return tag + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames),
        0, 0xFFFFFFFF, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(
        b"movi",
        b"".join(chunk(b"00dc", encode_jpeg(f, quality=92)) for f in frames),
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(data: bytes, every: int = 1) -> list:
    """MJPEG AVI -> list of (frame_index, (H,W,3) uint8) for every
    ``every``-th frame — real frame SAMPLING: unsampled frames are
    never JPEG-decoded (the point of stride sampling at 100 TB)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    from geo_spark.operators.jpeg import decode_jpeg

    out = []
    fi = 0

    def walk(buf: bytes) -> None:
        nonlocal fi
        pos = 0
        while pos + 8 <= len(buf):
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", buf, pos + 4)
            payload = buf[pos + 8 : pos + 8 + ln]
            if tag == b"LIST":
                walk(payload[4:])
            elif tag in (b"00dc", b"00db"):
                if fi % every == 0:
                    out.append((fi, decode_jpeg(payload)))
                fi += 1
            pos += 8 + ln + (ln & 1)

    walk(data[12:])
    return out


def audio_integer_features(
    media: DataFrame,
    key: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(key, n_samples, sum_sq, max_abs, zero_cross): exact INTEGER
    audio summary per RIFF/WAVE payload — energy (sum of squared
    samples), peak, and zero-crossing count, the loudness/silence/
    pitch-proxy trio an audio-corpus quality gate reads.  All four
    values are integers computed from the REAL PCM decode
    (:func:`decode_wav`), so a relational oracle can replay them
    exactly when the samples have a known construction — the
    engine-portability property the float band energies of
    :func:`audio_features` cannot offer.

    Arrow-batched mapInPandas; only (key, payload) cross into Python
    and (key, 4 ints) come back."""
    src = media.select(key, payload_col)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                payload = getattr(r, payload_col)
                _, s = decode_wav(payload)
                v = s.astype(np.int64)
                zc = int(np.sum(v[:-1] * v[1:] < 0)) if len(v) > 1 else 0
                out.append(
                    (
                        getattr(r, key),
                        int(len(v)),
                        int(np.sum(v * v)),
                        int(np.max(np.abs(v))) if len(v) else 0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[key, "n_samples", "sum_sq", "max_abs", "zero_cross"],
            )

    return src.mapInPandas(
        fn,
        f"{key} long, n_samples long, sum_sq long, max_abs long,"
        " zero_cross long",
    )
