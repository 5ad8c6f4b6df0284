"""Real, dependency-free media codecs (stdlib + numpy only).

The container has no image/audio libraries, but PNG is zlib (stdlib) plus
per-row byte filters, and WAV is raw PCM behind a RIFF header (stdlib
``wave``) — so these two formats get REAL decode/encode paths, used by
``stages/multimodal.DecodeKernel`` when ``fake=False``. Baseline JPEG
encode/decode is real too (functions/jpeg.py, pure numpy); GIF/BMP get
header sniffing (dimensions/type) only.

PNG support: 8-bit gray / RGB / RGBA, non-interlaced, all five filter
types (None/Sub/Up/Average/Paeth). Sub and Up unfilter vectorized; the
Average/Paeth rows fall back to a per-pixel loop (sequential left
dependency) — fine for the bounded thumbnails this stage handles.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples/pixel


def sniff_media(data: bytes) -> dict:
    """Header-only media identification: kind + dimensions where cheap.
    Returns {"kind": "png|jpeg|gif|bmp|wav|unknown", "width", "height"}
    (dims None when the header doesn't carry them cheaply)."""
    if data.startswith(_PNG_MAGIC) and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return {"kind": "png", "width": int(w), "height": int(h)}
    if data[:3] == b"\xff\xd8\xff":
        # scan JPEG segments for SOF0/1/2 dims
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return {"kind": "jpeg", "width": int(w), "height": int(h)}
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return {"kind": "jpeg", "width": None, "height": None}
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return {"kind": "gif", "width": int(w), "height": int(h)}
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return {"kind": "bmp", "width": int(w), "height": abs(int(h))}
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return {"kind": "wav", "width": None, "height": None}
    if data[:4] == b"RIFF" and data[8:12] == b"AVI " and len(data) >= 72:
        # avih main header sits at a fixed offset in our writer's layout;
        # fall back to dims-unknown for foreign writers
        try:
            if data[12:16] == b"LIST" and data[20:24] == b"hdrl" and data[24:28] == b"avih":
                w, h = struct.unpack("<II", data[64:72])
                return {"kind": "avi_mjpeg", "width": int(w), "height": int(h)}
        except struct.error:
            pass
        return {"kind": "avi_mjpeg", "width": None, "height": None}
    return {"kind": "unknown", "width": None, "height": None}


# ---------------------------------------------------------------------------
# PNG


def png_encode(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA -> PNG
    bytes (filter 0 rows, one IDAT)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    raw = np.zeros((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 1:] = a.reshape(h, w * channels)  # filter byte 0 per row

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) or (h, w, channels). Supports
    8-bit depth, color types 0/2/4/6, non-interlaced."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG variant unsupported (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); 8-bit non-interlaced gray/RGB/RGBA only"
        )
    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = raw.reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        ft = int(filters[y])
        row = raw[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        if ft == 0:  # None
            rec = row
        elif ft == 2:  # Up — fully vectorized
            rec = (row + prev) & 0xFF
        elif ft == 1:  # Sub — cumsum per byte-phase is exact mod 256
            rec = row.copy()
            for phase in range(bpp):
                rec[phase::bpp] = np.cumsum(rec[phase::bpp]) & 0xFF
        else:  # Average(3) / Paeth(4): sequential left dependency
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if ft == 3:
                    rec[x] = (row[x] + (left + up) // 2) & 0xFF
                elif ft == 4:
                    rec[x] = (row[x] + _paeth(int(left), int(up), int(ul))) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ft}")
        out[y] = rec.astype(np.uint8)
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of a (h, w[, c]) uint8 image."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV (PCM)


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> WAV bytes (stdlib wave)."""
    import io
    import wave

    s = np.ascontiguousarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 samples in [-1, 1] shaped (n, channels),
    sample_rate). 8/16/32-bit integer PCM."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch = w.getnchannels()
        rate = w.getframerate()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    return x.reshape(-1, n_ch), rate


# ---------------------------------------------------------------------------
# AVI (RIFF) container with MJPEG frames — video as a sequence of the
# engine's own baseline JPEGs (functions/jpeg.py). Writer emits the
# canonical RIFF/hdrl/strl/movi/idx1 layout; reader walks chunks
# generically, so foreign MJPEG-AVIs with extra chunks still parse.


def avi_mjpeg_encode(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Pack JFIF frame byte strings into a minimal standard MJPEG AVI."""
    if fps <= 0:
        raise ValueError("fps must be positive")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(four: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four + payload)

    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,   # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        n, 0, 1,           # total frames, initial frames, streams
        max_bytes,         # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,        # reserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,       # flags, priority, language
            0,             # initial frames
            1, fps,        # scale, rate -> fps
            0, n,          # start, length
            max_bytes,
            0xFFFFFFFF,    # quality: default
            0,             # sample size: varies
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_chunks)
    # idx1: offsets are relative to the start of the 'movi' four-cc
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def avi_mjpeg_frames(data: bytes) -> list[bytes]:
    """Extract the MJPEG frame payloads ('..dc' chunks inside LIST movi)
    by walking RIFF chunks generically."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int, in_movi: bool) -> None:
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if tag == b"LIST" and size >= 4:
                four = buf[body_start : body_start + 4]
                walk(buf, body_start + 4, body_end, in_movi or four == b"movi")
            elif in_movi and tag[2:4] == b"dc":
                frames.append(buf[body_start:body_end])
            pos = body_end + (size % 2)

    walk(data, 12, len(data), False)
    return frames


# ---------------------------------------------------------------------------
# BMP (uncompressed BI_RGB, 8-bit palette / 24-bit) — trivial raster


def bmp_encode(arr: np.ndarray) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> 24-bit BI_RGB BMP bytes
    (bottom-up rows, 4-byte row padding, no palette)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # RGB -> BGR, bottom-up
    bgr = a[::-1, :, ::-1]
    body = b"".join(bgr[y].tobytes() + b"\x00" * pad for y in range(h))
    pixel_off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + body


def bmp_decode(data: bytes) -> np.ndarray:
    """BI_RGB 24-bit (or 8-bit palette) BMP bytes -> uint8 (h, w, 3)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack("<I", data[10:14])[0]
    size, w, h, _planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} unsupported (BI_RGB only)")
    flip = h > 0
    h = abs(h)
    if bpp == 24:
        row_bytes = w * 3
        pad = (-row_bytes) % 4
        out = np.empty((h, w, 3), np.uint8)
        pos = pixel_off
        for y in range(h):
            row = np.frombuffer(data, np.uint8, row_bytes, pos)
            out[y] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
            pos += row_bytes + pad
    elif bpp == 8:
        pal_off = 14 + size
        n_pal = (pixel_off - pal_off) // 4
        pal = np.frombuffer(data, np.uint8, n_pal * 4, pal_off).reshape(n_pal, 4)
        pal_rgb = pal[:, :3][:, ::-1]  # BGRA -> RGB
        row_bytes = w
        pad = (-row_bytes) % 4
        out = np.empty((h, w, 3), np.uint8)
        pos = pixel_off
        for y in range(h):
            idx = np.frombuffer(data, np.uint8, row_bytes, pos)
            out[y] = pal_rgb[idx]
            pos += row_bytes + pad
    else:
        raise NotImplementedError(f"BMP bpp {bpp} unsupported (8/24 only)")
    return out[::-1] if flip else out


# ---------------------------------------------------------------------------
# GIF87a/89a — LZW decode (single image, optional interlace unsupported)


def gif_decode(data: bytes) -> np.ndarray:
    """First image of a GIF -> uint8 (h, w, 3) via pure-Python LZW."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
            pos += 10
            lct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                lct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF unsupported")
            if lct is None:
                raise ValueError("GIF image without a color table")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                stream.extend(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(stream), min_code, w * h)
            img = lct[np.asarray(idx, np.int64)].reshape(h, w, 3)
            return img
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image")


def _lzw_decode(stream: bytes, min_code: int, n_pixels: int) -> list[int]:
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    bitpos = 0
    prev: tuple[int, ...] | None = None
    total_bits = len(stream) * 8
    while bitpos + code_size <= total_bits and len(out) < n_pixels:
        byte = bitpos // 8
        # codes are LSB-first across up to 3 bytes
        window = int.from_bytes(stream[byte : byte + 3], "little")
        code = (window >> (bitpos % 8)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            code_size = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        else:  # KwKwK case
            entry = prev + (prev[0],)
            table.append(entry)
        if prev is not None and len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
        out.extend(entry)
        prev = entry
    return out[:n_pixels]


def gif_encode(arr: np.ndarray) -> bytes:
    """uint8 (h, w) palette-index array + implicit grayscale palette ->
    GIF87a bytes (uncompressed-style LZW: emit a clear code before every
    pixel code so the table never grows — valid LZW, simple writer)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("gif_encode takes a (h, w) palette-index array")
    h, w = a.shape
    min_code = 8
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    bits = bytearray()
    acc = 0
    nbits = 0

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for v in a.ravel():
        put(int(v))
        put(clear)  # keep table minimal; decoder-agnostic
    put(end)
    if nbits:
        bits.append(acc & 0xFF)
    palette = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 colors
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    pos = 0
    data = bytes(bits)
    while pos < len(data):
        chunk_ = data[pos : pos + 255]
        out.append(len(chunk_))
        out += chunk_
        pos += 255
    out += b"\x00\x3b"
    return bytes(out)
