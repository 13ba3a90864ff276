"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batch UDFs over ``mapInPandas``. Codec registry (``DECODERS``):

  * ``wav``  — REAL decode via the stdlib ``wave`` module (16-bit PCM ->
    RMS envelope features), no external library needed;
  * ``png``  — REAL decode via stdlib ``zlib``/``struct`` (chunk CRC
    verification, IDAT inflate, full scanline unfiltering) -> luminance
    histogram features; 8-bit non-interlaced gray/RGB/A;
  * ``fake`` — deterministic keyed-hash stand-in used to exercise the
    full Arrow path for formats whose libraries (ffmpeg etc.) are NOT in
    this container;
  * ``real`` — honest ``NotImplementedError`` placeholder for those
    formats.

Everything Spark-side (schema, partitioning, UDF signature, Arrow batch
shape) is real and tested for every codec.
"""

from __future__ import annotations

import hashlib
from struct import error as _struct_error  # wave raises it on garbage bytes

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = ("doc_id long, media_type string, payload binary, "
                "meta struct<width:int, height:int, sample_rate:int, codec:string>")

FEATURE_SCHEMA = ("doc_id long, media_type string, n_bytes int, magic string, "
                  "feature array<float>, decode_ok boolean, decode_error string")

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff-wav",
    b"OggS": "ogg",
    b"\x00\x00\x00": "mp4ish",
}

FEATURE_DIM = 16


def _real_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Real codec path — requires PIL/soundfile/ffmpeg, absent here."""
    raise NotImplementedError(
        f"no codec library in this environment for media_type={media_type}; "
        "install pillow/soundfile and register in DECODERS")


def _fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in: 16-dim feature from a keyed blake2b of the
    bytes — stable across runs/executors, exercises the full Arrow path."""
    h = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    return (np.frombuffer(h, dtype=np.uint32).astype(np.float32)
            / np.float32(2**32))


def _wav_decode(payload: bytes, media_type: str) -> np.ndarray:
    """REAL audio decode via the stdlib ``wave`` module (no external codec
    needed): parse the RIFF/WAVE container, read PCM samples, and emit a
    FEATURE_DIM-segment RMS envelope in [0, 1] — an honest audio feature,
    not a hash. Non-WAV / truncated payloads raise ValueError (reported as
    decode_ok=False by the stage)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            sampwidth = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError, _struct_error) as e:
        raise ValueError(f"not a decodable WAV payload: {e}") from e
    if sampwidth != 2:
        raise ValueError(f"only 16-bit PCM supported, got sampwidth={sampwidth}")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    if samples.size == 0:
        raise ValueError("WAV payload holds zero samples")
    # FEATURE_DIM equal segments -> per-segment RMS, normalized by int16 max
    seg = np.array_split(samples, FEATURE_DIM)
    rms = np.array([np.sqrt(np.mean(s * s)) if s.size else 0.0 for s in seg])
    return (rms / 32768.0).astype(np.float32)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# bytes per pixel by color type (8-bit depth): gray, RGB, gray+A, RGBA
_PNG_BPP = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline PNG filtering (types 0-4). Rows are sequential
    by construction (Up/Average/Paeth reference the prior row); within a
    row, Sub/Average/Paeth recur on the previous pixel. Fixture-scale
    images only — a production raster path would use a real codec lib."""
    out = np.zeros((h, stride), dtype=np.int64)
    raw = raw.reshape(h, stride + 1)
    for y in range(h):
        ft, line = int(raw[y, 0]), raw[y, 1:].astype(np.int64)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if ft == 0:
            out[y] = line
        elif ft == 2:                              # Up
            out[y] = (line + prev) & 0xFF
        else:                                      # Sub/Average/Paeth
            cur = out[y]
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                elif ft == 4:                      # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"unknown PNG filter type {ft}")
                cur[x] = (line[x] + pred) & 0xFF
    return out


def _png_decode(payload: bytes, media_type: str) -> np.ndarray:
    """REAL image decode via stdlib only (struct + zlib): parse the chunk
    stream with CRC verification, inflate IDAT, undo scanline filters,
    and emit a FEATURE_DIM-bin luminance histogram (mass-normalized) —
    an honest pixel-derived feature. Supports 8-bit depth, color types
    gray/RGB/gray+A/RGBA, non-interlaced."""
    import zlib
    from struct import unpack

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload (bad signature)")
    pos, w = len(_PNG_SIG), None
    idat = b""
    while pos + 8 <= len(payload):
        (length,), ctype = unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        crc_bytes = payload[pos + 8 + length:pos + 12 + length]
        # explicit length checks: unpack on short slices raises
        # struct.error, which would escape the stage's ValueError
        # quarantine and crash the task (the never-raise contract)
        if len(body) != length or len(crc_bytes) != 4:
            raise ValueError("truncated PNG chunk")
        (crc,) = unpack(">I", crc_bytes)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError("malformed IHDR chunk")
            w, h, depth, color, _, _, interlace = unpack(">IIBBBBB", body)
            if depth != 8 or color not in _PNG_BPP or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace}); stdlib path handles 8-bit "
                    "non-interlaced gray/RGB/A")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    bpp = _PNG_BPP[color]
    try:
        raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    except zlib.error as e:  # CRC-valid chunks, truncated stream overall
        raise ValueError(f"PNG IDAT stream does not inflate: {e}") from e
    if raw.size != h * (w * bpp + 1):
        raise ValueError("PNG pixel data size mismatch")
    px = _png_unfilter(raw, h, w * bpp, bpp).reshape(h, w, bpp)
    # luminance: Rec.601 for color, first channel for gray (alpha ignored)
    lum = (0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
           if color in (2, 6) else px[..., 0].astype(np.float64))
    hist, _ = np.histogram(lum, bins=FEATURE_DIM, range=(0.0, 256.0))
    return (hist / max(1, lum.size)).astype(np.float32)


DECODERS = {"real": _real_decode, "fake": _fake_decode, "wav": _wav_decode,
            "png": _png_decode}


def synth_wav_media(spark: SparkSession, n: int = 16) -> DataFrame:
    """Deterministic REAL WAV fixtures: 16-bit mono PCM sine bursts whose
    frequency/amplitude derive from doc_id (stdlib wave writer)."""
    def gen(batches):
        import io
        import wave

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                sr = 8000
                t = np.arange(sr // 4) / sr  # 250 ms
                freq = 200.0 + 40.0 * (i % 12)
                amp = 0.2 + 0.05 * (i % 7)
                # amplitude ramps over the clip so the RMS envelope varies
                sig = (amp * np.linspace(0.2, 1.0, t.size)
                       * np.sin(2 * np.pi * freq * t))
                pcm = (sig * 32767).astype("<i2").tobytes()
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(pcm)
                rows.append({
                    "doc_id": i,
                    "media_type": "audio",
                    "payload": buf.getvalue(),
                    "meta": {"width": 0, "height": 0, "sample_rate": sr,
                             "codec": "pcm_s16le"},
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def encode_png(px: np.ndarray) -> bytes:
    """Minimal stdlib PNG encoder for fixtures: 8-bit gray (h, w) or RGB
    (h, w, 3), filter 0 scanlines, one IDAT. Round-trips through
    ``_png_decode`` (test-pinned)."""
    import zlib
    from struct import pack

    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    color = 0 if gray else 2
    body = b"".join(b"\x00" + (px[y].tobytes()) for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (pack(">I", len(data)) + ctype + data
                + pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    return (_PNG_SIG
            + chunk(b"IHDR", pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(body))
            + chunk(b"IEND", b""))


def synth_png_media(spark: SparkSession, n: int = 12) -> DataFrame:
    """Deterministic REAL PNG fixtures: gradient / checker / solid
    patterns whose luminance distribution derives from doc_id."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                h, w = 24 + i % 8, 32 + i % 8
                yy, xx = np.mgrid[0:h, 0:w]
                kind = i % 3
                if kind == 0:    # horizontal gradient, offset by id
                    img = ((xx * 255 // max(1, w - 1)) + 16 * i) % 256
                elif kind == 1:  # checkerboard
                    img = ((yy // 4 + xx // 4) % 2) * 255
                else:            # RGB gradient
                    img = np.stack([(xx * 255 // max(1, w - 1)),
                                    (yy * 255 // max(1, h - 1)),
                                    np.full((h, w), (i * 37) % 256)], axis=-1)
                rows.append({
                    "doc_id": i, "media_type": "image",
                    "payload": encode_png(img.astype(np.uint8)),
                    "meta": {"width": w, "height": h, "sample_rate": 0,
                             "codec": "png"},
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic binary fixtures (seeded bytes with magic headers)."""
    def gen(batches):
        magics = list(_MAGIC.keys())
        types = ["image", "image", "audio", "video", "image"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng([42, 99, i])
                body = rng.integers(0, 256, size=256 + (i % 1024), dtype=np.uint8).tobytes()
                m = magics[i % len(magics)]
                rows.append({
                    "doc_id": i,
                    "media_type": types[i % len(types)],
                    "payload": m + body,
                    "meta": {"width": 64 + i % 512, "height": 64 + (i * 7) % 512,
                             "sample_rate": 16000, "codec": "stub"},
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_media_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """binary payload -> (magic sniff, feature vector) via Arrow batches.

    ``decoder='auto'`` dispatches per row on the container magic (real
    PNG/WAV decode, fake elsewhere); a named decoder forces one codec.
    Mirrors the text pipeline's shape: cheap JVM-expressible metadata
    (n_bytes) computed as columns; only the codec work crosses to Python.
    """
    auto = decoder == "auto"
    decode = _fake_decode if auto else DECODERS[decoder]

    def stage(batches):
        for pdf in batches:
            out = []
            # zip over ndarrays, not iterrows (row-object construction ~10x)
            for doc_id, media_type, raw in zip(pdf["doc_id"].to_numpy(),
                                               pdf["media_type"].to_numpy(),
                                               pdf["payload"].to_numpy()):
                payload = bytes(raw or b"")
                magic = "unknown"
                for sig, name in _MAGIC.items():
                    if payload.startswith(sig):
                        magic = name
                        break
                try:
                    if auto and magic == "png":
                        feat = _png_decode(payload, media_type)
                    elif auto and magic == "riff-wav":
                        feat = _wav_decode(payload, media_type)
                    else:
                        feat = decode(payload, media_type)
                    ok, err = True, None
                except (NotImplementedError, ValueError) as e:
                    feat, ok, err = np.zeros(FEATURE_DIM, dtype=np.float32), False, str(e)
                out.append({
                    "doc_id": doc_id,
                    "media_type": media_type,
                    "n_bytes": len(payload),
                    "magic": magic,
                    "feature": feat.tolist(),
                    "decode_ok": ok,
                    "decode_error": err,
                })
            yield pd.DataFrame(out)

    return media.mapInPandas(stage, schema=FEATURE_SCHEMA)


# ------------------------------------------------------- metadata validation

def png_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the PNG IHDR (signature + first chunk only)."""
    from struct import unpack

    if not payload.startswith(_PNG_SIG) or len(payload) < 24:
        raise ValueError("not a PNG payload")
    if payload[12:16] != b"IHDR":
        raise ValueError("PNG does not start with IHDR")
    w, h = unpack(">II", payload[16:24])
    return int(w), int(h)


def jpeg_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first JPEG SOF marker (baseline 0xC0,
    extended 0xC1, progressive 0xC2). Metadata-only — a full stdlib JPEG
    pixel decode is not feasible, but frame dimensions are."""
    from struct import unpack

    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynchronized")
        marker = payload[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2):
            if pos + 9 > len(payload):
                raise ValueError("truncated JPEG SOF segment")
            h, w = unpack(">HH", payload[pos + 5:pos + 9])
            return int(w), int(h)
        if marker == 0xD9:  # EOI before any SOF
            break
        (seglen,) = unpack(">H", payload[pos + 2:pos + 4])
        if seglen < 2:
            raise ValueError("invalid JPEG segment length")
        pos += 2 + seglen
    raise ValueError("JPEG has no SOF marker")


def wav_rate(payload: bytes) -> int:
    """Sample rate from the WAV container header."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            return int(w.getframerate())
    except (wave.Error, EOFError, _struct_error) as e:
        raise ValueError(f"not a WAV payload: {e}") from e


VALIDATE_SCHEMA = ("doc_id long, media_type string, magic string, "
                   "meta_ok boolean, mismatch string")


def validate_media_meta(media: DataFrame) -> DataFrame:
    """Data-quality check: does the DECLARED metadata struct match what
    the container headers actually say? Mislabeled media (wrong
    dimensions / sample rate — a classic upstream-pipeline bug) is
    flagged per row, never dropped silently. Header parses only (bounded
    bytes per row); formats without a stdlib parser report
    meta_ok=NULL/mismatch='unverifiable' rather than a fake pass. A null
    or incomplete declared-metadata struct is itself a flaggable defect
    (meta_ok=False, 'no declared metadata') — exactly the upstream bug
    class this stage exists to catch, so it must never crash the task."""
    def check(magic, payload, meta):
        """-> (meta_ok, mismatch); raises on an unparseable container."""
        declared = meta if isinstance(meta, dict) else {}
        if magic in ("png", "jpeg"):
            w, h = (png_dims if magic == "png" else jpeg_dims)(payload)
            dw, dh = declared.get("width"), declared.get("height")
            if dw is None or dh is None:
                return False, "no declared metadata"
            if w == dw and h == dh:
                return True, None
            return False, f"declared {dw}x{dh}, container says {w}x{h}"
        if magic == "riff-wav":
            sr = wav_rate(payload)
            dsr = declared.get("sample_rate")
            if dsr is None:
                return False, "no declared metadata"
            if sr == dsr:
                return True, None
            return False, f"declared {dsr}Hz, container says {sr}Hz"
        return None, "unverifiable"

    def stage(batches):
        for pdf in batches:
            out = []
            for doc_id, media_type, raw, meta in zip(
                    pdf["doc_id"].to_numpy(), pdf["media_type"].to_numpy(),
                    pdf["payload"].to_numpy(), pdf["meta"].to_numpy()):
                payload = bytes(raw or b"")
                magic = "unknown"
                for sig, name in _MAGIC.items():
                    if payload.startswith(sig):
                        magic = name
                        break
                try:
                    ok, why = check(magic, payload, meta)
                except (ValueError, TypeError, KeyError) as e:
                    ok, why = False, f"header parse failed: {e}"
                out.append({"doc_id": doc_id, "media_type": media_type,
                            "magic": magic, "meta_ok": ok, "mismatch": why})
            yield pd.DataFrame(out)

    return media.mapInPandas(stage, schema=VALIDATE_SCHEMA)
