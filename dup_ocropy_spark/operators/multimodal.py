"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batch UDFs over ``mapInPandas``. The decode libraries (PIL/ffmpeg/...)
are NOT in this container, so the codec step is STUBBED — behind
``DECODERS`` — with (a) ``NotImplementedError`` for real codecs and (b) a
deterministic fake decoder used by tests; everything Spark-side (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib

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


DECODERS = {"real": _real_decode, "fake": _fake_decode}


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

    Mirrors the text pipeline's shape: cheap JVM-expressible metadata
    (n_bytes) computed as columns; only the codec work crosses to Python.
    """
    decode = DECODERS[decoder]

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
                    feat = decode(payload, media_type)
                    ok, err = True, None
                except NotImplementedError as e:
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
