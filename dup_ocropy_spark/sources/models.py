"""Model artifact save/load (reference S7: ``ocrolib/common.py:412-450``
save_object/load_object — gzip-pickled object graphs with a search path).

Spark-first recast: the model is a tiny named-parameter dict persisted as
JSON (human-diffable, no pickle execution risk); at scale the artifact
ships via ``spark-submit --files`` and loads once per executor into the
UDF closure or a broadcast variable.
"""

from __future__ import annotations

import json
import os

import numpy as np

from dup_ocropy_spark.config import ExtractConfig
from dup_ocropy_spark.kernels.classify import CTX_FEATURE_NAMES, FEATURE_NAMES

FORMAT_VERSION = 1

_KIND_FEATURES = {
    "logistic": FEATURE_NAMES,
    "logistic_ctx": CTX_FEATURE_NAMES,
    "lstm": FEATURE_NAMES,  # inputs; the flat vector packs all LSTM params
}


def _expected_len(kind: str) -> int:
    if kind == "lstm":
        from dup_ocropy_spark.kernels.lstm import TinyBiLSTM

        return len(TinyBiLSTM(len(FEATURE_NAMES)).to_flat())
    return len(_KIND_FEATURES[kind])


def save_model(path: str, weights: np.ndarray, bias: float,
               kind: str = "logistic", meta: dict | None = None) -> None:
    names = _KIND_FEATURES[kind]
    w = np.asarray(weights).ravel()
    if len(w) != _expected_len(kind):
        raise ValueError(f"{kind} expects {_expected_len(kind)} weights, got {len(w)}")
    obj = {
        "format_version": FORMAT_VERSION,
        "kind": kind,
        "feature_names": list(names),
        "weights": [float(x) for x in w],
        "bias": float(bias),
        "meta": meta or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def load_model(path: str) -> tuple[np.ndarray, float, str, dict]:
    with open(path) as f:
        obj = json.load(f)
    if obj.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported model format: {obj.get('format_version')}")
    kind = obj.get("kind", "logistic")
    expected = list(_KIND_FEATURES.get(kind, ()))
    if obj["feature_names"] != expected:
        raise ValueError(
            f"feature mismatch: model has {obj['feature_names']}, engine has {expected}")
    return (np.asarray(obj["weights"], dtype=np.float64), float(obj["bias"]),
            kind, obj["meta"])


def config_with_model(path: str, base: ExtractConfig | None = None) -> ExtractConfig:
    """ExtractConfig wired to a saved model; a calibrated decision
    threshold stored in the artifact meta (train_job --calibrate)
    overrides the static default."""
    from dataclasses import replace

    w, b, kind, meta = load_model(path)
    base = base or ExtractConfig()
    kw: dict = {"classifier": kind, "weights": tuple(w), "bias": b}
    if "content_threshold" in meta:
        kw["content_threshold"] = float(meta["content_threshold"])
    return replace(base, **kw)
