"""Multimodal column support: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns beside a metadata
struct (modality, byte_len, checksum). Decode / feature-extraction runs as
Arrow-batched pandas iterators over ``mapInPandas`` — the only sanctioned
Python boundary, sized by batch not by row.

The decode step is STUBBED: the real implementation needs image/audio
codecs not present in this container. ``decode_features`` raises
``NotImplementedError`` unless ``fake=True``, which computes a
deterministic per-payload byte-histogram feature vector — the Spark-side
plumbing (schema, batching, partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MULTIMODAL_SCHEMA = (
    "doc_id long, modality string, byte_len long, checksum string"
)


def attach_binary(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  modality: str = "image") -> DataFrame:
    """Wrap a source column as an opaque binary payload + metadata struct
    (stand-in for real image/audio bytes; schema identical to production)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.sha2(payload, 256).alias("checksum"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in: 16-bin byte histogram, L1-normalized."""
    hist = [0] * FEATURE_DIM
    for byte in payload[:4096]:
        hist[byte % FEATURE_DIM] += 1
    total = float(sum(hist)) or 1.0
    return [h / total for h in hist]


def decode_features(multimodal: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads → feature vectors via mapInPandas (Arrow batches).

    Real decode requires codec libraries absent here → NotImplementedError.
    ``fake=True`` switches to the deterministic byte-histogram stub so the
    distributed plumbing (batch iteration, schema, output shape) is
    exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires codec libs not in this container; "
            "pass fake=True for the deterministic stub"
        )

    # self-contained closure: no references to this module's globals, so
    # cloudpickle ships it fully by value and workers never need to import
    # kafka_streams_demo_spark (which may not be on their PYTHONPATH)
    feature_dim = FEATURE_DIM

    def batches(it):
        import pandas as _pd

        def fake_features(payload):
            hist = [0] * feature_dim
            for byte in payload[:4096]:
                hist[byte % feature_dim] += 1
            total = float(sum(hist)) or 1.0
            return [h / total for h in hist]

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "features": [fake_features(p) for p in pdf["payload"]],
                }
            )

    return multimodal.mapInPandas(
        batches, schema="doc_id long, modality string, features array<double>"
    )


def resize_images(
    multimodal: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = False
) -> DataFrame:
    """Image resize stub (decode → scale → re-encode in production): emits
    per-image original and target dimensions plus the scale factor. Real
    resize needs an image codec → NotImplementedError unless fake=True,
    which derives deterministic fake source dims from the payload bytes —
    the Spark-side contract (Arrow batching, schema, one-row-per-image) is
    the part under test."""
    if not fake:
        raise NotImplementedError(
            "real image resize requires codec libs; pass fake=True for the stub"
        )
    tw, th = target_w, target_h

    def batches(it):
        import pandas as _pd

        for pdf in it:
            rows = {"doc_id": [], "orig_w": [], "orig_h": [],
                    "new_w": [], "new_h": [], "scale": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # deterministic fake dims from payload bytes (stand-in for
                # the decoded header)
                ow = 64 + (payload[0] if len(payload) else 0) * 8
                oh = 64 + (payload[-1] if len(payload) else 0) * 8
                rows["doc_id"].append(doc_id)
                rows["orig_w"].append(ow)
                rows["orig_h"].append(oh)
                rows["new_w"].append(tw)
                rows["new_h"].append(th)
                rows["scale"].append(round(min(tw / ow, th / oh), 6))
            yield _pd.DataFrame(rows)

    return multimodal.mapInPandas(
        batches,
        schema="doc_id long, orig_w int, orig_h int, new_w int, new_h int, scale double",
    )


def frame_sample(multimodal: DataFrame, every_n_bytes: int = 1024, fake: bool = False) -> DataFrame:
    """Frame-sampling stub (video → every-Nth-frame): emits one row per
    sampled 'frame' offset with a checksum slice. Real frame extraction
    needs a video codec → NotImplementedError unless fake=True."""
    if not fake:
        raise NotImplementedError(
            "real frame sampling requires a video codec; pass fake=True for the stub"
        )

    def batches(it):
        import pandas as _pd

        for pdf in it:
            rows = {"doc_id": [], "frame_no": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fno, off in enumerate(range(0, len(payload), every_n_bytes)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(fno)
                    rows["frame_bytes"].append(len(payload[off:off + every_n_bytes]))
            yield _pd.DataFrame(rows)

    return multimodal.mapInPandas(
        batches, schema="doc_id long, frame_no int, frame_bytes int"
    )
