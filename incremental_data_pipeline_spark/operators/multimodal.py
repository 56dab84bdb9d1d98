"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
`mapInPandas` (the one place Python belongs: per-batch byte work the JVM
can't express). The decode itself is STUBBED — codec libraries aren't in
this container — but everything Spark-side is real and tested: schema,
Arrow batch shape, partition-parallel execution, metadata extraction.

At 100 TB: binary payloads dominate partition size, so reads go through
`spark.sql.files.maxPartitionBytes`-bounded splits and the decode stage is
a narrow map (no shuffle); feature outputs (embeddings, frames) feed the
similarity/dedup operators downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incremental_data_pipeline_spark.functions.util import fan_out

DECODED_SCHEMA = "doc_id long, n_bytes long, first_byte int, content_md5 string"


def attach_binary(df: DataFrame, text_col: str = "text", out: str = "content") -> DataFrame:
    """Deterministic fake media: the utf-8 bytes of a text column. Stands in
    for real image/audio payloads so the binary path is exercisable."""
    return df.withColumn(out, F.encode(F.col(text_col), "utf-8"))


def decode_binary_metadata(df: DataFrame, id_col: str = "doc_id", bin_col: str = "content") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    Real decode (image resize, audio resample, video frame-sample) would
    slot into `_decode_one`; here it extracts byte-level metadata and the
    content hash — enough to prove the batch shape and schema plumbing.
    """
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return fan_out(df).select(id_col, bin_col).mapInPandas(extract, DECODED_SCHEMA)


def decode_image(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Real image decode — requires PIL/opencv, absent in this container."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "plug a decoder into decode_binary_metadata's extract loop"
    )


FEATURE_DIM = 16
FEATURES_SCHEMA = "doc_id long, feature array<double>"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_offset long, frame_bytes long, frame_md5 string"


def extract_features(df: DataFrame, id_col: str = "doc_id", bin_col: str = "content") -> DataFrame:
    """Feature extraction over binary payloads: Arrow-batched mapInPandas
    producing a fixed-dim array<double> per payload.

    The featurizer is a deterministic stand-in (L1-normalized 16-bin byte
    histogram) for a real image/audio encoder — swap `_featurize` for a
    model call; the Spark contract (schema, batch shape, narrow no-shuffle
    map) is the production one. Output feeds the similarity operators
    (brute_force_topk / lsh_topk / ivf_topk) unchanged.
    """
    import numpy as np

    def _featurize(payload: bytes) -> list[float]:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return [0.0] * FEATURE_DIM
        hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype("float64")
        return (hist / hist.sum()).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "feature": pdf[bin_col].map(_featurize),
                }
            )

    return fan_out(df).select(id_col, bin_col).mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame, n_frames: int = 4, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """Frame sampling over binary payloads: emit ``n_frames`` evenly spaced
    chunks per payload (offset + length + content hash), the plumbing shape
    of video keyframe extraction. One input row fans out to n output rows
    inside the Arrow batch — still a narrow map, no shuffle.

    A real codec would decode at each offset; byte-slicing is the
    deterministic stand-in (codec libraries absent in this container).
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, md5s = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                size = len(payload)
                step = max(size // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, size)
                    chunk = bytes(payload[off : off + step])
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    lens.append(len(chunk))
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "frame_bytes": pd.Series(lens, dtype="int64"),
                    "frame_md5": md5s,
                }
            )

    return fan_out(df).select(id_col, bin_col).mapInPandas(run, FRAMES_SCHEMA)
