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

    return df.select(id_col, bin_col).mapInPandas(extract, DECODED_SCHEMA)


def decode_image(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Real image decode — requires PIL/opencv, absent in this container."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "plug a decoder into decode_binary_metadata's extract loop"
    )
