"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
`mapInPandas` (the one place Python belongs: per-batch byte work the JVM
can't express). Formats needing codec libraries (JPEG/PNG/audio) are out
of reach in this container, but `decode_image` is a REAL parser for the
dependency-free PGM (P5) format — header, dimensions, raster stats — and
everything Spark-side is real and tested: schema, Arrow batch shape,
partition-parallel execution, metadata extraction.

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

from incremental_data_pipeline_spark.functions.util import FAN_OUT_ARROW_BPT, fan_out

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

    return fan_out(df, bytes_per_task=FAN_OUT_ARROW_BPT).select(id_col, bin_col).mapInPandas(extract, DECODED_SCHEMA)


PGM_WIDTH = 16
IMAGE_SCHEMA = "doc_id long, width int, height int, maxval int, mean_pixel_milli long"


def attach_pgm_image(df: DataFrame, text_col: str = "text", out: str = "content") -> DataFrame:
    """Render the text bytes as a REAL binary-format grayscale image:
    PGM 'P5' (netpbm) — ASCII header ``P5\\n<w> <h>\\n255\\n`` followed by
    w×h raw pixel bytes. Width is fixed at PGM_WIDTH; the last row is
    space-padded. Pure built-ins (one string concat + encode), so image
    construction is a narrow codegen'd map — and the payloads are honest
    images any netpbm tool can open, not opaque fakes.

    The raster is built from a SANITIZED copy of the text: every char
    outside printable ASCII (0x20-0x7E) becomes one space. That pins
    1 char == 1 byte (so height×width == raster byte count even for
    multi-byte UTF-8 input) and removes embedded newlines that would
    corrupt the header split in ``decode_image`` — without it, one bad
    document fails the whole mapInPandas job. Identity for ASCII corpora
    like the fixtures."""
    clean = F.regexp_replace(F.col(text_col), r"[^\x20-\x7E]", " ")
    n = F.length(clean)
    h = ((n + F.lit(PGM_WIDTH - 1)) / F.lit(PGM_WIDTH)).cast("int")
    header = F.concat(
        F.lit(f"P5\n{PGM_WIDTH} "), h.cast("string"), F.lit("\n255\n")
    )
    pad = F.repeat(F.lit(" "), (h * PGM_WIDTH - n).cast("int"))
    return df.withColumn(out, F.encode(F.concat(header, clean, pad), "utf-8"))


def decode_image(df: DataFrame, id_col: str = "doc_id", bin_col: str = "content") -> DataFrame:
    """REAL image decode — a pure-Python parser for the dependency-free
    PGM (P5) format: validate the magic, parse dimensions and maxval from
    the header, and compute pixel statistics from the raster (numpy over
    the Arrow batch). The same mapInPandas slot takes a PIL/opencv decode
    for formats that need codec libraries; this one runs everywhere.

    ``mean_pixel_milli`` is integer-exact (1000×sum // n_pixels) so the
    decode is oracle-verifiable bit-for-bit."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, mx, means = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload)
                magic, dims, maxval_s, raster = b.split(b"\n", 3)
                if magic != b"P5":
                    raise ValueError(f"not a P5 PGM payload (doc {doc_id})")
                w, h = (int(x) for x in dims.split())
                arr = np.frombuffer(raster, dtype=np.uint8)
                if arr.size != w * h:
                    raise ValueError(f"raster size {arr.size} != {w}x{h}")
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                mx.append(int(maxval_s))
                means.append(1000 * int(arr.sum()) // (w * h))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "maxval": pd.Series(mx, dtype="int32"),
                    "mean_pixel_milli": pd.Series(means, dtype="int64"),
                }
            )

    return fan_out(df, bytes_per_task=FAN_OUT_ARROW_BPT).select(id_col, bin_col).mapInPandas(run, IMAGE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, width int, height int, resized binary, mean_pixel_milli long"
)


def resize_image(
    df: DataFrame,
    out_w: int = 8,
    id_col: str = "doc_id",
    bin_col: str = "content",
) -> DataFrame:
    """REAL image resize: nearest-neighbor downsample of each PGM (P5)
    payload to ``out_w`` columns and half the source height (min 1),
    re-emitting a valid PGM payload plus integer-exact raster stats.

    Nearest-neighbor with integer source indexing (src_row = y*h // out_h,
    src_col = x*w // out_w) is the one resampling kernel that is exactly
    reproducible in SQL — ``mean_pixel_milli`` over the selected pixels is
    the oracle hook, the same determinism trick as ``decode_image``. A
    PIL/opencv bilinear resize slots into the same mapInPandas seam when
    codec libs exist. Narrow map, no shuffle; output payloads shrink by
    ~4x, the usual reason a 100 TB image corpus resizes early.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, blobs, means = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload)
                magic, dims, maxval_s, raster = b.split(b"\n", 3)
                if magic != b"P5":
                    raise ValueError(f"not a P5 PGM payload (doc {doc_id})")
                w, h = (int(x) for x in dims.split())
                arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w)
                out_h = max(h // 2, 1)
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                small = arr[np.ix_(rows, cols)]
                ids.append(doc_id)
                ws.append(out_w)
                hs.append(out_h)
                blobs.append(
                    f"P5\n{out_w} {out_h}\n{int(maxval_s)}\n".encode()
                    + small.tobytes()
                )
                means.append(1000 * int(small.sum()) // (out_w * out_h))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "resized": blobs,
                    "mean_pixel_milli": pd.Series(means, dtype="int64"),
                }
            )

    return fan_out(df, bytes_per_task=FAN_OUT_ARROW_BPT).select(id_col, bin_col).mapInPandas(run, RESIZED_SCHEMA)


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

    return fan_out(df, bytes_per_task=FAN_OUT_ARROW_BPT).select(id_col, bin_col).mapInPandas(run, FEATURES_SCHEMA)


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

    return fan_out(df, bytes_per_task=FAN_OUT_ARROW_BPT).select(id_col, bin_col).mapInPandas(run, FRAMES_SCHEMA)


WAV_SAMPLE_RATE = 8000
AUDIO_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, peak_abs int, "
    "mean_square_milli long, zero_crossings long"
)


def attach_wav_audio(
    df: DataFrame, text_col: str = "text", out: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Render each document as a REAL audio file: canonical 44-byte
    RIFF/WAVE header + mono 16-bit PCM, one sample per sanitized text
    byte (sample = (byte − 79)·256, spanning ±12k of the int16 range) —
    honest payloads any audio tool can open, the audio twin of
    ``attach_pgm_image``. Sanitization (JVM-side, same contract as the
    PGM path) pins 1 char == 1 sample for the oracle.

    Binary packing is byte work the JVM can't express, so the pack runs
    in the sanctioned Arrow-batched ``mapInPandas`` seam; the stage is a
    narrow map, no shuffle."""
    import struct

    import numpy as np

    clean = F.regexp_replace(F.col(text_col), r"[^\x20-\x7E]", " ")
    src = fan_out(df, bytes_per_task=FAN_OUT_ARROW_BPT).withColumn("__clean", clean).select(id_col, "__clean")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, t in zip(pdf[id_col], pdf["__clean"]):
                s = (
                    np.frombuffer(t.encode("ascii"), dtype=np.uint8).astype(np.int16)
                    - 79
                ) * 256
                data = s.astype("<i2").tobytes()
                hdr = struct.pack(
                    "<4sI4s4sIHHIIHH4sI",
                    b"RIFF", 36 + len(data), b"WAVE",
                    b"fmt ", 16, 1, 1,
                    WAV_SAMPLE_RATE, WAV_SAMPLE_RATE * 2, 2, 16,
                    b"data", len(data),
                )
                ids.append(doc_id)
                payloads.append(hdr + data)
            yield pd.DataFrame({"doc_id": ids, "content": payloads})

    return src.mapInPandas(pack, "doc_id long, content binary")


def _wav_samples(payload: bytes, doc_id) -> "object":
    """Parse one RIFF/WAVE mono PCM16 payload to an int64 sample array,
    validating magic, format chunk, and layout — fails loud on anything
    that is not the advertised format."""
    import struct

    import numpy as np

    b = bytes(payload)
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload (doc_id={doc_id})")
    fmt_id, fmt_sz, audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack(
        "<4sIHHIIHH", b[12:36]
    )
    data_id, data_len = struct.unpack("<4sI", b[36:44])
    if (
        fmt_id != b"fmt "
        or fmt_sz != 16
        or audio_fmt != 1
        or n_ch != 1
        or bits != 16
        or data_id != b"data"
    ):
        raise ValueError(f"unsupported WAV layout (doc_id={doc_id})")
    return rate, np.frombuffer(b, dtype="<i2", offset=44, count=data_len // 2).astype(
        np.int64
    )


def decode_wav_audio(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content", stride: int = 1
) -> DataFrame:
    """REAL audio decode + feature extraction over the binary column: RIFF
    header parse, then integer-exact waveform stats — peak amplitude,
    mean-square energy (×1000, floor-divided: bit-reproducible), and
    zero-crossing count, the dependency-free stand-ins for loudness /
    spectral features. ``stride > 1`` decimates (every stride-th sample)
    before the stats — naive resampling, the audio twin of
    ``resize_image``.

    Scale shape: narrow Arrow-batched map, no shuffle; payload bytes
    never leave the partition."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in (
                "doc_id", "n_samples", "sample_rate", "peak_abs",
                "mean_square_milli", "zero_crossings",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                rate, s = _wav_samples(payload, doc_id)
                s = s[::stride]
                n = len(s)
                sgn = np.sign(s)
                cols["doc_id"].append(doc_id)
                cols["n_samples"].append(n)
                cols["sample_rate"].append(rate // stride)
                cols["peak_abs"].append(int(np.max(np.abs(s))) if n else 0)
                cols["mean_square_milli"].append(
                    int(1000 * int((s * s).sum()) // n) if n else 0
                )
                cols["zero_crossings"].append(
                    int(((sgn[:-1] * sgn[1:]) < 0).sum()) if n > 1 else 0
                )
            yield pd.DataFrame(cols)

    return fan_out(df, bytes_per_task=FAN_OUT_ARROW_BPT).select(id_col, bin_col).mapInPandas(run, AUDIO_SCHEMA)


AHASH_SCHEMA = "doc_id long, ahash string"


def ahash_image(df: DataFrame, id_col: str = "doc_id", bin_col: str = "content") -> DataFrame:
    """Perceptual average-hash (aHash) of a PGM payload: the raster is
    block-averaged onto an 8x8 grid, each cell emits 1 iff its mean
    exceeds the whole-image mean, and the 64 bits (row-major) form the
    visual fingerprint — the classic cheap near-dup hash for images
    (identical hash => visually identical content at 8x8 granularity,
    robust to trailing-pad / minor edits that leave block means alone).

    All arithmetic is integer (milli-means via 1000*sum//count), and the
    cell mapping is the explicit floor rule cell_y = min(y*8//h, 7), so
    the DuckDB oracle recomputes the SAME 64 bits from the source text —
    a perceptual hash under the exact-correctness gate, not just a
    Python-side artifact. Cells empty at h < 8 contribute 0 bits by rule.

    Scale shape: one Arrow-batched pass per partition; payload bytes
    never cross the network — only the 64-char hash leaves."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload)
                magic, dims, _maxval, raster = b.split(b"\n", 3)
                if magic != b"P5":
                    raise ValueError(f"not a P5 PGM payload (doc {doc_id})")
                w, h = (int(x) for x in dims.split())
                arr = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
                if arr.size != w * h:
                    raise ValueError(f"raster size {arr.size} != {w}x{h}")
                total_milli = 1000 * int(arr.sum()) // (w * h)
                ys = np.minimum(np.arange(h) * 8 // h, 7)
                xs = np.minimum(np.arange(w) * 8 // w, 7)
                cell = (ys[:, None] * 8 + xs[None, :]).ravel()
                sums = np.bincount(cell, weights=arr, minlength=64).astype(np.int64)
                cnts = np.bincount(cell, minlength=64)
                bits = []
                for c in range(64):
                    if cnts[c] == 0:
                        bits.append("0")
                    else:
                        bits.append(
                            "1" if 1000 * sums[c] // cnts[c] > total_milli else "0"
                        )
                ids.append(doc_id)
                hashes.append("".join(bits))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(hashes, dtype="object"),
                }
            )

    return fan_out(df, bytes_per_task=FAN_OUT_ARROW_BPT).select(id_col, bin_col).mapInPandas(run, AHASH_SCHEMA)
