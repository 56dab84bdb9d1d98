"""Derive a BENCH-ONLY 10x replica of the sf0.1 fixture (~sf1).

The driver ships fixtures up to sf0.1; the scale story needs one honest
measured point a decade up. This script key-offsets 10 replicas of every
sf0.1 table so join cardinalities and key distributions scale exactly 10x
(each replica is a disjoint key universe joined to the shared
region/nation dims — the same shape TPC-H scaling produces). Content
columns are perturbed per replica (text suffix, one embedding coordinate
nudged) so dedup/similarity workloads grow IN SIZE but not in duplicate
rate — replicating verbatim would make every document a 10-way duplicate
and measure a different (pathological) workload, not scale.

Output: .scale/sf1/{table}.parquet directories (gitignored, regenerate on
demand). Correctness gates never read this data — bench only.

The script composes: pointing --src at a previously derived .scale/sf1
with a larger --stride yields a 100x point (.scale/sf10). The word-level
perturbation stacks — second-pass tags land on words offset by the new
replica id, so ~3/4 of 3-gram shingles still break between any two of
the 100 replicas and the duplicate RATE stays flat at 100x too.

Usage: python scripts/make_scale10.py [out_dir] [--src DIR] [--stride N]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from incremental_data_pipeline_spark.session import get_spark
from incremental_data_pipeline_spark.sources.readers import load_table

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
STRIDE = 10_000_000  # > every key domain at sf0.1

# table -> columns that get the replica offset (key universes disjoint)
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    global SRC, STRIDE
    argv = list(sys.argv[1:])
    if "--src" in argv:
        i = argv.index("--src")
        SRC = argv[i + 1]
        del argv[i : i + 2]
    if "--stride" in argv:
        i = argv.index("--stride")
        STRIDE = int(argv[i + 1])
        del argv[i : i + 2]
    global REPLICAS
    if "--replicas" in argv:
        # e.g. --src .scale/sf10 --replicas 3 gives a 3x step (sf30) for
        # between-decade scale spot-probes (VERDICT r7 #6)
        i = argv.index("--replicas")
        REPLICAS = int(argv[i + 1])
        del argv[i : i + 2]
    out_dir = argv[0] if argv else str(
        Path(__file__).resolve().parent.parent / ".scale" / "sf1"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="make_scale10",
        master="local[32]",
        shuffle_partitions=32,
        # The 100x pass (--src .scale/sf1) cross-joins ~6M-row inputs
        # against the replica range and word-tags every document; the
        # default 1g local-mode driver heap OOMs on the lineitem write.
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "24g"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("__r"))

    for name in COPY_AS_IS:
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
        print("copied", name)

    for name, keys in OFFSET_KEYS.items():
        df = load_table(spark, SRC, name).crossJoin(reps)
        for k in keys:
            df = df.withColumn(
                k, (F.col(k) + F.col("__r").cast("long") * STRIDE).cast("long")
            )
        # Keyed ENTITY NAMES are re-derived from the offset key (the same
        # TPC-H '<Entity>#%09d' rule — wider keys just print more digits).
        # Cloning names verbatim made every replica a true same-name
        # entity of its siblings, so entity-resolution OUTPUT itself grew
        # quadratically in the replica count — a duplicate-rate
        # pathology, not scale, same class as the text/embedding
        # perturbations.
        if name == "customer":
            df = df.withColumn(
                "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
            )
        if name == "supplier":
            df = df.withColumn(
                "s_name", F.format_string("Supplier#%09d", F.col("s_suppkey"))
            )
        if name == "part":
            # p_name was cloned VERBATIM across replicas, so every part
            # had ~R exact same-name twins within its brand and the
            # fuzzy-linkage OUTPUT grew quadratically in the replica
            # count (measured: heap OOM at the 100x point) — the same
            # duplicate-rate pathology as the cloned customer/supplier
            # names. A REPLICA-level md5 suffix (derived from the global
            # key offset, like the document word tags) pushes
            # cross-replica name distance far past the lev<=3 linkage
            # threshold while keeping within-replica near-name structure
            # intact (both members of a pair get the identical suffix).
            # Replica 0 keeps the original names.
            df = df.withColumn(
                "p_name",
                F.when(F.col("__r") == 0, F.col("p_name")).otherwise(
                    F.concat(
                        F.col("p_name"),
                        F.lit(" "),
                        F.substring(
                            F.md5(
                                (
                                    F.col("__r").cast("long") * STRIDE
                                ).cast("string")
                            ),
                            1,
                            8,
                        ),
                    )
                ),
            )
        if name == "documents":
            # Per-replica WORD-LEVEL perturbation: tag every 4th word
            # (offset by replica id) with a replica marker. A mere suffix
            # leaves replicas at ~0.94 word-3-gram Jaccard — a 10-way
            # NEAR-DUP clique per document, which turns every lossless
            # near-dup workload quadratic in the replica count (measured:
            # dedup_prefix_jaccard 29x at 10x data). Tagging 1-in-4 words
            # breaks ~3/4 of each replica's 3-gram shingles, pushing
            # cross-replica Jaccard to ~0.14 — well under the 0.6 dedup
            # thresholds — so the duplicate RATE genuinely stays flat
            # while sizes scale 10x. Replica 0 keeps the original text.
            # Tag VALUE is the replica's GLOBAL key offset (r * STRIDE),
            # not the bare replica index: bare-index tags COMMUTE across
            # passes — pass-1 tag a at positions i%4==a%4 composed with
            # pass-2 tag b at i%4==b%4 touches disjoint positions whenever
            # a%4 != b%4, so replicas (a,b) and (b,a) of the 100x point
            # produced IDENTICAL text. 74 of every 100 sf10 replicas had
            # an exact whole-document twin; 80% of all k=10 windows were
            # duplicated (r7 span_removal_probe: dup occurrences 88x for
            # 10x data) — a duplicate-rate pathology, not scale. The
            # stride differs between passes, so r*STRIDE values from
            # different passes never collide and the composition is
            # order-sensitive again.
            words = F.split(F.col("text"), " ")
            tagged = F.array_join(
                F.zip_with(
                    words,
                    F.sequence(F.lit(0), F.size(words) - 1),
                    lambda w, i: F.when(
                        (F.col("__r") > 0)
                        & (i % 4 == F.col("__r") % 4),
                        F.concat(
                            w,
                            F.lit("~"),
                            (F.col("__r").cast("long") * STRIDE).cast(
                                "string"
                            ),
                        ),
                    ).otherwise(w),
                ),
                " ",
            )
            df = df.withColumn("text", tagged).withColumn(
                "n_chars", F.length("text").cast("long")
            )
        if name == "embeddings":
            # Per-replica ORTHOGONAL transform: circular-shift the vector
            # by r and flip the sign of coordinates j ≡ r (mod 10).
            # A replica-uniform isometry preserves every within-replica
            # cosine EXACTLY (all planted similarity structure scales
            # with the data) while cross-replica cosines collapse to
            # ~0 — the embedding analogue of the word-tagging above.
            # The previous one-coordinate 0.001 nudge left replicas at
            # cosine ≈ 0.9999: every vector acquired ~replicas mutual
            # near-dups, so near-dup/semantic-dedup outputs (and their
            # within-bucket confirm scans) grew QUADRATICALLY in the
            # replica count — a pathological workload, not scale
            # (embedding_near_dup's output and confirm-scan volume grew
            # with replica², dominating its 10x-point wall).
            # Replica 0 keeps the original vectors. Known residual: the
            # two-pass composition (x,0) vs (0,x) applies the same total
            # transform, so ~18% of final vectors keep exactly ONE
            # cross-replica twin — a LINEAR near-dup population, which a
            # realistic corpus has anyway.
            e = F.col("embedding")
            r = F.col("__r")
            shifted = F.when(r == 0, e).otherwise(
                F.concat(
                    F.slice(e, r + 1, F.lit(64) - r), F.slice(e, F.lit(1), r)
                )
            )
            df = df.withColumn(
                "embedding",
                F.when(r == 0, e).otherwise(
                    F.transform(
                        shifted,
                        lambda x, j: F.when(
                            j % 10 == r % 10, (-x).cast("float")
                        ).otherwise(x),
                    )
                ),
            )
        df = df.drop("__r").repartition(32)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        print("scaled 10x", name)

    spark.stop()
    print("done ->", out_dir)


if __name__ == "__main__":
    main()
