"""Benchmark harness: times the engine's headline queries at one scale
factor and emits ONE JSON line the driver records as BENCH_r{N}.json.

Methodology:
- each query is forced end-to-end with the `noop` sink (full execution,
  zero driver-side collect cost — measures the plan, not Py4J transfer);
- one untimed warm-up pass of the first query absorbs JVM/codegen JIT;
- `metric` is the total wall seconds across all headline queries, with the
  per-query breakdown under `queries`.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_COMPARE_JSON (embed a
shared-subset ratio vs a previous artifact, e.g. cross-SF),
SPARK_GRAFT_PREV_REF (git ref of the previous round: benchmark that tree
sequentially in the same session and embed `vs_prev_round`).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from incremental_data_pipeline_spark.plans.queries import QUERIES
from incremental_data_pipeline_spark.session import get_spark

# Headline set: every subsystem has a representative — relational core,
# star join, CDC/medallion, dedup family, text analysis, vector search.
HEADLINE = [
    "pricing_summary",
    "silver_agg",
    "star_join",
    "topk_per_group",
    "watermark_range",
    "scd1_upsert",
    "medallion_e2e",
    "dedup_exact",
    "dedup_minhash_lsh",
    # embedding_near_dup (pinned B=8) left the headline set in round 8:
    # its fixed-band bucket populations grow with the corpus BY CONTRACT
    # (69.5x wall at the sf1->sf10 step, SCALE_CLAIMS.md), so it is a
    # recall-contract registry query, not a scale benchmark; the
    # auto-sized twin embedding_near_dup_auto below is the scale path.
    "text_quality",
    "knn_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "stream_window_agg",
    "multimodal_frames",
    "dedup_clusters",
    "corpus_curation",
    "shipping_priority",
    # round-3 subsystems
    "decontaminate_corpus",
    "semantic_dedup_emb",
    "purchase_click_window",
    "kmv_distinct_orderparts",
    "tfidf_top_terms",
    "text_bigram_coverage",
    "incremental_agg_merge",
    "snapshot_diff_orders",
    # round-4: corpus-sized bucket params + hierarchical codebook
    "ann_lsh_auto_topk",
    "ann_ivf_auto_topk",
    "ann_ivf2_topk",
    # round-4: temporal/association analytics + lossless set-similarity
    "pit_join_scd2",
    "basket_lift",
    "dedup_prefix_jaccard",
    "ivm_join_delta",
    "cms_heavy_hitters",
    "stream_click_purchase_timeout",
    # round-4 session: vector quantization, banded theta join, interval
    # overlap, streaming retract fold
    "embedding_quantize_int8",
    "price_band_pairs",
    "order_span_overlap_pairs",
    "stream_ivm_retract",
    # round-4 session 2: scan-throughput probe, quarterly top-20 join,
    # asymmetric containment near-dup
    "discount_band_revenue",
    "returned_item_report",
    "dedup_containment",
    # round-4 session 3: PQ-ADC scan, perceptual image hash, streaming
    # stateful CUSUM
    "ann_pq_topk",
    "multimodal_ahash",
    "stream_cusum_alarms",
    "dedup_prefix_containment",
    # round-5: blocked edit-distance dedup/ER, integer-exact BM25
    # retrieval, robust outlier census, schema-evolving merge, multi-table
    # transactional snapshot, Q5-shaped cyclic join, persisted/streamed
    # IVF index + recall audit
    "dedup_blocked_edit",
    "bm25_per_term_topk",
    "multi_table_txn_snapshot",
    "er_blocked_match",
    "robust_outlier_profile",
    "scd1_upsert_evolving",
    "local_supplier_volume",
    "ann_ivf_index_persisted",
    "stream_ivf_index_upsert",
    "ann_ivf_recall",
    # round-5 session 2: the auto-sized OR-amplified near-dup operating
    # point and C4-style repeated-span removal
    "embedding_near_dup_auto",
    "dedup_span_removal",
    # round-9 session 2: cross-engine HLL, FS record linkage over a
    # range-bucketed global order, trained NB classifier, bucketed
    # co-located join, leakage-safe target encoding
    "hll_distinct_users",
    "er_fs_sorted_neighborhood",
    "nb_lang_confusion",
    "bucketed_join_pricing",
    "target_encode_loo",
    "jl_distortion_audit",
    "chi2_top_terms_lang",
    "hll_rollup_users_by_type",
]


def _force(df) -> None:
    """Run the full plan through the noop sink (no rows to the driver)."""
    df.write.mode("overwrite").format("noop").save()


def _bench_prev_round(ref: str, sf_dir: str, cpus: str, timings: dict) -> dict:
    """Benchmark the PREVIOUS round's code in the same host window and
    return the shared-subset comparison. Cross-round wall clocks from
    different sessions are dominated by host conditions (r4→r5 showed a
    near-uniform 1.29x on untouched queries); running both trees
    back-to-back in one session makes the ratio attributable to CODE.

    The previous tree comes from a detached git worktree at ``ref`` and
    runs as a SEQUENTIAL subprocess (its own pre-touched JVM — concurrent
    JVMs would contend for the same cores and skew both numbers). The
    subprocess pays the same warm-up discipline this run pays."""
    import subprocess
    import tempfile

    wt = tempfile.mkdtemp(prefix="bench_prev_")
    os.rmdir(wt)  # worktree add requires a non-existent path
    try:
        subprocess.run(
            ["git", "-C", str(Path(__file__).resolve().parent),
             "worktree", "add", "--detach", wt, ref],
            check=True, capture_output=True, text=True,
        )
        env = dict(os.environ)
        env.pop("SPARK_GRAFT_COMPARE_JSON", None)
        # "" (not unset): an unset var makes the child fall back to ITS
        # committed .prev_round_ref, so round N would recursively benchmark
        # rounds N-1, N-2, ... until the subprocess timeout.
        env["SPARK_GRAFT_PREV_REF"] = ""
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
        env["SPARK_GRAFT_CPUS"] = cpus
        env["PYTHONPATH"] = wt
        res = subprocess.run(
            [sys.executable, os.path.join(wt, "bench.py")],
            env=env, cwd=wt, capture_output=True, text=True, timeout=7200,
        )
        lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
        if res.returncode != 0 or not lines:
            return {"ref": ref, "error": (res.stderr or "no output")[-500:]}
        prev = json.loads(lines[-1])
        shared = sorted(set(timings) & set(prev.get("queries", {})))
        prev_total = sum(prev["queries"][q] for q in shared)
        cur_total = sum(timings[q] for q in shared)
        return {
            "ref": ref,
            "n_shared": len(shared),
            "shared_total_sec": round(cur_total, 3),
            "prev_total_sec": round(prev_total, 3),
            "ratio": round(cur_total / prev_total, 3) if prev_total else None,
            "prev_host_steal_pct": prev.get("host_steal_pct"),
            "per_query_ratio": {
                q: round(timings[q] / prev["queries"][q], 2)
                for q in shared
                if prev["queries"][q] > 0
            },
        }
    finally:
        subprocess.run(
            ["git", "-C", str(Path(__file__).resolve().parent),
             "worktree", "remove", "--force", wt],
            capture_output=True,
        )


def _cpu_stat() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat, or (0, 0) off-Linux."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return (vals[7] if len(vals) > 7 else 0, sum(vals))
    except (OSError, ValueError, IndexError):
        return (0, 0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    steal0, total0 = _cpu_stat()

    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # Local-mode Spark defaults to a 1 GiB driver heap, which the
        # full headline set exhausts at the sf1 scale point (GCLocker
        # alloc stalls, then OOM). Effective only when this process
        # creates the JVM — exactly the bench case. The sf10 (100x)
        # point needs more headroom: override via SPARK_GRAFT_DRIVER_MEM.
        extra_conf={
            "spark.driver.memory": mem,
            # Size the INITIAL heap to the max and pre-fault every page at
            # JVM start. Without this, the first heavy query PAYS the
            # hypervisor page-fault + heap-expansion cost for tens of GB
            # and the measurement is an artifact of run ORDER, not query
            # cost (measured in an otherwise-idle session: the identical
            # dedup_containment run at sf1 took 438s on a growing heap and
            # 15.7s immediately after, same process; AlwaysPreTouch alone
            # doesn't help because it only pre-faults -Xms). Standard JVM
            # benchmarking hygiene; startup eats the cost instead.
            # 240MB default JIT code cache fills after ~50 queries x 2
            # reps of whole-stage-codegen classes; the JVM then silently
            # stops compiling and late-list queries run interpreted
            # (observed: ann_ivf_auto_topk 1.3s early-list vs 6.1s
            # late-list, same session). 1g keeps every plan compiled.
            "spark.driver.extraJavaOptions": (
                f"-Xms{mem} -XX:+AlwaysPreTouch -XX:ReservedCodeCacheSize=1g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up, untimed: JVM/codegen JIT via the first query, one tiny
    # Arrow/Pandas-UDF round to spin up the Python worker pool (so queries
    # that use mapInPandas measure compute, not interpreter fork time),
    # and one tiny sf0.001 streaming drain so the first HEADLINE streaming
    # query measures the micro-batch pipeline, not one-time StreamExecution
    # engine/state-store class init.
    _force(QUERIES[HEADLINE[0]](spark, sf_dir))
    spark.range(64).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    from incremental_data_pipeline_spark.streaming import pipeline as _sp

    # Warm on the smallest sibling fixture that exists (sf_dir itself as
    # the fallback) — no hard-coded host layout.
    sibling = Path(sf_dir).parent / "sf0.001"
    warm_dir = str(sibling) if (sibling / "events.parquet").exists() else sf_dir
    tiny = _sp.read_stream(spark, warm_dir, "events").groupBy().count()
    _sp.run_to_memory(tiny, "complete").collect()

    # Two timed iterations per query, report the min: host-VM CPU-steal
    # waves (observed: identical code 34 s vs 267 s total) otherwise
    # dominate the signal. Min-of-2 is the standard contention filter and
    # still includes each query's one-shot plan-compile cost in iteration
    # 1 — the min only discards *external* noise, not engine work, since
    # iteration 2 re-runs the full plan end-to-end.
    def _clear_leftover_state() -> None:
        """Per-query isolation: drop cached relations AND the
        localCheckpoint block RDDs some fixpoint queries (connected
        components, curation) leave pinned in the block manager — at the
        sf1 point the accumulated blocks otherwise push later queries
        into GC pressure and a query's number starts depending on its
        position in the list (observed: multimodal_frames 24 s mid-list
        vs 2.4 s standalone)."""
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist()

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        samples: list[float] = []
        # 2 reps, plus a 3rd when the pair disagrees >1.5x: the r5→r6
        # sf10 per-query swings (near_dup_auto 25→115 s) were partly
        # session noise even at ~2% steal — weak-lists must be gated on
        # stable numbers, and the per-query spread is embedded so the
        # artifact SHOWS which numbers were noisy.
        while len(samples) < 2 or (
            len(samples) == 2
            and max(samples) / max(min(samples), 1e-9) > 1.5
        ):
            _clear_leftover_state()
            t0 = time.perf_counter()
            _force(QUERIES[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
        spreads[name] = round(max(samples) / max(min(samples), 1e-9), 2)

    out = {
        "metric": "headline_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # max/min across the reps of each query; >1.5x triggered a 3rd rep
        "rep_spread": spreads,
        "sf": sf,
        # r1 was n=1; r2+ report min-of-2 (see comment above) — noted
        # here so cross-round comparisons stay honest.
        "method": "min-of-2+spread3",
        # headline-set size per round: r1/r2 had 16/19; totals are
        # only comparable on the shared per-query subset.
        "n_queries": len(HEADLINE),
    }
    # Host-contention self-report: hypervisor steal over the run, as a
    # fraction of total CPU ticks. Observed steal waves inflate identical
    # code 3-6x (r4/r5 notes); a number in the artifact beats a footnote
    # asking readers to trust that the run was quiet.
    steal1, total1 = _cpu_stat()
    if total1 > total0:
        out["host_steal_pct"] = round(
            100.0 * (steal1 - steal0) / (total1 - total0), 2
        )
    # Scale-ratio self-report: SPARK_GRAFT_COMPARE_JSON names a previous
    # bench artifact (e.g. the sf0.1 run when this run is the sf1 point);
    # the shared-subset wall ratio lands in the artifact itself so
    # cross-SF claims don't depend on anyone re-deriving them by hand.
    cmp_path = os.environ.get("SPARK_GRAFT_COMPARE_JSON")
    if cmp_path and os.path.exists(cmp_path):
        with open(cmp_path) as f:
            prev = json.load(f)
        shared = sorted(set(timings) & set(prev.get("queries", {})))
        prev_total = sum(prev["queries"][q] for q in shared)
        cur_total = sum(timings[q] for q in shared)
        out["compare"] = {
            "against": os.path.basename(cmp_path),
            "against_sf": prev.get("sf"),
            "n_shared": len(shared),
            "shared_total_sec": round(cur_total, 3),
            "shared_baseline_sec": round(prev_total, 3),
            "shared_subset_ratio": round(cur_total / prev_total, 3)
            if prev_total
            else None,
        }
    # Cross-ROUND ratio: SPARK_GRAFT_PREV_REF names a git ref (the prior
    # round's last commit); its tree is benchmarked sequentially in this
    # same host window and the shared-subset ratio embedded — the same
    # discipline compare/shared_subset_ratio applies cross-SF, applied
    # cross-round (VERDICT r5: session-to-session walls are not
    # comparable; 1.29x r4→r5 was host conditions, not code).
    prev_ref = os.environ.get("SPARK_GRAFT_PREV_REF")
    if prev_ref is None:
        # committed default so the per-round driver run embeds the ratio
        # without env plumbing; set SPARK_GRAFT_PREV_REF="" to disable
        ref_file = Path(__file__).resolve().parent / ".prev_round_ref"
        if ref_file.exists():
            prev_ref = ref_file.read_text().strip()
    if prev_ref:
        spark.stop()  # free the cores before the subprocess JVM starts
        out["vs_prev_round"] = _bench_prev_round(
            prev_ref, sf_dir, cpus, timings
        )
        print(json.dumps(out))
        return
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
