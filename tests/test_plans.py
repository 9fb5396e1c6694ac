"""Physical-plan regression tests: the scale posture (pushdown, broadcast
dimension joins, single-shuffle merges, partial aggregation) is asserted,
not just hoped for. If a refactor degrades a plan, these fail."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    from orion_spark.plans.queries import QUERIES

    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_scan_pushdown_and_hash_agg(spark):
    plan = _plan(spark, "tpch_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "HashAggregate" in plan
    # column pruning: the scan must not read unused columns
    assert "l_orderkey" not in plan.split("ReadSchema")[-1]


def test_q5_small_dims_broadcast(spark):
    plan = _plan(spark, "tpch_q5_nation_volume")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims fit the broadcast threshold


def test_merge_edges_single_shuffle_partial_agg(spark):
    plan = _plan(spark, "kgx_merge_edges")
    # property merge = ObjectHashAggregate (collect_list) with map-side
    # partial aggregation; exactly one shuffle for the whole merge
    assert "ObjectHashAggregate" in plan
    assert plan.count("Exchange") == 1
    assert "SortAggregate" not in plan


def test_normalization_map_joins_broadcast(spark):
    plan = _plan(spark, "normalize_edges_split")
    assert plan.count("BroadcastHashJoin") == 2  # subject map + object map
    assert "SortMergeJoin" not in plan


def test_closure_expansion_broadcasts_dimension(spark):
    plan = _plan(spark, "redundant_closure_counts")
    assert "BroadcastHashJoin" in plan


def test_semi_join_subset_uses_semi(spark):
    plan = _plan(spark, "connected_edge_subset")
    assert "LeftSemi" in plan


def test_prune_unconnected_semi_join(spark):
    plan = _plan(spark, "prune_unconnected_nodes")
    assert "LeftSemi" in plan


@pytest.mark.parametrize(
    "name",
    [
        "text_stats_panel",
        "text_fingerprints",
        "text_minhash_signatures",
        "text_simhash",
        "text_decontamination",
        "text_repetition_stats",
        "text_bpe_token_counts",
        "dedup_chunk_level",
        "graph_walk_skipgrams",
        "kgx_merge_map_tail",
    ],
)
def test_text_ops_no_python_udf(spark, name):
    """Text analysis must stay JVM-side — no BatchEvalPython/ArrowEvalPython
    stages (row-at-a-time Python would be the 100x slow path)."""
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_ann_brute_force_broadcasts_queries(spark):
    plan = _plan(spark, "ann_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q7_star_join_all_broadcast(spark):
    """The 5-way nation-volume star join must broadcast every dimension —
    the lineitem fact reaches the aggregate without a join shuffle."""
    plan = _plan(spark, "tpch_q7_nation_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q4_exists_becomes_semi_join(spark):
    plan = _plan(spark, "tpch_q4_order_priority")
    assert "LeftSemi" in plan
    # the date filter must reach the orders parquet scan
    assert "PushedFilters: [IsNotNull(o_orderdate)" in plan


def test_q22_not_exists_becomes_anti_join(spark):
    plan = _plan(spark, "tpch_q22_sales_opportunity")
    assert "LeftAnti" in plan


def test_q10_topk_is_takeordered(spark):
    """Deterministic top-20 must compile to TakeOrderedAndProject (per
    partition top-k + merge), not a global sort."""
    plan = _plan(spark, "tpch_q10_returned_items")
    assert "TakeOrderedAndProject" in plan


def test_q8_star_join_all_broadcast(spark):
    """q8's 7-way market-share star join: every dimension (incl. the
    pre-joined orders->customer->nation->region subtree) broadcasts; the
    lineitem fact is only shuffled once, for the per-year aggregate."""
    plan = _plan(spark, "tpch_q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q9_profit_dims_broadcast(spark):
    plan = _plan(spark, "tpch_q9_product_profit")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_q20_dominant_supplier_semi_join(spark):
    """q20: the dominant-supplier subquery reaches the supplier dimension
    as a left-semi join, and the per-part window reuses the (partkey)
    grouping shuffle rather than adding one per aggregate level."""
    plan = _plan(spark, "tpch_q20_dominant_suppliers")
    assert "LeftSemi" in plan


def test_repetition_stats_single_shuffle_chain(spark):
    """Both chained aggregates (doc_id,w then doc_id) must be partition-
    local after the single pre-explode repartition by doc_id: compact
    documents are shuffled once, exploded words never are."""
    plan = _plan(spark, "text_repetition_stats")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" in plan
    assert plan.count("Exchange") == 1


def test_chunk_dedup_no_cartesian(spark):
    """Chunk-level dedup must stay key-hashed joins — no all-pairs."""
    plan = _plan(spark, "dedup_chunk_level")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontamination_broadcast_no_corpus_shuffle(spark):
    """The benchmark side must broadcast (BNLJ over the tiny eval set is
    the intended plan — the train side never shuffles for the join); the
    arg-max aggregate is the only exchange, and no Python UDF appears."""
    plan = _plan(spark, "embedding_decontamination")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one exchange for the per-train-id max struct (AQE may add a final
    # coalesce read but not extra shuffles of the pair table)
    assert plan.count("Exchange") <= 2


def test_bm25_topk_is_takeordered_with_broadcast_dims(spark):
    """Global top-k must be TakeOrderedAndProject (no single-partition
    window over the corpus); df/query-term/stats dims broadcast."""
    plan = _plan(spark, "text_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_winnowing_matches_keyed_joins_only(spark):
    """The fingerprint match join must stay a key-hashed equi-join —
    no all-pairs fallback."""
    plan = _plan(spark, "text_winnowing_matches")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_span_rewrite_no_udf_no_cartesian(spark):
    plan = _plan(spark, "dedup_span_rewrite")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_epoch_shuffle_no_corpus_single_partition_sort(spark):
    """The global rank must come from the two-phase bucket scheme: the
    only single-partition exchange allowed is the tiny bucket dimension's
    prefix-sum window, never the corpus."""
    plan = _plan(spark, "documents_epoch_shuffle")
    assert plan.count("Exchange SinglePartition") <= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
