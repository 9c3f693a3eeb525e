"""Connected-components operator tests (operators/components.py)."""

from __future__ import annotations

from etl_spark.operators.components import connected_components, dedup_representatives


def _run(spark, vert_ids, edge_pairs):
    v = spark.createDataFrame([(i,) for i in vert_ids], "id long")
    e = spark.createDataFrame(edge_pairs or [(None, None)], "id_a long, id_b long").where(
        "id_a is not null"
    )
    out = connected_components(v, e)
    return {r["id"]: r["comp"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2, 2-3, 3-4: one component labeled 1; 5 isolated
    got = _run(spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5}


def test_two_components_and_direction_irrelevance(spark):
    got = _run(spark, [1, 2, 3, 10, 11], [(2, 1), (11, 10), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_no_edges_all_singletons(spark):
    got = _run(spark, [7, 8, 9], [])
    assert got == {7: 7, 8: 8, 9: 9}


def test_long_path_converges(spark):
    n = 20  # diameter 19 -> needs multiple label-propagation rounds
    got = _run(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])
    assert set(got.values()) == {0}


def test_dedup_representatives_keep_flags(spark):
    v = spark.createDataFrame([(i,) for i in [1, 2, 3, 9]], "doc_id long")
    e = spark.createDataFrame([(2, 3)], "id_a long, id_b long")
    out = {r["doc_id"]: (r["component"], r["keep"]) for r in dedup_representatives(v, e, id_col="doc_id").collect()}
    assert out == {1: (1, True), 2: (2, True), 3: (2, False), 9: (9, True)}


def test_star_matches_propagation_on_random_graphs(spark):
    """Large-star/small-star must produce the identical (id, comp) labeling
    as min-label propagation on arbitrary graphs (several seeds, skewed
    degree, isolated vertices)."""
    import pyspark.sql.functions as F

    from etl_spark.operators.components import connected_components, connected_components_star

    for seed in (1, 2, 3):
        n = 200
        verts = spark.range(n).select(F.format_string("v%04d", F.col("id")).alias("id"))
        edges = (
            spark.range(150)
            .select(
                F.format_string("v%04d", F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n))).alias("id_a"),
                F.format_string("v%04d", F.pmod(F.xxhash64("id", F.lit(seed + 99)), F.lit(n // 3))).alias("id_b"),
            )
            .where(F.col("id_a") != F.col("id_b"))
        )
        a = {r["id"]: r["comp"] for r in connected_components(verts, edges).collect()}
        b = {r["id"]: r["comp"] for r in connected_components_star(verts, edges).collect()}
        assert a == b, f"seed {seed}: labelings diverge"


def test_star_converges_logarithmically_on_deep_chains(spark):
    """A 60-hop chain: propagation needs ~60 rounds (raises at 12), the
    alternating star rounds collapse it within the same tiny budget."""
    import pyspark.sql.functions as F
    import pytest

    from etl_spark.operators.components import connected_components, connected_components_star

    n = 61
    verts = spark.range(n).select(F.format_string("c%03d", F.col("id")).alias("id"))
    chain = spark.range(n - 1).select(
        F.format_string("c%03d", F.col("id")).alias("id_a"),
        F.format_string("c%03d", F.col("id") + 1).alias("id_b"),
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, chain, max_rounds=12)
    got = {r["comp"] for r in connected_components_star(verts, chain, max_rounds=12).collect()}
    assert got == {"c000"}  # one component, rooted at the minimum
