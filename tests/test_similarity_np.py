"""Bit-parity of the dgemm cell-assignment twin.

``cell_assignments_np`` must return EXACTLY what the expression path
returns — same dots (both are exact integers: the expression path sums
bigints, the numpy path sums float64 values that are all exactly
representable), same cos doubles (same IEEE ops on the same operands),
same (negcos, label) ordering, same nprobe slice. Pinned on the
fixture embeddings and on a synthetic many-cell corpus with engineered
ties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_validator_github_spark.scale.similarity import (
    cell_assignments,
    cell_assignments_np,
    ivf_cells,
    quantized,
    semantic_threshold_sweep,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    out = []
    for r in df.collect():
        out.append((
            r["vec_id"], tuple(r["qv"]), r["norm2"],
            tuple((c["negcos"], c["label"]) for c in r["top_cells"]),
        ))
    return sorted(out)


def test_np_assignment_matches_expression_on_fixture(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vecs, cells = quantized(emb), ivf_cells(emb)
    for nprobe in (1, 3):
        a = _rows(cell_assignments(vecs, cells, nprobe=nprobe))
        b = _rows(cell_assignments_np(vecs, cells, nprobe=nprobe))
        assert a == b


def test_np_assignment_matches_on_synthetic_ties(spark):
    # 2000 vectors over 64 cells; duplicate vectors under different ids
    # force exact cos ties across cells built from identical label
    # populations, exercising the label tie-break.
    emb = spark.range(2000).selectExpr(
        "id as vec_id",
        "cast(id % 64 as int) as label",
        "transform(sequence(0, 15), i -> cast("
        "((id % 500) * 37 + i * 11) % 201 - 100 as float) / 100.0f)"
        " as embedding",
    )
    vecs, cells = quantized(emb), ivf_cells(emb)
    a = _rows(cell_assignments(vecs, cells, nprobe=2))
    b = _rows(cell_assignments_np(vecs, cells, nprobe=2))
    assert a == b


def test_per_vec_max_cos_np_matches_join_across_blocks(spark):
    # Cell populations of 1250 exceed the 1024 gram block, so the
    # blockwise strict-upper-triangle masking is exercised; values
    # must equal the join + max formulation exactly.
    from etl_validator_github_spark.scale.similarity import (
        _DOT,
        _per_vec_max_cos_np,
    )

    pairable = spark.range(2500).selectExpr(
        "id as vec_id",
        "cast(id % 2 as int) as cell",
        "transform(sequence(0, 7), i -> (id % 97) * 13 + i * 7 - 50)"
        " as qv",
    ).withColumn("norm2", F.expr(_DOT.format(a="qv", b="qv")))
    a, b = pairable.alias("a"), pairable.alias("b")
    cos = (
        F.expr(_DOT.format(a="a.qv", b="b.qv"))
        / (F.sqrt("a.norm2") * F.sqrt("b.norm2"))
    )
    want = (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("b.vec_id").alias("vec_id"), cos.alias("cos"))
        .groupBy("vec_id").agg(F.max("cos").alias("max_cos"))
    )
    got = _per_vec_max_cos_np(pairable)
    w = {r["vec_id"]: r["max_cos"] for r in want.collect()}
    g = {r["vec_id"]: r["max_cos"] for r in got.collect()}
    assert g == w


def test_sweep_scale_optins_change_nothing(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = semantic_threshold_sweep(emb, emb)
    fast = semantic_threshold_sweep(
        emb, emb, np_assign=True, materialize_assignment=True,
        np_pairs=True,
    )
    key = ["threshold_milli", "n_total", "n_dropped", "n_kept"]
    assert sorted(map(tuple, base.select(*key).collect())) == \
        sorted(map(tuple, fast.select(*key).collect()))


def test_keep_scale_optins_change_nothing(spark):
    from etl_validator_github_spark.scale.similarity import (
        semantic_dedup_keep,
        with_vector_copies,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    aug = with_vector_copies(emb)
    base = semantic_dedup_keep(aug, emb)
    fast = semantic_dedup_keep(
        aug, emb, np_assign=True, materialize_assignment=True,
        np_pairs=True,
    )
    cols = ["vec_id", "cell", "keep"]
    assert sorted(map(tuple, base.select(*cols).collect())) == \
        sorted(map(tuple, fast.select(*cols).collect()))


def test_split_leakage_scale_optins_change_nothing(spark):
    from etl_validator_github_spark.scale.similarity import (
        semantic_split_leakage,
        with_vector_copies,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    aug = with_vector_copies(emb)
    base = semantic_split_leakage(aug, emb)
    fast = semantic_split_leakage(
        aug, emb, np_assign=True, materialize_assignment=True,
        np_pairs=True,
    )
    cols = ["vec_id", "cell", "n_train_dups"]
    got_base = sorted(map(tuple, base.select(*cols).collect()))
    got_fast = sorted(map(tuple, fast.select(*cols).collect()))
    assert got_base == got_fast and len(got_base) > 0


def test_index_search_np_probe_matches_join(spark, tmp_path):
    from etl_validator_github_spark.scale.similarity import (
        ivf_topk_from_index,
        persist_ivf_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    persist_ivf_index(emb, emb, idx)
    base = sorted(map(tuple, ivf_topk_from_index(spark, idx).collect()))
    fast = sorted(map(tuple, ivf_topk_from_index(
        spark, idx, np_assign=True, np_probe=True).collect()))
    assert base == fast and len(base) > 0


def test_probe_topk_np_blockwise_matches_join(spark):
    # Cell populations of 5000 exceed the 4096 member block, so the
    # running top-k merge across blocks is exercised; the result must
    # equal the join formulation exactly (same total order, exact
    # integer dots → bit-identical cos doubles).
    from etl_validator_github_spark.scale.similarity import (
        _DOT,
        _probe_join_topk,
        _probe_topk_np,
    )

    assign = spark.range(10_000).selectExpr(
        "id as vec_id",
        "cast(id % 2 as int) as cell",
        "transform(sequence(0, 7), i -> (id % 311) * 17 + i * 5 - 40)"
        " as qv",
    ).withColumn("norm2", F.expr(_DOT.format(a="qv", b="qv")))
    probes = assign.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"),
        "cell",
        F.col("qv").alias("q_qv"),
        F.col("norm2").alias("q_norm2"),
    )
    want = sorted(map(tuple, _probe_join_topk(assign, probes, 10).collect()))
    got = sorted(map(tuple, _probe_topk_np(assign, probes, 10).collect()))
    assert got == want and len(got) == 16 * 10


def test_zero_norm_vectors_never_pair(spark):
    # A zero vector (all components quantize to 0) has no defined
    # cosine; the pair joins must exclude it in every formulation —
    # expression, numpy, and (structurally mirrored) the DuckDB oracle,
    # where 0/0 is NaN and NaN compares greater than any threshold.
    from etl_validator_github_spark.scale.similarity import (
        _DOT,
        _per_vec_max_cos_np,
        ann_pairs,
    )

    pairable = spark.range(50).selectExpr(
        "id as vec_id",
        "cast(0 as int) as cell",
        "CASE WHEN id = 7 THEN transform(sequence(0, 7), i -> 0L)"
        " ELSE transform(sequence(0, 7), i -> (id % 13) * 9 + i - 3)"
        " END as qv",
    ).withColumn("norm2", F.expr(_DOT.format(a="qv", b="qv")))
    got = _per_vec_max_cos_np(pairable).collect()
    assert all(r["vec_id"] != 7 for r in got)
    assert all(r["max_cos"] == r["max_cos"] for r in got)  # no NaN

    emb = spark.range(50).selectExpr(
        "id as vec_id",
        "CASE WHEN id = 7 THEN transform(sequence(0, 63), i -> 0.0f)"
        " ELSE transform(sequence(0, 63), i -> cast("
        "((id % 13) * 9 + i - 32) / 100.0 as float)) END as embedding",
    )
    pairs = ann_pairs(emb).collect()
    assert len(pairs) > 0
    assert all(r["v1"] != 7 and r["v2"] != 7 for r in pairs)
    assert all(r["cos_sim"] is not None
               and r["cos_sim"] == r["cos_sim"] for r in pairs)


def test_zero_norm_split_leakage_and_keep_guard(spark):
    # semantic_dedup_keep / semantic_split_leakage with a zero-norm row
    # in the corpus: the row keeps (nothing can drop it), reports no
    # leaks, and the np twins agree with the expression plan.
    from etl_validator_github_spark.scale.similarity import (
        semantic_dedup_keep,
        semantic_split_leakage,
    )

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = base.unionByName(spark.range(1).selectExpr(
        "cast(90000000 as bigint) as vec_id",
        "transform(sequence(0, 63), i -> 0.0f) as embedding",
        "cast(0 as int) as label",
    ).select("vec_id", "embedding", "label"))
    keep = semantic_dedup_keep(corpus, base)
    keep_np = semantic_dedup_keep(corpus, base, np_assign=True,
                                  np_pairs=True)
    cols = ["vec_id", "cell", "keep"]
    got = sorted(map(tuple, keep.select(*cols).collect()))
    got_np = sorted(map(tuple, keep_np.select(*cols).collect()))
    assert got == got_np
    zero_rows = [r for r in got if r[0] == 90_000_000]
    assert len(zero_rows) == 1 and zero_rows[0][2] == 1

    leak = semantic_split_leakage(corpus, base)
    leak_np = semantic_split_leakage(corpus, base, np_assign=True,
                                     np_pairs=True)
    cols = ["vec_id", "cell", "n_train_dups"]
    a = sorted(map(tuple, leak.select(*cols).collect()))
    b = sorted(map(tuple, leak_np.select(*cols).collect()))
    assert a == b
    assert all(r[0] != 90_000_000 for r in a)


def test_zero_norm_guard_in_serve_paths(spark, tmp_path):
    # The serve paths (_query_probes -> _probe_join_topk /
    # _probe_topk_np via ivf_topk_for_queries) under zero-norm index
    # AND query vectors: a zero vector has no defined cosine, so it
    # must neither occupy a top-k slot (index side) nor emit rows
    # (query side), and it must never surface as NaN — in either probe
    # formulation (r11 advice item).
    from etl_validator_github_spark.scale.similarity import (
        ivf_topk_for_queries,
        persist_ivf_index,
    )

    corpus = spark.range(200).selectExpr(
        "id as vec_id",
        "CASE WHEN id = 7 THEN transform(sequence(0, 63), i -> 0.0f)"
        " ELSE transform(sequence(0, 63), i -> cast("
        "((id % 13) * 9 + i - 32) / 100.0 as float)) END as embedding",
        "cast(id % 4 as int) as label",
    )
    idx = str(tmp_path / "idx")
    persist_ivf_index(corpus, corpus, idx)
    queries = spark.range(1000, 1005).selectExpr(
        "id as vec_id",
        "CASE WHEN id = 1003 THEN transform(sequence(0, 63), i -> 0.0f)"
        " ELSE transform(sequence(0, 63), i -> cast("
        "((id % 11) * 7 + i - 30) / 100.0 as float)) END as embedding",
    )
    base = sorted(map(tuple, ivf_topk_for_queries(
        spark, idx, queries, k=5).collect()))
    fast = sorted(map(tuple, ivf_topk_for_queries(
        spark, idx, queries, k=5, np_assign=True, np_probe=True
    ).collect()))
    assert base == fast and len(base) > 0
    qids = {r[0] for r in base}
    assert 1003 not in qids and qids == {1000, 1001, 1002, 1004}
    assert all(r[1] != 7 for r in base)          # zero member never ranks
    assert all(r[3] == r[3] for r in base)       # no NaN cos_sim


def test_external_topk_np_twin_matches_expression(spark):
    # The oracled external-serve query's scale opt-ins change nothing:
    # numpy assignment + blocked probe kernel vs the expression plan on
    # the same md5 holdout split.
    from pyspark.sql import functions as F

    from etl_validator_github_spark.scale.similarity import (
        EXT_QUERY_HOLDOUT,
        external_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    held = (
        emb.select("vec_id")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(EXT_QUERY_HOLDOUT)
    )
    queries = emb.join(F.broadcast(held), "vec_id").select(
        "vec_id", "embedding"
    )
    index = emb.join(F.broadcast(held), "vec_id", "left_anti")
    base = sorted(map(tuple, external_topk(index, queries).collect()))
    fast = sorted(map(tuple, external_topk(
        index, queries, np_assign=True, np_probe=True).collect()))
    assert base == fast and len(base) == EXT_QUERY_HOLDOUT * 10
