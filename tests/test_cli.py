"""CLI surface tests — the reference's muscle memory
(newaugsver_clean.py / DM_bankfile_validate_pipeline.py flags) against
the Spark engine, run in-process against the shared session."""

from __future__ import annotations

import pytest

from etl_validator_github_spark.cli import _parse_invalid_values, main


def test_parse_invalid_values_column_and_cell():
    columns, cells = _parse_invalid_values(
        ["RoutingTransitNumber:54321", "RecordOperation:3=Z", "State:1=X"]
    )
    assert columns == {"RoutingTransitNumber": "54321"}
    assert cells == {("RecordOperation", 3): "Z", ("State", 1): "X"}


def test_cli_generate_mutate_validate_roundtrip(spark, tmp_path):
    out = tmp_path / "bank"
    assert main([
        "generate", "--rows", "25", "--seed", "246",
        "--output", str(out), "--formats", "parquet",
    ]) == 0

    mutated = tmp_path / "mtfdm_dev2_dmbankdata_t.parquet"
    assert main([
        "mutate", f"{out}.parquet",
        "--invalid-values", "RoutingTransitNumber:2=ABC12",
        "--output", str(mutated),
    ]) == 0

    assert main([
        "validate", str(mutated),
        "--error-dir", str(tmp_path / "error"),
        "--archive-dir", str(tmp_path / "archive"),
    ]) == 0
    csvs = list((tmp_path / "error").glob("mtfdm_dev2_dmbankerrorfile_*.csv"))
    assert len(csvs) == 1
    body = csvs[0].read_text()
    assert body.startswith("FILENAME|PayeeId|ERROR_DESC")
    assert "RoutingTransitNumber" in body


def test_cli_validate_rejects_schema_drift(spark, tmp_path):
    out = tmp_path / "bank"
    main(["generate", "--rows", "10", "--output", str(out)])
    broken = tmp_path / "broken.parquet"
    assert main([
        "mutate", f"{out}.parquet",
        "--drop-columns", "ContactEmail",
        "--output", str(broken),
    ]) == 0
    # Missing column → file-level rejection, exit 1 (R24).
    assert main([
        "validate", str(broken), "--error-dir", str(tmp_path / "err2"),
    ]) == 1


def test_cli_mutate_extra_columns_and_duplicate_row(spark, tmp_path):
    out = tmp_path / "bank"
    main(["generate", "--rows", "10", "--output", str(out)])
    mutated = tmp_path / "extra.parquet"
    assert main([
        "mutate", f"{out}.parquet",
        "--extra-columns", "BonusCol",
        "--duplicate-row", "0",
        "--output", str(mutated),
    ]) == 0
    df = spark.read.parquet(str(mutated))
    assert "BonusCol" in df.columns
    vals = {r.BonusCol for r in df.select("BonusCol").collect()}
    assert all(v.startswith("Extra_BonusCol_") for v in vals)
    assert df.count() == 11  # 10 rows + one duplicated
    # Extra column is a detail, not a rejection (R24 extra vs missing).
    assert main([
        "validate", str(mutated), "--error-dir", str(tmp_path / "err3"),
    ]) == 0


def test_cli_mutate_min_max_limits_row_isolated(spark, tmp_path):
    """Mirror of the reference min/max scenario (PIPE:3325-3432): rows 0/1
    get the (valid) boundary values, rows 2/3 auto-derived violations —
    the validator must flag exactly rows 2 and 3."""
    out = tmp_path / "bank"
    main(["generate", "--rows", "10", "--seed", "246", "--output", str(out)])
    mutated = tmp_path / "mtfdm_dev2_dmbankdata_mm.parquet"
    assert main([
        "mutate", f"{out}.parquet",
        "--min-max-limits", "PostalCode:10000:9999999999",
        "--output", str(mutated),
    ]) == 0
    rows = (
        spark.read.parquet(str(mutated))
        .orderBy("PayeeID")
        .select("PayeeID", "PostalCode")
        .collect()
    )
    assert rows[0].PostalCode == "10000"          # min boundary, valid
    assert rows[1].PostalCode == "9999999999"     # max boundary, valid
    assert rows[2].PostalCode == "XXXX"           # below min_length 5
    assert rows[3].PostalCode == "A" * 15         # above max_length 10
    assert main([
        "validate", str(mutated),
        "--error-dir", str(tmp_path / "errmm"),
    ]) == 0
    body = next((tmp_path / "errmm").glob("*.csv")).read_text()
    postal_lines = [l for l in body.splitlines() if "PostalCode" in l]
    flagged = {l.split("|")[1] for l in postal_lines}
    assert flagged == {rows[2].PayeeID, rows[3].PayeeID}
    for clean in (rows[0].PayeeID, rows[1].PayeeID):
        assert clean not in flagged


def test_cli_scenario_invalid_extension_rejected(spark, tmp_path, capsys):
    rc = main([
        "scenario", "--work-dir", str(tmp_path), "--rows", "8",
        "--extension", "txt",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "FILE REJECTED" in out
    assert "invalid file extension" in out


def test_cli_scenario_mirrors_reference_contract(spark, tmp_path, capsys):
    # The reference's tests spawn the pipeline CLI with --invalid-values
    # and assert exit 0 + "Row counts MATCH" in stdout
    # (tests/test_recordoperation_invalid_z.py:49-76). Same contract here.
    rc = main([
        "scenario", "--work-dir", str(tmp_path), "--rows", "12",
        "--invalid-values", "RecordOperation:3=Z",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Row counts MATCH" in out


# ---------------------------------------------------------------------------
# Flag-family parity sweep over the reference pipeline CLI
# (DM_bankfile_validate_pipeline.py:3516-3767): one parametrized case
# per LIVE mutation flag family, asserting the validator catches (or
# deliberately tolerates) each. Two declared reference flags are dead
# code there and intentionally absent here: --invalid-mfr-ein-ssn
# forwards a flag newaugsver_clean.py's argparse does not accept
# (PIPE:3075-3091 vs GEN:596-606, subprocess would exit 2), and
# --min-max-all-columns is parsed (PIPE:3542) but never dispatched.
# The live TIN-type family (--invalid-tin-type Q, PIPE:3670-3680) is
# sugar for invalid-values on OrganizationTINType, exercised as such.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def base_bank(tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_sweep") / "bank"
    assert main([
        "generate", "--rows", "12", "--seed", "246", "--output", str(out),
    ]) == 0
    return f"{out}.parquet"


def _run_case(tmp_path, base, mutate_flags, name):
    mutated = tmp_path / f"mtfdm_dev2_dmbankdata_{name}.parquet"
    assert main(["mutate", base, "--output", str(mutated), *mutate_flags]) == 0
    rc = main([
        "validate", str(mutated), "--error-dir", str(tmp_path / "err"),
    ])
    csvs = list((tmp_path / "err").glob("*.csv"))
    body = csvs[0].read_text() if csvs else ""
    return rc, body


@pytest.mark.parametrize(
    "name,flags,expect_rc,expect_in_errors",
    [
        # --missing-column: structural rejection (R24).
        ("missing_one", ["--drop-columns", "ContactEmail"], 1, None),
        # --missing-columns (plural form).
        ("missing_many",
         ["--drop-columns", "ContactEmail", "ContactFax", "State"], 1, None),
        # --rename-column: old name missing + new name extra -> reject.
        ("rename_one", ["--rename-columns", "PayeeID:PayeeIdentifier"],
         1, None),
        # --rename-columns (plural form).
        ("rename_many", ["--rename-columns", "State:St", "City:Town"],
         1, None),
        # --invalid-values Col:Val (whole column).
        ("invalid_column", ["--invalid-values", "RoutingTransitNumber:BAD99"],
         0, "RoutingTransitNumber"),
        # --invalid-values Col:row=Val (single cell).
        ("invalid_cell", ["--invalid-values", "RecordOperation:3=Z"],
         0, "RecordOperation"),
        # --invalid-tin-type Q == invalid-values OrganizationTINType:Q.
        # (the evidence string's casing is the reference's verbatim
        # "OrganizationTinType", not the column name's)
        ("invalid_tin_type", ["--invalid-values", "OrganizationTINType:Q"],
         0, "Invalid OrganizationTinType"),
        # --extra-columns: reported detail, never a rejection.
        ("extra_columns", ["--extra-columns", "Bonus1", "Bonus2"], 0, None),
    ],
)
def test_cli_flag_family_sweep(spark, tmp_path, base_bank, name, flags,
                               expect_rc, expect_in_errors):
    rc, errors = _run_case(tmp_path, base_bank, flags, name)
    assert rc == expect_rc
    if expect_in_errors is not None:
        assert expect_in_errors in errors, errors


def test_cli_sweep_drop_rows_and_duplicate_row_counts(spark, tmp_path,
                                                      base_bank):
    """--drop-rows removes exactly the named rows (the missing-row
    scenario — a count change, not a rule violation); --duplicate-row
    appends one copy whose PayeeID then trips duplicate detection."""
    from etl_validator_github_spark.operators.mutate import (
        find_duplicate_payees,
    )

    dropped = tmp_path / "dropped.parquet"
    assert main(["mutate", base_bank, "--drop-rows", "0", "3",
                 "--output", str(dropped)]) == 0
    assert spark.read.parquet(str(dropped)).count() == 10

    duped = tmp_path / "duped.parquet"
    assert main(["mutate", base_bank, "--duplicate-row", "2",
                 "--output", str(duped)]) == 0
    df = spark.read.parquet(str(duped))
    assert df.count() == 13
    assert find_duplicate_payees(df).count() == 1


def test_cli_sweep_duplicate_payee_id(spark, tmp_path, base_bank):
    """--duplicate-payee (reference --duplicate-payee-id): two distinct
    rows end up sharing a PayeeID; detection is the R23 query side, not
    a row-local rule, so validation itself must still pass."""
    from etl_validator_github_spark.operators.mutate import (
        find_duplicate_payees,
    )

    duped = tmp_path / "payee_dup.parquet"
    assert main(["mutate", base_bank, "--duplicate-payee",
                 "--output", str(duped)]) == 0
    df = spark.read.parquet(str(duped))
    assert df.count() == 12                      # same row count
    assert find_duplicate_payees(df).count() == 1


def test_cli_generate_formats_family(spark, tmp_path):
    """--formats csv,parquet,json,xlsx in one run (GEN:599): every
    sidecar lands, mirroring the reference's multi-format output."""
    out = tmp_path / "multi"
    assert main([
        "generate", "--rows", "6", "--output", str(out),
        "--formats", "parquet,csv,json,xlsx",
    ]) == 0
    assert spark.read.parquet(f"{out}.parquet").count() == 6
    assert spark.read.option("header", True).csv(f"{out}.csv").count() == 6
    assert spark.read.json(f"{out}.json").count() == 6
    import os

    assert os.path.getsize(f"{out}.xlsx") > 0


def test_cli_dedup_exact_and_fuzzy(spark, tmp_path, capsys):
    """The dedup subcommand: exact mode drops a content-identical copy;
    --write-docs emits the surviving documents; fuzzy mode runs the
    full LSH pass."""
    src = tmp_path / "docs.parquet"
    text = " ".join(f"w{i}" for i in range(25))
    other = "entirely different document body with its own words here"
    spark.createDataFrame(
        [(0, text, "en"), (1, text, "en"), (2, other, "en")],
        "doc_id: long, text: string, lang: string",
    ).write.parquet(str(src))

    keep_out = tmp_path / "keep.parquet"
    assert main(["dedup", str(src), "--output", str(keep_out)]) == 0
    keep = {r.doc_id: (r.cluster_id, r.keep)
            for r in spark.read.parquet(str(keep_out)).collect()}
    assert keep == {0: (0, 1), 1: (0, 0), 2: (2, 1)}
    assert "3 docs -> 2 kept (1 dropped)" in capsys.readouterr().out

    docs_out = tmp_path / "clean.parquet"
    assert main(["dedup", str(src), "--output", str(docs_out),
                 "--mode", "fuzzy", "--write-docs"]) == 0
    survivors = sorted(
        r.doc_id for r in spark.read.parquet(str(docs_out)).collect()
    )
    assert survivors == [0, 2]


def test_cli_dedup_semantic_mode(spark, tmp_path, capsys):
    """Semantic mode over an embeddings parquet: the exact-copy vector
    drops to the lowest id in its cell; --write-docs keeps survivors."""
    src = tmp_path / "vecs.parquet"
    spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0], 0),
            (1, [1.0, 0.0, 0.0, 0.0], 0),     # exact dup -> dropped
            (2, [0.0, 1.0, 0.0, 0.0], 1),
        ],
        "vec_id: long, embedding: array<float>, label: int",
    ).write.parquet(str(src))

    keep_out = tmp_path / "vkeep.parquet"
    assert main(["dedup", str(src), "--mode", "semantic",
                 "--output", str(keep_out)]) == 0
    keep = {r.vec_id: r.keep
            for r in spark.read.parquet(str(keep_out)).collect()}
    assert keep == {0: 1, 1: 0, 2: 1}
    assert "3 vectors -> 2 kept (1 dropped)" in capsys.readouterr().out

    docs_out = tmp_path / "vdocs.parquet"
    assert main(["dedup", str(src), "--mode", "semantic", "--write-docs",
                 "--output", str(docs_out)]) == 0
    assert sorted(
        r.vec_id for r in spark.read.parquet(str(docs_out)).collect()
    ) == [0, 2]


def test_cli_dedup_semantic_incremental(spark, tmp_path, capsys):
    """--mode semantic --corpus: delta vectors flagged against the base
    corpus's cells; --write-docs is refused (output is flags)."""
    import pytest

    base = tmp_path / "vbase.parquet"
    delta = tmp_path / "vdelta.parquet"
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0], 0), (1, [0.0, 1.0, 0.0, 0.0], 1)],
        "vec_id: long, embedding: array<float>, label: int",
    ).write.parquet(str(base))
    spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 0.0, 1.0, 0.0])],
        "vec_id: long, embedding: array<float>",
    ).write.parquet(str(delta))

    out = tmp_path / "vflags.parquet"
    assert main(["dedup", str(delta), "--mode", "semantic",
                 "--corpus", str(base), "--output", str(out)]) == 0
    flags = {r.vec_id: r.is_semantic_dup
             for r in spark.read.parquet(str(out)).collect()}
    assert flags == {100: 1, 101: 0}
    assert "2 batch vectors, 1 flagged" in capsys.readouterr().out

    with pytest.raises(SystemExit, match="not supported"):
        main(["dedup", str(delta), "--mode", "semantic",
              "--corpus", str(base), "--write-docs",
              "--output", str(tmp_path / "x.parquet")])


def test_cli_curate_ops(spark, tmp_path, capsys):
    """curate subcommand: each op writes its report, --write-docs the
    survivors, and a wrong-schema input fails with a clear message."""
    import pytest

    src = tmp_path / "cdocs.parquet"
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(30)), "en", f"src{i % 3}")
            for i in range(30)]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string"
    ).write.parquet(str(src))

    cap_rep = tmp_path / "cap.parquet"
    assert main(["curate", str(src), "--op", "domain-cap",
                 "--output", str(cap_rep)]) == 0
    rep = spark.read.parquet(str(cap_rep))
    assert set(rep.columns) == {"doc_id", "source", "cap_bucket", "cap_keep"}
    assert "under the domain cap" in capsys.readouterr().out

    rs_out = tmp_path / "rs_docs.parquet"
    assert main(["curate", str(src), "--op", "resample", "--write-docs",
                 "--output", str(rs_out)]) == 0
    survivors = spark.read.parquet(str(rs_out))
    assert 0 < survivors.count() <= 30
    assert set(survivors.columns) == {"doc_id", "text", "lang", "source"}

    tb_rep = tmp_path / "tb.parquet"
    assert main(["curate", str(src), "--op", "token-budget",
                 "--output", str(tb_rep)]) == 0
    assert spark.read.parquet(str(tb_rep)).count() > 0

    bad = tmp_path / "bad.parquet"
    spark.createDataFrame([(1, "x")], "a: long, b: string") \
        .write.parquet(str(bad))
    with pytest.raises(SystemExit, match="missing doc_id, text"):
        main(["curate", str(bad), "--op", "resample",
              "--output", str(tmp_path / "nope.parquet")])


def test_cli_dedup_spans_mode(spark, tmp_path, capsys):
    """--mode spans: the per-doc span report, and with --write-docs the
    rewritten corpus with duplicated spans stripped in place."""
    import pytest

    src = tmp_path / "sdocs.parquet"
    shared = " ".join(f"w{i}" for i in range(20))          # one k=20 span
    uniq = " ".join(f"u{i}" for i in range(10))
    spark.createDataFrame(
        [(0, f"{shared} {uniq}", "en"), (1, f"{uniq.upper()} {shared}", "en"),
         (2, "totally unshared words only", "en")],
        "doc_id: long, text: string, lang: string",
    ).write.parquet(str(src))

    rep = tmp_path / "spanrep.parquet"
    assert main(["dedup", str(src), "--mode", "spans",
                 "--output", str(rep)]) == 0
    report = {r.doc_id: r for r in spark.read.parquet(str(rep)).collect()}
    assert report[0].n_dup_windows > 0 and report[2].n_dup_windows == 0
    assert "2 with duplicated spans" in capsys.readouterr().out

    out = tmp_path / "stripped.parquet"
    assert main(["dedup", str(src), "--mode", "spans", "--write-docs",
                 "--output", str(out)]) == 0
    texts = {r.doc_id: r.text for r in spark.read.parquet(str(out)).collect()}
    # The shared 20-token span is gone; the unique remainder survives.
    assert "w0" not in texts[0] and texts[0].startswith("u0 ")
    assert texts[2] == "totally unshared words only"
    assert "3 docs rewritten" in capsys.readouterr().out

    with pytest.raises(SystemExit, match="not supported with --mode spans"):
        main(["dedup", str(src), "--mode", "spans", "--corpus", str(src),
              "--output", str(tmp_path / "x.parquet")])


def test_cli_dedup_semantic_rejects_wrong_schema(spark, tmp_path):
    """A documents parquet (no vec_id/embedding/label) must fail with a
    clear SystemExit naming the missing columns, not a raw Spark
    AnalysisException (ADVICE r6)."""
    import pytest

    docs = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(0, "some text", "en")], "doc_id: long, text: string, lang: string"
    ).write.parquet(str(docs))

    with pytest.raises(SystemExit, match="missing embedding, label, vec_id"):
        main(["dedup", str(docs), "--mode", "semantic",
              "--output", str(tmp_path / "o1.parquet")])

    # Label-less embeddings are fine WITH --corpus (cells come from the
    # base) but the base itself must carry labels.
    nolabel = tmp_path / "nolabel.parquet"
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "vec_id: long, embedding: array<float>"
    ).write.parquet(str(nolabel))
    with pytest.raises(SystemExit, match="missing label"):
        main(["dedup", str(nolabel), "--mode", "semantic",
              "--output", str(tmp_path / "o2.parquet")])
    with pytest.raises(SystemExit, match="--corpus must be an embeddings"):
        main(["dedup", str(nolabel), "--mode", "semantic",
              "--corpus", str(nolabel),
              "--output", str(tmp_path / "o3.parquet")])


def test_cli_dedup_incremental_mode(spark, tmp_path, capsys):
    """Incremental mode: batch docs probe the corpus index; an exact
    re-send and a fresh doc are flagged correctly."""
    text = " ".join(f"w{i}" for i in range(25))
    novel = " ".join(f"n{i}" for i in range(25))
    corpus = tmp_path / "corpus.parquet"
    batch = tmp_path / "batch.parquet"
    spark.createDataFrame(
        [(0, text, "en")], "doc_id: long, text: string, lang: string"
    ).write.parquet(str(corpus))
    spark.createDataFrame(
        [(10, text, "en"), (11, novel, "en")],
        "doc_id: long, text: string, lang: string",
    ).write.parquet(str(batch))

    out = tmp_path / "flags.parquet"
    assert main(["dedup", str(batch), "--mode", "incremental",
                 "--corpus", str(corpus), "--output", str(out)]) == 0
    flags = {r.doc_id: (r.is_exact_dup, r.n_corpus_band_hits)
             for r in spark.read.parquet(str(out)).collect()}
    assert flags[10][0] == 1 and flags[10][1] > 0
    assert flags[11] == (0, 0)
    assert "2 batch docs, 1 flagged" in capsys.readouterr().out


def test_cli_sketch_report_and_register_log(spark, tmp_path, capsys):
    """Sketch CLI: the report mode prints est+true per group; register
    mode appends a mergeable log whose estimate is idempotent across
    re-runs of the same input (register merge is max)."""
    inp = tmp_path / "ev.parquet"
    spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", i % 37) for i in range(200)],
        "event_id: long, grp_col: string, user: long",
    ).write.parquet(str(inp))

    assert main(["sketch", str(inp), "--group-by", "grp_col",
                 "--key", "user"]) == 0
    out1 = capsys.readouterr().out
    assert "true=37" in out1

    regs = tmp_path / "reglog"
    assert main(["sketch", str(inp), "--group-by", "grp_col",
                 "--key", "user", "--registers", str(regs)]) == 0
    first = capsys.readouterr().out
    assert main(["sketch", str(inp), "--group-by", "grp_col",
                 "--key", "user", "--registers", str(regs)]) == 0
    second = capsys.readouterr().out
    assert first == second  # re-run over the log changes nothing

    import pytest as _pytest
    with _pytest.raises(SystemExit, match="missing column"):
        main(["sketch", str(inp), "--group-by", "nope", "--key", "user"])


def test_cli_dedup_bloom_mode(spark, tmp_path, capsys):
    """--mode bloom: flag report against a --corpus-built filter, the
    clean-docs gate with --write-docs, and the explicit schema guards."""
    held = tmp_path / "held.parquet"
    src = tmp_path / "bdocs.parquet"
    suite = " ".join(f"q{i}" for i in range(20))
    spark.createDataFrame(
        [(0, suite, "en")], "doc_id: long, text: string, lang: string",
    ).write.parquet(str(held))
    quoting = " ".join(f"q{i}" for i in range(8)) + " plus extra tail words"
    novel = " ".join(f"n{i}" for i in range(15))
    spark.createDataFrame(
        [(10, quoting, "en"), (11, novel, "en")],
        "doc_id: long, text: string, lang: string",
    ).write.parquet(str(src))

    rep = tmp_path / "bloomrep.parquet"
    assert main(["dedup", str(src), "--mode", "bloom",
                 "--corpus", str(held), "--output", str(rep)]) == 0
    flags = {r.doc_id: r.flagged for r in
             spark.read.parquet(str(rep)).collect()}
    assert flags == {10: 1, 11: 0}
    assert "1 flagged" in capsys.readouterr().out

    out = tmp_path / "bloomclean.parquet"
    assert main(["dedup", str(src), "--mode", "bloom", "--write-docs",
                 "--corpus", str(held), "--output", str(out)]) == 0
    kept = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert kept == {11}

    with pytest.raises(SystemExit, match="--corpus"):
        main(["dedup", str(src), "--mode", "bloom", "--output", str(rep)])
    bad = tmp_path / "bademb.parquet"
    spark.createDataFrame([(1, [0.1])], "vec_id: long, embedding: array<float>"
                          ).write.parquet(str(bad))
    with pytest.raises(SystemExit, match="missing"):
        main(["dedup", str(bad), "--mode", "bloom",
              "--corpus", str(held), "--output", str(rep)])


def test_cli_media_reports(spark, tmp_path, capsys):
    """media: decode-backed image and audio reports over documents."""
    src = tmp_path / "mdocs.parquet"
    spark.createDataFrame(
        [(i, f"doc text number {i} with a few words", "en")
         for i in range(4)],
        "doc_id: long, text: string, lang: string",
    ).write.parquet(str(src))

    feats = tmp_path / "imfeats.parquet"
    assert main(["media", str(src), "--kind", "image",
                 "--output", str(feats)]) == 0
    assert "4 images" in capsys.readouterr().out
    assert spark.read.parquet(str(feats)).count() == 4

    assert main(["media", str(src), "--kind", "audio"]) == 0
    out = capsys.readouterr().out
    assert "4 clips" in out and "samples" in out

    bad = tmp_path / "nontext.parquet"
    spark.createDataFrame([(1,)], "x: long").write.parquet(str(bad))
    with pytest.raises(SystemExit, match="missing"):
        main(["media", str(bad)])


def test_cli_curate_sample_k(spark, tmp_path, capsys):
    """--op sample-k: exactly k docs per stratum in the report, the
    sampled docs themselves with --write-docs."""
    src = tmp_path / "skdocs.parquet"
    spark.createDataFrame(
        [(i, f"text number {i}", "en", "web") for i in range(9)]
        + [(100, "lone doc", "fr", "web")],
        "doc_id: long, text: string, lang: string, source: string",
    ).write.parquet(str(src))

    rep = tmp_path / "skrep.parquet"
    assert main(["curate", str(src), "--op", "sample-k", "--k", "2",
                 "--output", str(rep)]) == 0
    got = spark.read.parquet(str(rep)).collect()
    per = {}
    for r in got:
        per.setdefault((r.lang, r.source), []).append(r.doc_id)
    assert len(per[("en", "web")]) == 2 and per[("fr", "web")] == [100]
    assert "3 sampled" in capsys.readouterr().out

    out = tmp_path / "skdocs_out.parquet"
    assert main(["curate", str(src), "--op", "sample-k", "--k", "2",
                 "--write-docs", "--output", str(out)]) == 0
    assert spark.read.parquet(str(out)).count() == 3


def test_cli_expect_gate_passes_and_fails(spark, tmp_path, capsys):
    """`expect` subcommand: green gate exits 0; a violated check exits
    1 and prints FAIL with exact counts; ppm tolerance waves it back
    through."""
    from etl_validator_github_spark.cli import main

    path = str(tmp_path / "t.parquet")
    spark.range(100).selectExpr(
        "id", "case when id = 7 then null else 'A' end as s"
    ).write.parquet(path)

    assert main(["expect", path, "--check", "not_null:id",
                 "--check", "unique:id"]) == 0

    rc = main(["expect", path, "--check", "not_null:s",
               "--check", "in_set:s:A|B"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL not_null(s)" in out and "violations=1" in out

    # 1/100 nulls = 10000 ppm → tolerated at 10000.
    assert main(["expect", path, "--check", "not_null:s",
                 "--max-violation-ppm", "10000"]) == 0


def test_cli_expect_empty_input_fails_cleanly(spark, tmp_path, capsys):
    """An empty table cannot pass a data-quality gate: exit 1 with an
    explicit message, not a TypeError on a NULL ppm (ADVICE r8) nor an
    ANSI DIVIDE_BY_ZERO from inside run_expectations."""
    from etl_validator_github_spark.cli import main

    path = str(tmp_path / "empty.parquet")
    spark.range(0).selectExpr("id").write.parquet(path)

    rc = main(["expect", path, "--check", "not_null:id",
               "--check", "unique:id"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "empty input" in out and "0 rows" in out


def test_cli_expect_standalone_subprocess_golden(tmp_path):
    """Golden-output drive of the user-facing entry as a REAL
    subprocess (no pre-existing SparkSession): pins both the output
    format and the start-session-before-parsing-checks ordering —
    building a Column before any SparkContext exists asserts deep in
    pyspark."""
    import re
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "-m", "etl_validator_github_spark", "expect",
         "/root/testdata/sf0.001/orders.parquet",
         "--check", "not_null:o_orderkey",
         "--check", "unique:o_orderkey",
         "--check", "in_set:o_orderstatus:O|F|P"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    got = sorted(
        re.sub(r"rows=\d+", "rows=N", line.strip())
        for line in res.stdout.splitlines() if line.startswith("OK")
    )
    assert got == [
        "OK   in_set(o_orderstatus)                    rows=N "
        "violations=0 ppm=0",
        "OK   not_null(o_orderkey)                     rows=N "
        "violations=0 ppm=0",
        "OK   unique(o_orderkey)                       rows=N "
        "violations=0 ppm=0",
    ]


def test_cli_sql_runs_over_testdata_views(tmp_path, capsys):
    """`sql` subcommand: registers <table>.parquet views under --dir
    and prints spark.sql results (the run_sql_test.py stand-in)."""
    import os

    from etl_validator_github_spark.cli import main

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    rc = main(["sql",
               "SELECT o_orderstatus, count(*) n FROM orders "
               "GROUP BY 1 ORDER BY 1",
               "--dir", sf])
    out = capsys.readouterr().out
    assert rc == 0
    assert "o_orderstatus" in out and "|F" in out.replace(" ", "")


def test_cli_retrieve_ranks_documents(spark, tmp_path, capsys):
    """`retrieve` subcommand: ad-hoc BM25 lists over a documents
    parquet; the doc containing the query terms ranks first."""
    from etl_validator_github_spark.cli import main

    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "alpha alpha zzz qqq"),
         (2, "unrelated words only here")],
        "doc_id long, text string",
    ).write.parquet(path)
    rc = main(["retrieve", path, "--query", "alpha zzz", "-k", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "query 1: 'alpha zzz'" in out
    assert "#1: doc 1" in out   # doc 1 matches both terms


def test_cli_classify_prints_and_writes(spark, tmp_path, capsys):
    """`classify` subcommand: confusion + calibration rollups print,
    and --output writes one score row per doc."""
    from etl_validator_github_spark.cli import main

    path = str(tmp_path / "docs.parquet")
    content = " ".join(f"w{i}" for i in range(30))
    soup = ("the of and to in a " * 5).strip()
    spark.createDataFrame(
        [(i, content if i % 2 else soup, "en") for i in range(20)],
        "doc_id long, text string, lang string",
    ).write.parquet(path)

    rc = main(["classify", path])
    out = capsys.readouterr().out
    assert rc == 0
    assert "confusion rollup" in out and "calibration" in out

    dst = str(tmp_path / "scores")
    rc = main(["classify", path, "--output", dst])
    assert rc == 0
    scored = spark.read.parquet(dst)
    assert scored.count() == 20
    assert {"doc_id", "label", "score_micro", "prior_micro"} <= \
        set(scored.columns)
