"""CLI surface tests — the reference's muscle memory
(newaugsver_clean.py / DM_bankfile_validate_pipeline.py flags) against
the Spark engine, run in-process against the shared session."""

from __future__ import annotations

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
