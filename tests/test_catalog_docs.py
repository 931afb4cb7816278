"""Documentation-vs-code consistency: the catalog counts claimed in
README.md and SCALE.md must equal ``len(CATALOG)``.

This count rotted twice (r6: 79 vs 102; r7: 118/127 vs 131) because
nothing asserted it; now the docs can't drift without failing CI.
"""

from __future__ import annotations

import os
import re

from etl_validator_github_spark.queries import CATALOG

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(_REPO, name)) as fh:
        return fh.read()


def test_readme_catalog_count_matches():
    text = _read("README.md")
    m = re.search(r"`:\s*(\d+) queries covering", text)
    assert m, "README.md no longer states the catalog count"
    assert int(m.group(1)) == len(CATALOG)
    m2 = re.search(r"all (\d+) with DuckDB oracle SQL", text)
    assert m2 and int(m2.group(1)) == len(CATALOG)


def test_scale_md_catalog_count_matches():
    m = re.search(r"All (\d+) catalog queries hash-match", _read("SCALE.md"))
    assert m, "SCALE.md no longer states the catalog count"
    assert int(m.group(1)) == len(CATALOG)


def test_coverage_md_catalog_count_matches():
    m = re.search(r"\(all (\d+) with DuckDB oracles;", _read("COVERAGE.md"))
    assert m, "COVERAGE.md no longer states the catalog count"
    assert int(m.group(1)) == len(CATALOG)


def test_every_catalog_query_has_an_oracle():
    assert all(q.oracle is not None for q in CATALOG.values())
