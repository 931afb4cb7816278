"""Whole-catalog non-vacuity guard (the q8 lesson, institutionalized).

``q8_market_share`` sat 0-rows-green for six rounds because the oracle
comparison is trivially satisfied by two empty results — nothing watched
for emptiness. This guard asserts EVERY catalog query returns at least
one row at sf0.01, with an explicit empty-by-design allowlist (currently
empty), so a future fixture or constant change can't silently
re-vacuate a query.

Runs against sf0.01 (the driver's correctness scale) regardless of the
parity suite's SF_DIR, because vacuity is a property of the scale the
driver checks at.
"""

from __future__ import annotations

import pytest

from etl_validator_github_spark.queries import CATALOG

#: Queries allowed to return zero rows at sf0.01. Empty on purpose: any
#: addition needs a comment explaining why empty output is the correct
#: result for that query.
EMPTY_BY_DESIGN: frozenset[str] = frozenset()

NONVACUITY_SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_is_nonvacuous_at_sf001(spark, name):
    if name in EMPTY_BY_DESIGN:
        pytest.skip("empty-by-design")
    df = CATALOG[name].build(spark, NONVACUITY_SF_DIR)
    assert df.limit(1).count() >= 1, (
        f"{name} returned 0 rows at sf0.01 — vacuously green"
    )
