"""Property-based cross-check of the conditional rule interactions.

The EFT/CHK/OrgCode cross-field rules (R10-R13, R16, R22) are where the
`applies_when`/`valid` split could silently go wrong. Hypothesis
generates rows across the full interaction space (org × mode × banking
field shapes, including NULLs, blanks, and junk); a pure-Python oracle
reimplements ONLY the predicate logic, and the Spark engine's emitted
error list must match it exactly — messages and catalog order included.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_validator_github_spark.operators.rules import bankdata_rules
from etl_validator_github_spark.operators.validate import with_errors
from etl_validator_github_spark.schema import COLUMNS, R_BLANK_FIELDS, bankdata_schema

FUZZ_RULES = (
    "paymentmode_enum",
    "routingtransitnumber_9_digits",
    "routingtransitnumber_numeric_eft",
    "routingtransitnumber_chk_blank",
    "accountnumber_eft_format",
    "accountnumber_chk_blank",
    "accounttype_eft_enum",
    "accounttype_chk_blank",
    "addresscode_enum",
    "addresscode_dp_paymentmode_pair",
    "orgcode_r_all_blank",
)


def _blank(v) -> bool:
    return v is None or str(v).strip() == ""


def _digits(v, lo, hi) -> bool:
    s = "" if v is None else str(v)
    return lo <= len(s) <= hi and s.isascii() and s.isdigit()


def _py_oracle(row: dict) -> dict[str, tuple[bool, bool]]:
    """rule name -> (applies, valid) mirroring operators/rules.py."""
    org, mode = row["OrganizationCode"], row["PaymentMode"]
    mdp = org in ("M", "D", "P")
    eft, chk = mdp and mode == "EFT", mdp and mode == "CHK"
    rtn, acct = row["RoutingTransitNumber"], row["AccountNumber"]
    atype, ac = row["AccountType"], row["AddressCode"]
    return {
        "paymentmode_enum": (mdp, mode in ("EFT", "CHK")),
        "routingtransitnumber_9_digits": (eft, rtn is not None and len(rtn) == 9),
        "routingtransitnumber_numeric_eft": (eft, _digits(rtn, 9, 9)),
        "routingtransitnumber_chk_blank": (chk, _blank(rtn)),
        "accountnumber_eft_format": (eft, _digits(acct, 2, 17)),
        "accountnumber_chk_blank": (chk, _blank(acct)),
        "accounttype_eft_enum": (eft, atype in ("CHKING", "SAVING")),
        "accounttype_chk_blank": (chk, _blank(atype)),
        "addresscode_enum": (mdp and not _blank(ac), ac in ("PMT", "COR")),
        "addresscode_dp_paymentmode_pair": (
            org in ("D", "P") and not _blank(ac) and mode in ("EFT", "CHK"),
            (mode == "CHK" and ac == "PMT") or (mode == "EFT" and ac == "COR"),
        ),
        "orgcode_r_all_blank": (
            org == "R",
            all(_blank(row[f]) for f in R_BLANK_FIELDS),
        ),
    }


_BASE = {c: "" for c in COLUMNS}
_BASE.update({
    "RecordOperation": "A", "PayeeID": "MFR001",
    "OrganizationIdentifier": "MFR001", "OrganizationName": "Apex",
    "EffectiveStartDate": "2026-03-10", "ContactEmail": "a@b.com",
})

_row_strategy = st.fixed_dictionaries({
    "OrganizationCode": st.sampled_from(["M", "D", "P", "R", "X", ""]),
    "PaymentMode": st.sampled_from(["EFT", "CHK", "", "XYZ", None]),
    "RoutingTransitNumber": st.sampled_from(
        ["", None, "123456789", "54321", "12345678a", "000000000", " "]),
    "AccountNumber": st.sampled_from(
        ["", None, "12", "1", "123456789012345678", "abc", "007"]),
    "AccountType": st.sampled_from(["", None, "CHKING", "SAVING", "checking"]),
    "AddressCode": st.sampled_from(["", None, "PMT", "COR", "COXE", " "]),
})


@pytest.fixture(scope="module")
def fuzz_rules():
    rules = [r for r in bankdata_rules() if r.name in FUZZ_RULES]
    assert len(rules) == len(FUZZ_RULES)
    return rules


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_row_strategy, min_size=40, max_size=80))
def test_conditional_rules_match_python_oracle(spark, fuzz_rules, variants):
    rows = []
    for i, v in enumerate(variants):
        row = dict(_BASE)
        row.update(v)
        row["PayeeID"] = f"MFR{i:03d}"
        rows.append(row)
    df = spark.createDataFrame(
        [tuple(r[c] for c in COLUMNS) for r in rows],
        schema=bankdata_schema(dates_as_strings=True),
    )
    got = {
        r["PayeeID"]: list(r["__errors"])
        for r in with_errors(df, rules=fuzz_rules).collect()
    }
    for row in rows:
        verdicts = _py_oracle(row)
        expected = [
            r.message for r in fuzz_rules
            if verdicts[r.name][0] and not verdicts[r.name][1]
        ]
        assert got[row["PayeeID"]] == expected, (
            f"row {row['PayeeID']}: org={row['OrganizationCode']!r} "
            f"mode={row['PaymentMode']!r} rtn={row['RoutingTransitNumber']!r} "
            f"acct={row['AccountNumber']!r} atype={row['AccountType']!r} "
            f"ac={row['AddressCode']!r}"
        )
