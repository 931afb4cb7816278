"""Canonical bank-data schema and field constraints.

Derived from the reference generator's ``field_constraints`` dict
(newaugsver_clean.py:41-72) and the verified parquet schema of preserved
evidence files (28 x string + 2 x date32). See SURVEY.md §1.1.
"""

from __future__ import annotations

from pyspark.sql.types import DateType, StringType, StructField, StructType

# Ordered canonical column list (generation order, GEN:440-471).
DATE_COLUMNS = ("EffectiveStartDate", "EffectiveEndDate")

COLUMNS = (
    "RecordOperation",
    "OrganizationCode",
    "PayeeID",
    "OrganizationIdentifier",
    "OrganizationName",
    "OrganizationLegalName",
    "OrganizationTIN",
    "OrganizationTINType",
    "ProfitNonprofit",
    "OrganizationNPI",
    "PaymentMode",
    "RoutingTransitNumber",
    "AccountNumber",
    "AccountType",
    "EffectiveStartDate",
    "EffectiveEndDate",
    "AddressCode",
    "AddressLine1",
    "AddressLine2",
    "CityName",
    "State",
    "PostalCode",
    "ContactCode",
    "ContactFirstName",
    "ContactLastName",
    "ContactTitle",
    "ContactPhone",
    "ContactFax",
    "ContactOtherPhone",
    "ContactEmail",
)

#: min/max string-length constraints (reference GEN:41-72). The PIPE-side
#: min/max table (PIPE:3350-3378) conflicts in places (AccountNumber 6..12,
#: ContactCode PRIM/SEC); the generator + error evidence win (SURVEY §7.4).
FIELD_CONSTRAINTS: dict[str, tuple[int, int]] = {
    "RecordOperation": (1, 1),
    "OrganizationCode": (1, 1),
    "PayeeID": (2, 9),
    "OrganizationIdentifier": (3, 12),
    "OrganizationName": (1, 40),
    "OrganizationLegalName": (1, 40),
    "OrganizationTIN": (9, 9),
    "OrganizationTINType": (3, 3),
    "ProfitNonprofit": (1, 2),
    "OrganizationNPI": (10, 10),
    "PaymentMode": (3, 3),
    "RoutingTransitNumber": (9, 9),
    "AccountNumber": (1, 17),
    "AccountType": (6, 6),
    "EffectiveStartDate": (10, 10),
    "EffectiveEndDate": (10, 10),
    "AddressCode": (1, 10),
    "AddressLine1": (1, 40),
    "AddressLine2": (1, 40),
    "CityName": (1, 25),
    "State": (2, 2),
    "PostalCode": (5, 10),
    "ContactCode": (1, 2),
    "ContactFirstName": (1, 20),
    "ContactLastName": (1, 25),
    "ContactTitle": (1, 23),
    "ContactPhone": (1, 25),
    "ContactFax": (1, 25),
    "ContactOtherPhone": (1, 25),
    "ContactEmail": (1, 99),
}

#: Fields where blank ('' or NULL) is always permitted regardless of
#: min_length (GEN:210-213 special handling).
BLANKABLE = frozenset(
    {
        "RoutingTransitNumber",
        "AccountNumber",
        "AccountType",
        "OrganizationTIN",
        "EffectiveEndDate",
        "OrganizationTINType",
        "ProfitNonprofit",
        "OrganizationNPI",
        "AddressCode",
        "AddressLine2",
        "ContactTitle",
        "ContactFax",
        "ContactOtherPhone",
    }
)

#: Banking + address + contact fields that MUST be completely blank for
#: OrganizationCode 'R' rows (GEN:348-360, PIPE:3477-3487, evidence string
#: "For OrgCode R, all banking/address fields must be completely blank").
R_BLANK_FIELDS = (
    "OrganizationTIN",
    "OrganizationTINType",
    "ProfitNonprofit",
    "OrganizationNPI",
    "RoutingTransitNumber",
    "AccountNumber",
    "AccountType",
    "AddressCode",
    "AddressLine1",
    "AddressLine2",
    "CityName",
    "State",
    "PostalCode",
    "ContactFirstName",
    "ContactLastName",
)

#: Identity columns preserved on R rows (PIPE:3477-3487
#: clear_unnecessary_columns keeps these five).
R_KEEP_FIELDS = (
    "RecordOperation",
    "OrganizationCode",
    "PayeeID",
    "OrganizationIdentifier",
    "OrganizationName",
)


def bankdata_schema(dates_as_strings: bool = False) -> StructType:
    """StructType for the bank-data table: 28 string + 2 date columns.

    ``dates_as_strings=True`` mirrors the flat csv/json representation where
    dates travel as 'YYYY-MM-DD' strings (GEN:489-492 coerces at write time).
    """
    fields = []
    for name in COLUMNS:
        if name in DATE_COLUMNS and not dates_as_strings:
            fields.append(StructField(name, DateType(), nullable=True))
        else:
            fields.append(StructField(name, StringType(), nullable=True))
    return StructType(fields)


def schema_diff(actual_columns: list[str]) -> dict[str, list[str]]:
    """File-level schema validation (rule R24): missing / extra columns.

    The reference exercises missing (PIPE:2279-2328), renamed
    (PIPE:2330-2408) and extra (PIPE:3289-3323) columns as first-class
    violation scenarios; a rename surfaces as one missing + one extra.
    """
    canonical = set(COLUMNS)
    actual = set(actual_columns)
    return {
        "missing": sorted(canonical - actual),
        "extra": sorted(actual - canonical),
    }
