"""1:1 replication of the reference's E2E scenario tests.

One parametrized case per reference test file (``/root/reference/tests/
test_*.py``). Each reference scenario is pure data — a list of
``--invalid-values`` specs (``Col:Val`` overwrites the whole column,
``Col:rowIdx=Val`` one cell) plus a row count — run through the full
pipeline lifecycle (generate → inject → ready → validate → error CSV →
archive → reconcile, pipeline.run_scenario). The reference's own pass
criterion is ``"Row counts MATCH"`` (tests/test_recordoperation_invalid_z
.py:73-76); this suite asserts that AND two strictly stronger properties:

1. **Independent per-row oracle**: the post-injection table (read back
   from the archive) is re-validated by the hand-translated DuckDB rule
   mirror (queries/bankdata_oracle._rule_mirrors) and the per-payee error
   token sets must EXACTLY equal what the Spark engine wrote to the error
   CSV — full value-level parity with a second engine, per scenario.
2. **Expected ERROR_DESC**: hand-derived expectations per scenario —
   which messages must appear, which targeted rows must carry which
   messages, whether every row must fail, or whether the scenario is a
   documented no-error case (soft rules).

Tokenization matches the reference comparator: ERROR_DESC split on ',',
whitespace-normalized, compared as unordered sets (PIPE:817-830).
"""

from __future__ import annotations

import csv
import os
import re
from dataclasses import dataclass, field

import pytest

from etl_validator_github_spark.cli import _parse_invalid_values
from etl_validator_github_spark.operators import rules as R
from etl_validator_github_spark.pipeline import run_scenario
from etl_validator_github_spark.queries.bankdata_oracle import (
    _rule_mirrors,
    _sq,
    _violation,
)

SEED = 246

# -- catalog messages (single source: operators/rules.py) -------------------
REC_ENUM = "RecordOperation must be one of A, C or D"
ORG_ENUM = "OrganizationCode must be one of M, D, P or R"
PAYEE_FMT = "PayeeID must be alphanumeric with a valid organization prefix"
ORGID_FMT = "OrganizationIdentifier must be 3 to 12 alphanumeric characters"
ORGNAME_FMT = "OrganizationName must be at most 40 characters without special characters"
ORGLEGAL_FMT = (
    "OrganizationLegalName must be at most 40 characters without special characters"
)
TIN_REQ = "OrganizationTIN is required for D and P records"
TIN_FMT = "OrganizationTIN must be 9 numeric digits"
TINTYPE_LEN = R.MSG_TINTYPE_LENGTH
TINTYPE_INV = R.MSG_TINTYPE_INVALID
PNP_ENUM = "ProfitNonprofit must be P or NP"
PNP_REQ = "ProfitNonprofit is required for D and P records"
NPI_FMT = "OrganizationNPI must be 10 numeric digits starting with a non-zero digit"
PM_ENUM = "PaymentMode must be EFT or CHK"
RTN9 = R.MSG_RTN_9_DIGITS
RTN_NUM = R.MSG_RTN_NUMERIC_EFT
RTN_CHK = R.MSG_CHK_RTN_BLANK
ACCT_EFT = "AccountNumber must be 2 to 17 numeric digits for EFT records"
ACCT_CHK = "For PaymentMode CHK, AccountNumber must be blank"
AT_EFT = "AccountType must be CHKING or SAVING for EFT records"
AT_CHK = "For PaymentMode CHK, AccountType must be blank"
ESD_REQ = "EffectiveStartDate is required"
ESD_FMT = "EffectiveStartDate must be a valid date in YYYY-MM-DD format"
EED_FMT = "EffectiveEndDate must be a valid date in YYYY-MM-DD format"
AC_ENUM = "AddressCode must be PMT or COR"
AC_PAIR = "AddressCode must be PMT for CHK and COR for EFT on D and P records"
STATE_FMT = "State must be exactly 2 characters"
POSTAL_FMT = "PostalCode must be 5 to 10 alphanumeric characters"
CITY_FMT = "CityName must be at most 25 characters without special characters"
CFN_REQ = "ContactFirstName is required for D and P records"
CLN_REQ = "ContactLastName is required for D and P records"
CFN_FMT = "ContactFirstName must be at most 20 characters without digits or special characters"
CLN_FMT = "ContactLastName must be at most 25 characters without digits or special characters"
CC_FMT = "ContactCode must be at most 2 characters"
CT_FMT = "ContactTitle must be at most 23 characters"
EMAIL_LEN = "ContactEmail must be at most 99 characters"
R22 = R.MSG_R_ALL_BLANK


def CHARSET(col: str) -> str:
    return f"{col} must not contain special characters"


def PHONE_FMT(col: str) -> str:
    return f"{col} must be at most 25 characters with digits and separators only"


_LONG_EMAIL = (
    "verylongemailaddressthatexceedsmaximumlengthvalidationthresholdof"
    "100charactersexactly12345@example.com"
)


@dataclass(frozen=True)
class Scenario:
    """One reference scenario test, as data.

    ``ref``   reference test file this replicates (parity evidence).
    ``specs`` the verbatim --invalid-values arguments from that file.
    ``must``  list of alternative-groups; ≥1 member of each group must
              appear in the error output (raw ERROR_DESC substring).
    ``cells`` targeted-row expectations: row idx -> messages whose tokens
              must all appear on that row's payee.
    ``cells_any`` row idx -> alternatives; ≥1 must appear on the payee
              (for rules conditional on that row's generated context).
    ``all_fail`` every input row must produce an error record.
    ``zero``  documented no-error scenario (soft rules): 0 error records.
    """

    ref: str
    specs: tuple[str, ...]
    rows: int = 10
    must: tuple[tuple[str, ...], ...] = ()
    cells: dict = field(default_factory=dict)
    cells_any: dict = field(default_factory=dict)
    all_fail: bool = False
    zero: bool = False


def g(*msgs: str) -> tuple[str, ...]:
    """One must-group (alternatives)."""
    return tuple(msgs)


SCENARIOS: list[Scenario] = [
    Scenario(
        "test_accountnumber_blank_eft_required.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "AccountNumber:"),
        must=(g(ACCT_EFT),), all_fail=True,
    ),
    Scenario(
        "test_accountnumber_chk_should_be_blank.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:CHK", "AccountNumber:123456789"),
        must=(g(ACCT_CHK),), all_fail=True,
    ),
    Scenario(
        "test_accountnumber_invalid_single_digit.py",
        ("AccountNumber:8",),
        must=(g(ACCT_EFT, ACCT_CHK, R22),), all_fail=True,
    ),
    Scenario(
        "test_accountnumber_invalid_single_digit_eft_required.py",
        ("OrganizationCode:P", "OrganizationCode:0=M", "OrganizationCode:1=M",
         "PaymentMode:EFT", "AccountType:CHKING",
         "RoutingTransitNumber:123456789", "AccountNumber:8"),
        must=(g(ACCT_EFT),), all_fail=True,
    ),
    Scenario(
        "test_accountnumber_invalid_special_char.py",
        ("AccountNumber:!!@@$$&&",),
        must=(g(CHARSET("AccountNumber")),), all_fail=True,
    ),
    Scenario(
        "test_accountnumber_over_max_length.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "AccountNumber:123456789012345678"),
        must=(g(ACCT_EFT),), all_fail=True,
    ),
    Scenario(
        "test_accounttype_blank_eft_required.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "AccountType:"),
        must=(g(AT_EFT),), all_fail=True,
    ),
    Scenario(
        "test_accounttype_invalid_lowercase_checking.py",
        ("AccountType:checking",),
        must=(g(AT_EFT, AT_CHK, R22),), all_fail=True,
    ),
    Scenario(
        "test_accounttype_invalid_lowercase_savings.py",
        ("AccountType:savings",),
        must=(g(AT_EFT, AT_CHK, R22),), all_fail=True,
    ),
    Scenario(
        "test_accounttype_invalid_special_char.py",
        ("AccountType:$%$%$%$%",),
        must=(g(AT_EFT, AT_CHK, R22),), all_fail=True,
    ),
    Scenario(
        "test_accounttype_value_rules_eft_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "RoutingTransitNumber:123456789",
         "AccountNumber:123456789", "AccountType:CHKING",
         "AccountType:0=checking", "AccountType:1=savings",
         "AccountType:2=$%$%$%$%"),
        cells={0: [AT_EFT], 1: [AT_EFT], 2: [AT_EFT]},
    ),
    Scenario(
        "test_address_location_formatting_rules_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PostalCode:0=90210#", "PostalCode:1=123", "PostalCode:2=@#$%!!",
         "State:3=STATE", "State:4=C", "AddressCode:5=COXE",
         "AddressCode:6=@#$%!!"),
        cells={0: [POSTAL_FMT], 1: [POSTAL_FMT], 2: [POSTAL_FMT],
               3: [STATE_FMT], 4: [STATE_FMT], 5: [AC_ENUM], 6: [AC_ENUM]},
    ),
    Scenario(
        "test_addresscode_invalid_coxe.py",
        ("AddressCode:COXE",),
        must=(g(AC_ENUM, R22),), all_fail=True,
    ),
    Scenario(
        "test_addresscode_invalid_coxe_chk_required.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:CHK", "AddressCode:COXE"),
        must=(g(AC_ENUM), g(AC_PAIR)), all_fail=True,
    ),
    Scenario(
        "test_addresscode_invalid_special_char.py",
        ("AddressCode:@#$%!!",),
        must=(g(AC_ENUM, R22),), all_fail=True,
    ),
    Scenario(
        "test_addresscode_paymentmode_rules_dp_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:CHK", "AddressCode:PMT", "AddressCode:0=COR",
         "PaymentMode:1=EFT", "AddressCode:1=PMT"),
        cells={0: [AC_PAIR], 1: [AC_PAIR]},
    ),
    Scenario(
        "test_banking_extras_format_validation_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "RoutingTransitNumber:0=54321",
         "AccountNumber:1=8"),
        cells={0: [RTN9, RTN_NUM], 1: [ACCT_EFT]},
    ),
    Scenario(
        "test_chk_banking_fields_should_be_blank_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:CHK", "RoutingTransitNumber:0=123456789",
         "AccountNumber:1=123456789", "AccountType:2=CHKING"),
        cells={0: [RTN_CHK], 1: [ACCT_CHK], 2: [AT_CHK]},
    ),
    Scenario(
        "test_chk_combined_special_chars_and_max_length.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:CHK", "RecordOperation:0=$", "OrganizationCode:1=@",
         "PayeeID:2=#$%", "OrganizationIdentifier:3=*&^",
         "OrganizationName:4=Name!", "OrganizationLegalName:5=Legal@",
         "OrganizationTIN:6=12#456789", "OrganizationTINType:7=@#$",
         "ProfitNonprofit:8=%", "OrganizationNPI:9=12@3456789",
         "PaymentMode:10=XYZ", "RoutingTransitNumber:11=12345ABCD",
         "AccountNumber:12=12#456", "AccountType:13=CHECK",
         "AddressCode:16=***",
         "AddressLine1:17=AddressLine1ValueWith#Special",
         "AddressLine2:18=AddressLine2ValueWith@Special",
         "CityName:19=City!", "State:20=C1", "PostalCode:21=12#45",
         "ContactCode:22=CONTACT_CODE_TOO_LONG",
         "ContactFirstName:23=ContactFirstNameExceedingMaximumAllowedLengthValue",
         "ContactLastName:24=ContactLastNameExceedingMaximumAllowedLengthValue",
         "ContactTitle:25=ContactTitleExceedingMaximumAllowedLength",
         "ContactPhone:26=123ABC4567", "ContactFax:27=123ABC4567",
         "ContactOtherPhone:28=123ABC4567",
         f"ContactEmail:29={_LONG_EMAIL}"),
        rows=34,
        cells={
            0: [REC_ENUM, CHARSET("RecordOperation")],
            1: [ORG_ENUM, CHARSET("OrganizationCode")],
            2: [PAYEE_FMT, CHARSET("PayeeID")],
            3: [ORGID_FMT, CHARSET("OrganizationIdentifier")],
            4: [ORGNAME_FMT], 5: [ORGLEGAL_FMT],
            6: [TIN_FMT, CHARSET("OrganizationTIN")],
            7: [TINTYPE_INV, CHARSET("OrganizationTINType")],
            8: [PNP_ENUM, CHARSET("ProfitNonprofit")],
            9: [NPI_FMT, CHARSET("OrganizationNPI")],
            10: [PM_ENUM], 11: [RTN_CHK],
            12: [ACCT_CHK, CHARSET("AccountNumber")], 13: [AT_CHK],
            16: [AC_ENUM],
            # rows 17/18 inject AddressLine1/2 — no AddressLine rule exists
            # in the recovered catalog (no generator constraint, no error
            # evidence), so no expectation; oracle parity still covers them.
            19: [CITY_FMT], 20: [STATE_FMT], 21: [POSTAL_FMT],
            22: [CC_FMT], 23: [CFN_FMT], 24: [CLN_FMT], 25: [CT_FMT],
            26: [PHONE_FMT("ContactPhone")], 27: [PHONE_FMT("ContactFax")],
            28: [PHONE_FMT("ContactOtherPhone")], 29: [EMAIL_LEN],
        },
    ),
    Scenario(
        "test_chk_contact_fields_over_max_length_combined.py",
        ("PaymentMode:CHK", "ContactCode:0=CONTACT_CODE_TOO_LONG",
         "ContactFirstName:1=ContactFirstNameExceedingMaximumAllowedLengthValue",
         "ContactLastName:2=ContactLastNameExceedingMaximumAllowedLengthValue",
         "ContactTitle:3=ContactTitleExceedingMaximumAllowedLength",
         "ContactPhone:4=12345678901234567890",
         "ContactFax:5=12345678901234567890",
         "ContactOtherPhone:6=12345678901234567890",
         f"ContactEmail:7={_LONG_EMAIL}"),
        rows=12,
        # Rows 4-6: a 20-digit phone is within the generator's documented
        # 25-char limit (newaugsver_clean.py column_constraints
        # ContactPhone max_length 25), so no length violation — matching
        # the reference, whose own pipeline also flags nothing there.
        cells={0: [CC_FMT], 1: [CFN_FMT], 2: [CLN_FMT], 3: [CT_FMT],
               7: [EMAIL_LEN]},
    ),
    Scenario(
        "test_chk_core_fields_special_characters_combined.py",
        ("PaymentMode:CHK", "RecordOperation:0=$", "OrganizationCode:1=@",
         "PayeeID:2=#$%", "OrganizationIdentifier:3=*&^",
         "OrganizationName:4=Name!", "OrganizationLegalName:5=Legal@",
         "OrganizationTIN:6=12#456789", "OrganizationTINType:7=@#$",
         "ProfitNonprofit:8=%", "OrganizationNPI:9=12@3456789"),
        rows=12,
        cells={
            0: [REC_ENUM, CHARSET("RecordOperation")],
            1: [ORG_ENUM, CHARSET("OrganizationCode")],
            2: [PAYEE_FMT, CHARSET("PayeeID")],
            3: [ORGID_FMT, CHARSET("OrganizationIdentifier")],
            4: [ORGNAME_FMT], 5: [ORGLEGAL_FMT],
            6: [CHARSET("OrganizationTIN")],
            7: [CHARSET("OrganizationTINType")],
            8: [CHARSET("ProfitNonprofit")],
            9: [NPI_FMT, CHARSET("OrganizationNPI")],
        },
    ),
    Scenario(
        "test_contact_fields_over_max_length_dp_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactFirstName:0=ABCDEFGHIJKLMNOPQRSTU",
         "ContactLastName:1=ABCDEFGHIJKLMNOPQRSTUVWXYZ",
         "ContactTitle:2=VeryLongContactTitleExceedingMaxLength",
         f"ContactEmail:3={_LONG_EMAIL}"),
        cells={0: [CFN_FMT], 1: [CLN_FMT], 2: [CT_FMT], 3: [EMAIL_LEN]},
    ),
    Scenario(
        "test_contact_required_format_rules_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactFirstName:0=", "ContactLastName:1=",
         "ContactFirstName:2=John123", "ContactLastName:3=Smith456",
         "ContactPhone:4=555-123-4567#", "ContactFax:5=555-987-6543@"),
        cells={0: [CFN_REQ], 1: [CLN_REQ], 2: [CFN_FMT], 3: [CLN_FMT],
               4: [PHONE_FMT("ContactPhone")], 5: [PHONE_FMT("ContactFax")]},
    ),
    Scenario(
        "test_contactemail_over_max_length.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         f"ContactEmail:{_LONG_EMAIL}"),
        must=(g(EMAIL_LEN),), all_fail=True,
    ),
    Scenario(
        "test_contactfax_invalid_format.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactFax:555-987-6543@"),
        must=(g(PHONE_FMT("ContactFax")),), all_fail=True,
    ),
    Scenario(
        "test_contactfirstname_blank_dp.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactFirstName:"),
        must=(g(CFN_REQ),), all_fail=True,
    ),
    Scenario(
        "test_contactfirstname_invalid_numeric.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactFirstName:John123"),
        must=(g(CFN_FMT),), all_fail=True,
    ),
    Scenario(
        "test_contactfirstname_over_max_length_dp.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactFirstName:ABCDEFGHIJKLMNOPQRSTU"),
        must=(g(CFN_FMT),), all_fail=True,
    ),
    Scenario(
        "test_contactlastname_blank_dp.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactLastName:"),
        must=(g(CLN_REQ),), all_fail=True,
    ),
    Scenario(
        "test_contactlastname_invalid_numeric.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactLastName:Smith456"),
        must=(g(CLN_FMT),), all_fail=True,
    ),
    Scenario(
        "test_contactlastname_over_max_length_dp.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactLastName:ABCDEFGHIJKLMNOPQRSTUVWXYZ"),
        must=(g(CLN_FMT),), all_fail=True,
    ),
    Scenario(
        "test_contactphone_invalid_format.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactPhone:555-123-4567#"),
        must=(g(PHONE_FMT("ContactPhone")),), all_fail=True,
    ),
    Scenario(
        "test_contacttitle_over_max_length.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ContactTitle:VeryLongContactTitleExceedingMaxLength"),
        must=(g(CT_FMT),), all_fail=True,
    ),
    Scenario(
        # Soft rule: deactivated records with blank end dates default to
        # the current date (pipeline.default_end_date_for_deactivated) —
        # NOT an error; the reference generator emits such rows in valid
        # data (newaugsver_clean.py:176-191).
        "test_effectiveenddate_blank_deactivated_record.py",
        ("RecordOperation:D", "EffectiveEndDate:"),
        zero=True,
    ),
    Scenario(
        "test_effectiveenddate_invalid_format.py",
        ("EffectiveEndDate:2026/03/03",),
        must=(g(EED_FMT),), all_fail=True,
    ),
    Scenario(
        "test_effectiveenddate_invalid_special_char.py",
        ("EffectiveEndDate:@#$%!!",),
        must=(g(EED_FMT),), all_fail=True,
    ),
    Scenario(
        "test_effectivestartdate_blank.py",
        ("EffectiveStartDate:",),
        must=(g(ESD_REQ),),
    ),
    Scenario(
        "test_effectivestartdate_blank_active_record.py",
        ("RecordOperation:A", "EffectiveStartDate:"),
        must=(g(ESD_REQ),),
    ),
    Scenario(
        "test_effectivestartdate_invalid_format.py",
        ("EffectiveStartDate:2026/03/03",),
        must=(g(ESD_FMT),), all_fail=True,
    ),
    Scenario(
        "test_eft_banking_fields_blank_required_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "RoutingTransitNumber:0=", "AccountNumber:1=",
         "AccountType:2="),
        cells={0: [RTN9], 1: [ACCT_EFT], 2: [AT_EFT]},
    ),
    Scenario(
        "test_eft_banking_format_rules_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "RoutingTransitNumber:123456789",
         "AccountNumber:123456789", "AccountType:CHKING",
         "RoutingTransitNumber:0=12345A678", "RoutingTransitNumber:1=101",
         "RoutingTransitNumber:2=@#$&^%!!", "AccountNumber:3=8",
         "AccountNumber:4=!!@@$$&&", "AccountNumber:5=123456789012345678"),
        rows=12,
        cells={0: [RTN_NUM], 1: [RTN9, RTN_NUM], 2: [RTN9, RTN_NUM],
               3: [ACCT_EFT], 4: [ACCT_EFT, CHARSET("AccountNumber")],
               5: [ACCT_EFT]},
    ),
    Scenario(
        "test_organization_tin_profit_rules_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=H", "OrganizationCode:1=@",
         "OrganizationIdentifier:2=&&&&&&&",
         "OrganizationIdentifier:3=999999999999999999", "OrganizationTIN:4=",
         "OrganizationTIN:5=!@#$", "OrganizationTINType:6=XXX",
         "OrganizationTINType:7=@#$!!!", "ProfitNonprofit:8=",
         "ProfitNonprofit:9=FVGHJK", "ProfitNonprofit:10=@!#$&&"),
        rows=15,
        cells={
            0: [ORG_ENUM], 1: [ORG_ENUM, CHARSET("OrganizationCode")],
            2: [ORGID_FMT, CHARSET("OrganizationIdentifier")],
            3: [ORGID_FMT], 4: [TIN_REQ],
            5: [TIN_FMT, CHARSET("OrganizationTIN")],
            6: [TINTYPE_INV],
            7: [TINTYPE_LEN, TINTYPE_INV, CHARSET("OrganizationTINType")],
            8: [PNP_REQ], 9: [PNP_ENUM],
            10: [PNP_ENUM, CHARSET("ProfitNonprofit")],
        },
    ),
    Scenario(
        "test_organizationcode_invalid_h.py",
        ("OrganizationCode:H",),
        must=(g(ORG_ENUM),), all_fail=True,
    ),
    Scenario(
        "test_organizationcode_invalid_special_char.py",
        ("OrganizationCode:@",),
        must=(g(ORG_ENUM), g(CHARSET("OrganizationCode"))), all_fail=True,
    ),
    Scenario(
        "test_organizationidentifier_invalid_ampersand.py",
        ("OrganizationIdentifier:&&&&&&&",),
        must=(g(ORGID_FMT), g(CHARSET("OrganizationIdentifier"))),
        all_fail=True,
    ),
    Scenario(
        "test_organizationidentifier_invalid_ampersand_strict.py",
        ("OrganizationCode:D", "PayeeID:PAYEE123",
         "OrganizationIdentifier:&&&&&&&"),
        must=(g(ORGID_FMT), g(PAYEE_FMT)), all_fail=True,
    ),
    Scenario(
        "test_organizationidentifier_invalid_long_numbers.py",
        ("OrganizationIdentifier:999999999999999999",),
        must=(g(ORGID_FMT),), all_fail=True,
    ),
    Scenario(
        "test_organizationnpi_invalid_mixed_chars.py",
        ("OrganizationNPI:XxXyYyZzZ",),
        must=(g(NPI_FMT),), all_fail=True,
    ),
    Scenario(
        "test_organizationnpi_invalid_single_digit.py",
        ("OrganizationNPI:1",),
        must=(g(NPI_FMT),), all_fail=True,
    ),
    Scenario(
        "test_organizationnpi_value_rules_combined.py",
        ("OrganizationNPI:0=1", "OrganizationNPI:1=XxXyYyZzZ"),
        cells={0: [NPI_FMT], 1: [NPI_FMT]},
    ),
    Scenario(
        "test_organizationtin_blank_dp_required.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "OrganizationTIN:"),
        must=(g(TIN_REQ),), all_fail=True,
    ),
    Scenario(
        "test_organizationtin_invalid_special_char.py",
        ("OrganizationTIN:!@#$",),
        must=(g(CHARSET("OrganizationTIN")),), all_fail=True,
    ),
    Scenario(
        "test_organizationtintype_invalid_mixed_special.py",
        ("OrganizationTINType:@#$!!!",),
        must=(g(CHARSET("OrganizationTINType")),), all_fail=True,
    ),
    Scenario(
        "test_organizationtintype_invalid_value.py",
        ("OrganizationTINType:XXX",),
        must=(g(TINTYPE_INV, R22),), all_fail=True,
    ),
    Scenario(
        "test_organizationtintype_invalid_xzxz.py",
        ("OrganizationTINType:XZXZ",),
        must=(g(TINTYPE_LEN, R22),), all_fail=True,
    ),
    Scenario(
        "test_payeeid_invalid_special_char_hash.py",
        ("PayeeID:###",),
        must=(g(CHARSET("PayeeID")), g(PAYEE_FMT)), all_fail=True,
    ),
    Scenario(
        # XCD555 is a legal generic id for R rows (^[A-Za-z0-9]{2,9}$), so
        # only M/D/P rows fail the prefix rule — not necessarily all rows.
        "test_payeeid_invalid_xcd555.py",
        ("PayeeID:XCD555",),
        must=(g(PAYEE_FMT),),
    ),
    Scenario(
        "test_paymentmode_invalid_numeric.py",
        ("PaymentMode:123",),
        must=(g(PM_ENUM),),
    ),
    Scenario(
        "test_paymentmode_invalid_pop.py",
        ("PaymentMode:POP",),
        must=(g(PM_ENUM),),
    ),
    Scenario(
        "test_paymentmode_recordoperation_enum_rules_combined.py",
        ("PaymentMode:0=123", "PaymentMode:1=POP", "RecordOperation:2=$",
         "RecordOperation:3=Z"),
        cells={2: [REC_ENUM, CHARSET("RecordOperation")], 3: [REC_ENUM]},
        cells_any={0: [PM_ENUM, R22], 1: [PM_ENUM, R22]},
    ),
    Scenario(
        "test_paymentmode_requiredness_rules_dp_combined.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "RoutingTransitNumber:123456789",
         "AccountNumber:123456789", "AccountType:CHKING", "AddressCode:COR",
         "PaymentMode:0=CHK", "RoutingTransitNumber:0=", "AccountNumber:0=",
         "AccountType:0=", "RoutingTransitNumber:1=", "AddressCode:2="),
        cells={0: [AC_PAIR], 1: [RTN9]},
    ),
    Scenario(
        "test_postalcode_invalid_characters.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PostalCode:90210#"),
        must=(g(POSTAL_FMT),), all_fail=True,
    ),
    Scenario(
        "test_postalcode_invalid_length.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PostalCode:123"),
        must=(g(POSTAL_FMT),), all_fail=True,
    ),
    Scenario(
        "test_postalcode_invalid_special_char.py",
        ("PostalCode:@#$%!!",),
        must=(g(POSTAL_FMT),), all_fail=True,
    ),
    Scenario(
        "test_profitnonprofit_blank_dp_required.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ProfitNonprofit:"),
        must=(g(PNP_REQ),), all_fail=True,
    ),
    Scenario(
        "test_profitnonprofit_invalid_fvghjk.py",
        ("ProfitNonprofit:FVGHJK",),
        must=(g(PNP_ENUM, R22),), all_fail=True,
    ),
    Scenario(
        "test_profitnonprofit_invalid_special_char.py",
        ("ProfitNonprofit:@!#$&&",),
        must=(g(CHARSET("ProfitNonprofit")),), all_fail=True,
    ),
    Scenario(
        "test_profitnonprofit_invalid_special_char_required_org.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "ProfitNonprofit:@!#$&&"),
        must=(g(PNP_ENUM), g(CHARSET("ProfitNonprofit"))), all_fail=True,
    ),
    Scenario(
        # First command in the reference file: '$'.
        "test_recordoperation_invalid_special_char.py",
        ("RecordOperation:$",),
        must=(g(REC_ENUM), g(CHARSET("RecordOperation"))), all_fail=True,
    ),
    Scenario(
        # Second command in the same reference file: 'Z'.
        "test_recordoperation_invalid_special_char.py#z",
        ("RecordOperation:Z",),
        must=(g(REC_ENUM),), all_fail=True,
    ),
    Scenario(
        "test_recordoperation_invalid_z.py",
        ("RecordOperation:Z",),
        must=(g(REC_ENUM),), all_fail=True,
    ),
    Scenario(
        "test_routingnumber_blank_eft_required.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "RoutingTransitNumber:"),
        must=(g(RTN9),), all_fail=True,
    ),
    Scenario(
        "test_routingnumber_invalid_characters.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "RoutingTransitNumber:12345A678"),
        must=(g(RTN_NUM),), all_fail=True,
    ),
    Scenario(
        "test_routingnumber_leading_zeros.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "PaymentMode:EFT", "RoutingTransitNumber:54321"),
        must=(g(RTN9), g(RTN_NUM)), all_fail=True,
    ),
    Scenario(
        "test_routingtransitnumber_invalid_short.py",
        ("RoutingTransitNumber:101",),
        must=(g(RTN9, RTN_CHK, R22),), all_fail=True,
    ),
    Scenario(
        "test_routingtransitnumber_invalid_special_char.py",
        ("RoutingTransitNumber:@#$&^%!!",),
        must=(g(RTN9, RTN_CHK, R22),), all_fail=True,
    ),
    Scenario(
        # test_run_2's scenario command: blank AddressCode everywhere — a
        # blank AddressCode violates nothing (the enum applies only when
        # present; R rows get *more* blank), so the documented outcome is
        # a clean run.
        "test_run_2.py",
        ("AddressCode:",),
        zero=True,
    ),
    Scenario(
        # Org X is neither M/D/P nor R: org-conditional rules stand down,
        # leaving exactly the enum + the org-independent NPI format.
        "test_run_3.py",
        ("OrganizationCode:X", "OrganizationTIN:ABC123",
         "OrganizationNPI:12345"),
        must=(g(ORG_ENUM), g(NPI_FMT)), all_fail=True,
    ),
    Scenario(
        "test_state_invalid_format.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "State:STATE"),
        must=(g(STATE_FMT),), all_fail=True,
    ),
    Scenario(
        "test_state_invalid_single_character.py",
        ("OrganizationCode:D", "OrganizationCode:0=P", "OrganizationCode:1=P",
         "State:C"),
        must=(g(STATE_FMT),), all_fail=True,
    ),
]


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def _toks(desc: str) -> set[str]:
    """Reference comparator tokenization (PIPE:817-830): split on ',',
    collapse whitespace, drop empties."""
    return {
        re.sub(r"\s+", " ", t).strip()
        for t in desc.split(",")
        if t.strip()
    }


def _toks_of(msgs) -> set[str]:
    out: set[str] = set()
    for m in msgs:
        out |= _toks(m)
    return out


def _read_error_csv(path: str) -> list[dict]:
    with open(path, newline="") as f:
        return list(csv.DictReader(f, delimiter="|"))


def _oracle_payee_tokens(parquet_dir: str) -> dict[str, set[str]]:
    """Re-validate the post-injection table with the DuckDB rule mirror:
    payee -> union of error tokens. Fully independent of the Spark engine."""
    import duckdb

    cases = ",\n".join(
        f"CASE WHEN {_violation(valid, applies)} THEN {_sq(msg)} END"
        for msg, valid, applies in _rule_mirrors()
    )
    sql = f"""
    SELECT PayeeID, list_filter([{cases}], x -> x IS NOT NULL) AS errs
    FROM read_parquet('{parquet_dir}/*.parquet')
    """
    out: dict[str, set[str]] = {}
    for payee, errs in duckdb.sql(sql).fetchall():
        if errs:
            out.setdefault(payee, set()).update(_toks_of(errs))
    return out


@pytest.fixture(scope="module")
def base_payees(spark):
    """rows-count -> generated PayeeIDs in overwrite_cells order (sorted by
    PayeeID), for mapping a reference row index to its error-CSV payee."""
    from etl_validator_github_spark.generator import generate_bankdata

    cache: dict[int, list[str]] = {}

    def get(rows: int) -> list[str]:
        if rows not in cache:
            cache[rows] = [
                r.PayeeID
                for r in generate_bankdata(spark, rows, seed=SEED)
                .select("PayeeID").orderBy("PayeeID").collect()
            ]
        return cache[rows]

    return get


def _payee_for_idx(sc: Scenario, idx: int, payees: list[str],
                   columns: dict, cells: dict) -> str:
    """The payee the error CSV reports for reference row ``idx``, taking
    PayeeID injections into account."""
    if ("PayeeID", idx) in cells:
        return cells[("PayeeID", idx)]
    if "PayeeID" in columns:
        return columns["PayeeID"]
    return payees[idx]


@pytest.mark.parametrize(
    "sc", SCENARIOS, ids=[s.ref.removeprefix("test_") for s in SCENARIOS]
)
def test_reference_scenario(sc: Scenario, spark, base_payees, tmp_path):
    columns, cells = _parse_invalid_values(list(sc.specs))
    res = run_scenario(
        spark, str(tmp_path), rows=sc.rows, seed=SEED,
        invalid_values=columns, invalid_cells=cells,
    )

    # 1. The reference's own pass criterion: "Row counts MATCH".
    assert res.reconcile_passed, res.summary()
    assert not res.pipeline.file_level_failure

    if sc.zero:
        assert res.pipeline.error_count == 0, (
            f"documented no-error scenario produced "
            f"{res.pipeline.error_count} error records"
        )
        return

    assert res.pipeline.error_count > 0, "scenario produced no errors"
    records = _read_error_csv(res.pipeline.error_file)
    by_payee: dict[str, set[str]] = {}
    for rec in records:
        by_payee.setdefault(rec["PayeeId"], set()).update(_toks(rec["ERROR_DESC"]))

    # 2. Independent per-row oracle: DuckDB rule mirror over the archived
    #    post-injection table must agree payee-by-payee, token-by-token.
    oracle = _oracle_payee_tokens(res.pipeline.archived_to)
    assert by_payee == oracle, {
        "engine_only": {p: sorted(t - oracle.get(p, set()))
                        for p, t in by_payee.items()
                        if t - oracle.get(p, set())},
        "oracle_only": {p: sorted(t - by_payee.get(p, set()))
                        for p, t in oracle.items()
                        if t - by_payee.get(p, set())},
    }

    # 3a. Scenario-level expected messages (any-of per group).
    corpus = "\n".join(rec["ERROR_DESC"] for rec in records)
    for group in sc.must:
        assert any(m in corpus for m in group), (
            f"none of {group} found in error output:\n{corpus}"
        )

    # 3b. Every row fails, where the injection guarantees it.
    if sc.all_fail:
        assert res.pipeline.error_count == sc.rows, (
            f"expected all {sc.rows} rows to fail, got "
            f"{res.pipeline.error_count}"
        )

    # 3c. Targeted-row expectations.
    payees = base_payees(sc.rows)
    for idx, msgs in sc.cells.items():
        payee = _payee_for_idx(sc, idx, payees, columns, cells)
        got = by_payee.get(payee, set())
        want = _toks_of(msgs)
        assert want <= got, (
            f"row {idx} (payee {payee!r}): missing "
            f"{sorted(want - got)}; has {sorted(got)}"
        )
    for idx, alts in sc.cells_any.items():
        payee = _payee_for_idx(sc, idx, payees, columns, cells)
        got = by_payee.get(payee, set())
        assert any(_toks(m) <= got for m in alts), (
            f"row {idx} (payee {payee!r}): none of {alts} present; "
            f"has {sorted(got)}"
        )


def test_scenario_inventory_covers_reference():
    """Every reference scenario test file is replicated above (files whose
    scenarios are S3/Glue/Allure plumbing only are explicitly excluded)."""
    ref_dir = "/root/reference/tests"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference repo not present")
    excluded = {
        "conftest.py",
        "run_pipeline_test.py",
        "test_etl_allure.py",  # allure-report smoke test, no scenario
    }
    ref_files = {
        f for f in os.listdir(ref_dir)
        if f.startswith("test_") and f.endswith(".py") and f not in excluded
    }
    covered = {s.ref.split("#")[0] for s in SCENARIOS}
    assert ref_files <= covered, sorted(ref_files - covered)
