"""Permanent type-parity gate for oracle SQL (round-1 verdict item #2).

The driver's correctness hash is representation-sensitive: DuckDB widens
SUM(BIGINT) → HUGEINT (Arrow decimal128(38,0)) and passes DECIMAL columns
through, while the Spark side returns int64/double.  Values compare equal in
Python but hash differently at the Arrow layer, so every registered oracle's
final projection must be free of decimal types (cast aggregates to
BIGINT/DOUBLE).  Round 1 shipped 24 offenders; this test keeps it at zero.

No SparkSession needed — DuckDB-only, runs in seconds.
"""

from __future__ import annotations

import os

import pytest

from scripts.audit_oracle_types import audit

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.mark.slow  # excluded from the default (driver-window) run; see pytest.ini
def test_no_decimal_in_any_oracle_output():
    offenders = audit(SF_DIR)
    assert offenders == {}, (
        "Oracle SQL exposes decimal128/hugeint columns (driver hash will "
        f"fail on these): {offenders} — CAST the final projection to "
        "BIGINT/DOUBLE on both the SQL and Spark sides."
    )
