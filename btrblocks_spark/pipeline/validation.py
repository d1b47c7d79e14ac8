"""Data-quality constraint auditing (Deequ/Great-Expectations-style).

The reference verifies every written block against its input
(``tools/conversion/csvtobtr.cpp:49-66``, null-aware compare
``storage/Chunk.cpp:143-231``); at pipeline scale the same need shows up as
declarative table constraints checked in bulk. This module evaluates a
constraint suite and returns ONE row per constraint with checked/violation
counts.

Scale design:
  - All single-table predicates for one table are fused into ONE scan
    (a single ``agg`` with conditional sums), then unpivoted to long form —
    N constraints cost one pass, not N.
  - Uniqueness checks are a groupBy on the key only (no payload shuffled).
  - Referential checks are left-anti joins; the dimension side is
    broadcast when small, and only key columns are projected so the probe
    scan reads one column.
  - The result is O(#constraints) rows, safe to collect at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["constraint_audit"]


def _long(df: DataFrame, tbl: str, triples: list[tuple[str, str, str]]) -> DataFrame:
    """Unpivot one wide aggregate row into (constraint, tbl, checked,
    violations) rows. ``triples`` = (constraint_name, checked_col, viol_col).
    """
    pairs = ", ".join(
        f"'{name}', named_struct('checked', {c}, 'violations', {v})"
        for name, c, v in triples
    )
    exploded = df.select(
        F.explode(F.expr(f"map({pairs})")).alias("constraint_name", "s")
    )
    return exploded.select(
        "constraint_name",
        F.lit(tbl).alias("tbl"),
        F.col("s.checked").alias("checked"),
        F.col("s.violations").alias("violations"),
    )


def _viol(cond) -> object:
    """Count rows violating a constraint. NULL-extends the predicate: a row
    where the violation test is UNKNOWN (the checked value is NULL, e.g.
    ``~(NULL > 0)``) counts as a violation — an audit must not silently
    pass rows it could not affirm. coalesce(…, 0) keeps an empty table's
    count at 0 instead of a NULL that makes ``passed`` three-valued."""
    return F.coalesce(
        F.sum(F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0)).cast("long"),
        F.lit(0).cast("long"),
    )


def constraint_audit(
    orders: DataFrame, customer: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Evaluate the constraint suite; returns
    (constraint_name, tbl, checked, violations, passed) sorted by name.
    """
    n_o = F.count(F.lit(1)).cast("long")

    # --- orders: one scan, four predicates -------------------------------
    o_agg = orders.agg(
        n_o.alias("checked_rows"),
        _viol(F.col("o_custkey").isNull()).alias("v_null_cust"),
        _viol(~(F.col("o_totalprice") > 0)).alias("v_price_pos"),
        _viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("v_status_dom"),
        _viol(
            (F.col("o_orderdate") < F.lit("1992-01-01"))
            | (F.col("o_orderdate") > F.lit("1998-12-31"))
        ).alias("v_date_range"),
    )
    o_long = _long(
        o_agg,
        "orders",
        [
            ("orders.o_custkey_not_null", "checked_rows", "v_null_cust"),
            ("orders.o_totalprice_positive", "checked_rows", "v_price_pos"),
            ("orders.o_orderstatus_domain", "checked_rows", "v_status_dom"),
            ("orders.o_orderdate_range", "checked_rows", "v_date_range"),
        ],
    )

    # --- lineitem: one scan, three predicates ----------------------------
    l_agg = lineitem.agg(
        F.count(F.lit(1)).cast("long").alias("checked_rows"),
        _viol(~F.col("l_quantity").between(1, 50)).alias("v_qty_range"),
        _viol(~F.col("l_discount").between(0.0, 0.1)).alias("v_disc_range"),
        _viol(F.col("l_shipdate").isNull()).alias("v_ship_null"),
    )
    l_long = _long(
        l_agg,
        "lineitem",
        [
            ("lineitem.l_quantity_range", "checked_rows", "v_qty_range"),
            ("lineitem.l_discount_range", "checked_rows", "v_disc_range"),
            ("lineitem.l_shipdate_not_null", "checked_rows", "v_ship_null"),
        ],
    )

    # --- uniqueness: key-only shuffle ------------------------------------
    cust_dupes = (
        customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.lit("customer.c_custkey_unique").alias("constraint_name"),
            F.lit("customer").alias("tbl"),
            F.sum("n").cast("long").alias("checked"),
            F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
            .cast("long")
            .alias("violations"),
        )
    )
    li_dupes = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.lit("lineitem.pk_unique").alias("constraint_name"),
            F.lit("lineitem").alias("tbl"),
            F.sum("n").cast("long").alias("checked"),
            F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
            .cast("long")
            .alias("violations"),
        )
    )

    # --- referential integrity: key-only anti joins ----------------------
    o_keys = orders.select("o_custkey")
    fk_orders = (
        o_keys.join(
            F.broadcast(customer.select("c_custkey")),
            o_keys["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .crossJoin(o_keys.agg(F.count(F.lit(1)).cast("long").alias("checked")))
        .select(
            F.lit("orders.o_custkey_fk_customer").alias("constraint_name"),
            F.lit("orders").alias("tbl"),
            "checked",
            "violations",
        )
    )
    l_keys = lineitem.select("l_orderkey")
    fk_lineitem = (
        l_keys.join(
            orders.select("o_orderkey"),
            l_keys["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .crossJoin(l_keys.agg(F.count(F.lit(1)).cast("long").alias("checked")))
        .select(
            F.lit("lineitem.l_orderkey_fk_orders").alias("constraint_name"),
            F.lit("lineitem").alias("tbl"),
            "checked",
            "violations",
        )
    )

    out = o_long.unionByName(l_long)
    for part in (cust_dupes, li_dupes, fk_orders, fk_lineitem):
        out = out.unionByName(part)
    return out.withColumn("passed", F.col("violations") == 0).orderBy(
        "constraint_name"
    )
