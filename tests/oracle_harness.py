"""Local mirror of the driver's correctness gate: run a registry query
on Spark and its oracle SQL on DuckDB over the same parquet tables,
then compare row count, schema width, and order-insensitive values
(floats rounded upstream by the queries themselves)."""

from __future__ import annotations

import math

import duckdb

from lintdb_spark.tables import TABLES, table_path


# Session-scoped memo (round 14, suite-budget): several registry
# queries deliberately share ONE oracle SQL (the artifact drift serve
# is the oracle of every fold/maintenance variant — the trigger
# changes WHEN maintenance runs, never what is served), so the local
# suite was re-running the identical fat DuckDB pipeline up to 6x per
# session. Keyed on (sql, sf_dir) over immutable test parquet, the
# memo is exact; the DRIVER's compare is untouched (this harness is
# local-only). One connection per sf_dir saves the per-compare view
# setup as well.
_ORACLE_MEMO: dict = {}
_CONNS: dict = {}


def _conn(sf_dir: str):
    con = _CONNS.get(sf_dir)
    if con is None:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{table_path(sf_dir, t)}')"
            )
        _CONNS[sf_dir] = con
    return con


def run_oracle(sql: str, sf_dir: str):
    key = (sql, sf_dir)
    hit = _ORACLE_MEMO.get(key)
    if hit is not None:
        return hit
    out = _conn(sf_dir).sql(sql)
    cols = out.columns
    rows = out.fetchall()
    _ORACLE_MEMO[key] = (cols, rows)
    return cols, rows


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and fix float repr noise
        return round(v + 0.0, 9)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    # null-safe row sort: None sorts before any value, and mixed-type
    # cells compare by type name first (Python 3 refuses int < None)
    return sorted(
        normed,
        key=lambda row: tuple(
            (v is not None, type(v).__name__, v) if v is not None else (False, "", 0)
            for v in row
        ),
    ), [cols[i] for i in order]


def compare(spark_df, oracle_sql_text: str, sf_dir: str):
    """Returns (ok, message)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql_text, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    sn, _ = _normalize(s_cols, s_rows)
    on, _ = _normalize(o_cols, o_rows)
    if sn != on:
        diff = [(a, b) for a, b in zip(sn, on) if a != b][:5]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
