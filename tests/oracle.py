"""Local replica of the driver's DuckDB-oracle comparison (SURVEY.md §5):
row-count + column names + order-insensitive exact value comparison.  Run
before the driver does, so every oracle-checked query ships pre-verified."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from etl_pipeline_aws_spark.catalog import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class for the driver-hash parity guard: 'float',
    'int', 'decimal' (object dtype holding decimal.Decimal), or 'other'
    (strings, dates, bools — classes with a stable canonical string on
    both bridges)."""
    import decimal

    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if s.dtype == object:
        for v in s:
            if v is None:
                continue
            return "decimal" if isinstance(v, decimal.Decimal) else "other"
    return "other"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # Deliberately NO stringification of unhashable cells: the driver's
    # canonicalizer sorts the raw frame, so a list/array/dict cell raises
    # TypeError there.  The local harness must fail the same way (round-4
    # lesson: a stringify shim here let two ArrayType-output queries ship
    # "green" locally while erring on the driver).  `compare` additionally
    # rejects complex-typed result schemas up front.
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, float_exact: bool = True) -> None:
    # Registry-wide shape guard: the driver's canonicalizer cannot sort or
    # hash Array/Map/Struct cells, so no oracle-checked query may emit one.
    # List-valued results follow the array_join convention; vector-valued
    # results go long-form (see embedding_centroids).
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"oracle-checked query emits complex-typed columns {complex_cols}; "
        "the driver canonicalizer cannot sort these — array_join or go long-form"
    )
    # r8 lesson (window_range_interval_frame driver red): a DecimalType
    # output reaches the driver as Decimal objects while DuckDB's pandas
    # bridge renders its side float64 — same values, different canonical
    # strings, hash mismatch.  Repo convention: do arithmetic in decimal
    # for exactness, but SURFACE the final column as DOUBLE (or BIGINT for
    # integral cents).  Schema-level, so it fires before any value check.
    decimal_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, DecimalType)
    ]
    assert not decimal_cols, (
        f"oracle-checked query emits DecimalType columns {decimal_cols}; "
        "cast the final projection to DOUBLE (or BIGINT for integral "
        "cents) on both engines — Decimal-vs-float64 splits the driver hash"
    )
    got = spark_df.toPandas()
    want = con.sql(sql).df()
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns: spark={sorted(got.columns)} duckdb={sorted(want.columns)}"
    )
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        gc, wc = g[c], w[c]
        # Driver-canonicalizer dtype-parity guard (r8 lesson): the driver
        # string-hashes both frames, so a NUMERIC column whose dtype CLASS
        # differs across the bridge mismatches even when every value is
        # equal — Decimal('25018.60') vs float 25018.6, int 5 vs float 5.0.
        # The tolerant float branch below would mask exactly this class
        # (any float side routes the pair through to_numeric), so the
        # parity check must run FIRST.  Fix in the query, not here: cast
        # final decimals to DOUBLE (or integral cents to BIGINT) on BOTH
        # engines — see windows.py window_range_interval_frame.
        gcls, wcls = _dtype_class(gc), _dtype_class(wc)
        if "decimal" in (gcls, wcls) or {"float", "int"} == {gcls, wcls}:
            assert gcls == wcls, (
                f"column {c!r}: dtype-class split spark={gcls} duckdb={wcls} "
                f"(spark dtype {gc.dtype}, duckdb dtype {wc.dtype}) — the "
                "driver's string-hash canonicalizer rejects this even when "
                "values match; cast the final column to DOUBLE/BIGINT on "
                "both engines"
            )
        if pd.api.types.is_float_dtype(gc) or pd.api.types.is_float_dtype(wc):
            ga = pd.to_numeric(gc).to_numpy(dtype=float)
            wa = pd.to_numeric(wc).to_numpy(dtype=float)
            both_nan = [math.isnan(x) and math.isnan(y) for x, y in zip(ga, wa)]
            bad = [
                i
                for i, (x, y, bn) in enumerate(zip(ga, wa, both_nan))
                if not bn and x != y
            ]
            if bad and not float_exact:
                bad = [i for i in bad if abs(ga[i] - wa[i]) > 1e-9 * max(1.0, abs(wa[i]))]
            assert not bad, (
                f"column {c!r}: {len(bad)} mismatches, first: "
                f"spark={ga[bad[0]]!r} duckdb={wa[bad[0]]!r} at row {bad[0]}"
            )
        else:
            neq = (gc.astype(str) != wc.astype(str))
            assert not neq.any(), (
                f"column {c!r}: {int(neq.sum())} mismatches, first: "
                f"spark={gc[neq].iloc[0]!r} duckdb={wc[neq].iloc[0]!r}"
            )
