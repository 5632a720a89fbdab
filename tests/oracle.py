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
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"oracle-checked query emits complex-typed columns {complex_cols}; "
        "the driver canonicalizer cannot sort these — array_join or go long-form"
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
