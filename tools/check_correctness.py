#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark AND
its ``oracle_sql()`` on DuckDB, then compares:
  - row count
  - schema (column names, sorted)
  - order-insensitive value hash (rows canonicalized + sorted)

Usage: python tools/check_correctness.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import datetime
import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v) -> str:
    if v is None:
        return "\\N"
    if v is getattr(__import__("pandas"), "NaT", None):
        return "\\N"
    import numpy as np
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, bool):
        # BEFORE the float branch only by luck (bool is not float) but
        # must stay before str: True/1 collapse is deliberate (DuckDB
        # and Spark agree on booleans; the driver sees both as 1)
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            # NULL floats: both sides fetch via pandas (r06 — the
            # mirror now toPandas()-es Spark exactly like the driver),
            # where SQL NULL in a float column is NaN; canonicalize
            # NaN to NULL so nullable float columns hash identically
            # (seen: multimodal_features).
            return "\\N"
        if math.isinf(v):
            # int(inf) raises OverflowError OUTSIDE any try (infra
            # review r06) — canonicalize explicitly instead of
            # aborting the whole sweep
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            # deliberate int-valued-float collapse (r03: DuckDB
            # HUGEINT aggregates surface as float64/object ints)
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime.datetime):
        # DuckDB DATE columns arrive as midnight Timestamps while
        # Spark DateType (Arrow-off) gives datetime.date — collapse
        # exact midnights to the date form so a raw date column can
        # hash-match (infra review r06); real timestamps keep full
        # precision
        if (v.tzinfo is None and v.hour == v.minute == v.second == 0
                and v.microsecond == 0):
            return v.strftime("%Y-%m-%d")
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, str):
        # type-tagged: a digit STRING must not hash-collide with the
        # number it spells — the schema compare checks names only, so
        # without this a wrong-typed column passes silently (infra
        # review r06)
        return "s:" + v
    return str(v)


def driver_sort(pdf):
    """Reproduce the driver gate's _canon row-ordering step EXACTLY:
    pandas ``sort_values`` over all columns (sorted by name).

    This is deliberately NOT a tolerant sort — the driver's pandas
    lexsort factorizes each column through a hash table, so any cell
    pandas cannot hash (list/dict/ndarray) or cannot order raises
    TypeError there. r03 (HUGEINT casts), r04 (Arrow-off inference)
    and r05 (list columns: cypher_collect/list_fns/keys_props) all
    shipped because the mirror's hand-rolled canon was MORE tolerant
    than the driver; this function makes the mirror fail first.
    """
    cols = sorted(pdf.columns)
    # single-column frames take pandas' comparison-sort path, which
    # does NOT factorize — a lone array<...> column would sort fine
    # here while the driver's hash step still chokes on the list
    # cells (infra review r06: the r05 class, 1-column variant).
    # Reject unhashable cell types explicitly.
    for c in cols:
        col = pdf[c]
        if col.dtype == object:
            for v in col:
                if isinstance(v, (list, dict, set, bytearray)) or \
                        type(v).__module__ == "numpy" and \
                        getattr(v, "ndim", 0) > 0:
                    raise TypeError(
                        f"unhashable type in column {c!r}: "
                        f"{type(v).__name__} (driver gate cannot "
                        "hash this cell)")
    body = pdf[cols].sort_values(by=cols)  # raises like the driver does
    return cols, [tuple(r) for r in body.itertuples(index=False, name=None)]


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    argv = sys.argv[1:]
    if "--sf" in argv:
        i = argv.index("--sf")
        if i + 1 >= len(argv):
            print("usage: check_correctness.py [query ...] [--sf DIR]")
            return 2
        globals()["SF_DIR"] = argv[i + 1]
        del argv[i:i + 2]  # strip flag AND value from positionals
    args = [a for a in argv if not a.startswith("--")]

    import duckdb

    import __spark_entry__ as entrymod
    from incubator_hugegraph_spark.session import get_spark

    spark = get_spark("correctness-check")
    spark.sparkContext.setLogLevel("ERROR")
    # Environment fidelity: the DRIVER's session runs with Arrow OFF,
    # so createDataFrame(pandas) goes through _inferSchemaFromList —
    # which rejects numpy scalars (<U dtype) that Arrow-on silently
    # accepts (r04 `jaccard_top_ram` driver-FAIL was exactly this).
    # Pandas UDF paths always use Arrow regardless of this conf, so
    # only the conversion path — the divergent one — is affected.
    # Opt back with --arrow to mirror the builder session instead.
    if "--arrow" not in sys.argv:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or list(qs)
    failures = 0
    # rows-only is an EXPLICIT declaration, not a fallback: a typo'd
    # or renamed oracle key must FAIL, not silently downgrade the
    # query to an unfailable rows-only check (infra review r06)
    ROWS_ONLY = {"louvain"}
    orphans = set(oracles) - set(qs)
    if orphans:
        print(f"FAIL  orphaned oracle_sql keys (no matching query): "
              f"{sorted(orphans)}")
        failures += 1
    for name in names:
        t0 = time.time()
        try:
            # Fetch via pandas exactly like the driver gate does (the
            # driver toPandas()-es the returned DataFrame, it does not
            # .collect() row objects).
            sdf = qs[name](spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        if name not in oracles:
            if name not in ROWS_ONLY:
                print(f"FAIL  {name}: no oracle_sql entry and not in "
                      "the declared ROWS_ONLY set")
                failures += 1
                continue
            print(f"OK?   {name}: rows-only check, {len(spdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            # Fetch via pandas (Arrow) exactly like the driver gate does:
            # DuckDB HUGEINT/DECIMAL columns convert to float64 here, so
            # oracle-typing artifacts reproduce locally instead of hiding
            # behind fetchall()'s Python-int path.
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        try:
            # Driver-faithful canonicalization: pandas sort_values over
            # all columns. Raises on anything the driver cannot hash
            # (r05: list columns) — that MUST be a local FAIL.
            scols, srows = driver_sort(spdf)
            dcols_s, drows = driver_sort(dpdf)
        except Exception as e:
            print(f"FAIL  {name}: driver canon error (the driver gate "
                  f"would ERR on this output): {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} != {len(drows)}")
        if scols != dcols_s:  # both already name-sorted by driver_sort
            problems.append(f"cols {scols} != {dcols_s}")
        if not problems:
            # driver_sort already reordered columns by name, so rows
            # are positionally comparable as-is.
            sh, dh = table_hash(scols, srows), table_hash(dcols_s, drows)
            if sh != dh:
                problems.append(f"hash {sh} != {dh}")
                # show a sample diff
                so = sorted("\x1f".join(canon(v) for v in r) for r in srows)
                do = sorted("\x1f".join(canon(v) for v in r) for r in drows)
                for a, b in zip(so, do):
                    if a != b:
                        problems.append(f"first diff:\n  spark={a!r}\n  duck ={b!r}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
