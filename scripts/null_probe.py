"""Probe: run the documents-facing graded (query, oracle) pairs over a
clone of sf0.001 whose documents table carries NULL/empty adversarial rows,
and report any Spark-vs-DuckDB divergence. One-off diagnostic; the durable
check lives in tests/test_null_robustness.py."""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession

sys.path.insert(0, str(REPO / "scripts"))
from driver_sim import norm  # noqa: E402

# the query lists and adversarial fixtures are owned by the durable test —
# a hand-maintained copy here drifted (it was 3 graded queries behind the
# test within one round; review finding), so import the single source
sys.path.insert(0, str(REPO / "tests"))
from test_null_robustness import (  # noqa: E402
    DOC_ADVERSARIAL as ADVERSARIAL, DOC_QUERIES, EMB_ADVERSARIAL,
    EMB_QUERIES)


def build_sf(src: str) -> str:
    tmp = Path(tempfile.mkdtemp(prefix="nullsf_"))
    inject = {"documents.parquet": ADVERSARIAL,
              "embeddings.parquet": EMB_ADVERSARIAL}
    for p in Path(src).iterdir():
        if p.name not in inject:
            (tmp / p.name).symlink_to(p)
            continue
        t = pq.read_table(p)
        extra = pa.Table.from_pylist(inject[p.name], schema=pa.schema(
            [(f.name, f.type) for f in t.schema]))
        pq.write_table(pa.concat_tables([t, extra]), tmp / p.name)
    return str(tmp)


def main() -> int:
    sf = build_sf("/root/testdata/sf0.001")
    print(f"adversarial sf dir: {sf}")
    spark = (SparkSession.builder.master("local[8]")
             .appName("null-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    con = duckdb.connect()
    con.execute("SET threads=4")
    con.execute("SET memory_limit='8GB'")
    for tname in ["events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM "
                    f"read_parquet('{sf}/{tname}.parquet')")

    qs, osql = E.queries(), E.oracle_sql()
    fails = []
    for name in DOC_QUERIES + EMB_QUERIES:
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK RAISED {type(e).__name__}: {str(e)[:200]}")
            fails.append(name)
            continue
        try:
            ddf = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DUCK RAISED {type(e).__name__}: {str(e)[:200]}")
            fails.append(name)
            continue
        a, b = norm(sdf), norm(ddf)
        if len(a) != len(b):
            print(f"{name}: ROWS spark={len(a)} duck={len(b)} MISMATCH")
            fails.append(name)
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"{name}: VALUES MISMATCH on {int(neq.sum())}/{len(a)} rows")
            merged = pd.concat([a[neq].head(3).add_prefix("s_"),
                                b[neq].head(3).add_prefix("d_")], axis=1)
            print(merged.to_string())
            fails.append(name)
        else:
            print(f"{name}: OK ({len(a)} rows)")
    print(f"\n{'DIVERGENT: ' + ', '.join(fails) if fails else 'ALL ROBUST'}")
    shutil.rmtree(sf, ignore_errors=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
