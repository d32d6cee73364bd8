#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every entry in ``__spark_entry__.queries()`` on Spark and the matching
``oracle_sql()`` statement on DuckDB over the same parquet tables, then
compares row count, sorted column names, and a value hash computed the same
way the driver does (columns sorted by name, values stringified, rows
sorted). Usage::

    python scripts/oracle_check.py [sf_dir] [query ...]
"""
import hashlib
import json
import sys

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_s(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def _s(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as entry
    from solaris_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            results[name] = {"err": "no_oracle"}
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rel = con.execute(sql)
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
            res = {
                "rows_match": len(srows) == len(orows),
                "schema_match": sorted(scols) == sorted(ocols),
                "hash_match": _hash_rows(scols, srows) == _hash_rows(ocols, orows),
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
            }
            if not res["hash_match"] and res["rows_match"] and res["schema_match"]:
                # show first differing line to speed up diagnosis
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sl = sorted("\x1f".join(_s(r[i]) for i in so) for r in srows)
                ol = sorted("\x1f".join(_s(r[i]) for i in oo) for r in orows)
                for a, b in zip(sl, ol):
                    if a != b:
                        res["first_diff"] = {"spark": a.replace("\x1f", " | "),
                                             "oracle": b.replace("\x1f", " | ")}
                        break
            results[name] = res
        except Exception as e:  # noqa: BLE001
            results[name] = {"err": f"{type(e).__name__}: {e}"}

    bad = []
    for name, r in results.items():
        if r.get("err") == "no_oracle":
            status = "no_oracle"
        elif r.get("err"):
            status = "ERROR"
            bad.append(name)
        elif r["rows_match"] and r["schema_match"] and r["hash_match"]:
            status = "OK"
        else:
            status = "MISMATCH"
            bad.append(name)
        print(f"{name:24s} {status}")
        if status in ("ERROR", "MISMATCH"):
            print("   ", json.dumps(r, default=str)[:500])
    print(f"\n{len(bad)} failing: {bad}" if bad else "\nall green")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
