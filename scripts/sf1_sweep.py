"""Full-registry sf1 volume pass (r10 verdict item 6).

Runs EVERY non-drain registry query Spark-side at a synthetic sf1
(scripts/make_sf_synth.py output) under cluster-default partitioning
(200 shuffle partitions + AQE), recording row count, a canonical
content hash, and wall time — then runs the DuckDB oracle twin under a
per-query timeout and compares exactly where the twin stays tractable
at 10× volume (the dedup-pair oracles are quadratic in the synth's
deliberate 90%-duplicate corpus; Spark-side success + the sf0.01/sf0.1
exact hashes remain their correctness evidence, and the report records
WHICH queries fell back to the weaker Spark-only check — no silent
skips, per the boundary_audit rule).

Usage: python scripts/sf1_sweep.py [sf1_dir] [oracle_timeout_s] [out.json]
"""

from __future__ import annotations

import hashlib
import json
import sys
import threading
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from selfcheck import TABLES, canon  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    oracle_timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 180.0
    out_path = sys.argv[3] if len(sys.argv) > 3 else "sf1_sweep.json"

    import __spark_entry__ as entrymod
    from broadway_spark import get_spark
    from broadway_spark.operators import materialize as matz

    spark = get_spark("sf1sweep")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    drains = getattr(entrymod, "STREAMING_DRAINS", frozenset())
    oracles = entrymod.oracle_sql()
    report: dict[str, dict] = {}
    n_exact = n_spark_only = n_fail = 0
    for name, fn in entrymod.queries().items():
        if name in drains:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001 - sweep records failures
            report[name] = {"status": "spark_error", "error": str(e)[:300]}
            print(f"FAIL {name}: spark error: {str(e)[:160]}", flush=True)
            n_fail += 1
            continue
        finally:
            matz.release_all()
        s_wall = round(time.time() - t0, 2)
        sc, sr = canon(rows, cols)
        s_hash = hashlib.md5(repr((sc, sr)).encode()).hexdigest()
        entry = {
            "status": "spark_ok",
            "rows": len(sr),
            "hash": s_hash,
            "spark_s": s_wall,
        }
        sql = oracles.get(name)
        if sql is not None:
            timer = threading.Timer(oracle_timeout, con.interrupt)
            timer.start()
            t1 = time.time()
            try:
                res = con.sql(sql)
                d_cols = res.columns
                d_rows = res.fetchall()
            except Exception as e:  # noqa: BLE001 - timeout or error
                entry["oracle"] = "timeout_or_error"
                entry["oracle_note"] = str(e)[:160]
            else:
                dc, dr = canon(d_rows, d_cols)
                if (sc, sr) == (dc, dr):
                    entry["oracle"] = "exact_match"
                else:
                    entry["oracle"] = "MISMATCH"
                    bad = sum(1 for a, b in zip(sr, dr) if a != b)
                    entry["oracle_note"] = (
                        f"rows {len(sr)} vs {len(dr)}, {bad} differ"
                    )
            finally:
                timer.cancel()
            entry["oracle_s"] = round(time.time() - t1, 2)
        else:
            entry["oracle"] = "no_oracle"
        report[name] = entry
        if entry["oracle"] == "exact_match":
            n_exact += 1
            tag = "EXACT"
        elif entry["oracle"] == "MISMATCH":
            n_fail += 1
            tag = "MISMATCH"
        else:
            n_spark_only += 1
            tag = "SPARK-ONLY"
        print(
            f"{tag} {name} ({entry['rows']} rows, {s_wall}s spark"
            + (f", {entry.get('oracle_s')}s oracle" if sql else "")
            + ")",
            flush=True,
        )
    summary = {
        "sf_dir": sf_dir,
        "n_exact": n_exact,
        "n_spark_only": n_spark_only,
        "n_fail": n_fail,
        "oracle_timeout_s": oracle_timeout,
        "queries": report,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(
        f"\n{n_exact} exact, {n_spark_only} spark-only, {n_fail} failed "
        f"-> {out_path}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
