#!/usr/bin/env python3
"""Oracle-type lint helper (test-infra only; NOT part of the library).

Reads a JSON map {query_name: oracle_sql}, binds each statement in
DuckDB against views over the test parquet tables, and emits
{query_name: {column_name: duckdb_type}} from `DESCRIBE <sql>` —
without executing the queries. OracleTypeLintSpec compares these
against the Spark result schemas to catch the HUGEINT/float64 hash
trap (DuckDB windowed SUM(BIGINT) -> HUGEINT -> pandas float64, which
hash-mismatches Spark's long even when values agree; bit the gate in
rounds 3 and 4).

Usage: oracle_type_lint.py <sf_dir> <oracle_sql.json> <out.json>
"""
import json
import pathlib
import sys

import duckdb


def main() -> None:
    sf_dir, sql_path, out_path = sys.argv[1:4]
    con = duckdb.connect()
    for p in sorted(pathlib.Path(sf_dir).glob("*.parquet")):
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')"
        )
    oracle = json.loads(pathlib.Path(sql_path).read_text())
    out = {}
    for name, sql in oracle.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
            out[name] = {r[0]: r[1] for r in rows}
        except Exception as e:  # surface bind errors to the spec
            out[name] = {"__error__": str(e)}
    pathlib.Path(out_path).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
