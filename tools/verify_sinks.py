"""Per-turn text-equality verifier between two pipeline output roots.

The north-rule invariant made executable: two runs (ours vs a
reference run, or a fresh run vs a resumed one) are equivalent iff,
per sink, the (conv_id, turn_idx)-ordered sequence of turn texts is
byte-identical and the routed-row counts match. Reads both roots with
DuckDB — independent of Spark — and compares:

  1. the set of sinks;
  2. per-sink routed-row counts;
  3. per-sink md5 over the ordered (conv_id, turn_idx, text) stream.

Usage:
    python tools/verify_sinks.py <root_a> <root_b>

Exit 0 = equivalent; 1 = any mismatch (printed per sink).
"""

from __future__ import annotations

import sys

import duckdb


def sink_digests(con, root: str) -> dict[str, tuple[int, str]]:
    # canonicalization notes: each row folds to a fixed-width hex
    # triple (md5 of each field separately — no delimiter-injection
    # ambiguity from tabs/newlines inside text), NULL text gets a
    # distinct marker instead of vanishing from string_agg, and the
    # row hash itself is the ordering tie-break so duplicate
    # (conv_id, turn_idx) keys still digest deterministically.
    rows = con.execute(
        f"""
        WITH r AS (
          SELECT sink,
                 conv_id, turn_idx,
                 md5(conv_id) || md5(CAST(turn_idx AS VARCHAR)) ||
                 CASE WHEN text IS NULL THEN 'N' ELSE md5(text) END AS row_h
          FROM parquet_scan('{root}/data/*/*/*.parquet',
                            hive_partitioning=1)
        )
        SELECT sink, count(*) AS n,
               md5(string_agg(row_h, ''
                              ORDER BY conv_id, turn_idx, row_h)) AS digest
        FROM r GROUP BY sink
        """
    ).fetchall()
    return {r[0]: (r[1], r[2]) for r in rows}


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    root_a, root_b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    a, b = sink_digests(con, root_a), sink_digests(con, root_b)

    ok = True
    for sink in sorted(set(a) | set(b)):
        if sink not in a or sink not in b:
            print(f"{sink:30s} MISSING in {'A' if sink not in a else 'B'}")
            ok = False
            continue
        (na, da), (nb, db) = a[sink], b[sink]
        if na != nb:
            print(f"{sink:30s} COUNT MISMATCH {na} != {nb}")
            ok = False
        elif da != db:
            print(f"{sink:30s} TEXT MISMATCH (counts equal: {na})")
            ok = False
        else:
            print(f"{sink:30s} OK rows={na} digest={da[:12]}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
