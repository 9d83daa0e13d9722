#!/usr/bin/env python3
"""Local pre-flight replica of the driver's DuckDB oracle compare.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB against <sfDir>'s tables,
and compares schema + values (column-name-sorted, row-sorted, exact).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def d7_oracle(con, sql: str) -> pd.DataFrame:
    """Iterative min-label propagation replacement for d7's registered
    transitive-closure SQL.

    The registered oracle (what the driver runs at sf0.01) materializes
    the full reachability closure — exact but Σ|component|² rows, which
    is impractical at sf0.1 where the corpus's near-dup families give
    ~1M LSH edges. This computes the same cluster assignment with the
    same fixpoint the Spark operator uses: per-round min-label over the
    edge set, looped host-side (single-statement SQL cannot iterate-
    with-aggregates). Cost per round is one scan of the edge table.
    """
    _d7_labels(con, sql)
    return con.execute("""SELECT doc_id, label AS cluster_id,
        CAST(COUNT(*) OVER (PARTITION BY label) AS BIGINT) AS cluster_size
        FROM __labels ORDER BY doc_id""").df()


def _d7_labels(con, sql: str) -> None:
    """Populate temp table __labels with the converged min-label
    assignment for the cluster CTE chain embedded in `sql` (shared by
    the d7 and d10 oracles)."""
    # everything up to the closure CTE is the shared shingle/band/edge
    # pipeline — reuse it verbatim so the edge set is identical
    prefix = sql.split(",\nreach AS")[0]
    con.execute(f"CREATE OR REPLACE TEMP TABLE __edges AS {prefix} SELECT src, dst FROM edges")
    con.execute("""CREATE OR REPLACE TEMP TABLE __labels AS
                   SELECT doc_id, doc_id AS label FROM documents""")
    for _ in range(200):
        con.execute("""CREATE OR REPLACE TEMP TABLE __next AS
            SELECT l.doc_id, LEAST(l.label, COALESCE(m.nlabel, l.label)) AS label
            FROM __labels l LEFT JOIN (
              SELECT e.dst AS doc_id, MIN(l2.label) AS nlabel
              FROM __edges e JOIN __labels l2 ON l2.doc_id = e.src
              GROUP BY e.dst) m USING (doc_id)""")
        changed = con.execute("""SELECT count(*) FROM __next n
            JOIN __labels l USING (doc_id) WHERE n.label <> l.label""").fetchone()[0]
        con.execute("CREATE OR REPLACE TEMP TABLE __labels AS SELECT * FROM __next")
        if changed == 0:
            break
    else:
        raise RuntimeError("d7 oracle label propagation did not converge")


def d20_oracle(con, sql: str) -> pd.DataFrame:
    """d20 via the same iterative propagation as d7_oracle — the
    registered oracle is d7's closure over the union plus the batch
    flag, so the swap is identical."""
    _d7_labels(con, sql)
    return con.execute("""WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents)
        SELECT l.doc_id, l.label AS cluster_id,
          l.doc_id > m.mx - m.mx // 5 AS is_new
        FROM __labels l CROSS JOIN mx m ORDER BY l.doc_id""").df()


def d10_oracle(con, sql: str) -> pd.DataFrame:
    """d10 via the same iterative propagation as d7_oracle, plus the
    quality CTE lifted verbatim from the registered oracle SQL."""
    _d7_labels(con, sql)
    qcte = "qscore AS" + sql.split("qscore AS")[1].split("\nSELECT c.doc_id")[0]
    return con.execute(f"""WITH {qcte}
        SELECT l.doc_id, l.label AS cluster_id,
          CAST(COUNT(*) OVER (PARTITION BY l.label) AS BIGINT) AS cluster_size,
          q.quality_score,
          ROW_NUMBER() OVER (PARTITION BY l.label
            ORDER BY q.quality_score DESC, l.doc_id) = 1 AS keep
        FROM __labels l JOIN qscore q ON q.doc_id = l.doc_id
        ORDER BY l.doc_id""").df()


def t29_oracle(con, sql: str) -> pd.DataFrame:
    """t29 via the same iterative propagation as d7_oracle: its
    near-dup drop column is d10's keeper rule over the cluster
    assignment, so the closure swaps identically; everything after the
    clusters CTE (the datasheet chain + rollup) is lifted verbatim and
    re-rooted on the converged __labels table."""
    _d7_labels(con, sql)
    tail = sql.split("MIN(dst) AS cluster_id FROM reach GROUP BY src),\n")[1]
    return con.execute(
        "WITH clusters AS (SELECT doc_id, label AS cluster_id FROM __labels),\n"
        + tail).df()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (a directory of part files) — e.g. the
            # ScaleData-generated sf1 corpus
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            if name == "d7_cluster":
                exp = canon(d7_oracle(con, oracle[name]))
            elif name == "d10_cluster_keep":
                exp = canon(d10_oracle(con, oracle[name]))
            elif name == "d20_cross_batch_cluster":
                exp = canon(d20_oracle(con, oracle[name]))
            elif name == "t29_datasheet":
                exp = canon(t29_oracle(con, oracle[name]))
            else:
                exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols got={list(got.columns)} exp={list(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            ok = False
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                # dtype-strict: the driver hashes typed values, so an
                # int64 Spark column vs a float64 DuckDB column (the
                # HUGEINT->float64 pandas fetch) must FAIL even when
                # every value compares equal.
                if g.dtype != e.dtype:
                    print(f"FAIL {name}: col {c} dtype got={g.dtype} exp={e.dtype}")
                    ok = False
                    break
                try:
                    eq = (g.isna() & e.isna()) | (g == e)
                except Exception:
                    eq = g.astype(str) == e.astype(str)
                if not eq.all():
                    bad = (~eq).idxmax()
                    print(f"FAIL {name}: col {c} row {bad}: got={g[bad]!r} exp={e[bad]!r} "
                          f"(dtype {g.dtype} vs {e.dtype}, {int((~eq).sum())} diffs)")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
