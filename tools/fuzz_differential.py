#!/usr/bin/env python3
"""Differential SQL fuzzing: seeded random queries in the Spark/DuckDB common
dialect, executed by graft (spark.sql via graft.tools.SqlRunner) and DuckDB,
results compared (columns sorted, rows sorted, float epsilon).

Generator constraints keep the dialect common and deterministic:
 - aggregates over doubles are emitted RAW and compared with float epsilon:
   round(x, n) is engine-divergent on decimal-boundary doubles (found by
   seed 987654: avg = 962.98124999999993 rounds to .9812 via Spark's
   exact-BigDecimal path but .9813 in DuckDB 1.0)
 - window-frame sums run over INT columns only (frame evaluation order and
   segment-tree float association differ per engine; ints are exact)
 - no division (x/0 semantics differ), no implicit casts across engines
 - ORDER BY always carries a total tie-break
 - JSON extraction is the one dialect split: Spark get_json_object is
   rewritten to DuckDB json_extract_string before the oracle run

Shapes: agg, filter_topk, distinct, join_agg, window (row_number top-k),
window_frame (running/banded frames, lag), setop (INTERSECT/EXCEPT/UNION),
json (events props extraction), tokens, vector_topk, lsh_bands,
percentile (exact interpolated quantiles at random q).

Usage: python3 tools/fuzz_differential.py [n_queries] [seed] [sfdir]
"""
import json
import math
import random
import re
import subprocess
import sys
import tempfile
from pathlib import Path

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 42
SFDIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

rng = random.Random(SEED)

TABLES = {
    "lineitem": {
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "int": ["l_orderkey", "l_partkey", "l_suppkey"],
        "str": ["l_returnflag", "l_linestatus"],
        # tie-break must make the order total. The SYNTHETIC lineitem has
        # ~12k duplicate (l_orderkey, l_linenumber) pairs (unlike real
        # TPC-H), so order by every column: fully-identical rows are
        # interchangeable in a sorted-multiset compare.
        "key": ("l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, "
                "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus"),
    },
    "orders": {
        "num": ["o_totalprice"],
        "int": ["o_orderkey", "o_custkey"],
        "str": ["o_orderstatus", "o_orderpriority"],
        "key": "o_orderkey",
    },
    "customer": {
        "num": ["c_acctbal"],
        "int": ["c_custkey", "c_nationkey"],
        "str": ["c_name", "c_mktsegment"],
        "key": "c_custkey",
    },
    "part": {
        "num": ["p_retailprice"],
        "int": ["p_partkey", "p_size"],
        "str": ["p_name", "p_brand", "p_type"],
        "key": "p_partkey",
    },
    "events": {
        "num": ["value"],
        "int": ["user_id"],
        "str": ["event_type"],
        "key": "event_id",
    },
}


def predicate(t):
    kind = rng.choice(["num", "int", "str", "and", "or"])
    if kind == "and" or kind == "or":
        return f"({predicate(t)} {kind.upper()} {predicate(t)})"
    if kind == "num":
        c = rng.choice(TABLES[t]["num"])
        op = rng.choice(["<", ">", "<=", ">="])
        return f"{c} {op} {round(rng.uniform(0, 1000), 2)}"
    if kind == "int":
        c = rng.choice(TABLES[t]["int"])
        op = rng.choice(["<", ">", "=", "<>"])
        return f"{c} {op} {rng.randint(0, 5000)}"
    c = rng.choice(TABLES[t]["str"])
    return f"{c} {rng.choice(['<', '>', '<>'])} '{rng.choice('ABCFNOPR')}'"


JOINS = [
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("customer", "nation", "c_nationkey = n_nationkey"),
]


# Spark-only spellings -> DuckDB spellings (the one dialect split we fuzz)
DUCK_REWRITES = [
    ("get_json_object(props, '$.k')", "json_extract_string(props, '$.k')"),
    ("explode(split(text, ' '))", "unnest(string_split(text, ' '))"),
    # the gate-proven cosine pair (SparkEntry search_topk_sql + its oracle):
    # graft's codegen'd expression accumulates in double, bit-identical to
    # DuckDB's array_cosine_similarity over DOUBLE[64]
    ("array_cosine_distance(embedding, (SELECT embedding FROM q))",
     "1 - array_cosine_similarity(embedding::DOUBLE[64], "
     "(SELECT embedding FROM q)::DOUBLE[64])"),
]


def duck_chunks(w):
    """DuckDB list-slice replay of graft's codegen'd word_chunks(split(text,' '), w):
    non-overlapping w-token segments, partial tail kept."""
    return (f"list_transform(range(0, (len(string_split(text, ' ')) + {w - 1}) // {w}), "
            f"i -> array_to_string(string_split(text, ' ')[i*{w}+1:i*{w}+{w}], ' '))")


def to_duck(sql):
    for spark_form, duck_form in DUCK_REWRITES:
        sql = sql.replace(spark_form, duck_form)
    # the segment shape: word_chunks explode + per-doc chunk digest
    sql = re.sub(
        r"explode\(word_chunks\(split\(text, ' '\), (\d+)\)\)",
        lambda m: f"unnest({duck_chunks(int(m.group(1)))})",
        sql)
    sql = re.sub(
        r"concat_ws\('\|', word_chunks\(split\(text, ' '\), (\d+)\)\)",
        lambda m: f"array_to_string({duck_chunks(int(m.group(1)))}, '|')",
        sql)
    # Spark element_at(arr, i) is 1-based like DuckDB's arr[i]
    sql = re.sub(r"element_at\(embedding, (\d+)\)", r"embedding[\1]", sql)
    # Spark exact interpolated percentile == DuckDB quantile_cont
    sql = re.sub(r"\bpercentile\(", "quantile_cont(", sql)
    # the window_min shape's md5-derived long array and the winnowing
    # selection itself, replayed with list_transform / list_min
    sql = re.sub(
        r"transform\(sequence\(1, (\d+)\), i -> CAST\(conv\(substring\("
        r"md5\(concat\(CAST\(vec_id AS STRING\), '\|', CAST\(i AS STRING\)\)\)"
        r", 1, 15\), 16, 10\) AS BIGINT\)\)",
        lambda m: f"list_transform(range(1, {int(m.group(1)) + 1}), "
                  f"i -> ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '|' || "
                  f"CAST(i AS VARCHAR)), 1, 15))::BIGINT)",
        sql)
    sql = re.sub(
        r"explode\(window_min\(hs, (\d+)\)\)",
        lambda m: f"unnest(list_transform(range(1, greatest(len(hs)-"
                  f"{int(m.group(1)) - 1}, 0)+1), "
                  f"i -> list_min(hs[i:i+{int(m.group(1)) - 1}])))",
        sql)
    return sql


def gen_query():
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    all_shapes = ["agg", "agg", "filter_topk", "distinct", "join_agg",
                  "window", "window_frame", "setop", "json",
                  "having", "subquery", "rollup", "tokens",
                  "vector_topk", "lsh_bands", "percentile",
                  "window_min", "segment", "sessions"]
    # FUZZ_SHAPES=a,b focuses a run on one family (geometry sweeps);
    # unset = the full mixed sweep
    import os
    only = os.environ.get("FUZZ_SHAPES")
    if only:
        wanted = {s.strip() for s in only.split(",") if s.strip()}
        unknown = wanted - set(all_shapes)
        if unknown:
            raise SystemExit(f"FUZZ_SHAPES unknown: {sorted(unknown)}")
        all_shapes = [s for s in all_shapes if s in wanted]
    shape = rng.choice(all_shapes)
    if shape == "segment":
        # segmentDedup's chunk constructor + census geometry vs the DuckDB
        # list-slice replay: random window sizes (incl. window >> doc
        # length -> one partial segment), minDocs 2 vs 3, with and without
        # the null-text filter. The gate proves one (window, minDocs);
        # this sweeps the geometry of the codegen'd WordChunks expression
        # and the distinct-doc census it feeds.
        w = rng.choice([1, 2, 3, 4, 5, 7, 11, 23, 60, 200])
        pick = rng.random()
        if pick < 0.35:
            # per-doc segmentation digest: pins chunk CONTENT, order, and
            # the partial tail exactly (md5 of the '|'-joined chunk list)
            lim = rng.randint(50, 400)
            return (f"SELECT doc_id, md5(concat_ws('|', word_chunks(split(text, ' '), {w}))) AS dg "
                    f"FROM documents WHERE text IS NOT NULL "
                    f"ORDER BY doc_id LIMIT {lim}")
        md = rng.choice([2, 2, 3])
        nullf = " WHERE text IS NOT NULL" if rng.random() < 0.7 else ""
        # census: distinct-doc count per segment hash, joined back per doc
        return (f"WITH segs AS (SELECT doc_id, explode(word_chunks(split(text, ' '), {w})) AS seg "
                f"FROM documents{nullf}), "
                f"c AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM segs GROUP BY seg), "
                f"j AS (SELECT s.doc_id, CASE WHEN c.nd >= {md} THEN 1 ELSE 0 END AS isdup "
                f"FROM segs s JOIN c ON s.seg = c.seg) "
                f"SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments, "
                f"CAST(sum(isdup) AS BIGINT) AS n_dup "
                f"FROM j GROUP BY doc_id ORDER BY doc_id")
    if shape == "sessions":
        # gaps-and-islands sessionization over events with a RANDOM gap —
        # the geometry sweep behind the events_sessions/streamed_sessions
        # gates (which prove one 30-minute gap). New session iff
        # ts >= prev + gap (the session_window close rule); value sums in
        # DECIMAL so aggregation order can't drift; both engines parse the
        # ANSI INTERVAL '<n>' MINUTE literal. Timestamps ARE compared
        # (Spark's parquet output and DuckDB's computation both surface as
        # naive-UTC datetimes).
        g = rng.choice([1, 5, 15, 30, 60, 240, 1440])
        where = f" WHERE {predicate('events')}" if rng.random() < 0.4 else ""
        return (
            "WITH o AS ("
            "SELECT user_id, event_id, ts, CAST(value AS DECIMAL(18,2)) AS v, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts "
            f"FROM events{where}), "
            "m AS (SELECT user_id, event_id, ts, v, "
            f"CASE WHEN pts IS NULL OR ts >= pts + INTERVAL '{g}' MINUTE "
            "THEN 1 ELSE 0 END AS brk FROM o), "
            "s AS (SELECT user_id, ts, v, sum(brk) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS sid FROM m) "
            "SELECT user_id, sid, count(*) AS n_events, "
            "min(ts) AS session_start, max(ts) AS session_end, "
            "sum(v) AS session_value "
            "FROM s GROUP BY user_id, sid ORDER BY user_id, sid")
    if shape == "window_min":
        # the codegen'd winnowing selection expression vs a DuckDB
        # list_transform/list_min replay, over deterministic md5-derived
        # long arrays at random lengths and window widths (incl. n < w ->
        # empty); the gate proves one (k, w) — this sweeps the geometry
        n = rng.randint(5, 40)
        w = rng.randint(2, 6)
        lim = rng.randint(50, 400)
        return (f"WITH h AS (SELECT vec_id, transform(sequence(1, {n}), "
                f"i -> CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), "
                f"'|', CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT)) AS hs "
                f"FROM embeddings), "
                f"m AS (SELECT vec_id, explode(window_min(hs, {w})) AS fp FROM h) "
                f"SELECT vec_id, count(*) AS n, min(fp) AS mn, max(fp) AS mx, "
                f"count(DISTINCT fp) AS nd FROM m GROUP BY vec_id "
                f"ORDER BY vec_id LIMIT {lim}")
    if shape == "percentile":
        # exact interpolated percentile over INT columns at random q — the
        # q*(n-1) definition the ppl_buckets/adaptive_filter gates rely on
        # (Spark `percentile` vs DuckDB `quantile_cont`; the rewrite is in
        # to_duck). Int inputs convert to double exactly, so any
        # formula-level divergence (nearest-rank, off-by-one position)
        # surfaces past the comparator's epsilon.
        g = rng.choice(cols["str"])
        ic = rng.choice(cols["int"])
        q = rng.choice([0.1, 0.25, 1 / 3, 0.5, 2 / 3, 0.75, 0.9, 0.95])
        where = f" WHERE {predicate(t)}" if rng.random() < 0.5 else ""
        return (f"SELECT {g}, count(*) AS n, percentile({ic}, {q!r}) AS p "
                f"FROM {t}{where} GROUP BY {g} ORDER BY {g}")
    if shape == "vector_topk":
        # brute-force cosine top-k over a random corpus query vector, with
        # the total (distance, id) tie-break and an optional metadata
        # filter — the vector surface the gates prove bit-identical, here
        # exercised across random query points / k / predicates
        qid = rng.randint(0, 400)
        k = rng.randint(3, 40)
        where = ""
        pick = rng.random()
        if pick < 0.35:
            where = f" WHERE label = {rng.randint(0, 9)}"
        elif pick < 0.55:
            m = rng.randint(2, 5)
            where = f" WHERE vec_id % {m} = {rng.randint(0, m - 1)}"
        return (f"WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {qid}) "
                f"SELECT vec_id, array_cosine_distance(embedding, "
                f"(SELECT embedding FROM q)) AS d FROM embeddings{where} "
                f"ORDER BY d ASC NULLS LAST, vec_id ASC LIMIT {k}")
    if shape == "lsh_bands":
        # sign-LSH band over random dimensions: bucket by the concatenated
        # sign bits, then either the banded a<b candidate pair join (the
        # dedup-tier join shape) or the bucket histogram
        dims = rng.sample(range(1, 65), k=rng.randint(3, 6))
        bits = ", ".join(
            f"CASE WHEN element_at(embedding, {i}) > 0 THEN '1' ELSE '0' END"
            for i in dims)
        s_cte = f"WITH s AS (SELECT vec_id, concat({bits}) AS band FROM embeddings)"
        if rng.random() < 0.5:
            return (f"{s_cte} SELECT band, count(*) AS n FROM s "
                    f"GROUP BY band ORDER BY band")
        lim = rng.randint(50, 400)
        return (f"{s_cte} SELECT l.vec_id AS a, r.vec_id AS b, l.band AS band "
                f"FROM s l JOIN s r ON l.band = r.band AND l.vec_id < r.vec_id "
                f"ORDER BY a, b LIMIT {lim}")
    if shape == "rollup":
        # grouping sets over string keys; int sums stay exact. NULLS FIRST
        # is explicit: Spark defaults asc-nulls-first, DuckDB asc-nulls-last.
        # NO WHERE: ROLLUP over an EMPTY input is a genuine engine
        # divergence this fuzzer found (seed 777555) — DuckDB emits the
        # standard grand-total row (NULL, NULL, 0, NULL) like a global
        # aggregate, Spark emits zero rows — so the generator keeps the
        # input non-empty, like it avoids round() and division
        two = [x for x in TABLES if len(TABLES[x]["str"]) >= 2]
        t = rng.choice(two)
        cols = TABLES[t]
        g1, g2 = rng.sample(cols["str"], k=2)
        ic = rng.choice(cols["int"])
        return (f"SELECT {g1}, {g2}, count(*) AS n, sum({ic}) AS s FROM {t} "
                f"GROUP BY ROLLUP ({g1}, {g2}) "
                f"ORDER BY {g1} NULLS FIRST, {g2} NULLS FIRST")
    if shape == "tokens":
        # the split-on-single-space token convention every text oracle uses
        inner = "SELECT doc_id, explode(split(text, ' ')) AS tk FROM documents"
        pick = rng.random()
        if pick < 0.4:
            k = rng.randint(10, 60)
            return (f"SELECT tk, count(*) AS n, count(DISTINCT doc_id) AS df "
                    f"FROM ({inner}) GROUP BY tk ORDER BY n DESC, tk LIMIT {k}")
        if pick < 0.7:
            return (f"SELECT length(tk) AS l, count(*) AS n FROM ({inner}) "
                    f"GROUP BY length(tk) ORDER BY l")
        lo = rng.randint(1, 6)
        return (f"SELECT doc_id, count(*) AS n FROM ({inner}) "
                f"WHERE length(tk) >= {lo} GROUP BY doc_id ORDER BY doc_id")
    if shape == "having":
        g = rng.choice(cols["str"])
        ic = rng.choice(cols["int"] + cols["num"])
        where = f" WHERE {predicate(t)}" if rng.random() < 0.5 else ""
        cond = rng.choice([f"count(*) >= {rng.randint(2, 50)}",
                           f"min({ic}) > {rng.randint(0, 500)}"])
        return (f"SELECT {g}, count(*) AS n FROM {t}{where} "
                f"GROUP BY {g} HAVING {cond} ORDER BY {g}")
    if shape == "subquery":
        # correlated EXISTS / uncorrelated IN over the join graph
        a, b, cond = rng.choice(JOINS)
        if b not in TABLES:
            a, b, cond = JOINS[0]
        sel = rng.choice(TABLES[a]["str"])
        neg = rng.choice(["", "NOT "])
        if rng.random() < 0.5:
            sub = f"SELECT 1 FROM {b} WHERE {cond} AND {predicate(b)}"
            where = f"{neg}EXISTS ({sub})"
        else:
            lk, rk = cond.split(" = ")
            sub = f"SELECT {rk} FROM {b} WHERE {predicate(b)}"
            where = f"{lk} {neg}IN ({sub})"
        return (f"SELECT {sel}, count(*) AS n FROM {a} WHERE {where} "
                f"GROUP BY {sel} ORDER BY {sel}")
    if shape == "json":
        # JSON property extraction over the events props payload; the value
        # is an integer, so aggregates stay exact across engines
        where = f" WHERE {predicate('events')}" if rng.random() < 0.6 else ""
        agg = rng.choice([
            "sum(CAST(get_json_object(props, '$.k') AS BIGINT))",
            "max(CAST(get_json_object(props, '$.k') AS BIGINT))",
            "count(get_json_object(props, '$.k'))"])
        return (f"SELECT event_type, count(*) AS n, {agg} AS j "
                f"FROM events{where} GROUP BY event_type ORDER BY event_type")
    if shape == "window_frame":
        # running/banded frames over INT columns only: frame sums must be
        # exact, not subject to per-engine float association in segment trees
        g = rng.choice(cols["str"])
        ic = rng.choice(cols["int"])
        frame = rng.choice([
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {rng.randint(1, 3)} PRECEDING AND CURRENT ROW"])
        fn = rng.choice([f"sum({ic})", f"min({ic})", f"count({ic})"])
        expr = f"{fn} OVER (PARTITION BY {g} ORDER BY {cols['key']} {frame})"
        if rng.random() < 0.3:
            expr = f"lag({ic}, 1) OVER (PARTITION BY {g} ORDER BY {cols['key']})"
        where = f" WHERE {predicate(t)}" if rng.random() < 0.5 else ""
        return (f"SELECT {g}, {ic}, {expr} AS w FROM {t}{where} "
                f"ORDER BY {cols['key']}")
    if shape == "setop":
        op = rng.choice(["INTERSECT", "EXCEPT", "UNION"])
        sel = ", ".join(rng.sample(cols["int"] + cols["str"], k=rng.randint(1, 2)))
        n_cols = sel.count(",") + 1
        order = ", ".join(str(i + 1) for i in range(n_cols))
        return (f"SELECT {sel} FROM {t} WHERE {predicate(t)} {op} "
                f"SELECT {sel} FROM {t} WHERE {predicate(t)} ORDER BY {order}")
    if shape == "join_agg":
        a, b, cond = rng.choice(JOINS)
        g = rng.choice(TABLES[a]["str"] if rng.random() < 0.5 and a in TABLES
                       else TABLES[b]["str"] if b in TABLES else TABLES[a]["str"])
        c = rng.choice(TABLES[a]["num"])
        where = f" AND {predicate(a)}" if rng.random() < 0.5 else ""
        # raw doubles, no round(): round(x, n) is engine-divergent when the
        # exact value sits on a decimal boundary (e.g. avg = 962.98124999...
        # rounds to .9812 on Spark's exact-BigDecimal path and .9813 in
        # DuckDB) — the comparator's float epsilon is the right equality
        return (f"SELECT {g}, count(*) AS n, sum({c}) AS s "
                f"FROM {a} JOIN {b} ON {cond}{where} GROUP BY {g} ORDER BY {g}")
    if shape == "window":
        g = rng.choice(cols["str"])
        o = rng.choice(cols["num"] + cols["int"])
        k = rng.randint(1, 3)
        return (f"SELECT {g}, {o}, rn FROM ("
                f"SELECT {g}, {o}, row_number() OVER (PARTITION BY {g} "
                f"ORDER BY {o} DESC, {cols['key']}) AS rn FROM {t}) "
                f"WHERE rn <= {k} ORDER BY {g}, rn")
    if shape == "agg":
        g = rng.choice(cols["str"])
        aggs = []
        for i in range(rng.randint(1, 3)):
            c = rng.choice(cols["num"] + cols["int"])
            fn = rng.choice(["sum", "min", "max", "avg", "count"])
            # no round() — see the join_agg comment on boundary divergence
            aggs.append(f"{fn}({c}) AS a{i}")
        where = f" WHERE {predicate(t)}" if rng.random() < 0.7 else ""
        return (f"SELECT {g}, count(*) AS n, {', '.join(aggs)} FROM {t}{where} "
                f"GROUP BY {g} ORDER BY {g}")
    if shape == "filter_topk":
        pool = cols["int"] + cols["str"] + cols["num"]
        sel = rng.sample(pool, k=rng.randint(2, min(4, len(pool))))
        ordc = rng.choice(sel)
        return (f"SELECT {', '.join(sel)} FROM {t} WHERE {predicate(t)} "
                f"ORDER BY {ordc} {rng.choice(['ASC', 'DESC'])}, {cols['key']} LIMIT {rng.randint(5, 50)}")
    g = rng.choice(cols["str"])
    return (f"SELECT DISTINCT {g} FROM {t} WHERE {predicate(t)} ORDER BY {g}")


def close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def main():
    queries = [gen_query() for _ in range(N)]
    work = Path(tempfile.mkdtemp(prefix="graft_fuzz_"))
    sql_file = work / "queries.sql"
    sql_file.write_text("\n".join(queries))
    out = work / "out"
    print(f"running {N} queries (seed {SEED}) via SqlRunner -> {out}")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.SqlRunner {SFDIR} {sql_file} {out}"],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print("SqlRunner failed:", r.stdout[-2000:], r.stderr[-500:])
        sys.exit(2)

    con = duckdb.connect()
    for t in set(TABLES) | {"region", "nation", "supplier", "documents", "embeddings", "events"}:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")
    n_pass = n_fail = 0
    for i, sql in enumerate(queries):
        err = out / f"q{i}.error"
        if err.exists():
            print(f"FAIL q{i}: spark error: {err.read_text()[:120]}\n  SQL: {sql}")
            n_fail += 1
            continue
        s_rel = con.execute(f"SELECT * FROM read_parquet('{out}/q{i}/*.parquet')")
        s_cols = [d[0] for d in s_rel.description]
        s_rows = s_rel.fetchall()
        try:
            d_rel = con.execute(to_duck(sql))
            d_cols = [d[0] for d in d_rel.description]
            d_rows = d_rel.fetchall()
        except Exception as e:
            print(f"FAIL q{i}: duckdb error: {str(e)[:120]}\n  SQL: {sql}")
            n_fail += 1
            continue
        # Sort key: floats through %.6g so a last-ULP difference between the
        # engines cannot reorder the two sorted lists (a raw str() key did —
        # r2 ADVICE); non-floats compare exactly.
        def cell_key(x):
            if x is None:
                return (True, "")
            if isinstance(x, float):
                return (False, f"{x:.6g}")
            return (False, str(x))
        key = lambda r: tuple(cell_key(x) for x in r)
        si = [s_cols.index(c) for c in sorted(s_cols)]
        di = [d_cols.index(c) for c in sorted(d_cols)]
        s_sorted = sorted([tuple(r[j] for j in si) for r in s_rows], key=key)
        d_sorted = sorted([tuple(r[j] for j in di) for r in d_rows], key=key)
        ok = (sorted(s_cols) == sorted(d_cols) and len(s_sorted) == len(d_sorted)
              and all(close(a, b) for sr, dr in zip(s_sorted, d_sorted)
                      for a, b in zip(sr, dr)))
        if not ok and sorted(s_cols) == sorted(d_cols) \
                and len(s_sorted) == len(d_sorted) and len(s_sorted) <= 5000:
            # positional compare failed — rule out residual sort-boundary
            # noise with tolerance-aware multiset matching before declaring
            # an engine mismatch
            remaining = list(d_sorted)
            def take(sr):
                for idx, dr in enumerate(remaining):
                    if all(close(a, b) for a, b in zip(sr, dr)):
                        remaining.pop(idx)
                        return True
                return False
            ok = all(take(sr) for sr in s_sorted)
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL q{i}: mismatch rows spark={len(s_sorted)} duck={len(d_sorted)}\n  SQL: {sql}")
            for sr, dr in list(zip(s_sorted, d_sorted))[:3]:
                if not all(close(a, b) for a, b in zip(sr, dr)):
                    print(f"    spark={sr}\n    duck ={dr}")
                    break
    print(f"== fuzz: {n_pass} pass, {n_fail} fail (seed {SEED}, n {N}) ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
