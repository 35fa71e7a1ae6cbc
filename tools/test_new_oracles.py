#!/usr/bin/env python3
"""Dev-only: mirror SparkEntry's new unrolled-oracle builders and diff
them against an existing Verify dump, without a Spark round-trip.
Usage: python3 tools/test_new_oracles.py <sfDir> <verifyOutDir>
"""
import sys, glob, os
import duckdb
import pandas as pd

GRAPH_CTE = """WITH e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY 1)
"""


def cc_unrolled(rounds):
    out = (", symp AS (SELECT src, dst FROM sym UNION ALL SELECT id, id FROM deg)\n"
           ", c0 AS (SELECT id, id AS lbl FROM deg)\n")
    for i in range(1, rounds + 1):
        out += f""", c{i} AS (
  SELECT s.src AS id, min(n.lbl) AS lbl
  FROM symp s JOIN c{i-1} n ON n.id = s.dst
  GROUP BY s.src)
"""
    return out


def lpa_unrolled(iters):
    out = ", l0 AS (SELECT id, id AS label FROM deg)\n"
    for i in range(1, iters + 1):
        out += f""", n{i} AS (
  SELECT s.src AS id, l.label, count(*) AS cnt
  FROM sym s JOIN l{i-1} l ON l.id = s.dst
  GROUP BY s.src, l.label)
, l{i} AS (
  SELECT id, label FROM (
    SELECT id, label, row_number() OVER (
      PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
    FROM n{i}) WHERE rn = 1)
"""
    return out


def pr_unrolled(iters, personalized):
    if personalized:
        init = ("SELECT d.id, CASE WHEN d.id = (SELECT id FROM srcv) "
                "THEN 1.0 ELSE 0.0 END AS rank FROM deg d")
        teleport = "(CASE WHEN d.id = (SELECT id FROM srcv) THEN 0.15 ELSE 0.0 END)"
    else:
        init = "SELECT id, 1.0 AS rank FROM deg"
        teleport = "0.15"
    out = f", r0 AS ({init})\n"
    for i in range(1, iters + 1):
        out += f""", r{i} AS (
  SELECT d.id, {teleport} + 0.85 * coalesce(acc.a, 0.0) AS rank
  FROM deg d LEFT JOIN (
    SELECT s.dst AS id, sum(r.rank / dg.degree) AS a
    FROM sym s JOIN r{i-1} r ON r.id = s.src
    JOIN deg dg ON dg.id = s.src
    GROUP BY s.dst) acc ON acc.id = d.id)
"""
    return out


def kcore_unrolled(rounds, k):
    out = ", ke0 AS MATERIALIZED (SELECT src, dst FROM e)\n"
    for i in range(1, rounds + 1):
        out += f""", kk{i} AS MATERIALIZED (
  SELECT src AS id FROM (
    SELECT src, dst FROM ke{i-1}
    UNION ALL SELECT dst, src FROM ke{i-1})
  GROUP BY src HAVING count(*) >= {k})
, ke{i} AS MATERIALIZED (
  SELECT t.src, t.dst FROM ke{i-1} t
  JOIN kk{i} a ON a.id = t.src
  JOIN kk{i} b ON b.id = t.dst)
"""
    return out


ORACLES = {
    "g_connected_components": GRAPH_CTE + cc_unrolled(8) +
        "SELECT id, lbl AS component FROM c8 ORDER BY id",
    "g_component_sizes": GRAPH_CTE + cc_unrolled(8) +
        """, comp AS (SELECT lbl, count(*) AS size FROM c8 GROUP BY lbl)
SELECT size, count(*) AS n_components FROM comp
GROUP BY size ORDER BY size""",
    "g_label_propagation": GRAPH_CTE + lpa_unrolled(5) +
        """SELECT id, dense_rank() OVER (ORDER BY label) - 1 AS community
FROM l5 ORDER BY id""",
    "g_community_count": GRAPH_CTE + lpa_unrolled(5) +
        "SELECT count(DISTINCT label) AS n_communities FROM l5",
    "g_modularity": GRAPH_CTE + lpa_unrolled(5) +
        """, mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM e)
, intra AS (
  SELECT la.label AS c, count(*) AS e_c
  FROM e JOIN l5 la ON la.id = e.src JOIN l5 lb ON lb.id = e.dst
  WHERE la.label = lb.label GROUP BY la.label)
, dc AS (
  SELECT l.label AS c, CAST(sum(d.degree) AS DOUBLE) AS d_c
  FROM deg d JOIN l5 l ON l.id = d.id GROUP BY l.label)
SELECT round(sum(coalesce(i.e_c, 0) / (SELECT m FROM mm)
  - pow(dc.d_c / (2 * (SELECT m FROM mm)), 2)), 6) AS modularity
FROM dc LEFT JOIN intra i ON i.c = dc.c""",
    "g_pagerank": GRAPH_CTE + pr_unrolled(10, False) +
        "SELECT id, round(rank, 6) AS pagerank FROM r10 ORDER BY id",
    "g_personalized_pagerank": GRAPH_CTE +
        ", srcv AS (SELECT id FROM deg ORDER BY degree DESC, id LIMIT 1)\n" +
        pr_unrolled(10, True) +
        "SELECT id, round(rank, 6) AS ppr FROM r10 ORDER BY id",
    "g_kcore": GRAPH_CTE + kcore_unrolled(10, 4) +
        """SELECT id, 4 AS k FROM (
  SELECT src AS id FROM ke10 UNION SELECT dst AS id FROM ke10)
GROUP BY id ORDER BY id""",
    "g_eccentricity": """WITH RECURSIVE e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY 1),
lm AS (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 8),
bfs(landmark, v, dist) AS (
  SELECT id, id, 0 FROM lm
  UNION
  SELECT b.landmark, s.dst, b.dist + 1
  FROM bfs b JOIN sym s ON s.src = b.v WHERE b.dist < 25),
md AS (
  SELECT landmark, v, min(dist) AS dist FROM bfs GROUP BY 1, 2)
SELECT landmark, max(dist) AS eccentricity FROM md
GROUP BY landmark ORDER BY landmark""",
    "g_diameter": """WITH RECURSIVE e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY 1),
lm1 AS (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1),
b1(v, dist) AS (
  SELECT id, 0 FROM lm1
  UNION
  SELECT s.dst, b.dist + 1
  FROM b1 b JOIN sym s ON s.src = b.v WHERE b.dist < 25),
b1m AS (SELECT v, min(dist) AS dist FROM b1 GROUP BY v),
far AS (SELECT v FROM b1m ORDER BY dist DESC, v ASC LIMIT 1),
b2(v, dist) AS (
  SELECT v, 0 FROM far
  UNION
  SELECT s.dst, b.dist + 1
  FROM b2 b JOIN sym s ON s.src = b.v WHERE b.dist < 25),
b2m AS (SELECT v, min(dist) AS dist FROM b2 GROUP BY v)
SELECT max(dist) AS diameter_lower_bound FROM b2m""",
    "d_lang_id": """WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks
  FROM documents),
s AS (
  SELECT doc_id, 'de' AS lang, round(len(list_filter(toks, x -> x IN
    ('der','die','das','und','ist','nicht','ein','zu')))::DOUBLE
    / len(toks), 4) AS score FROM t
  UNION ALL
  SELECT doc_id, 'en', round(len(list_filter(toks, x -> x IN
    ('the','a','of','and','to','in','is','that')))::DOUBLE
    / len(toks), 4) FROM t
  UNION ALL
  SELECT doc_id, 'es', round(len(list_filter(toks, x -> x IN
    ('el','la','los','y','es','un','una','que')))::DOUBLE
    / len(toks), 4) FROM t
  UNION ALL
  SELECT doc_id, 'fr', round(len(list_filter(toks, x -> x IN
    ('le','la','les','et','est','un','une','dans')))::DOUBLE
    / len(toks), 4) FROM t),
b AS (
  SELECT doc_id, lang, score, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
  FROM s)
SELECT doc_id,
  CASE WHEN score >= 0.02 THEN lang ELSE 'und' END AS lang_pred,
  score AS lang_score
FROM b WHERE rn = 1 ORDER BY doc_id""",
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    for name, sql in ORACLES.items():
        import time
        t0 = time.time()
        try:
            want = norm(con.execute(sql).fetchdf())
        except Exception as ex:
            print(f"[new-oracle] {name}: SQL ERROR {ex}")
            fails += 1
            continue
        dt = time.time() - t0
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        status = "OK"
        if list(got.columns) != list(want.columns):
            status = f"COLS got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWS got={len(got)} want={len(want)}"
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, rtol=0, atol=0)
            except AssertionError as e:
                status = "VALUES: " + str(e).split("\n")[0]
                neq = (got != want) & ~(got.isna() & want.isna())
                bad = neq.any(axis=1)
                print(got[bad].head(3))
                print(want[bad].head(3))
        print(f"[new-oracle] {name}: {len(got)} rows {status} ({dt:.1f}s)")
        if status != "OK":
            fails += 1
    return fails


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
