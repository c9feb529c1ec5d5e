#!/usr/bin/env python3
"""Pre-flight for the x19 top-n-gram repetition oracle: replicates
TextAnalysis.topNgramCharFractions234 in Python, runs the candidate
DuckDB SQL over the documents parquet, and compares the aggregate row
(n_docs, n_kept, max_top2, max_top4) exactly.

Usage: python3 tools/validate_ngram_oracle.py /root/testdata/sf0.01 [...]
"""
import sys

import duckdb


def fractions(text):
    toks = (text or "").lower().split()
    nt = len(toks)
    if nt < 2:
        return (0.0, 0.0, 0.0)
    total = sum(len(t) for t in toks) + (nt - 1)
    out = []
    for n in (2, 3, 4):
        if nt < n:
            out.append(0.0)
            continue
        counts = {}
        for j in range(nt - n + 1):
            g = " ".join(toks[j:j + n])
            counts[g] = counts.get(g, 0) + 1
        best_c = max(counts.values())
        if best_c <= 1:
            out.append(0.0)
            continue
        best = min(g for g, c in counts.items() if c == best_c)
        out.append((best_c * len(best)) / total)
    return tuple(out)


ORACLE_SQL = r"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                     w -> w <> '') AS ws
  FROM documents
),
sized AS (
  SELECT id, ws, len(ws) AS nt,
         list_sum(list_transform(ws, w -> length(w))) + (len(ws) - 1) AS total
  FROM base
),
grams AS (
  SELECT s.id, n.n, s.total,
         unnest(list_transform(range(1, s.nt - n.n + 2),
                j -> array_to_string(s.ws[j:j + n.n - 1], ' '))) AS gram
  FROM sized s, (VALUES (2), (3), (4)) n(n)
  WHERE s.nt >= 2 AND s.nt >= n.n
),
counts AS (
  SELECT id, n, total, gram, count(*) AS c
  FROM grams GROUP BY id, n, total, gram
),
best AS (
  SELECT id, n,
         CASE WHEN c <= 1 THEN 0.0
              ELSE CAST(c * length(gram) AS DOUBLE) / CAST(total AS DOUBLE)
         END AS f
  FROM counts
  QUALIFY row_number() OVER (PARTITION BY id, n ORDER BY c DESC, gram) = 1
),
per AS (
  SELECT b.id,
         coalesce(max(CASE WHEN t.n = 2 THEN t.f END), 0.0) AS top2,
         coalesce(max(CASE WHEN t.n = 3 THEN t.f END), 0.0) AS top3,
         coalesce(max(CASE WHEN t.n = 4 THEN t.f END), 0.0) AS top4
  FROM base b LEFT JOIN best t ON t.id = b.id
  GROUP BY b.id
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN top2 <= 0.20 AND top3 <= 0.18 AND top4 <= 0.16
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(max(top2), 4) AS max_top2,
       round(max(top4), 4) AS max_top4
FROM per
"""


def main():
    ok = True
    for sf_dir in sys.argv[1:]:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
        duck = con.sql(ORACLE_SQL).fetchone()

        rows = con.sql("SELECT doc_id, text FROM documents").fetchall()
        fr = [fractions(t) for _, t in rows]
        n_docs = len(fr)
        n_kept = sum(1 for f2, f3, f4 in fr
                     if f2 <= 0.20 and f3 <= 0.18 and f4 <= 0.16)
        max2 = round(max(f[0] for f in fr), 4)
        max4 = round(max(f[2] for f in fr), 4)
        exp = (n_docs, n_kept, max2, max4)
        got = (duck[0], duck[1], duck[2], duck[3])
        match = exp == got
        print(f"{sf_dir}: sql={got} py={exp} match={match}")
        if not match:
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
