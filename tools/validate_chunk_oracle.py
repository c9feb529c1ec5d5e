#!/usr/bin/env python3
"""Pre-flight for the x09 chunker oracle: replicates Chunker.semantic
(semantic_search.py:137-170 semantics) in Python, runs the candidate
DuckDB recursive-CTE oracle over the documents parquet, and compares
(doc_id, chunk_idx, n_chars, chunk_md5) multisets exactly.

Usage: python3 tools/validate_chunk_oracle.py /root/testdata/sf0.01 [...]
"""
import hashlib
import sys

import duckdb
import pandas as pd

PY_WS = set(" \t\n\x0b\f\r\x1c\x1d\x1e\x1f\x85")


def py_strip(s):
    i, j = 0, len(s)
    while i < j and s[i] in PY_WS:
        i += 1
    while j > i and s[j - 1] in PY_WS:
        j -= 1
    return s[i:j]


def chunk_semantic(text, chunk_size=512, overlap_words=50):
    if text is None or len(py_strip(text)) < 10:
        return []
    words = text.split()
    chunks = []
    current = []
    current_len = 0
    for word in words:
        if current_len + len(word) + 1 > chunk_size:
            if current:
                chunks.append(" ".join(current))
                overlap = current[-overlap_words:]
                current = overlap + [word]
                current_len = sum(len(w) for w in current) + len(current)
            else:
                current = [word]
                current_len = len(word)
        else:
            current.append(word)
            current_len += len(word) + 1
    if current:
        chunks.append(" ".join(current))
    return chunks


ORACLE_SQL = r"""
WITH RECURSIVE
doc AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     w -> w <> '') AS ws
  FROM documents
  WHERE length(trim(coalesce(text, ''),
               ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))) >= 10
),
w AS (
  SELECT doc_id, word, idx, CAST(length(word) AS BIGINT) AS len
  FROM (
    SELECT doc_id, unnest(ws) AS word,
           CAST(unnest(range(len(ws))) AS BIGINT) AS idx
    FROM doc
  )
),
cum AS (
  SELECT doc_id, idx, len,
         coalesce(sum(len) OVER (PARTITION BY doc_id ORDER BY idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS plen
  FROM w
),
nw AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id),
st AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS cs,
         CAST(0 AS BIGINT) AS cur_len,
         CAST(NULL AS BIGINT) AS e_start, CAST(NULL AS BIGINT) AS e_end
  FROM doc
  UNION ALL
  SELECT st.doc_id,
         st.i + 1,
         CASE WHEN c.len + st.cur_len + 1 > 512 AND st.i > st.cs
                THEN greatest(st.cs, st.i - 50)
              ELSE st.cs END,
         CASE WHEN c.len + st.cur_len + 1 > 512 AND st.i > st.cs
                THEN (c.plen - o.plen) + c.len
                     + (st.i - greatest(st.cs, st.i - 50)) + 1
              WHEN c.len + st.cur_len + 1 > 512
                THEN c.len
              ELSE st.cur_len + c.len + 1 END,
         CASE WHEN c.len + st.cur_len + 1 > 512 AND st.i > st.cs
                THEN st.cs ELSE NULL END,
         CASE WHEN c.len + st.cur_len + 1 > 512 AND st.i > st.cs
                THEN st.i ELSE NULL END
  FROM st
  JOIN cum c ON c.doc_id = st.doc_id AND c.idx = st.i
  JOIN cum o ON o.doc_id = st.doc_id
            AND o.idx = greatest(st.cs, st.i - 50)
),
bounds AS (
  SELECT doc_id, e_start AS s, e_end AS e, e_end AS ord
  FROM st WHERE e_start IS NOT NULL
  UNION ALL
  SELECT st.doc_id, st.cs, nw.n, nw.n + 1
  FROM st JOIN nw ON nw.doc_id = st.doc_id
  WHERE st.i = nw.n AND nw.n > st.cs
),
chunks AS (
  SELECT b.doc_id, b.ord,
         string_agg(w.word, ' ' ORDER BY w.idx) AS chunk
  FROM bounds b
  JOIN w ON w.doc_id = b.doc_id AND w.idx >= b.s AND w.idx < b.e
  GROUP BY b.doc_id, b.ord
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1
            AS INT) AS chunk_idx,
       CAST(length(chunk) AS INT) AS n_chars,
       md5(chunk) AS chunk_md5
FROM chunks
"""


def main():
    ok = True
    for sf_dir in sys.argv[1:]:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
        # the oracle's '\s+' split only mirrors Py.splitWs when no document
        # carries whitespace outside the RE2 \s set (VT, FS..US, NEL)
        odd = con.sql(
            r"SELECT count(*) FROM documents "
            r"WHERE text ~ '.*[\x0b\x1c-\x1f\x85].*'").fetchone()[0]
        if odd:
            print(f"{sf_dir}: {odd} docs carry non-RE2 whitespace "
                  "— oracle split would diverge from Py.splitWs")
            ok = False
        duck = con.sql(ORACLE_SQL).df()

        rows = con.sql(
            "SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
        exp = []
        for doc_id, text in rows:
            for i, c in enumerate(chunk_semantic(text)):
                exp.append((int(doc_id), i, len(c),
                            hashlib.md5(c.encode()).hexdigest()))
        expected = pd.DataFrame(
            exp, columns=["doc_id", "chunk_idx", "n_chars", "chunk_md5"])

        key = ["doc_id", "chunk_idx", "n_chars", "chunk_md5"]
        a = duck[key].sort_values(key, ignore_index=True)
        b = expected.sort_values(key, ignore_index=True)
        match = len(a) == len(b) and a.equals(
            b.astype({c: a[c].dtype for c in key}))
        print(f"{sf_dir}: sql={len(a)} py={len(b)} match={match}")
        if not match:
            ok = False
            merged = a.merge(b, how="outer", indicator=True)
            print(merged[merged["_merge"] != "both"].head(20))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
