"""Generate a scaled-up benchmark dataset by key-shifted replication.

The driver ships sf0.001/0.01/0.1 only; the 100 TB story needs at least
one measured datapoint above the correctness scale (r6 verdict item 5).
This tool builds ``.scratch/sf<N>`` inside the repo (NEVER under
/root/testdata — that tree is read-only) from sf0.1, multiplying every
non-dimension table by ``factor`` copies with all entity keys shifted by
``copy * 10_000_000`` — foreign-key joins keep their exact cardinality
ratios, group-by keys keep their distributions, dims (region/nation)
stay fixed, so every relational plan sees a faithful 10x fact volume.

Two tables need DECORRELATION, not plain copies, or the similarity
surface would measure an artifact (every doc having `factor` near-exact
twins makes LSH bucket pairs grow quadratically in the copy count —
a duplication property of the copier, not of a 10x corpus):

- ``documents``: each copy suffixes a hash-chosen half of the words with
  a copy tag — Jaccard between copies drops to ~1/3, below every
  near-dup threshold in the repo, while length/token distributions stay
  intact.
- ``embeddings``: each copy rotates the vector by ``copy`` positions —
  norm-preserving, and a rotation of a high-dimensional vector is
  effectively a fresh random direction, so cosine structure scales
  instead of duplicating.

Usage: ``python tools/gen_scaled_sf.py [factor] [table,table,...]``
(default 10 → sf1, all tables). The optional table list restricts output
(e.g. ``documents,embeddings`` for the similarity-family decades at
sf3/sf10 without copying the relational tables). Scratch output is
gitignored; regenerate at will (deterministic).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"sf{factor / 10:g}".replace(".0", ""),
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def emit(table: str, select_sql: str) -> None:
        if only is not None and table not in only:
            return
        path = os.path.join(out, f"{table}.parquet")
        con.execute(f"COPY ({select_sql}) TO '{path}' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{path}')").fetchone()[0]
        print(f"{table}: {n} rows")

    copies = f"(SELECT unnest(range({factor})) AS cp)"

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

    for t, keys in KEY_COLS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + cp * {OFF} AS {c}" if c in keys else c for c in cols
        )
        emit(t, f"SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), {copies}")

    # documents: shift doc_id, decorrelate text per copy (hash-chosen half
    # of the words get a copy suffix), keep n_chars consistent with text
    emit(
        "documents",
        f"""
        WITH base AS (
          SELECT doc_id, text, lang, source
          FROM read_parquet('{SRC}/documents.parquet')),
        scaled AS (
          SELECT doc_id + cp * {OFF} AS doc_id,
                 CASE WHEN cp = 0 THEN text
                      ELSE array_to_string(
                        list_transform(
                          string_split(text, ' '),
                          (w, j) -> CASE WHEN hash(w || ':' || j) % 2 = 0
                                    THEN w || 'x' || cp ELSE w END),
                        ' ')
                 END AS text,
                 lang, source
          FROM base, {copies})
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM scaled
        """,
    )

    # embeddings: shift vec_id, rotate the vector by cp MOD dim positions,
    # then (for cp >= dim, where the rotation alone would wrap back to the
    # identity and plant exact duplicates — an artifact, not corpus
    # structure) apply a per-generation deterministic sign pattern keyed by
    # cp // dim. Both transforms are norm-preserving; a sign-flipped
    # rotation of a high-dimensional vector is effectively a fresh random
    # direction. cp = 0..dim-1 keeps the original sf1-pass semantics.
    emit(
        "embeddings",
        f"""
        WITH rot AS (
          SELECT vec_id + cp * {OFF} AS vec_id,
                 cp,
                 CASE WHEN cp % 64 = 0 THEN embedding
                      ELSE embedding[(cp % 64) + 1:len(embedding)]
                           || embedding[1:(cp % 64)]
                 END AS emb,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'), {copies})
        SELECT vec_id,
               CASE WHEN cp < 64 THEN emb
                    ELSE list_transform(
                      emb,
                      (x, j) -> CASE WHEN hash((cp // 64) || ':' || j) % 2 = 0
                                THEN x ELSE -x END)
               END AS embedding,
               label
        FROM rot
        """,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
