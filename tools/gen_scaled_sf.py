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
- ``embeddings``: each copy cp >= 1 applies a PER-COPY seeded random
  signed coordinate permutation (orthogonal, norm-preserving; cp = 0 is
  the identity). Same-copy pairs of different bases keep their exact
  base cosines (orthogonal invariance — the genuine pair structure
  replicates linearly); different-copy pairs differ by a random signed
  permutation and are distributed like independent random directions.

  The r8 scheme (rotation by cp%64 + a sign flip keyed by cp//64) is
  gone: rotations preserve coordinate adjacency (measured lag
  correlations to 0.54 on real sf0.1 data) and the fixed per-generation
  flip made cp=r vs cp=64+r pairs systematically correlated (~0.73 —
  the r8 ADVICE finding).

  What "decorrelated" can honestly mean here: the base embeddings are
  ISOTROPIC in d=64 (measured cos std = 1/8 = the random-direction
  value, effective rank 62/64), so ANY norm-preserving scheme leaves
  cross-copy cosines distributed N(0, 1/d) — over ~1e7 copy pairs the
  tail ABOVE the repo's 0.40 near-dup threshold is ~5e-4 of pairs by
  construction of the threshold (3.2 sigma), identical to the base
  corpus's own random tail (measured 4.6e-4). The generator therefore
  asserts the achievable property: copy-pair cos>=0.40 rate within the
  i.i.d. envelope (<= 2e-3) and NO artifact cluster above 0.70
  (count <= 50 vs ~7e4 under the r8 bug). A "max pairwise ~= 0" claim
  is mathematically impossible at this dimensionality and pair count.

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

    # embeddings: shift vec_id; copy cp applies a per-copy seeded random
    # SIGNED PERMUTATION of the 64 coordinates (cp = 0 identity — byte-
    # exact originals). Permutation + sign tables are computed in numpy
    # (fixed seeds — deterministic across runs) and joined in as a copy-
    # keyed map; the output position j takes sgn[j] * emb[idx[j]].
    # float32 -> float64 -> negate -> float32 is value-exact, so norms
    # and same-copy cosines are bit-identical to the base corpus.
    if only is None or "embeddings" in only:
        import numpy as np

        cp_rows = []
        for cp in range(factor):
            if cp == 0:
                idx = list(range(1, 65))
                sgn = [1.0] * 64
            else:
                idx = (
                    np.random.default_rng(10_000 + cp).permutation(64) + 1
                ).tolist()
                sgn = (
                    np.random.default_rng(20_000 + cp)
                    .choice([-1.0, 1.0], 64)
                    .tolist()
                )
            cp_rows.append((cp, idx, sgn))
        con.execute("CREATE OR REPLACE TABLE cp_map (cp BIGINT, idx BIGINT[], sgn DOUBLE[])")
        con.executemany("INSERT INTO cp_map VALUES (?, ?, ?)", cp_rows)
        emit(
            "embeddings",
            f"""
            SELECT e.vec_id + m.cp * {OFF} AS vec_id,
                   CASE WHEN m.cp = 0 THEN e.embedding
                        ELSE CAST(list_transform(range(1, 65),
                               j -> m.sgn[j] * e.embedding[m.idx[j]])
                             AS FLOAT[])
                   END AS embedding,
                   e.label
            FROM read_parquet('{SRC}/embeddings.parquet') e, cp_map m
            """,
        )
        _verify_embedding_decorrelation(con, out, factor)
    print(f"wrote {out}")


def _verify_embedding_decorrelation(con, out: str, factor: int) -> None:
    """Assert the achievable decorrelation property on the WRITTEN data
    (see module docstring): copy-pair cosines behave like independent
    random directions — tail rate at the 0.40 threshold inside the
    i.i.d. envelope, and no artifact cluster above 0.70 (the r8
    fixed-sign-flip bug planted ~36 pairs per base at ~0.73)."""
    import numpy as np

    if factor < 2:
        return
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{out}/embeddings.parquet')"
    ).fetchall()
    by_base: dict[int, list] = {}
    for vid, emb in rows:
        by_base.setdefault(vid % OFF, []).append(emb)
    n_pairs = 0
    n_over_thr = 0
    n_over_70 = 0
    for copies_of_base in by_base.values():
        c = np.array(copies_of_base, dtype=np.float64)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        g = np.abs(c @ c.T)
        iu = np.triu_indices(len(c), 1)
        v = g[iu]
        n_pairs += v.size
        n_over_thr += int((v >= 0.40).sum())
        n_over_70 += int((v >= 0.70).sum())
    rate = n_over_thr / max(n_pairs, 1)
    print(
        f"embeddings decorrelation: {n_pairs} copy pairs, "
        f"|cos|>=0.40 rate {rate:.2e} (i.i.d. envelope <= 2e-3), "
        f"|cos|>=0.70 count {n_over_70} (<= 50)"
    )
    assert rate <= 2e-3, (
        f"copy-pair |cos|>=0.40 rate {rate:.2e} exceeds the i.i.d. "
        "random-direction envelope — the copier is planting correlation"
    )
    assert n_over_70 <= 50, (
        f"{n_over_70} copy pairs with |cos|>=0.70 — artifact cluster "
        "(r8 sign-flip-style bug), not a random tail"
    )


if __name__ == "__main__":
    main()
