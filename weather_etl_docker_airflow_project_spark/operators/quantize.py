"""Vector quantization for embedding storage/serving: symmetric per-vector
int8 quantization, the standard 4× compression step before shipping an
embedding corpus to an ANN serving tier (the scalar-quantization sibling of
the PQ codebooks in operators/similarity.py).

Implemented with ``mapInArrow`` — the Arrow-native batch path (Spark 4):
the list column arrives as a zero-copy ``pyarrow`` buffer, the whole batch
quantizes as three vectorized numpy ops over the FLAT values buffer
(segmented max via ``np.maximum.reduceat``, one multiply/divide, one
floor), and the output ListArray is rebuilt on the same offsets — no
per-row Python, no pandas conversion overhead. At 100 TB this is an
embarrassingly-parallel map stage: no shuffle, payload never leaves the
scan stage it was read in.

Cross-engine determinism (hash-exact vs a DuckDB oracle): every step is an
elementwise IEEE-754 double op in a fixed order — float32→float64 cast
(exact), ``abs`` (exact), segment ``max`` (exact comparison, order-free),
``v * 127.0`` then ``/ mx`` then ``+ 0.5`` then ``floor`` (each a single
correctly-rounded op, identical in numpy and any SQL engine). Half-up
rounding is spelled ``floor(x + 0.5)`` deliberately: numpy's ``round``
half-to-even differs from SQL ``round`` half-away at exact .5 ties, while
``floor`` is identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = "vec_id bigint, max_abs double, q array<int>"


def int8_quantize(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization: ``q_i = floor(v_i * 127 / max|v| + 0.5)``
    per vector; all-zero vectors quantize to zeros with ``max_abs = 0``.

    Returns ``(vec_id, max_abs, q)`` — ``max_abs`` is the dequantization
    scale numerator (``v_i ≈ q_i * max_abs / 127``).
    """

    def quantize_batches(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            ids = b.column(id_col)
            emb = b.column(vec_col)
            if isinstance(emb, pa.ChunkedArray):  # pragma: no cover - RecordBatch cols aren't chunked
                emb = emb.combine_chunks()
            lst = emb
            if lst.null_count:
                # NULL list slots break the zero-copy path two ways:
                # flatten() drops values under null slots (misaligning
                # np.diff(offsets) against the flat buffer), and a
                # zero-width null slot would masquerade as a genuinely
                # empty vector. Correctness first: per-row assembly,
                # NULL in -> NULL out for both columns.
                mx_py, q_py = [], []
                for v in lst.to_pylist():
                    if v is None:
                        mx_py.append(None)
                        q_py.append(None)
                        continue
                    a = np.asarray(v, dtype=np.float64)
                    m = float(np.max(np.abs(a))) if len(a) else 0.0
                    if m == 0.0:
                        q_py.append([0] * len(a))
                    else:
                        q_py.append(
                            [int(x) for x in np.floor(a * 127.0 / m + 0.5)]
                        )
                    mx_py.append(m)
                yield pa.RecordBatch.from_arrays(
                    [
                        ids,
                        pa.array(mx_py, type=pa.float64()),
                        pa.array(q_py, type=pa.list_(pa.int32())),
                    ],
                    ["vec_id", "max_abs", "q"],
                )
                continue
            offsets = np.asarray(lst.offsets)
            # flatten() honors the array's offset/length slice; float64 for
            # exact float32 widening (no nulls on this path, so flatten and
            # the offsets agree)
            vals = np.asarray(lst.flatten(), dtype=np.float64)
            base = offsets[0]
            starts = (offsets[:-1] - base).astype(np.int64)
            lens = np.diff(offsets)
            flat_abs = np.abs(vals)
            mx = np.zeros(len(lens), dtype=np.float64)
            nonempty = lens > 0
            if nonempty.any():
                seg_max = np.maximum.reduceat(flat_abs, starts[nonempty])
                mx[nonempty] = seg_max
            rep = np.repeat(mx, lens)
            with np.errstate(divide="ignore", invalid="ignore"):
                q = np.floor(vals * 127.0 / rep + 0.5)
            q[rep == 0.0] = 0.0  # all-zero vector -> zeros, not NaN
            q_arr = pa.ListArray.from_arrays(
                pa.array(offsets - base, type=pa.int32()),
                pa.array(q.astype(np.int32), type=pa.int32()),
            )
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(mx, type=pa.float64()), q_arr],
                ["vec_id", "max_abs", "q"],
            )

    return df.select(id_col, vec_col).mapInArrow(quantize_batches, OUT_SCHEMA)
