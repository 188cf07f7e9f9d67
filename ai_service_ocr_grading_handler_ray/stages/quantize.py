"""Per-vector affine int8 quantization of an embedding column.

The storage/serving compression step every embedding-heavy pipeline
runs before indexing (FAISS SQ8-style): per vector,

    scale = (max - min) / 255        (1.0 when the vector is constant)
    q_i   = round((v_i - min) / scale)          — uint8 codes 0..255
    recon = min + q_i * scale
    mse   = mean((v - recon)^2)

Emitting (min, max, codes) shrinks a float32 vector 4× with bounded
reconstruction error; the mse column is the quality audit used to pick
quantization vs full precision per corpus.

Scale shape: one shuffle-free ``map_batches`` scan; the kernel reshapes
the batch's flattened list<float> buffer to (n, d) once and runs pure
numpy — no per-row Python.  Arithmetic is float64 with HALF-AWAY
rounding, exactly what DuckDB replays (:func:`quantize_sql` is
GENERATED from the same constants — single-generator policy; codes are
checked via their per-vector sum, the full code list being an array
column the driver's value-hash cannot canonicalize portably).

Reference scope: no counterpart in the reference repo; belongs to the
embedding battery (q20/q36/q49 ANN, q88 SemDeDup, q104 k-means, q111
PCA) as its storage-side member.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .selection import round_half_away

LEVELS = 255  # 8-bit affine grid


def quantize_batch(
    batch: pa.Table, vec_col: str = "embedding", id_col: str = "vec_id"
) -> pa.Table:
    """Batch kernel → (id, v_min, v_max, q_sum, mse).  Vectors must be
    equal-length lists (embedding tables are); raises on ragged input."""
    col = batch[vec_col].combine_chunks() if isinstance(
        batch[vec_col], pa.ChunkedArray
    ) else batch[vec_col]
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    if n == 0:
        return pa.table(
            {
                id_col: batch[id_col],
                "v_min": pa.array([], type=pa.float64()),
                "v_max": pa.array([], type=pa.float64()),
                "q_sum": pa.array([], type=pa.int64()),
                "mse": pa.array([], type=pa.float64()),
            }
        )
    offsets = np.diff(
        col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    )
    d = int(offsets[0])
    if not (offsets == d).all():
        raise ValueError("quantize_batch: ragged embedding lists")
    if d == 0:
        # the SQL replay's unnest would silently emit nothing for these
        # rows — reject loudly instead of diverging (or crashing in min)
        raise ValueError("quantize_batch: zero-length embedding lists")
    m = flat.reshape(n, d)
    mn = m.min(axis=1)
    mx = m.max(axis=1)
    scale = np.where(mx > mn, (mx - mn) / LEVELS, 1.0)
    q = round_half_away((m - mn[:, None]) / scale[:, None], 0)
    recon = mn[:, None] + q * scale[:, None]
    mse = np.mean((m - recon) ** 2, axis=1)
    return pa.table(
        {
            id_col: batch[id_col],
            "v_min": pa.array(mn),
            "v_max": pa.array(mx),
            "q_sum": pa.array(q.sum(axis=1).astype(np.int64)),
            "mse": pa.array(mse),
        }
    )


def quantize_sql(
    *,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_min_max: int = 6,
    round_mse: int = 8,
) -> str:
    """DuckDB replay of :func:`quantize_batch`, generated from the SAME
    LEVELS constant and formula ordering (single-generator policy).
    DuckDB ``round`` is half-away, matching ``round_half_away``."""
    return f"""
        WITH e AS (
          SELECT {id_col}, unnest(CAST({vec_col} AS DOUBLE[])) AS v
          FROM {table}
        ),
        s AS (
          SELECT {id_col}, min(v) AS mn, max(v) AS mx,
                 CASE WHEN max(v) > min(v)
                      THEN (max(v) - min(v)) / {LEVELS} ELSE 1.0 END AS sc,
                 count(*) AS d
          FROM e GROUP BY {id_col}
        ),
        q AS (
          SELECT e.{id_col},
                 CAST(SUM(round((e.v - s.mn) / s.sc, 0)) AS BIGINT) AS q_sum,
                 SUM((e.v - (s.mn + round((e.v - s.mn) / s.sc, 0) * s.sc))
                     * (e.v - (s.mn + round((e.v - s.mn) / s.sc, 0) * s.sc)))
                   AS sse
          FROM e JOIN s USING ({id_col}) GROUP BY e.{id_col}
        )
        SELECT s.{id_col},
               round(s.mn, {round_min_max}) AS v_min,
               round(s.mx, {round_min_max}) AS v_max,
               q.q_sum,
               round(q.sse / s.d, {round_mse}) AS mse
        FROM s JOIN q USING ({id_col})
    """
