"""Product quantization (PQ) — the third ANN building block next to
sign-LSH (`operators/lsh.py`) and IVF cells (`operators/ivf.py`).

PQ splits each D-dim vector into M subvectors of D/M dims, quantizes
every subvector to its nearest entry in a per-subspace codebook of
``ksub`` centroids, and stores only the M small codes (here 8 codes
for a 64-dim float vector — a 32x compression). Retrieval scores a
candidate against a query with ADC (asymmetric distance computation):
the query stays full-precision and the candidate is represented by its
codebook entries, so one dot per subspace replaces the full D-dim dot.

Determinism/oracle story: codebooks are the ``ksub`` lowest-id
vectors' subvectors (seedless, stable — the same construction as
``operators/ivf.sample_centroids``), assignment breaks sqdist ties on
the lower code, and the ADC sum across subspaces accumulates as
DECIMAL(38,18) — so codes AND scores are bit-identical across engines
and the whole index is exactly DuckDB-replicable.

At 100 TB: codebooks are KBs (collected once, embedded as plan
literals — broadcast by value); code assignment is a narrow per-row
projection (M*ksub small sqdists, whole-stage codegen); the PQ-coded
corpus is what an IVF cell list would store, cutting candidate-scan
memory 32x. Production pairs this with the IVF coarse partitioner
(`ivf_cosine_topk`); here ADC is verified against a bounded query
batch so the quantizer itself is the thing under test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzy_item_matching_spark.functions.vector import dot, squared_dist


def pq_codebooks(
    df: DataFrame, id_col: str, vec_col: str, m: int, ksub: int
) -> list[list[list[float]]]:
    """codebooks[mi][j] = subvector mi of the j-th lowest-id vector.
    Deterministic and tiny (m * ksub * dsub floats — KBs): collected
    once driver-side, then embedded as plan literals."""
    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(ksub).collect()
    )
    vecs = [[float(x) for x in r[1]] for r in rows]
    dim = len(vecs[0])
    dsub = dim // m
    return [
        [v[mi * dsub : (mi + 1) * dsub] for v in vecs] for mi in range(m)
    ]


def _lit_vec(v: list[float]) -> Column:
    return F.array(*[F.lit(x) for x in v])


def pq_codes(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """array<int> of PQ codes: per subspace, the argmin-sqdist codebook
    entry (ties -> lower code). Pure Catalyst expression — m*ksub
    8-dim sqdists per row, no shuffle, no Python."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    parts = []
    for mi in range(m):
        sub = F.slice(vec, mi * dsub + 1, dsub)
        scored = F.array(
            *[
                F.struct(
                    squared_dist(sub, _lit_vec(c)).alias("sqd"),
                    F.lit(j).alias("j"),
                )
                for j, c in enumerate(codebooks[mi])
            ]
        )
        parts.append(F.element_at(F.array_sort(scored), 1).getField("j"))
    return F.array(*parts)


def codebook_literal(codebooks: list[list[list[float]]]) -> Column:
    """The full codebook as one nested array literal
    array<array<array<double>>> (m x ksub x dsub) — a plan constant,
    i.e. broadcast by value to every task."""
    return F.array(
        *[
            F.array(*[_lit_vec(c) for c in cb_m])
            for cb_m in codebooks
        ]
    )


def adc_term(
    query_vec: Column, m_idx: Column, code: Column, cb_lit: Column, dsub: int
) -> Column:
    """One subspace's ADC contribution: dot(query subvector m,
    codebook[m][code]). The caller SUMs these per pair with a
    DECIMAL(38,18) aggregate so the cross-subspace float sum is
    order-insensitive and exactly SQL-replicable (a chained per-row
    decimal add would progressively lose scale under Spark's
    precision-capping rules; SUM keeps scale 18)."""
    qsub = F.slice(query_vec, m_idx * dsub + 1, dsub)
    entry = F.element_at(F.element_at(cb_lit, m_idx + 1), code + 1)
    return dot(qsub, entry)
