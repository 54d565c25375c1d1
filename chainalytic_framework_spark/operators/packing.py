"""Sequence packing: assign documents to fixed-length training chunks.

LM pretraining consumes the corpus as a concatenated token stream cut
into fixed ``seq_len`` chunks ("document packing with splitting" — the
GPT-style loader). The batch-side job is to compute, per document,
WHERE its tokens land: global start offset, first chunk id, and how
many chunks it straddles — that mapping drives shard writing,
curriculum ordering, and contamination tracing back from a chunk id to
its source documents.

Shape: one window cumsum over the deterministic document order
(doc_id). At warehouse scale a single global window is a one-task
bottleneck, so the production form partitions by ``shard_col`` (token
streams are sharded anyway — chunk ids only need to be unique within a
shard) and every shard's cumsum runs in parallel;
``tests/test_packing.py`` proves sharded == global-per-shard. The
global form is exact and oracle-paired at gate scale
(``pack_chunks_documents``).

Reference analogue: none — engine-added LLM-data capability (SURVEY
training-data-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    doc_tokens: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str | None = None,
) -> DataFrame:
    """Per-doc packing coordinates over the doc_id-ordered token stream.

    Returns (shard?, doc_id, n_tokens, start_off, first_chunk,
    n_chunks): ``start_off`` is the doc's first token's offset in the
    (shard's) stream; a doc occupies chunks ``first_chunk ..
    first_chunk + n_chunks - 1`` of width ``seq_len``. Zero-token docs
    are dropped (they occupy no chunk). Integer arithmetic end to end.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    parts = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = doc_tokens.where(F.col(tokens_col) > 0)
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    out_cols = parts + [id_col, tokens_col]
    return (
        t.select(*out_cols, start.alias("start_off"))
        .withColumn("first_chunk", F.expr(f"start_off DIV {int(seq_len)}"))
        .withColumn(
            "n_chunks",
            F.expr(
                f"(start_off + {tokens_col} - 1) DIV {int(seq_len)}"
                f" - start_off DIV {int(seq_len)} + 1"
            ).cast("long"),
        )
    )
