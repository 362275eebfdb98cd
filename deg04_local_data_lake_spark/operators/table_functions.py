"""Python UDTF surface (SURVEY.md §2.11 extension).

The reference has no user-defined functions at all; this module locks the
*table*-function corner of the modern PySpark UDF surface the way
functions/portable.py + similarity.cosine_pandas_udf lock the scalar
corners: a ``@udtf`` class used through a SQL ``LATERAL`` correlate.

The worked example is the canonical LLM-data one: overlapping word-window
chunking (RAG / training-sequence prep) — each document row expands into
stride-advanced chunks of ``CHUNK`` words with ``CHUNK − STRIDE`` words of
overlap.

UDTFs are row-at-a-time Python — the slow path. This one is registered
Arrow-optimized (``useArrow=True``) and the work per row is one split +
slicing, but the declarative twin (posexplode over a generated index
range, see ``passage_dedup`` in operators/llm_extras.py for the
non-overlapping variant) is what the 100 TB hot path should use; the UDTF
exists because some expansions (stateful per-row generators, tokenizer
libraries) have no declarative form, and the lateral-join plumbing —
partition-preserving, no shuffle, pipelined with the scan — is identical
either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

CHUNK = 30
STRIDE = 20


@udtf(returnType="chunk_idx int, chunk string, n_words int", useArrow=True)
class ChunkWords:
    """Expand a text into overlapping word windows: start offsets 0, STRIDE,
    2·STRIDE, … ; the final window is the first one that reaches the end of
    the document (so every word lands in ≥1 chunk and no empty tail chunk
    is emitted)."""

    def eval(self, text: str):
        words = text.split(" ")
        i, idx = 0, 0
        while True:
            piece = words[i : i + CHUNK]
            yield idx, " ".join(piece), len(piece)
            if i + CHUNK >= len(words):
                break
            i += STRIDE
            idx += 1


@register(
    "udtf_chunk_text",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id % 7 = 0
),
idx AS (
  SELECT doc_id, ws,
         unnest(generate_series(
           0,
           GREATEST(0, CAST(ceil((len(ws) - {CHUNK}) / {STRIDE}.0) AS INT))
         )) AS chunk_idx
  FROM w
)
SELECT doc_id, chunk_idx,
       array_to_string(ws[chunk_idx * {STRIDE} + 1 : chunk_idx * {STRIDE} + {CHUNK}], ' ')
         AS chunk,
       LEAST({CHUNK}, len(ws) - chunk_idx * {STRIDE}) AS n_words
FROM idx
""",
)
def udtf_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking via a Python UDTF in a LATERAL
    correlate (every 7th doc keeps the expansion bounded). The plan is a
    scan → ArrowEvalPythonUDTF expansion — no shuffle; chunk count per doc
    is ⌈(n−CHUNK)/STRIDE⌉+1."""
    spark.udtf.register("chunk_words", ChunkWords)
    docs = load_table(spark, sf_dir, "documents").filter("doc_id % 7 = 0")
    docs.createOrReplaceTempView("_chunk_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_words
        FROM _chunk_docs d, LATERAL chunk_words(d.text) c
        """
    )
