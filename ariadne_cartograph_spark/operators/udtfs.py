"""Python UDTFs (Spark 4 user-defined TABLE functions) — the one
row-in/many-rows-out extension surface (SURVEY.md §2.7 U3) that isn't
a pandas UDF. The production chunking path is the pure-column-math
plan in plans/text_queries.text_chunking (JVM-side, codegen); this
UDTF twin exists because the UDTF API is part of the engine surface a
user of the reference's stack would expect to have available for
logic that genuinely can't be expressed as column algebra (per-row
recursive descent, external-library tokenizers, ...). Equality with
the column-math chunker is pinned in tests/test_udtf.py.

UDTFs run row-at-a-time in Python workers — keep them OFF hot paths
at 100 TB; when the logic is batchable, mapInPandas (Arrow) is the
right tool instead.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_tokens bigint, chunk_text string")
class ChunkDoc:
    """Emit overlapping fixed-size token windows for one document —
    same formula as plans/text_queries.text_chunking: chunk i covers
    tokens [i*stride, i*stride + size); n_chunks =
    max(ceil((n - size)/stride) + 1, 1)."""

    def eval(self, text: str, size: int, stride: int):
        import math
        import re

        # re.split(r"\s+") matches Spark's F.split(text, r"\s+")
        # exactly (including the leading-empty-token and empty-string
        # edge cases) — no filtering, so the twins stay identical.
        toks = re.split(r"\s+", text or "")
        n = len(toks)
        n_chunks = max(math.ceil((n - size) / stride) + 1, 1)
        for i in range(n_chunks):
            chunk = toks[i * stride : i * stride + size]
            yield i, len(chunk), " ".join(chunk)
