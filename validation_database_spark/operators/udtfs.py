"""Python UDTFs (table functions) — the row-expanding escape hatch
for logic a JVM expression can't state (here: a tokenizer-driven
chunker whose real-world version would call a BPE tokenizer library).

The built-in expression pipeline in suite/text.py::q_text_chunks is
the production path (JVM, no Python); this UDTF exists as the
API-parity surface and is pinned against that query in tests.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_SIZE = 64
CHUNK_OVERLAP = 16


@udtf(returnType="doc_id bigint, chunk_idx bigint, chunk_text string, chunk_tokens bigint")
class ChunkTextUdtf:
    """Sliding-window passage chunker as a lateral table function.

    Self-contained (stdlib only) so executor workers need no
    importable copy of this package.
    """

    def eval(self, doc_id: int, text: str):
        stride = CHUNK_SIZE - CHUNK_OVERLAP
        toks = [t for t in (text or "").lower().split(" ") if t]
        starts = range(0, max(len(toks), 1), stride)
        for idx, s in enumerate(starts):
            chunk = toks[s : s + CHUNK_SIZE]
            yield doc_id, idx, " ".join(chunk), len(chunk)


def register_udtfs(spark) -> None:
    spark.udtf.register("chunk_text", ChunkTextUdtf)
