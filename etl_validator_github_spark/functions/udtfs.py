"""Python UDTFs (Spark 4, SPARK-43798): table functions callable from
SQL — the lateral-join escape hatch for row→rows expansions whose logic
doesn't fit column expressions.

Policy (same as the UDF policy in SCALE.md): a UDTF is row-at-a-time
Python, so it NEVER belongs in a hot path where an expression form
exists — ``ChunkDocument`` here deliberately duplicates the catalog's
expression-based ``text.chunk_documents`` so the test suite can pin the
two byte-identical, making the demo honest about what the expression
path replaces. Use a UDTF when the expansion needs real Python (a
tokenizer library, a parser) and the input is already pruned.

``analyze``-free static-schema form (the common case); registration is
per-session via ``register_udtfs``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_tokens int, chunk_hash string")
class ChunkDocument:
    """Fixed-size token chunking of one document text.

    SQL: ``SELECT d.doc_id, c.* FROM docs d,
    LATERAL chunk_document(d.text, 50) c``.
    """

    def eval(self, text: str, chunk_tokens: int):
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), chunk_tokens):
            piece = " ".join(toks[i:i + chunk_tokens])
            yield (
                i // chunk_tokens,
                len(piece.split(" ")),
                hashlib.md5(piece.encode()).hexdigest(),
            )


def register_udtfs(spark) -> None:
    """Register all UDTFs on the session (idempotent)."""
    spark.udtf.register("chunk_document", ChunkDocument)
