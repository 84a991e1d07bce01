"""Python UDTF surface (SURVEY.md section 2.5 — UDF/UDAF/UDTF all
ABSENT in the reference).

``TokenizeUDTF`` is the table-function contract demonstrator: one input
row -> many output rows, registered so SQL can LATERAL-join it. It
mirrors operators/text.py's tokenizer exactly, so its oracle is the
same DuckDB expression. At scale the SAME logic should be the
explode() in operators/text.py — row-based Python UDTFs are the
flexibility path, not the throughput path.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")


@udtf(returnType="token: string, pos: int")
class TokenizeUDTF:
    """(text) -> one row per token: (token, position)."""

    def eval(self, text: str):  # noqa: D102 — contract defined by pyspark
        if text is None:
            return
        pos = 0
        for tok in _TOKEN_SPLIT.split(text.lower()):
            if tok != "":
                yield (tok, pos)
                pos += 1


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on a session (idempotent)."""
    spark.udtf.register("boost_tokenize", TokenizeUDTF)
