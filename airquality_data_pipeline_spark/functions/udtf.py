"""Python UDTFs (Spark 4 table functions) — the user-extensible
table-function surface (SURVEY.md §2.9; the reference exposes none, the
engine provides the native Spark mechanism).

`TokenizeUDTF` is the demonstrative table function: one text row in,
one row per token out with ordinal + length — registered via
spark.udtf.register and callable from SQL (LATERAL joins included).
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle as _cloudpickle
from pyspark.sql.functions import udtf

# UDTF classes are module-level and run on Python workers: pickle by
# value so executors need not import this package (see
# operators/multimodal.py for the full rationale).
_cloudpickle.register_pickle_by_value(sys.modules[__name__])


@udtf(returnType="token: string, idx: int, token_len: int")
class TokenizeUDTF:
    """Whitespace tokenizer as a table function."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if not text:
            return
        for i, tok in enumerate(text.strip().lower().split()):
            yield tok, i, len(tok)


def register_udtfs(spark) -> None:
    """Make the table functions callable from SQL:
    SELECT t.* FROM documents, LATERAL tokenize(text) t"""
    spark.udtf.register("tokenize", TokenizeUDTF)
