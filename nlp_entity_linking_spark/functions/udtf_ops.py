"""Python UDTF surface (SURVEY.md §2 U): Spark 4 table functions.

The engine prefers `pandas UDF returning array<struct> + explode` for
1-row->n-rows shapes (cheaper: Arrow-batched, no per-row Python), but the
UDTF capability itself is provided and tested here — `tokenize_udtf` emits
(pos, token, is_stopword) rows per input string.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf

_EN_STOP = frozenset(
    "the of and to in a is that for it as was with be by on not he i this "
    "are or his from at which but have an".split()
)


@udtf(returnType="pos int, token string, is_stopword boolean")
class tokenize_udtf:
    """One row per whitespace token of the input string."""

    def eval(self, text: str):  # noqa: D401
        if not text:
            return
        for pos, tok in enumerate(text.split()):
            yield pos, tok, tok.lower() in _EN_STOP
