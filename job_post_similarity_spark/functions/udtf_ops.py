"""Python UDTF surface (PySpark 4 table functions).

One representative table-valued function — fixed-size token
windowing with an index — registered for LATERAL use from SQL. This
demonstrates the UDTF API end-to-end (class-based eval, typed return
schema, per-row lateral expansion); the PRODUCTION path for this
exact transformation is ``operators/curation.py chunk_documents``,
which does the same windowing as a single JVM ``Generate`` with zero
Python (UDFs/UDTFs are the slow path — a UDTF pays a Python worker
round-trip per partition). Keep UDTFs for logic that genuinely needs
imperative Python; this module exists so a user porting UDTF-based
pipelines has the surface, with the fast alternative documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="win_idx int, win_text string, n_tokens int")
class TokenWindows:
    """Lateral token windower: whitespace-tokenize the input and emit
    one row per fixed-size window (non-overlapping, last window
    ragged). Deterministic, so it stays oracle-checkable.

    Tokenization matches the repo contract exactly (the JVM/RE2
    ``\\s+`` regex split): ASCII whitespace only — Python's bare
    ``str.split()`` would also split on U+00A0 etc. and silently
    diverge from the DuckDB twin — with empty tokens dropped on both
    sides. ``str.lower`` equals SQL ``lower`` on ASCII corpora (the
    documented scope)."""

    def eval(self, text: str, size: int):  # noqa: D102
        import re

        if text is None or size is None or size <= 0:
            return
        toks = [
            w for w in re.split(r"[ \t\n\r\f\v]+", text.lower()) if w
        ]
        for i in range(0, len(toks), size):
            win = toks[i : i + size]
            yield i // size, " ".join(win), len(win)


def register_udtfs(spark: SparkSession) -> None:
    """Register the module's UDTFs for SQL LATERAL use."""
    spark.udtf.register("token_windows", TokenWindows)


def token_windows(
    spark: SparkSession,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 8,
) -> DataFrame:
    """Apply the TokenWindows UDTF laterally per document:
    ``(id, win_idx, win_text, n_tokens)``. Arrow-less row transfer —
    see the module docstring for why the JVM chunker is the 100 TB
    path and this is the API-parity one."""
    register_udtfs(spark)
    df.createOrReplaceTempView("__udtf_in")
    return spark.sql(
        f"""
        SELECT {id_col}, w.win_idx, w.win_text, w.n_tokens
        FROM __udtf_in, LATERAL token_windows({text_col}, {size}) w
        """
    )
