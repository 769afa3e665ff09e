"""Unicode text normalization: NFC composition + control-char strip +
whitespace collapse — the canonicalization every multilingual crawl
pipeline runs BEFORE hashing/dedup (CCNet/Dolma do exactly this), since
byte-level fingerprints miss texts that differ only in composition form
('cafe' + U+0301 COMBINING ACUTE vs the precomposed 'café' are the same
text and different bytes; web pages ship both).

Split by engine capability: the NFC step is the one transform Spark has
no built-in for, so it runs as an Arrow-vectorized pandas UDF (the
engine's only sanctioned Python path — input_hint: no per-row Python);
the control-strip and whitespace-collapse steps stay JVM regexp inside
whole-stage codegen. Order is strip-then-collapse, pinned because it is
observable: 'a\\x0bb' strips to 'ab', whereas collapsing first would
space it — and it also keeps the chain engine-portable (Java's \\s
includes \\x0B, RE2's does not; stripping \\x0B first makes the
difference unreachable). The DuckDB oracle replays the identical chain
via nfc_normalize + regexp_replace.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = ["nfc_udf", "normalize_text_col", "normalize_text"]


# DataType object, not the "string" DDL form: DDL parsing at decoration
# time needs an active SparkSession, which import time doesn't have
@pandas_udf(T.StringType())
def nfc_udf(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda x: None if x is None else unicodedata.normalize("NFC", x)
    )


# C0 controls except \t \n \r (those are whitespace and collapse below),
# plus DEL. \x0B and \x0C are stripped HERE, before the \s+ collapse —
# see module docstring for why that order is load-bearing.
_CTL = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def normalize_text_col(col: Column) -> Column:
    """NFC → strip controls → collapse \\s+ runs to one space → trim."""
    c = nfc_udf(col)
    c = F.regexp_replace(c, _CTL, "")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def normalize_text(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, norm_text, changed, n_chars_norm) per document. Map-only:
    one Arrow batch hop for NFC, JVM regexp for the rest — no shuffle at
    any scale; run it as an ingest-time projection, not a corpus pass."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_raw"),
        normalize_text_col(F.col(text_col)).alias("norm_text"),
    )
    return base.select(
        "doc_id",
        "norm_text",
        (F.col("norm_text") != F.col("_raw")).alias("changed"),
        F.length("norm_text").cast("long").alias("n_chars_norm"),
    )
