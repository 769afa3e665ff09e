"""HTML → visible-text extraction as an Arrow-vectorized pandas UDF.

The north rule's per-row invariant: "all text extraction from html runs
through vectorized Arrow pandas UDFs so the extracted text is byte-identical
per url" (BASELINE.json input_hint). The reference has no HTML processing —
this is the injected payload transform; its analog in the reference is the
value-codec layer (registerFromTapValue, MysqlConnector.java:188-228) where
per-type scalar rewrites happen.

Determinism contract: `extract_text(html_bytes)` is a pure function of the
bytes — stdlib-only (regex + html.unescape), no locale/env dependence, so
replaying the same event twice (or on a different cluster size) yields
byte-identical `text` (fixture F12).

Vectorization: the UDF receives pandas Series of bytes via Arrow. The regex
pipeline runs through pandas `.str` ops (C-backed loops over the block);
only entity unescape is a per-element `map` of a C-accelerated stdlib call.
This is the engine's single Python hot path and it is batch-shaped, never
row-at-a-time serde (SURVEY.md §2.10, §2.13).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Order matters and is part of the determinism contract.
_RE_SCRIPT = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_RE_COMMENT = re.compile(rb"(?s)<!--.*?-->")
_RE_TAG = re.compile(rb"(?s)<[^>]*>")
_RE_WS = re.compile(r"\s+")


def extract_text_bytes(b: bytes | None) -> str | None:
    """Pure-python reference implementation (used by tests/oracle too)."""
    if b is None:
        return None
    s = _RE_SCRIPT.sub(b" ", b)
    s = _RE_COMMENT.sub(b" ", s)
    s = _RE_TAG.sub(b" ", s)
    txt = s.decode("utf-8", errors="replace")
    txt = _html.unescape(txt)
    return _RE_WS.sub(" ", txt).strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_text_bytes, na_action="ignore")
