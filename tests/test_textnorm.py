"""Unicode normalization op (functions/textnorm.py) edge semantics the
AUX oracle's augmented corpus doesn't isolate: null propagation,
identity on already-clean text, NFC composition, strip-before-collapse
ordering."""

from __future__ import annotations

from tapdata_connectors_spark.functions import textnorm


def test_normalize_text_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "already clean"),
            (2, None),
            (3, "a\x00b  c\u0301"),  # NUL + double space + combining acute
            (4, "x\x0by"),                 # \x0b strips (no space inserted)
            (5, "  lead\t\ttrail  "),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textnorm.normalize_text(df).collect()}
    assert rows[1]["norm_text"] == "already clean"
    assert rows[1]["changed"] is False and rows[1]["n_chars_norm"] == 13
    assert rows[2]["norm_text"] is None and rows[2]["changed"] is None
    assert rows[3]["norm_text"] == "ab ć"  # NFC: c+U+0301 -> ć
    assert rows[3]["changed"] is True and rows[3]["n_chars_norm"] == 4
    assert rows[4]["norm_text"] == "xy"
    assert rows[5]["norm_text"] == "lead trail"
