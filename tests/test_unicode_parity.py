"""Cross-engine tokenization parity on non-ASCII text.

Java's ``lower()`` applies full Unicode case mappings (Turkish 'İ' → "i̇",
two codepoints) while DuckDB applies simple ones ('İ' → 'i'), so any
pipeline that lowercases before hashing silently breaks md5-shingle /
digest parity on the first non-ASCII corpus — found by this differential
probe, fixed by folding case with ``translate()`` (ASCII-only 1:1 map,
identical semantics in both engines, byte-identical to lower() on ASCII).

These fixtures cover the divergence-prone neighborhoods: Turkish İ, German
ß/uppercase, combining accents, Greek capitals (final-sigma lowering),
NBSP (not regex \\s in either engine), fullwidth Latin, and the
vertical tab \\x0B (INSIDE Java's \\s, OUTSIDE RE2's — which is why every
DuckDB-side tokenizer spells the whitespace class explicitly,
``[ \\t\\n\\x0b\\f\\r]``, instead of ``\\s``).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from spark_signals.datapipe.dedup import SQL_DEDUP_EXACT, dedup_exact
from spark_signals.datapipe.text import (
    SQL_FINGERPRINT,
    SQL_LANG_ID,
    SQL_TEXT_STATS,
    fingerprint,
    lang_id,
    text_stats,
)

TEXTS = [
    "İstanbul LOWER test",
    "ÄÖÜ straße FUSS",
    "naïve café résumé",
    "ΣΙΣΥΦΟΣ sigma test",
    "nbsp separated words",
    "ＦＵＬＬＷＩＤＴＨ text",
    "mixed CASE Ascii words",
    "duplicate CONTENT words",
    "DUPLICATE content WORDS",  # case-folds equal → exact-dup pair
]


@pytest.fixture()
def engines(spark):
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(TEXTS)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(TEXTS)),
                "text": TEXTS,
                "lang": "en",
                "source": "s",
                "n_chars": [len(t) for t in TEXTS],
            }
        ),
    )
    return docs, con


@pytest.mark.parametrize(
    "op,sql",
    [
        (text_stats, SQL_TEXT_STATS()),
        (fingerprint, SQL_FINGERPRINT()),
        (dedup_exact, SQL_DEDUP_EXACT),
        # lang_id joined the probe in r06: its r05 ascii_lower tokenization
        # change shipped in the same diff that retired it from the driver
        # check, so the divergence-prone corpus pins it here permanently
        (lang_id, SQL_LANG_ID()),
    ],
    ids=["text_stats", "fingerprint", "dedup_exact", "lang_id"],
)
def test_unicode_text_parity(engines, op, sql):
    docs, con = engines
    a = op(docs).toPandas()
    b = con.execute(sql).fetchdf()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    for c in cols:
        assert a[c].astype(object).equals(b[c].astype(object)), (
            f"{c}: spark={a[c].tolist()} duck={b[c].tolist()}"
        )


def test_case_folded_duplicates_detected(engines):
    docs, _ = engines
    # the two 'duplicate content words' rows differ only by ASCII case →
    # same content digest → a group of size 2
    out = dedup_exact(docs).toPandas()
    assert (out["group_size"] == 2).sum() == 2  # both rows join one group
