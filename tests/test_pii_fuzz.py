"""Differential fuzz for the PII scrub: Spark (Java regex) vs DuckDB (RE2)
over generated adversarial inputs.

The fixed fixtures in test_curation_ops prove the happy path; this generates
the nasty neighborhood — digits glued to candidate matches (word-boundary
semantics), 4-digit octets, double dots, unicode filler, empty-ish strings —
where two regex engines most plausibly diverge. Seeded RNG: failures are
reproducible, and any divergence is a real contract break because the scrub's
oracle promises byte-identical redacted text.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd

from spark_signals.datapipe import scrub as S

ATOMS = [
    "a@b.io",
    "first.last+tag@sub.domain.org",
    "not-an-email@",
    "@nothing.com",
    "a@@b.com",
    "10.0.0.1",
    "999.999.999.999",
    "1234.1.1.1",
    "1.2.3.4567",
    "1.2.3.4.5",
    "123-45-6789",
    "9123-45-6789",
    "123-45-67890",
    "415-555-1234",
    "415.555.1234",
    "415-555.1234",
    "x415-555-1234",
    "1-415-555-1234",
    "word",
    "Wörd",
    "…",
    "3.14",
    "v1.2.3",
    "",
    " ",
    "-",
    ".",
]


def _gen_rows(n: int = 250, seed: int = 0xC0FFEE) -> list[str]:
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        k = rng.randint(1, 8)
        sep = rng.choice([" ", "  ", ",", " | "])
        rows.append(sep.join(rng.choice(ATOMS) for _ in range(k)))
    return rows


def test_pii_scrub_differential_fuzz(spark):
    texts = _gen_rows()
    sdf = S.pii_scrub(
        spark.createDataFrame(
            [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    ).toPandas()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": "en",
                "source": "src",
                "n_chars": [len(t) for t in texts],
            }
        ),
    )
    ddf = con.execute(S.sql_pii_scrub()).fetchdf()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values("doc_id").reset_index(drop=True)
    b = ddf[cols].sort_values("doc_id").reset_index(drop=True)
    for c in cols:
        mism = a.index[a[c].astype(object) != b[c].astype(object)].tolist()
        assert not mism, (
            f"engine divergence in {c} at doc_ids {mism[:5]}: "
            f"spark={a[c].iloc[mism[0]]!r} duckdb={b[c].iloc[mism[0]]!r} "
            f"text={texts[mism[0]]!r}"
        )
    # the generator must actually exercise every category
    assert (a[["n_email", "n_ipv4", "n_ssn", "n_phone"]].sum() > 0).all()
