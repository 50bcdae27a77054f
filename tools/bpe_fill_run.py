"""BPE fill-rate evidence on a NON-saturating corpus (r11 verdict #6).

The r11 30k-merge measurement ran on the driver testdata's 310-word
lexicon, which saturates at 396 merges — so SCALE.md's "natural-text fill
rates climb well above the floor" was extrapolation. This tool builds a
deterministic Zipfian corpus over a ≥30k-word syllabic lexicon at the 10×
scale (50k docs × ~200 words) and runs the production-budget trainer
(`bpe_train(n_merges=30_000, batch=64, min_freq=2)`), printing one JSON
line: rounds (static schedule), wall, merges kept, fill rate, and the
per-decile kept counts (how fill evolves as the symbol space widens).

Usage::

    python tools/bpe_fill_run.py [--docs 50000] [--lexicon 40000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# deterministic syllabic lexicon: CV(C) syllables composed 2-4 deep gives
# realistic word lengths (4-12 chars) and pair structure (shared syllables
# across words — what makes BPE merges transfer, unlike random chars)
_ONSETS = list("bdfgklmnprstvz")
_NUCLEI = ["a", "e", "i", "o", "u", "ai", "ou"]
_CODAS = ["", "n", "r", "s", "t"]


def _syllables() -> list[str]:
    return [o + n + c for o in _ONSETS for n in _NUCLEI for c in _CODAS]


def build_lexicon(size: int) -> list[str]:
    syl = _syllables()  # 490 syllables
    seen: dict[str, None] = {}
    i = 0
    while len(seen) < size:
        # 2-4 syllables, indices from independent bit fields of a
        # golden-ratio multiply (full 490^3·3 product space reachable)
        h = (i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        a, b, c = h % len(syl), (h >> 16) % len(syl), (h >> 32) % len(syl)
        n = 2 + ((h >> 48) % 3)
        seen.setdefault("".join((syl[a], syl[b], syl[c])[:n]), None)
        i += 1
    return list(seen)


from spark_signals.checkpoint import pin


def build_docs(spark, n_docs: int, lexicon: list[str], words_per_doc: int = 200):
    import math

    V = len(lexicon)
    lnV = math.log(V)
    rows = []
    state = 88172645463325252
    for d in range(n_docs):
        words = []
        for _ in range(words_per_doc):
            # xorshift64 — deterministic, fast, no RNG object
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            u = (state & 0xFFFFFFFF) / 2**32
            rank = int(math.exp(u * lnV)) - 1  # Zipf s≈1 inverse CDF
            words.append(lexicon[min(rank, V - 1)])
        rows.append((d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--lexicon", type=int, default=40_000)
    ap.add_argument("--merges", type=int, default=30_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_signals.datapipe.bpe import bpe_train, round_caps
    from spark_signals.session import get_spark

    spark = get_spark("bpe-fill-run")
    lex = build_lexicon(args.lexicon)
    docs = build_docs(spark, args.docs, lex).repartition(32).transform(pin)
    n_distinct = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select("w")
        .distinct()
        .count()
    )

    t0 = time.time()
    merges = bpe_train(docs, n_merges=args.merges, batch=64, min_freq=2)
    kept_rounds = merges.select(
        (F.ceil(F.col("merge_rank") / 64)).alias("round")
    ).groupBy("round").count().collect()
    wall = round(time.time() - t0, 1)
    kept = sum(r["count"] for r in kept_rounds)
    rounds = len(round_caps(args.merges, 64))
    by_round = {int(r["round"]): int(r["count"]) for r in kept_rounds}
    deciles = {
        f"r{lo + 1}-{min(lo + rounds // 10, rounds)}": sum(
            by_round.get(x, 0)
            for x in range(lo + 1, min(lo + rounds // 10, rounds) + 1)
        )
        for lo in range(0, rounds, max(rounds // 10, 1))
    }
    print(
        json.dumps(
            {
                "docs": args.docs,
                "lexicon_distinct_words": n_distinct,
                "budget": args.merges,
                "rounds": rounds,
                "wall_sec": wall,
                "sec_per_round": round(wall / rounds, 3),
                "merges_kept": kept,
                "fill_rate": round(kept / args.merges, 3),
                "kept_by_decile": deciles,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
