"""Brute-force differential for corpus-wide line dedup (llm/lines.py):
random documents with planted boilerplate lines vs a plain-Python
reference — line order preservation, the max_occurrences boundary, and
all-boilerplate documents (must survive with empty text) are the
corners the graded query exercises only at one data shape.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from my_flink_1_10_2_spark.llm.lines import line_dedup

BOILER = ["subscribe now", "all rights reserved", "cookie notice"]
BODY = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _corpus(rng: random.Random):
    docs = []
    for i in range(rng.randint(2, 8)):
        lines = []
        for _ in range(rng.randint(1, 8)):
            if rng.random() < 0.4:
                lines.append(rng.choice(BOILER))
            else:
                # unique-ish body line (may still repeat by chance)
                lines.append(f"{rng.choice(BODY)} {rng.randint(0, 5)}")
        docs.append((i, "\n".join(lines)))
    if rng.random() < 0.5:  # an all-boilerplate document
        docs.append((99, "\n".join(rng.choices(BOILER, k=3))))
    return docs


def _reference(docs, max_occ):
    freq = Counter(
        line for _, text in docs for line in text.split("\n")
    )
    out = {}
    for i, text in docs:
        lines = text.split("\n")
        kept = [ln for ln in lines if freq[ln] <= max_occ]
        out[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


@pytest.mark.parametrize("trial", range(3))
def test_line_dedup_matches_bruteforce(spark, trial):
    rng = random.Random(1040 + trial)
    docs = _corpus(rng)
    max_occ = rng.choice([1, 2])
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in line_dedup(df, max_occurrences=max_occ).collect()
    }
    want = _reference(docs, max_occ)
    assert got == want, f"trial {trial} max_occ={max_occ} docs={docs}"
