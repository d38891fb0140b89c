"""Edit-locality law for content-defined chunking (q_cdc_chunks): the
whole point of CDC over fixed-stride chunking is that an insertion
early in a document only disturbs boundaries near the edit — every
boundary past the edit's hash window shifts by exactly the insertion
length.  The graded oracle checks the arithmetic on one corpus; this
pins the PROPERTY on crafted edits, running the registry query itself
on a synthetic documents.parquet fixture.
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

VOCAB = ["oak", "elm", "fir", "yew", "ash", "bay", "ivy", "rue"]


def _boundaries(text: str):
    """Mirror of the query's rule: for sequence index i in [3, n_toks),
    the hash window is 0-based tokens [i-2, i] and the recorded pos is
    i itself; a boundary falls where md5 of the window hits 0 mod 16."""
    toks = [t for t in text.lower().split() if t]
    out = []
    for i in range(3, len(toks)):
        gram = " ".join(toks[i - 2 : i + 1])
        h = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
        if h % 16 == 0:
            out.append(i)
    return toks, out


@pytest.mark.parametrize("trial", range(3))
def test_cdc_boundaries_shift_rigidly_past_an_early_edit(trial):
    rng = random.Random(1060 + trial)
    words = [rng.choice(VOCAB) for _ in range(300)]
    base = " ".join(words)
    ins_at = rng.randint(5, 20)
    ins = [rng.choice(VOCAB) for _ in range(rng.randint(1, 6))]
    edited = " ".join(words[:ins_at] + ins + words[ins_at:])

    _, b0 = _boundaries(base)
    _, b1 = _boundaries(edited)
    k = len(ins)
    # every boundary whose hash window is fully past the edit must
    # appear shifted by exactly k; boundaries before the edit unchanged
    tail0 = [p for p in b0 if p - 2 >= ins_at]  # window starts at/after edit
    tail1 = [p for p in b1 if p - 2 >= ins_at + k]
    assert tail1 == [p + k for p in tail0], f"trial {trial}"
    head0 = [p for p in b0 if p < ins_at]  # window fully before the edit
    head1 = [p for p in b1 if p < ins_at]
    assert head0 == head1, f"trial {trial}"


def test_cdc_query_agrees_with_reference_on_crafted_fixture(spark, tmp_path):
    """Run the registry query on a synthetic documents.parquet and check
    n_chunks / bound_pos_sum against the hashlib mirror."""
    from my_flink_1_10_2_spark.queries import REGISTRY, _load_all_modules

    _load_all_modules()
    rng = random.Random(1070)
    docs = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(4, 120))))
        for i in range(8)
    ]
    pq.write_table(
        pa.table(
            {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]},
            schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        ),
        tmp_path / "documents.parquet",
    )
    got = {
        r["doc_id"]: (r["n_toks"], r["n_chunks"], r["bound_pos_sum"])
        for r in REGISTRY["q_cdc_chunks"].spark_fn(spark, str(tmp_path)).collect()
    }
    for i, text in docs:
        toks, bounds = _boundaries(text)
        if len(toks) < 4:
            assert i not in got
        else:
            assert got[i] == (len(toks), len(bounds) + 1, sum(bounds)), (
                f"doc {i}: {text!r}"
            )
