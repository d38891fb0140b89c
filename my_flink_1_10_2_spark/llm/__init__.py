"""Beyond-reference operators for large-scale training-data pipelines
(BASELINE.json north star): deduplication, similarity search, text
analysis, multimodal columns.

Everything is DataFrame-declarative with the same 100 TB discipline as
the relational core: shingle/minhash pipelines are explode→groupBy chains
(shuffle on shingle/band keys, never a cartesian product), similarity
search offers a brute-force oracle path and an LSH-bucketed scale path,
and text analysis stays in JVM built-ins (no Python in the hot loop).
"""
