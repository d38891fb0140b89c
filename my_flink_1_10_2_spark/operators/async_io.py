"""Async per-record I/O enrichment — the reference's AsyncDataStream
(ref: flink-streaming-java/.../datastream/AsyncDataStream.java:103
`orderedWait` / :148 `unorderedWait`, AsyncFunction + async lookup
TableFunction, AsyncLookupJoinRunner.java).

Spark expression: Arrow batches through ``mapInPandas``, with an asyncio
event loop *inside* the batch — so slow external lookups (HTTP, KV
store, feature service) overlap within a batch exactly like the
reference's in-flight-request buffer. `capacity` bounds concurrent
requests (the reference's queue capacity); `ordered=True` preserves
input order within each partition (orderedWait), `ordered=False` yields
completions as they finish (unorderedWait — lower latency, order not
guaranteed).

Scale notes: concurrency is per-core × capacity (each task runs its own
loop), and the Arrow batch amortizes Python/JVM crossing. For joins
against *tables* prefer broadcast/lookup joins; async enrichment is for
genuinely per-record remote calls that no join can express.
"""

from __future__ import annotations

import asyncio
from collections.abc import Awaitable, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def async_enrich(
    df: DataFrame,
    async_fn: Callable[[dict], Awaitable[dict]],
    output_schema: str,
    capacity: int = 100,
    ordered: bool = True,
    timeout: float | None = None,
) -> DataFrame:
    """Enrich every row with the dict returned by ``await async_fn(row)``
    (row passed as a plain dict; returned keys become/overwrite output
    columns). Rows whose request times out are emitted with null
    enrichment (the reference's timeout handler default)."""

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def enrich_batch(rows: list[dict]) -> list[dict]:
            sem = asyncio.Semaphore(capacity)

            async def one(i: int, row: dict):
                async with sem:  # in-flight request cap
                    try:
                        if timeout is not None:
                            extra = await asyncio.wait_for(async_fn(row), timeout)
                        else:
                            extra = await async_fn(row)
                    except asyncio.TimeoutError:
                        extra = {}
                    return i, {**row, **extra}

            tasks = [asyncio.create_task(one(i, r)) for i, r in enumerate(rows)]
            if ordered:
                done = [await t for t in tasks]  # orderedWait: emit in order
            else:
                done = []
                for fut in asyncio.as_completed(tasks):  # unorderedWait
                    done.append(await fut)
            return [r for _i, r in done]

        for pdf in batches:
            rows = pdf.to_dict("records")
            out = asyncio.run(enrich_batch(rows))
            if out:
                yield pd.DataFrame(out)

    return df.mapInPandas(run_partition, output_schema)
