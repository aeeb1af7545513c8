"""Continuous-crawl seam: the wave loop as a Structured Streaming job.

The reference is a continuous asyncio loop; our engine renders it as
wave-synchronous batches (north_rule's unit is the wave). This module
is the documented seam for continuous operation (SURVEY.md §2i/§4.4):
frontier rows arrive as a stream, and a host-keyed
``applyInPandasWithState`` operator maintains exactly the two pieces of
per-host state the reference's scheduler+datalayer keep — the seen-surt
set shard and the politeness cursor — emitting fetchable rows with
their slot index.

The stateful core (`_politeness_state_fn`) is plain Python over pandas
batches, so the batch engine and the streaming engine share semantics;
tests drive it both through a real streaming query (file source →
memory sink) and directly.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("surt", StringType()),
        StructField("priority", IntegerType()),
        StructField("slot", DoubleType()),
        StructField("slot_index", LongType()),
    ]
)

# state: (pages_emitted, seen_surts as '\x1f'-joined string)
STATE_SCHEMA = StructType(
    [
        StructField("pages_emitted", LongType()),
        StructField("seen_blob", StringType()),
    ]
)


def _politeness_state_fn(crawl_delay: float, max_pages_per_host: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            pages, blob = state.get
            seen = set(blob.split("\x1f")) if blob else set()
        else:
            pages, seen = 0, set()
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["priority", "surt"])
            for r in pdf.itertuples(index=False):
                if r.surt in seen or pages >= max_pages_per_host:
                    continue
                seen.add(r.surt)
                out_rows.append(
                    {
                        "host": host,
                        "url": r.url,
                        "surt": r.surt,
                        "priority": int(r.priority),
                        "slot": pages * crawl_delay,
                        "slot_index": pages,
                    }
                )
                pages += 1
        state.update((pages, "\x1f".join(sorted(seen))))
        yield pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return fn


def politeness_stream(
    frontier: DataFrame,
    crawl_delay: float = 1.0,
    max_pages_per_host: int = 1_000_000,
) -> DataFrame:
    """Streaming dedup + politeness slotting keyed by host.

    `frontier` is a streaming DataFrame with (host, url, surt, priority).
    Each micro-batch emits the newly-seen URLs of each host with their
    politeness slot; per-host state persists across batches (the
    streaming twin of the seen table + host_state of the batch engine).
    """
    return frontier.groupBy("host").applyInPandasWithState(
        _politeness_state_fn(crawl_delay, max_pages_per_host),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
