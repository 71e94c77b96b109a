"""Streaming transaction assembly — the reference's online data plane.

`applyInPandasWithState` keyed by an XID-HASH BUCKET: per-bucket state
buffers the open transactions' records across micro-batches; each
transaction flushes (ordered) when ITS commit arrives; a rollback
clears it; a processing-time timeout implements the
incomplete-transaction policy (reference REDO_FLAGS::SHOW_INCOMPLETE /
Ctx.h:97 — transactions abandoned mid-log are dropped or surfaced).

Bucket keying, not raw xid: every record of an xid still lands in
exactly one bucket (per-txn correctness is hash-local), but one Arrow
batch and one Python invocation then carry THOUSANDS of transactions —
the same ~10⁴ amortization the batch kernel gets. Keyed by raw xid,
a busy micro-batch pays one Python-worker round trip per transaction.

Reference mapping:
- micro-batch            = LWN group        (Parser.cpp:1260-1460)
- per-bucket state       = XID-hash shard of the transaction buffer
                           (TransactionBuffer.h:50-80 — the reference's
                           buffer is itself a hash map over xids)
- commit flush           = Transaction::flush (Transaction.cpp:199-571)
- state store (RocksDB)  = swap-to-disk     (MemoryManager.cpp)
- checkpoint dir         = state files      (Writer.cpp:362-400)

State is a compact JSON payload of not-yet-committed records. At scale
the state store shards by bucket across the cluster and spills via
RocksDB — the same oldest-inactive-first pressure valve the reference
hand-rolls. NOTE: the bucket count is part of the state key space —
changing it (or moving between xid- and bucket-keyed checkpoints)
requires a fresh checkpoint, like any stateful-operator key change.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from openlogreplicator_spark.operators.transaction_assembly import (
    ASSEMBLED_SCHEMA,
    assemble_transactions_py,
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_buffered", T.IntegerType()),
        T.StructField("payload", T.StringType()),
    ]
)

_TERMINAL = ("commit", "rollback")


def _split_at_last_terminal(records: list[dict]) -> tuple[list[dict], list[dict]]:
    """PER XID: records up to (incl.) that xid's last commit/rollback
    are flushable; each xid's tail belongs to a still-open transaction
    and goes back to state. The bucket holds many interleaved xids, so
    a global split would flush (and silently drop) open transactions
    that happen to sort before another transaction's commit."""
    last: dict[str, int] = {}
    for i, r in enumerate(records):
        if r["opcode"] in _TERMINAL:
            last[r["xid"]] = i
    flushable: list[dict] = []
    leftover: list[dict] = []
    for i, r in enumerate(records):
        if i <= last.get(r["xid"], -1):
            flushable.append(r)
        else:
            leftover.append(r)
    return flushable, leftover


def _sort_key(r: dict) -> tuple:
    return (
        r.get("scn") or 0,
        r.get("subscn") or 0,
        r.get("block") or 0,
        r.get("offset") or 0,
    )


def assemble_stateful(
    key: tuple,
    pdf_iter: Iterable[pd.DataFrame],
    state: GroupState,
    max_ops: int | None = None,
    ttl_timeout: bool = True,
) -> Iterable[pd.DataFrame]:
    """Per-bucket stateful kernel (wired via the xid-hash groupBy in
    :func:`streaming_assemble`; also correct keyed by raw xid — the
    in-kernel logic is per-xid throughout)."""
    buffered: list[dict] = []
    if state.exists:
        (_, payload) = state.get
        buffered = json.loads(payload)

    if state.hasTimedOut:
        # incomplete-transaction policy: drop the abandoned transaction
        state.remove()
        yield pd.DataFrame(columns=[f.name for f in ASSEMBLED_SCHEMA.fields])
        return

    new: list[dict] = []
    for pdf in pdf_iter:
        for r in pdf.to_dict("records"):
            rec: dict[str, Any] = {}
            for k, v in r.items():
                if isinstance(v, float) and pd.isna(v):
                    v = None
                elif k in ("scn", "subscn", "block", "offset", "bdba", "slot", "seq"):
                    v = int(v) if v is not None else None
                elif k in ("cols",) and v is not None and not isinstance(v, dict):
                    v = dict(v)
                elif k == "rows" and v is not None:
                    v = [dict(x) if not isinstance(x, dict) else x for x in v]
                rec[k] = v
            new.append(rec)
    new.sort(key=_sort_key)

    # Source contract: records arrive in log order across batches (the
    # reference's reader guarantees the same). The defensive re-sort below
    # repairs ordering *within* what we currently hold, but a record
    # arriving after its transaction's commit was flushed is unrecoverable
    # — same as a redo block appearing after its LWN was confirmed.
    combined = sorted(buffered + new, key=_sort_key)
    flushable, leftover = _split_at_last_terminal(combined)

    if leftover:
        state.update((len(leftover), json.dumps(leftover)))
        # incomplete-transaction TTL. Generous by default: an open
        # transaction is legitimate until its commit arrives; the timeout
        # only reaps transactions abandoned by a crashed session (the
        # reference keeps them until log end). Local test batches can be
        # minutes apart under load — a short TTL here silently drops
        # mid-flight transactions. Only registered in continuous mode:
        # with any processing-time timer pending, Spark's
        # shouldRunAnotherBatch forces endless zero-input micro-batches
        # under Trigger.AvailableNow, so a drain run would never
        # terminate.
        if ttl_timeout:
            state.setTimeoutDuration(3_600_000)
    elif state.exists:
        state.remove()

    if flushable:
        # already in emission order — do not re-sort across batch boundaries
        events = assemble_transactions_py(
            sorted(flushable, key=_sort_key), max_ops=max_ops
        )
        if events:
            yield pd.DataFrame(events)
            return
    yield pd.DataFrame(columns=[f.name for f in ASSEMBLED_SCHEMA.fields])


def streaming_assemble(
    redo_stream: DataFrame,
    max_ops: int | None = None,
    ttl_timeout: bool = True,
) -> DataFrame:
    """Wire the stateful kernel onto a streaming redo-record DataFrame.
    ``max_ops`` is the T4 transaction size guard (Transaction.h size
    cap): a transaction exceeding it is dropped whole, as the reference
    does when `transaction-max-mb` overflows. Threaded via a closure so
    it serializes with the function to the executors.

    ``ttl_timeout`` selects the abandoned-transaction reaper (a
    processing-time timer per open xid). It must be False for
    Trigger.AvailableNow drain runs: Spark schedules another micro-batch
    whenever a ProcessingTimeTimeout is configured (state may hold a
    pending timer it can only service by running a batch), so a drain
    with timers enabled spins zero-input batches forever instead of
    terminating. Continuous pipelines keep the reaper; a bounded drain
    simply leaves incomplete transactions in state — identical to the
    reference at log end, which holds open transactions until more redo
    arrives (Transaction.h buffering)."""

    from pyspark.sql import functions as F

    def kernel(key, pdf_iter, state):
        return assemble_stateful(
            key, pdf_iter, state, max_ops=max_ops, ttl_timeout=ttl_timeout
        )

    # xid-hash buckets (not raw xid): one Python invocation per bucket
    # per batch instead of one per TRANSACTION — the same ~10⁴
    # amortization as the batch kernel, with per-txn correctness
    # preserved because every record of an xid hashes to one bucket.
    # TTL granularity coarsens with the key: the reaper fires when a
    # BUCKET has been idle for the TTL (a bucket that keeps receiving
    # records keeps its stale transactions buffered until log end —
    # which is the reference's own behavior for open transactions).
    n_buckets = max(
        32, redo_stream.sparkSession.sparkContext.defaultParallelism
    )
    bucketed = redo_stream.withColumn(
        "_bucket", F.pmod(F.xxhash64("xid"), F.lit(n_buckets))
    ).groupBy("_bucket")
    return bucketed.applyInPandasWithState(
        kernel,
        outputStructType=ASSEMBLED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
