"""T6 big-transaction split — byte-true greedy part assignment.

The reference caps the RENDERED message size a writer can handle
(``max-message-mb``, src/builder/Builder.h:167): while flushing a
transaction it closes the current message and force-begins a new one as
soon as the builder's accumulated rendered bytes would cross the cap
(src/parser/Transaction.cpp:519-538; documentation/json/8.writer.adoc:68
"message size is governed by max-message-mb", the Kafka writer even sets
``message.max.bytes`` from it, src/writer/WriterKafka.cpp:63-64).

That is greedy first-fit in emission order: a part closes when the NEXT
op would push its rendered bytes past the cap, so no multi-op message
ever exceeds the cap — the single unavoidable exception being one op
that alone renders larger than the cap, which then occupies a part of
its own (the reference has the same escape: the check fires between
ops, never inside one).

Both builders (JSON and protobuf) share this assignment; only the
per-op byte measure differs (UTF-8 JSON octets vs protobuf wire bytes).
Everything stays JVM-side: the fold is a Catalyst ``aggregate`` over the
already-collected per-transaction payload array — message-scale data,
no extra shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def greedy_parts(items: Column, cap_bytes: int, hdr_bytes: Column) -> Column:
    """Part index per op: fold over ``items`` (an ordered
    ``array<struct<..., sz: long>>``) carrying (current part, running
    rendered bytes). Each part starts at ``hdr_bytes`` (every split part
    repeats the envelope header, Transaction.cpp:536-537 re-emits
    begin/commit); an op that would cross ``cap_bytes`` on a non-empty
    part opens the next part. Returns ``array<int>`` aligned to items."""
    hdr = hdr_bytes.cast("long")
    init = F.struct(
        F.expr("CAST(array() AS array<int>)").alias("parts"),
        F.lit(0).cast("int").alias("cur"),
        hdr.alias("bytes"),
    )

    def step(acc: Column, x: Column) -> Column:
        overflow = (acc["bytes"] + x["sz"] > F.lit(cap_bytes)) & (
            acc["bytes"] > hdr
        )
        nxt = F.when(overflow, acc["cur"] + 1).otherwise(acc["cur"])
        nbytes = F.when(overflow, hdr + x["sz"]).otherwise(
            acc["bytes"] + x["sz"]
        )
        return F.struct(
            F.concat(acc["parts"], F.array(nxt)).alias("parts"),
            nxt.alias("cur"),
            nbytes.alias("bytes"),
        )

    return F.aggregate(items, init, step, lambda acc: acc["parts"])


def chunk_by_parts(items: Column, parts: Column) -> Column:
    """Zip ``items`` with their part indices and regroup:
    ``array<struct<part:int, chunk:array<payload>>>`` with one entry per
    part, ops in original order. ``items`` must carry the payload under
    field ``p``."""
    zipped = F.zip_with(
        items,
        parts,
        lambda it, pt: F.struct(pt.alias("part"), it["p"].alias("p")),
    )
    n_parts = F.element_at(parts, -1) + 1
    return F.transform(
        F.sequence(F.lit(0), n_parts - 1),
        lambda i: F.struct(
            i.alias("part"),
            F.transform(
                F.filter(zipped, lambda z: z["part"] == i),
                lambda z: z["p"],
            ).alias("chunk"),
        ),
    )
