"""Deterministic synthetic redo-record streams (FIXTURES.md group C).

Generates interleaved multi-transaction op sequences — begins, DML,
session attributes, partial rollbacks, rollbacks, commits, multi-row
QMI/QMD — for exercising the transaction-assembly core the way the
reference's private validation suite exercises Transaction.cpp.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from openlogreplicator_spark.event_model import REDO_RECORD_SCHEMA

_DML = ["insert", "update", "delete", "overwrite"]


def generate_redo_records(
    n_txns: int = 20,
    max_ops: int = 12,
    seed: int = 42,
    p_rollback: float = 0.1,
    p_prollback: float = 0.15,
    p_qmulti: float = 0.1,
    n_objs: int = 5,
) -> list[dict]:
    rng = random.Random(seed)
    scn = 1000
    pending: list[dict] = []  # per-txn op generators round-robin interleaved
    for i in range(n_txns):
        xid = f"{i % 4}.{i % 8}.{i + 1}"
        n_ops = rng.randint(1, max_ops)
        pending.append({"xid": xid, "left": n_ops, "begun": False, "live": []})
    records: list[dict] = []

    def rec(xid: str, opcode: str, **kw) -> dict:
        nonlocal scn
        scn += rng.randint(0, 2)  # duplicate SCNs happen (subscn breaks ties)
        # null LWN key components happen too (a record missing its
        # subscn/block/offset sorts as 0, the state machine's
        # convention) — generated so the fast-path/state-machine parity
        # properties cover the null-coalescing sort on both routes
        r = {
            "scn": scn,
            "subscn": None if rng.random() < 0.1 else rng.randint(0, 3),
            "block": None if rng.random() < 0.05 else rng.randint(0, 1 << 20),
            "offset": None if rng.random() < 0.05 else rng.randint(0, 1 << 15),
            "seq": 1,
            "xid": xid,
            "opcode": opcode,
            "obj": rng.randint(1, n_objs),
            "bdba": None,
            "slot": None,
            "fb": 0,
            "cols": None,
            "rows": None,
        }
        r.update(kw)
        return r

    while pending:
        t = rng.choice(pending)
        xid = t["xid"]
        if not t["begun"]:
            records.append(rec(xid, "begin"))
            if rng.random() < 0.5:
                records.append(
                    rec(
                        xid,
                        "attr",
                        cols={
                            "OS_USER_NAME": f"u{rng.randint(0, 3)}",
                            "MACHINE_NAME": f"host{rng.randint(0, 2)}",
                        },
                    )
                )
            t["begun"] = True
            continue
        if t["left"] > 0:
            t["left"] -= 1
            roll = rng.random()
            if roll < p_prollback and t["live"]:
                bdba, slot = rng.choice(t["live"])
                # the rolled-back op leaves the live set — re-picking it
                # emitted dangling rollbacks no legal redo sequence
                # produces (the LIFO cancel pairs each 5.6 with exactly
                # one standing op, Transaction.cpp) — r12 review-pass-11
                t["live"].remove((bdba, slot))
                records.append(rec(xid, "prollback", bdba=bdba, slot=slot))
            elif roll < p_prollback + p_qmulti:
                opc = rng.choice(["qmi", "qmd"])
                nrows = rng.randint(2, 4)
                records.append(
                    rec(
                        xid,
                        opc,
                        bdba=rng.randint(1, 100),
                        slot=rng.randint(0, 50),
                        rows=[
                            {"c1": str(rng.randint(0, 99)), "c2": f"v{k}"}
                            for k in range(nrows)
                        ],
                    )
                )
            else:
                bdba = rng.randint(1, 100)
                slot = rng.randint(0, 50)
                t["live"].append((bdba, slot))
                records.append(
                    rec(
                        xid,
                        rng.choice(_DML),
                        bdba=bdba,
                        slot=slot,
                        cols={"c1": str(rng.randint(0, 99)), "c2": f"x{slot}"},
                    )
                )
            continue
        # finish: commit, rollback, or leave incomplete
        r = rng.random()
        if r < p_rollback:
            records.append(rec(xid, "rollback"))
        elif r < 0.95:
            records.append(rec(xid, "commit"))
        pending.remove(t)
    return records


def redo_records_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    rows = [
        tuple(r.get(f.name) for f in REDO_RECORD_SCHEMA.fields) for r in records
    ]
    return spark.createDataFrame(rows, REDO_RECORD_SCHEMA)
