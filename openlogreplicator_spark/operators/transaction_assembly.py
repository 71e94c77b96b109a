"""Transaction assembly — the engine's stateful core (SURVEY §2.1 T1-T8).

Reassembles interleaved redo records into ordered, committed transactions:

- T1/T2  XID-keyed buffering            (TransactionBuffer.cpp:1-309)
- T3     partial-rollback LIFO cancel   (Transaction::rollbackLastOp,
         Transaction.cpp:73-197 — cancels the latest un-cancelled op with
         the same (bdba, slot))
- T4     transaction size guard         (Parser.cpp:610-626)
- T5     commit flush, ordered emission (Transaction::flush,
         Transaction.cpp:199-571; rolled-back txns skipped :207-210)
- B4     multi-row QMI/QMD expansion    (Builder.cpp:714-895)
- P9     session-attribute merge        (OpCode0513/0514)
- P12    11.4 lock / 11.16 supp-log / 11.22 KDOCMP
         (Parser.cpp:393-400; Transaction.cpp:419-491 — locks parse and
         never emit; supplemental-log records fill before-image columns
         the row piece didn't carry and are transparent to the LIFO
         partial-rollback cancel, Transaction.cpp:171-176; KDOCMP is
         LogMiner support, consumed silently)

Spark shape: one shuffle keyed by xid (the reference's transaction buffer
*is* a hash partition by xid), then per-group assembly in an Arrow-batched
``applyInPandas``. Per-group state is bounded by the size guard, so a
1000-executor cluster holds each transaction on exactly one task — the
same memory envelope as the reference's per-XID chunk lists, but spread
across the cluster. Global emission order is (commit_scn, xid, num),
restored lazily by the sink's sort — order is only *materialized* where
the reference also had to serialize (the writer).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSEMBLED_SCHEMA = T.StructType(
    [
        T.StructField("xid", T.StringType()),
        T.StructField("begin_scn", T.LongType()),
        T.StructField("commit_scn", T.LongType()),
        T.StructField("num", T.LongType()),
        T.StructField("op", T.StringType()),  # c|u|d|ddl
        T.StructField("obj", T.LongType()),
        T.StructField("bdba", T.LongType()),
        T.StructField("slot", T.IntegerType()),
        T.StructField("scn", T.LongType()),
        T.StructField("cols", T.MapType(T.StringType(), T.StringType())),
        # P5: the paired 5.1 undo vector's image — before-image for
        # updates/deletes (OpCode0501.h; Parser.cpp pairs vector1=undo
        # with vector2=redo inside one record)
        T.StructField(
            "before_cols", T.MapType(T.StringType(), T.StringType())
        ),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)

def _norm_map(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if isinstance(v, dict):
        return v
    return dict(v)


_OP_MAP = {
    "insert": "c",
    "update": "u",
    "overwrite": "u",
    "delete": "d",
    "ddl": "ddl",
}

# chained-row piece flags (reference FB_P/FB_N, RedoLogRecord.h:36-43)
FB_NEXT = 0x1  # more pieces of this row follow
FB_PREV = 0x2  # continuation of the previous piece


def _merge_row_pieces(ops: list[dict]) -> list[dict]:
    """T7 chained/multi-piece row merge (Builder::valueSet semantics,
    Builder.cpp:962-1376): an op flagged FB_PREV continues the previous
    emitted op of the same object and op-kind — its columns overlay the
    head piece's image. Chains close when a piece lacks FB_NEXT."""
    merged: list[dict] = []
    for o in ops:
        fb = o.get("fb") or 0
        if (
            merged
            and fb & FB_PREV
            and (merged[-1].get("fb") or 0) & FB_NEXT
            and merged[-1]["obj"] == o["obj"]
            and merged[-1]["op"] == o["op"]
        ):
            head = merged[-1]
            head["cols"] = {**(head["cols"] or {}), **(o["cols"] or {})}
            if o.get("before_cols"):
                head["before_cols"] = {
                    **(head.get("before_cols") or {}),
                    **o["before_cols"],
                }
            head["fb"] = fb  # chain continues only if this piece has FB_NEXT
        else:
            merged.append(dict(o))
    return merged


def assemble_transactions_py(
    records: Iterable[dict],
    show_incomplete: bool = False,
    max_ops: int | None = None,
) -> list[dict]:
    """Sequential reference implementation (single transaction stream).

    Used as the oracle for property tests and inside the per-XID pandas
    kernel. ``records`` must belong to one xid OR be globally interleaved —
    the function keys its own state by xid either way.
    """
    txns: dict[str, dict] = {}
    out: list[dict] = []
    skiplist: set[str] = set()

    def get(xid: str) -> dict:
        return txns.setdefault(
            xid, {"ops": [], "begin_scn": None, "attrs": {}, "dropped": False}
        )

    ordered = sorted(
        records,
        key=lambda r: (
            r["scn"],
            r.get("subscn") or 0,
            r.get("block") or 0,
            r.get("offset") or 0,
        ),
    )
    for r in ordered:
        xid = r["xid"]
        if xid in skiplist:
            continue
        opc = r["opcode"]
        t = get(xid)
        if opc == "begin":
            t["begin_scn"] = r["scn"]
        elif opc == "attr":
            t["attrs"].update(r.get("cols") or {})
        elif opc == "prollback":
            # LIFO cancel: newest surviving op with matching (bdba, slot)
            for i in range(len(t["ops"]) - 1, -1, -1):
                o = t["ops"][i]
                if o["bdba"] == r.get("bdba") and o["slot"] == r.get("slot"):
                    del t["ops"][i]
                    break
        elif opc == "rollback":
            txns.pop(xid, None)
            skiplist.add(xid)
        elif opc == "commit":
            if t["begin_scn"] is None and not show_incomplete and not t["ops"]:
                txns.pop(xid, None)
                continue
            for num, o in enumerate(_merge_row_pieces(t["ops"])):
                out.append(
                    {
                        "xid": xid,
                        "begin_scn": t["begin_scn"],
                        "commit_scn": r["scn"],
                        "num": num,
                        "op": o["op"],
                        "obj": o["obj"],
                        "bdba": o["bdba"],
                        "slot": o["slot"],
                        "scn": o["scn"],
                        "cols": o["cols"],
                        "before_cols": o.get("before_cols"),
                        "attrs": dict(t["attrs"]),
                    }
                )
            txns.pop(xid, None)
        elif opc == "undo":
            # P5: 5.1 undo vector — the before image of the row piece the
            # paired redo vector changes (the reference carries it as
            # redoLogRecord1 of the same record). Addressed by
            # (bdba, slot); consumed by the next row op at that address.
            if r.get("bdba") is not None:
                t.setdefault("pending_undo", {})[
                    (r.get("bdba"), r.get("slot"))
                ] = r.get("cols") or {}
        elif opc == "lock":
            # 11.4 lock row piece (select-for-update): parsed, never
            # emitted — no change event exists for a lock.
            pass
        elif opc == "kdocmp":
            # 11.22 LogMiner-support record: consumed silently
            # (Transaction.cpp:431-433).
            pass
        elif opc == "supp":
            # 11.16 supplemental log record: fills before-image columns
            # (typically the PK) that the addressed row piece didn't
            # carry (Transaction.cpp:451-481). Targets the most recent op
            # with the same (bdba, slot); an unaddressed supp with no
            # match is ignored (suppLogBdba==0 → nul1/nul2).
            supp_cols = r.get("cols") or {}
            addr = (r.get("bdba"), r.get("slot"))
            for i in range(len(t["ops"]) - 1, -1, -1):
                o = t["ops"][i]
                if (o["bdba"], o["slot"]) == addr:
                    o["cols"] = {**supp_cols, **(o["cols"] or {})}
                    break
            else:
                # supp ahead of its row piece (same group, piece order
                # not guaranteed): stash, applied when the op arrives
                if addr[0] is not None:
                    t.setdefault("pending_supp", {}).setdefault(
                        addr, {}
                    ).update(supp_cols)
        elif opc in ("qmi", "qmd"):
            op = "c" if opc == "qmi" else "d"
            rows = r.get("rows") or []
            # QMD rollback-of-insert walks rows in reverse (Builder.cpp:805-895)
            it = rows if opc == "qmi" else list(reversed(rows))
            for j, row in enumerate(it):
                t["ops"].append(
                    {
                        "op": op,
                        "obj": r["obj"],
                        "bdba": r.get("bdba"),
                        "slot": (r.get("slot") or 0) + j,
                        "scn": r["scn"],
                        "cols": row,
                    }
                )
        elif opc in _OP_MAP:
            cols = r.get("cols")
            pending = t.get("pending_supp", {}).pop(
                (r.get("bdba"), r.get("slot")), None
            )
            if pending:
                cols = {**pending, **(cols or {})}
            undo = t.get("pending_undo", {}).pop(
                (r.get("bdba"), r.get("slot")), None
            )
            t["ops"].append(
                {
                    "op": _OP_MAP[opc],
                    "obj": r["obj"],
                    "bdba": r.get("bdba"),
                    "slot": r.get("slot"),
                    "scn": r["scn"],
                    "cols": cols,
                    "before_cols": undo,
                    "fb": r.get("fb") or 0,
                }
            )
        if max_ops is not None and len(t["ops"]) > max_ops:
            # T4 size guard: drop and skip-list the oversized transaction
            txns.pop(xid, None)
            skiplist.add(xid)
    if show_incomplete:
        for xid, t in txns.items():
            for num, o in enumerate(_merge_row_pieces(t["ops"])):
                out.append(
                    {
                        "xid": xid,
                        "begin_scn": t["begin_scn"],
                        "commit_scn": None,
                        "num": num,
                        "op": o["op"],
                        "obj": o["obj"],
                        "bdba": o["bdba"],
                        "slot": o["slot"],
                        "scn": o["scn"],
                        "cols": o["cols"],
                        "before_cols": o.get("before_cols"),
                        "attrs": dict(t["attrs"]),
                    }
                )
    return out


_FAST_OPS = {"begin", "commit", "insert", "update", "overwrite", "delete"}


def _assemble_fast_path(
    pdf: pd.DataFrame, show_incomplete: bool, max_ops: int | None
):
    """Vectorized kernel for the dominant case: only begin/DML/commit,
    no partial rollbacks, no multi-row ops, no chained pieces, no attrs.
    The general state machine costs ~1µs/record in Python dict handling;
    this path is pure pandas/numpy (sort → per-xid commit broadcast →
    cumcount) and is ~5× faster. Falls back (returns None) whenever any
    record needs stateful semantics."""
    opcodes = pdf["opcode"]
    if not opcodes.isin(_FAST_OPS).all():
        return None
    if max_ops is not None or show_incomplete:
        return None
    fb = pdf["fb"]
    if fb.notna().any() and (fb.fillna(0) != 0).any():
        return None

    df = pdf.sort_values(
        ["scn", "subscn", "block", "offset"], kind="stable"
    ).reset_index(drop=True)
    commits = df[df["opcode"] == "commit"]
    begins = df[df["opcode"] == "begin"]
    # xid reuse (a second begin OR commit for the same xid) — let the
    # state machine arbitrate. Checking only commits is not enough: a
    # reuse 'begin' arriving after the single commit would overwrite the
    # emitted begin_scn here, whereas the sequential path snapshots
    # begin_scn at commit time.
    if commits["xid"].duplicated().any() or begins["xid"].duplicated().any():
        return None
    commit_scn = dict(zip(commits["xid"], commits["scn"]))
    commit_pos = dict(zip(commits["xid"], commits.index))
    begin_scn = dict(zip(begins["xid"], begins["scn"]))

    dml = df[df["opcode"].isin(("insert", "update", "overwrite", "delete"))].copy()
    # only ops positioned before their transaction's commit are emitted
    # (an op after the commit belongs to an uncommitted reuse → dropped,
    # matching the state machine)
    cpos = dml["xid"].map(commit_pos)
    dml = dml[cpos.notna() & (dml.index < cpos)]
    if len(dml) == 0:
        return pd.DataFrame(columns=[f.name for f in ASSEMBLED_SCHEMA.fields])
    out = pd.DataFrame(
        {
            "xid": dml["xid"],
            "begin_scn": pd.array(
                dml["xid"].map(begin_scn), dtype="Int64"
            ),
            "commit_scn": pd.array(
                dml["xid"].map(commit_scn), dtype="Int64"
            ),
            "num": dml.groupby("xid", sort=False).cumcount(),
            "op": dml["opcode"].map(_OP_MAP),
            "obj": dml["obj"],
            "bdba": dml["bdba"],
            "slot": dml["slot"],
            "scn": dml["scn"],
            # maps pass back to Arrow as the list-of-tuples form they
            # arrived in — no per-row dict conversion on the fast path
            "cols": dml["cols"],
            "before_cols": [None] * len(dml),
            "attrs": [{} for _ in range(len(dml))],
        }
    )
    return out


def _assemble_python(
    records: DataFrame,
    show_incomplete: bool = False,
    max_ops: int | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Arrow-batched state-machine assembly: shuffle by xid-bucket →
    per-bucket ordered flush in ``applyInPandas``.

    Grouping is by ``pmod(xxhash64(xid), n_buckets)``, NOT by raw xid:
    every record of an xid still lands in exactly one bucket (correctness
    is per-xid), but one Arrow batch carries *thousands* of transactions,
    so the per-group Python invocation cost is amortized ~10⁴×. The
    in-kernel state machine is keyed by xid and handles interleaving.
    Size n_buckets ≈ 4-8 × cluster cores at the target scale so each
    bucket's working set fits an executor; hot xids cannot straddle
    buckets, which is exactly the reference's one-transaction-one-buffer
    invariant (TransactionBuffer.h:50-80).
    """

    def _assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        fast = _assemble_fast_path(pdf, show_incomplete, max_ops)
        if fast is not None:
            return fast
        recs = pdf.to_dict("records")
        # Arrow hands MapType to pandas as list-of-(k,v) tuples; nulls in
        # numeric columns arrive as NaN — normalize both.
        for r in recs:
            r["cols"] = _norm_map(r.get("cols"))
            rows = r.get("rows")
            if rows is None or (isinstance(rows, float) and pd.isna(rows)):
                r["rows"] = None
            else:
                r["rows"] = [_norm_map(x) for x in rows]
            for k in ("scn", "subscn", "block", "offset", "bdba", "slot"):
                v = r.get(k)
                if isinstance(v, float):
                    r[k] = None if pd.isna(v) else int(v)
        out = assemble_transactions_py(
            recs, show_incomplete=show_incomplete, max_ops=max_ops
        )
        if not out:
            return pd.DataFrame(columns=[f.name for f in ASSEMBLED_SCHEMA.fields])
        return pd.DataFrame(out)

    if n_buckets is None:
        n_buckets = _default_buckets(records)
    bucketed = records.withColumn(
        "_bucket", F.pmod(F.xxhash64("xid"), F.lit(n_buckets))
    )
    return (
        bucketed.groupBy("_bucket")
        .applyInPandas(_assemble, schema=ASSEMBLED_SCHEMA)
    )


# sort-key null sentinels: pandas sort_values puts NaN last, so absent
# key components must sort after every present value
_NULL_I32 = 2**31 - 1
_NULL_I64 = 2**63 - 1


def _default_buckets(records: DataFrame) -> int:
    """4 × the session's core count, floor 64 — the '4-8 × cluster
    cores' sizing rule computed from the session instead of a constant,
    so a 32-core local run gets 128 buckets and a 4000-core cluster gets
    16k without a config change. Each bucket's working set (its share of
    in-flight transactions) must fit one executor; more buckets only
    shrink Arrow batch amortization, fewer concentrate hot xids."""
    return max(64, 4 * records.sparkSession.sparkContext.defaultParallelism)


def assemble_transactions(
    records: DataFrame,
    show_incomplete: bool = False,
    max_ops: int | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Batch transaction assembly: JVM split-route.

    Input: REDO_RECORD_SCHEMA rows (event_model.py). Output: one row per
    emitted change event, committed transactions only, `num` dense within
    xid, ordered by (commit_scn, xid, num) when sorted at the sink.

    Transactions are routed by shape, computed with window aggregates
    over ONE xid-keyed shuffle:

    - **plain** (only begin/DML/commit vectors, no chained-row fb flags,
      at most one begin and one commit — the overwhelming majority of
      real OLTP redo): assembled entirely JVM-side. Emitted ops are the
      DML vectors ordered before the commit by the reference's
      (scn, subscn, block, offset) LWN sort key (Parser.h:46-60);
      ``num`` is a per-xid row_number. The column-image payload never
      leaves Tungsten — no Arrow transfer, no Python.
    - **exotic** (partial rollbacks, QMI/QMD, supplemental log, locks,
      chained pieces, attrs, xid reuse): routed to the Arrow-batched
      per-xid state machine (`_assemble_python`), which implements the
      full LIFO-cancel/merge semantics.

    At 100 TB this is the difference between streaming the whole change
    payload through Python workers and streaming only the rare stateful
    tail: the hot path stays in whole-stage codegen, and the Python
    kernel's input is bounded by the exotic fraction of the workload.
    The `show_incomplete`/`max_ops` configurations need global per-txn
    state and take the state-machine path wholesale.
    """
    if n_buckets is None:
        n_buckets = _default_buckets(records)
    if show_incomplete or max_ops is not None:
        return _assemble_python(records, show_incomplete, max_ops, n_buckets)

    from pyspark.sql import Window

    # ONE explicit xid shuffle that BOTH routes hang off: the plain
    # window pipeline and the exotic state-machine branch read the same
    # exchange (ReuseExchange), so an expensive upstream (the binary
    # parse plane) executes exactly once.
    base = records.repartition(n_buckets, "xid")

    opcode = F.col("opcode")
    is_exotic = (~opcode.isin(*sorted(_FAST_OPS))) | (
        F.coalesce(F.col("fb"), F.lit(0)) != 0
    )
    key = F.struct(
        F.col("scn").alias("scn"),
        F.coalesce(F.col("subscn"), F.lit(_NULL_I32)).alias("subscn"),
        F.coalesce(F.col("block"), F.lit(_NULL_I64)).alias("block"),
        F.coalesce(F.col("offset"), F.lit(_NULL_I32)).alias("offset"),
    )
    # all per-txn aggregates over ONE ordered window spec, so the plain
    # branch pays a single in-partition sort; the running emit-count
    # below chains on the same (partition, order) and needs no new sort
    wo = Window.partitionBy("xid").orderBy(key)
    wu = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ann = (
        base.withColumn("_exotic", F.max(is_exotic.cast("int")).over(wu))
        .withColumn("_nc", F.sum((opcode == "commit").cast("int")).over(wu))
        .withColumn("_nb", F.sum((opcode == "begin").cast("int")).over(wu))
        .withColumn("_ckey", F.min(F.when(opcode == "commit", key)).over(wu))
        .withColumn(
            "_bscn", F.min(F.when(opcode == "begin", F.col("scn"))).over(wu)
        )
    )
    plain_txn = (
        (F.col("_exotic") == 0) & (F.col("_nc") <= 1) & (F.col("_nb") <= 1)
    )
    # emitted ops: DML of a plainly-committed txn positioned before its
    # commit in the LWN sort order — an op after the commit belongs to an
    # uncommitted xid reuse → dropped, matching the state machine; plain
    # xids with no commit at all are incomplete → dropped wholesale
    emitted = (
        plain_txn
        & (F.col("_nc") == 1)
        & opcode.isin("insert", "update", "overwrite", "delete")
        & (key < F.col("_ckey"))
    )
    ann = ann.withColumn("_emit", emitted).withColumn(
        "_num", F.sum(F.col("_emit").cast("long")).over(wo) - 1
    )
    op_expr = F.lit(None).cast("string")
    for k, v in _OP_MAP.items():
        op_expr = F.when(opcode == k, F.lit(v)).otherwise(op_expr)
    plain_out = ann.filter("_emit").select(
        F.col("xid").cast("string").alias("xid"),
        F.col("_bscn").cast("long").alias("begin_scn"),
        F.col("_ckey.scn").cast("long").alias("commit_scn"),
        F.col("_num").cast("long").alias("num"),
        op_expr.alias("op"),
        F.col("obj").cast("long").alias("obj"),
        F.col("bdba").cast("long").alias("bdba"),
        F.col("slot").cast("int").alias("slot"),
        F.col("scn").cast("long").alias("scn"),
        F.col("cols").alias("cols"),
        F.lit(None).cast("map<string,string>").alias("before_cols"),
        F.expr("map()").cast("map<string,string>").alias("attrs"),
    )
    # exotic routing: a slim per-xid aggregate (no payload columns) off
    # the same exchange decides which transactions need the state
    # machine; the semi-join side is txn-count-sized and broadcastable.
    # (Measured alternative: routing exotic rows by filtering the ann
    # window columns avoids the agg+semi-join but forces a SECOND full
    # in-partition sort + window pass over the payload — 20% slower at
    # sf0.1 and strictly worse at scale, where the payload sort dominates)
    exotic_xids = (
        base.groupBy("xid")
        .agg(
            F.max(is_exotic.cast("int")).alias("_e"),
            F.sum((opcode == "commit").cast("int")).alias("_nc"),
            F.sum((opcode == "begin").cast("int")).alias("_nb"),
        )
        .filter("_e = 1 OR _nc > 1 OR _nb > 1")
        .select("xid")
    )
    exotic = base.join(exotic_xids, "xid", "left_semi")
    exotic_out = _assemble_python(
        exotic, show_incomplete, max_ops, n_buckets
    )
    return plain_out.unionByName(exotic_out)


def with_emission_order(assembled: DataFrame) -> DataFrame:
    """Global ordered emission (reference W1 confirm protocol): sort by
    (commit_scn, xid, num). Done once at the sink — a total order is only
    needed where the output leaves the engine."""
    return assembled.orderBy("commit_scn", "xid", "num")
