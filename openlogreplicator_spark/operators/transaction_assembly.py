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
*is* a hash partition by xid), then per-partition assembly in an
Arrow-batched ``mapInPandas`` kernel — vectorized pandas for plain
transactions, the sequential state machine for the exotic tail.
Per-group state is bounded by the size guard, so a
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


def _state_machine_frame(
    pdf: pd.DataFrame, show_incomplete: bool, max_ops: int | None
) -> pd.DataFrame:
    """Run the full sequential state machine over one partition's rows
    (per-xid correctness needs only xid-locality, which the upstream
    hash exchange guarantees)."""
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


def _assemble_partition(
    pdf: pd.DataFrame, show_incomplete: bool, max_ops: int | None
) -> pd.DataFrame:
    """One partition's records → assembled events, routed by shape:

    - **plain** transactions (only begin/DML/commit vectors, no
      chained-row fb flags, no multi-row payloads, at most one begin and
      one commit — the overwhelming majority of real OLTP redo) are
      assembled by the vectorized pandas path (`_assemble_fast_path`),
      ~µs-scale per record.
    - **exotic** transactions (partial rollbacks, QMI/QMD, supplemental
      log, locks, chained pieces, attrs, xid reuse) go through the full
      sequential state machine — the input is bounded by the exotic
      fraction of the workload.

    The split is computed with vectorized masks, so the per-record
    Python state machine never sees plain traffic.
    """
    if show_incomplete or max_ops is not None:
        # both need global per-txn state (size guard, incomplete flush)
        return _state_machine_frame(pdf, show_incomplete, max_ops)
    opcodes = pdf["opcode"]
    fb = pdf["fb"]
    exotic_rec = (
        ~opcodes.isin(_FAST_OPS)
        | (fb.notna() & (fb.fillna(0) != 0))
        | pdf["rows"].notna()
    )
    commit_xids = pdf.loc[opcodes == "commit", "xid"]
    begin_xids = pdf.loc[opcodes == "begin", "xid"]
    exotic_xids = set(pdf.loc[exotic_rec, "xid"])
    exotic_xids.update(commit_xids[commit_xids.duplicated()])
    exotic_xids.update(begin_xids[begin_xids.duplicated()])
    if not exotic_xids:
        fast = _assemble_fast_path(pdf, show_incomplete, max_ops)
        assert fast is not None  # routing guarantees the preconditions
        return fast
    mask = pdf["xid"].isin(exotic_xids)
    parts = []
    plain_pdf = pdf[~mask]
    if len(plain_pdf):
        fast = _assemble_fast_path(plain_pdf, show_incomplete, max_ops)
        assert fast is not None
        parts.append(fast)
    slow = _state_machine_frame(pdf[mask], show_incomplete, max_ops)
    if len(slow):
        parts.append(slow)
    if not parts:
        return pd.DataFrame(columns=[f.name for f in ASSEMBLED_SCHEMA.fields])
    return parts[0] if len(parts) == 1 else pd.concat(
        parts, ignore_index=True
    )


# sort-key null sentinels: pandas sort_values puts NaN last, so absent
# key components must sort after every present value
_NULL_I32 = 2**31 - 1
_NULL_I64 = 2**63 - 1


def _arrow_out_schema(cols_type):
    """ASSEMBLED_SCHEMA as a pyarrow schema, reusing the input table's
    map type for the three map columns so taken arrays match exactly."""
    import pyarrow as pa

    return pa.schema(
        [
            ("xid", pa.string()),
            ("begin_scn", pa.int64()),
            ("commit_scn", pa.int64()),
            ("num", pa.int64()),
            ("op", pa.string()),
            ("obj", pa.int64()),
            ("bdba", pa.int64()),
            ("slot", pa.int32()),
            ("scn", pa.int64()),
            ("cols", cols_type),
            ("before_cols", cols_type),
            ("attrs", cols_type),
        ]
    )


def _pdf_out_batches(out: pd.DataFrame, out_schema):
    import pyarrow as pa

    if out is None or not len(out):
        return
    yield from pa.Table.from_pandas(
        out, schema=out_schema, preserve_index=False
    ).to_batches()


def _assemble_partition_arrow(tbl, show_incomplete: bool, max_ops):
    """Partition kernel over an Arrow table: the column-image payload
    (`cols`/`rows` maps) NEVER materializes as Python objects on the
    plain path — routing and emission are decided on a slim pandas view
    of the key columns, and the payload rides through with a C-level
    ``take``. Measured at sf0.1 the Arrow↔pandas map conversion was the
    single largest cost of assembly (~60%); this removes it for the
    plain majority. The exotic tail (and the show_incomplete/max_ops
    configurations, which need global per-txn state) still converts its
    few rows to Python for the sequential state machine."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    cols_type = tbl.schema.field("cols").type
    out_schema = _arrow_out_schema(cols_type)
    if show_incomplete or max_ops is not None:
        out = _state_machine_frame(tbl.to_pandas(), show_incomplete, max_ops)
        yield from _pdf_out_batches(out, out_schema)
        return

    slim = tbl.select(
        ["xid", "opcode", "scn", "subscn", "block", "offset", "fb"]
    ).to_pandas()
    rows_present = pc.is_valid(
        tbl.column("rows").combine_chunks()
    ).to_numpy(zero_copy_only=False)
    opc = slim["opcode"]
    exotic_rec = (
        (~opc.isin(_FAST_OPS)).to_numpy()
        | (slim["fb"].fillna(0).to_numpy() != 0)
        | rows_present
    )
    commit_x = slim.loc[opc.to_numpy() == "commit", "xid"]
    begin_x = slim.loc[opc.to_numpy() == "begin", "xid"]
    exotic_xids = set(slim.loc[exotic_rec, "xid"])
    exotic_xids.update(commit_x[commit_x.duplicated()])
    exotic_xids.update(begin_x[begin_x.duplicated()])

    if exotic_xids:
        exo_mask = slim["xid"].isin(exotic_xids).to_numpy()
        plain = slim[~exo_mask]
    else:
        exo_mask = None
        plain = slim

    # vectorized plain emission — same semantics as _assemble_fast_path:
    # sort by the LWN key (NaN sentinels sort last, like the sequential
    # path's null handling), emit DML positioned before its txn's single
    # commit, num = per-xid enumeration.
    s = plain.sort_values(
        ["scn", "subscn", "block", "offset"], kind="stable"
    )
    pos = np.arange(len(s))
    commit_m = s["opcode"].to_numpy() == "commit"
    begin_m = s["opcode"].to_numpy() == "begin"
    commit_scn = dict(zip(s.loc[commit_m, "xid"], s.loc[commit_m, "scn"]))
    commit_pos = dict(zip(s.loc[commit_m, "xid"], pos[commit_m]))
    begin_scn = dict(zip(s.loc[begin_m, "xid"], s.loc[begin_m, "scn"]))
    dml_m = s["opcode"].isin(
        ("insert", "update", "overwrite", "delete")
    ).to_numpy()
    dml = s[dml_m]
    cpos = dml["xid"].map(commit_pos)
    emit_m = cpos.notna().to_numpy() & (
        pos[dml_m] < cpos.fillna(-1).to_numpy()
    )
    dml = dml[emit_m]
    if len(dml):
        # original row positions in tbl survive the filters/sort via the
        # slim frame's RangeIndex
        take_idx = pa.array(dml.index.to_numpy(), type=pa.int64())

        def tk(name):
            return tbl.column(name).take(take_idx).combine_chunks()

        k = len(dml)
        empty_maps = pa.MapArray.from_arrays(
            pa.array(np.zeros(k + 1, dtype=np.int32)),
            pa.array([], type=cols_type.key_type),
            pa.array([], type=cols_type.item_type),
        ).cast(cols_type)
        plain_tbl = pa.Table.from_arrays(
            [
                tk("xid"),
                pa.array(
                    pd.array(dml["xid"].map(begin_scn), dtype="Int64"),
                    from_pandas=True,
                ),
                pa.array(dml["xid"].map(commit_scn), type=pa.int64()),
                pa.array(
                    dml.groupby("xid", sort=False).cumcount().to_numpy(),
                    type=pa.int64(),
                ),
                pa.array(dml["opcode"].map(_OP_MAP), type=pa.string()),
                tk("obj"),
                tk("bdba"),
                tk("slot"),
                tk("scn"),
                tk("cols"),
                pa.nulls(k, type=cols_type),
                empty_maps,
            ],
            schema=out_schema,
        )
        yield from plain_tbl.to_batches()

    if exo_mask is not None and exo_mask.any():
        exo_pdf = tbl.filter(pa.array(exo_mask)).to_pandas()
        out = _state_machine_frame(exo_pdf, show_incomplete, max_ops)
        yield from _pdf_out_batches(out, out_schema)


def _default_buckets(records: DataFrame) -> int:
    """One bucket per session core, floor 32. Python-runner tasks carry
    a measured ~15-20 ms serialized launch cost each (daemon fork +
    Arrow channel handshake), so oversubscribing buckets 4-8× the core
    count — the classic skew rule — costs more in task launches than it
    saves in balance here: at sf0.1 dropping 128 buckets to 32 removed
    ~1.9 s from the assembly stage. Each bucket's working set (its
    share of in-flight transactions) must still fit one executor; raise
    `n_buckets` explicitly for skewed or memory-tight workloads."""
    return max(32, records.sparkSession.sparkContext.defaultParallelism)


def assemble_transactions(
    records: DataFrame,
    show_incomplete: bool = False,
    max_ops: int | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Batch transaction assembly: ONE xid shuffle, ONE Arrow pass.

    Input: REDO_RECORD_SCHEMA rows (event_model.py). Output: one row per
    emitted change event, committed transactions only, `num` dense within
    xid, ordered by (commit_scn, xid, num) when sorted at the sink.

    Shape: ``repartition(n_buckets, xid)`` — the reference's transaction
    buffer IS a hash partition by xid (TransactionBuffer.h:50-80) — then
    a ``mapInPandas`` partition kernel that routes by transaction shape:
    the plain majority (begin/DML/commit only) through a vectorized
    pandas path, the exotic tail (partial rollbacks, QMI/QMD,
    supplemental log, chained pieces, xid reuse) through the sequential
    state machine. See `_assemble_partition`.

    Why a single Python pass instead of a JVM window route: a previous
    revision assembled plain transactions with window aggregates so the
    payload never crossed Arrow — but every variant of that design needs
    2-3 consumers of the xid exchange (per-txn aggregates, plain
    emission, exotic routing), and Catalyst pushes each consumer's
    filters/pruning below the repartition, making the exchange subtrees
    canonically different: ReuseExchange never fires and the upstream
    (the whole binary parse plane) re-executes per consumer. Measured at
    sf0.1 the single Arrow pass is ~2× faster end-to-end, and its
    per-record Python cost is bounded: the vectorized path handles plain
    traffic at ~µs/record and the state machine sees only the exotic
    fraction. Each partition's working set is its share of in-flight
    transactions (T4-bounded), the same memory envelope as the
    reference's per-XID chunk lists spread across the cluster.
    """
    if n_buckets is None:
        n_buckets = _default_buckets(records)

    def kernel(batches):
        import pyarrow as pa

        blist = list(batches)
        if not blist:
            return
        tbl = pa.Table.from_batches(blist)
        if tbl.num_rows == 0:
            return
        yield from _assemble_partition_arrow(tbl, show_incomplete, max_ops)

    # ONE xid-hash shuffle, ONE consumer: the upstream (possibly the
    # whole binary parse plane) executes exactly once, the payload
    # crosses the Python boundary exactly once — and stays in Arrow
    # form on the plain path. Each partition holds complete
    # transactions; the kernel vectorizes the plain majority and runs
    # the per-xid state machine only for the exotic tail.
    return records.repartition(n_buckets, "xid").mapInArrow(
        kernel, schema=ASSEMBLED_SCHEMA
    )


def with_emission_order(assembled: DataFrame) -> DataFrame:
    """Global ordered emission (reference W1 confirm protocol): sort by
    (commit_scn, xid, num). Done once at the sink — a total order is only
    needed where the output leaves the engine."""
    return assembled.orderBy("commit_scn", "xid", "num")
