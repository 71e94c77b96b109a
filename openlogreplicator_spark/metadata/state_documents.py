"""W7 portable state documents: checkpoint + schema snapshot JSON.

The reference persists two kinds of portable state a downstream tool (or a
cold restart) can read without any engine internals:

- a writer checkpoint document ``<database>-chkpt.json`` with the exact
  field set ``{"database", "scn", "idx", "resetlogs", "activation"}``
  (src/writer/Writer.cpp:386-395 — confirmedScn/confirmedIdx plus the
  incarnation identifiers);
- a schema snapshot ``<database>-schema-<scn>.json`` that serializes the
  dictionary replica versioned at a checkpoint SCN
  (src/metadata/SerializerJson.cpp:52-137 header fields, sys-obj/sys-col
  arrays at :753-756).

Spark shape: the engine's durable state already lives in Spark streaming
checkpoints + the versioned registry table (schema_registry.py). These
functions EXPORT that state into the reference-shaped JSON documents and
re-IMPORT them, so startup positioning (O3/F9) can begin from a document
written by an earlier run — the reference's cold-start path
(Writer::readCheckpoint, src/writer/Writer.cpp:401-443).

Scale note: both documents are metadata-scale (one scalar tuple; one row
per dictionary *version*, i.e. per table, not per event). The dictionary
collect here is the same catalog-scale collect the reference performs to
serialize its in-memory packs — never a data-scale frame.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def checkpoint_path(state_dir: str, database: str) -> str:
    return os.path.join(state_dir, f"{database}-chkpt.json")


def schema_path(state_dir: str, database: str, scn: int) -> str:
    return os.path.join(state_dir, f"{database}-schema-{scn}.json")


def write_checkpoint_doc(
    state_dir: str,
    database: str,
    scn: int,
    idx: int = 0,
    resetlogs: int = 0,
    activation: int = 0,
) -> str:
    """Writer checkpoint document — field set and meaning per
    Writer::writeCheckpoint (confirmed SCN + intra-SCN idx so a restart
    resumes mid-transaction-batch without re-emitting)."""
    os.makedirs(state_dir, exist_ok=True)
    doc = {
        "database": database,
        "scn": int(scn),
        "idx": int(idx),
        "resetlogs": int(resetlogs),
        "activation": int(activation),
    }
    path = checkpoint_path(state_dir, database)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, separators=(",", ":"))
    os.replace(tmp, path)  # atomic: a reader never sees a torn document
    return path


def read_checkpoint_doc(state_dir: str, database: str) -> dict | None:
    """Cold-start read (Writer::readCheckpoint): None when no checkpoint
    exists yet — the caller falls back to its configured start SCN."""
    path = checkpoint_path(state_dir, database)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        doc = json.load(fh)
    for field in ("database", "scn", "idx", "resetlogs", "activation"):
        if field not in doc:
            raise ValueError(f"{path}: missing checkpoint field {field!r}")
    if doc["database"] != database:
        # the reference validates the BODY's database name against the
        # requested one, not just the filename — a doc copied between
        # deployments must fail loudly, never position a foreign stream
        # (Writer::readCheckpoint, Writer.cpp:424-426, error 20001)
        raise ValueError(
            f"{path}: invalid database name: {doc['database']!r} "
            f"(expected {database!r}) — reference error 20001"
        )
    return doc


def advance_checkpoint_doc(
    state_dir: str, database: str, scn: int, idx: int = 0
) -> bool:
    """Monotone doc advance shared by every sink that persists the
    confirmed watermark: rewrite the document only when ``(scn, idx)``
    is LEXICOGRAPHICALLY beyond what it already records (a replayed
    batch or stale CONFIRM must never regress it; comparing scn alone
    silently discarded intra-scn idx progress — the exact field idx
    exists for, r12 review pass). Carries the incarnation identifiers
    (resetlogs/activation) from the previous document rather than
    resetting them to 0. Returns True when the doc moved."""
    prev = read_checkpoint_doc(state_dir, database)
    if prev is not None and (int(prev["scn"]), int(prev["idx"])) >= (
        int(scn), int(idx)
    ):
        return False
    write_checkpoint_doc(
        state_dir, database, scn=int(scn), idx=int(idx),
        resetlogs=int(prev["resetlogs"]) if prev else 0,
        activation=int(prev["activation"]) if prev else 0,
    )
    return True


def resume_scn(state_dir: str, database: str, default_scn: int = 0) -> int:
    """O3 startup positioning from the portable document."""
    doc = read_checkpoint_doc(state_dir, database)
    return int(doc["scn"]) if doc else default_scn


def gc_schema_snapshots(
    state_dir: str, database: str, keep: int = 100
) -> list[str]:
    """O4 checkpoint GC (Metadata::deleteOldCheckpoints,
    Metadata.cpp:584-596; ``state.keep-checkpoints``, default 100):
    keep the ``keep`` newest schema snapshots for the database, delete
    the older ones. Returns the deleted paths."""
    prefix = f"{database}-schema-"
    found: list[tuple[int, str]] = []
    if not os.path.isdir(state_dir):
        return []
    for fn in os.listdir(state_dir):
        if fn.startswith(prefix) and fn.endswith(".json"):
            try:
                found.append((int(fn[len(prefix):-5]), fn))
            except ValueError:
                continue
    found.sort(reverse=True)
    deleted = []
    for _scn, fn in found[keep:]:
        path = os.path.join(state_dir, fn)
        try:
            os.remove(path)
            deleted.append(path)
        except OSError:
            pass
    return deleted


def export_schema_snapshot(
    dict_versions: DataFrame,
    state_dir: str,
    database: str,
    scn: int,
    resetlogs: int = 0,
    activation: int = 0,
    keep: int | None = None,
) -> str:
    """Serialize the versioned dictionary into a reference-shaped schema
    document: header fields per SerializerJson::serialize, one sys-obj
    array entry per dictionary version (obj/owner/name/type + the version
    SCN; dropped versions are tombstones the deserializer re-applies)."""
    rows = dict_versions.select(
        "obj", "scn_from", "owner", "name", "type", "dropped"
    ).collect()
    doc = {
        "database": database,
        "scn": int(scn),
        "resetlogs": int(resetlogs),
        "activation": int(activation),
        "sys-obj": [
            {
                "obj": r.obj,
                "scn-from": r.scn_from,
                "owner": r.owner,
                "name": r.name,
                "type": r.type,
                "dropped": bool(r.dropped) if r.dropped is not None else False,
            }
            for r in sorted(rows, key=lambda r: (r.obj, r.scn_from))
        ],
    }
    os.makedirs(state_dir, exist_ok=True)
    path = schema_path(state_dir, database, scn)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, separators=(",", ":"))
    os.replace(tmp, path)
    if keep is not None:
        # the reference GCs after every checkpoint write
        # (Metadata::writeCheckpoint → deleteOldCheckpoints)
        gc_schema_snapshots(state_dir, database, keep)
    return path


def import_schema_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """Deserialize a schema snapshot back into the registry's versioned
    DataFrame shape — a cold start resumes as-of resolution exactly where
    the exporting run left it (SerializerJson::deserialize)."""
    with open(path) as fh:
        doc = json.load(fh)
    rows = [
        (
            e["obj"],
            e["scn-from"],
            e["owner"],
            e["name"],
            e["type"],
            e.get("dropped", False),
        )
        for e in doc["sys-obj"]
    ]
    return spark.createDataFrame(
        rows,
        "obj long, scn_from long, owner string, name string, type string, dropped boolean",
    )


def latest_schema_snapshot(state_dir: str, database: str) -> str | None:
    """Highest-SCN snapshot in the state dir (the reference keeps several
    and loads the newest at-or-before the resume SCN)."""
    prefix = f"{database}-schema-"
    best: tuple[int, str] | None = None
    if not os.path.isdir(state_dir):
        return None
    for fn in os.listdir(state_dir):
        if fn.startswith(prefix) and fn.endswith(".json"):
            try:
                scn = int(fn[len(prefix):-5])
            except ValueError:
                continue
            if best is None or scn > best[0]:
                best = (scn, os.path.join(state_dir, fn))
    return best[1] if best else None
