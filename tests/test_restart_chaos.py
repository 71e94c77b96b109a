"""Adversarial randomized restart harness for the W7 boundary contract
(r10 VERDICT #1).

Round 10 settled the restart contract after four designs in one round —
each silent-loss bug found only by the NEXT review pass, never by a
test. This harness replaces hand-picked scenarios with randomized
schedules and kill points over the REAL sink state machines
(`FileFunnelCore`, `NetworkFunnelCore`, `StreamServer` — the Spark
foreachBatch wrappers are thin row adapters over these), asserting the
settled contract on every run:

  * ZERO LOSS: every committed transaction's messages reach the sink at
    least once, no matter where the process dies;
  * BOUNDED DUPLICATES: a message delivers more than once ONLY inside
    an explicitly-allowed at-least-once window — the boundary scn's
    already-written prefix on a doc cold start, a partially-written
    batch replay after a mid-batch crash, or a client re-delivery of
    unconfirmed frames — the same window the reference's restart has
    between sendMessage and the confirm checkpoint
    (Writer.cpp:130-140; cold start Writer.cpp:235-268;
    documentation/checkpoint/8.checkpointing.adoc).

Schedule randomization (the failure modes pass 3-6 found by reading):
commit-scn COLLISIONS (two transactions sharing a commit scn), commits
STRADDLING micro-batches (the shared scn split across batches),
INCOMPLETE-transaction diagnostics (NULL commit scn), chkpt HEARTBEAT
interleavings, single-message and empty-tail batches. Kill
randomization: between batches, after a batch's rows but before its
offset commit (foreachBatch retry), and MID-batch (rows partially
written, sidecar/doc not advanced); each kill is followed by a WARM
restart (Spark checkpoint intact — same batch ids and contents replay
from the first uncommitted batch) or a COLD doc-only restart (Spark
checkpoint lost — re-emission filtered on the portable checkpoint
document exactly as `engine._doc_resume_predicate` does: file funnel
strict ``commit_scn > doc``, network ``>=`` re-emitting the boundary
whole, NULL-commit diagnostics always pass).

The oracle is the sequential no-kill run of the same schedule. No
SparkSession anywhere: hundreds of randomized schedules run in seconds
against the same state machines the engine wires.

On "unprobeable classification" (the r10 ask's third network case):
since review pass 6 removed the cold-start classifier, the engine has
NO warm/cold branch to misclassify — the doc predicate is always in
the plan and Spark's own offset log decides replay, so the chaos
matrix's warm and cold arms cover the whole behavior space; the only
remaining classification (the legacy-checkpoint-layout guard) is
fail-safe-to-loud by its pinned docstring contract.
"""

from __future__ import annotations

import json
import os
import random
from collections import Counter

import pytest

from openlogreplicator_spark.metadata.state_documents import (
    read_checkpoint_doc,
)
from openlogreplicator_spark.streaming.file_writer import FileFunnelCore
from openlogreplicator_spark.streaming.stream_network import (
    RESP_REPLICATE,
    NetworkFunnelCore,
    StreamServer,
    StreamClient,
    recv_frame,
)


class _Kill(Exception):
    """Simulated process death."""


class _CaptureWriter:
    """RotatingFileWriter stand-in: frames are durable the moment
    ``write`` returns (the rotating writer appends to the OS file),
    which is exactly the property the at-least-once window is about."""

    def __init__(self) -> None:
        self.frames: list[bytes] = []

    def write(self, data: bytes, seq: int = 0) -> None:
        self.frames.append(bytes(data))

    def flush(self) -> None:
        pass


# ---------------------------------------------------------------------------
# schedule generation
# ---------------------------------------------------------------------------


def _gen_schedule(rng: random.Random):
    """Random transaction workload.

    Returns (txns, heartbeats, diags):
      txns: [{xid, scn, msgs: [payload bytes]}] — commit-scn collisions
            on purpose (scn step is often 0);
      heartbeats: [(scn, payload)] — chkpt rows, NULL xid, never doc;
      diags: [{xid, scn, msgs}] — SHOW_INCOMPLETE diagnostics, NULL
            commit scn (scn here is only their emission sort key).
    """
    txns = []
    scn = 100
    for i in range(rng.randint(3, 10)):
        if i:
            scn += rng.choice([0, 0, 10, 10, 20])  # collisions likely
        xid = f"x{i}"
        msgs = [
            f"{xid}/{j}".encode() for j in range(rng.randint(1, 4))
        ]
        txns.append({"xid": xid, "scn": scn, "msgs": msgs})
    heartbeats = []
    for h in range(rng.randint(0, 3)):
        hscn = rng.choice(txns)["scn"]
        heartbeats.append((hscn, f"hb@{hscn}#{h}".encode()))
    diags = []
    for d in range(rng.randint(0, 2)):
        dscn = rng.choice(txns)["scn"] + rng.choice([0, 5])
        diags.append(
            {
                "xid": f"inc{d}",
                "scn": dscn,
                "msgs": [f"inc{d}/0".encode()],
            }
        )
    return txns, heartbeats, diags


def _make_batches(rng, txns, heartbeats, diags, monotone=True):
    """Random micro-batch plan over the emission model: assembly emits
    a committed transaction WHOLE in the batch where its commit lands;
    transactions sharing a commit scn may land in different consecutive
    batches (the straddle failure mode); within a batch the funnel
    sorts by (_oscn, _oxid nulls last, _oidx) — mirrored here. A batch
    row is (payload, scn, is_data, xid, num). ``monotone=False`` cuts
    the txns in a SHUFFLED order: commits then interleave
    non-monotonically across batches — the non-sequence-ordered
    multi-file replay the r11 freeze/clamp hardening covers."""
    ordered = sorted(txns, key=lambda t: t["scn"])
    if not monotone:
        ordered = list(txns)
        rng.shuffle(ordered)
    n = len(ordered)
    if n == 0:
        groups = [[]]   # heartbeats/diags still need a batch to ride
    else:
        n_batches = rng.randint(1, n)
        cuts = (
            sorted(rng.sample(range(1, n), n_batches - 1)) if n > 1 else []
        )
        groups = []
        prev = 0
        for c in cuts + [n]:
            groups.append(ordered[prev:c])
            prev = c
    batches = []
    for g in groups:
        rows = [
            (p, t["scn"], True, t["xid"], j)
            for t in g
            for j, p in enumerate(t["msgs"])
        ]
        batches.append(rows)
    # heartbeats/diags ride a random batch (unthrottled source: any
    # interleaving is legal)
    for hscn, hp in heartbeats:
        b = rng.randrange(len(batches))
        batches[b].append((hp, hscn, False, None, 0))
    for d in diags:
        b = rng.randrange(len(batches))
        for j, p in enumerate(d["msgs"]):
            batches[b].append((p, d["scn"], False, d["xid"], j))
    for rows in batches:
        # order_encoded_messages: scn, xid NULLS LAST, op index
        rows.sort(key=lambda r: (r[1], r[3] is None, r[3] or "", r[4]))
    return batches


def _refilter(rng, txns, heartbeats, diags, doc_scn, boundary_whole,
              monotone=True):
    """Cold-start re-emission set: mirrors engine._doc_resume_predicate
    — strict ``commit_scn > doc`` for the file funnel (its doc records
    only COMPLETE commit scns), ``>=`` for the network sink (its doc
    can record a mid-transaction watermark, so the boundary re-emits
    whole); NULL-commit diagnostics always pass; heartbeats re-read
    unconditionally (unthrottled source)."""
    if doc_scn is None:
        keep = txns
    elif boundary_whole:
        keep = [t for t in txns if t["scn"] >= doc_scn]
    else:
        keep = [t for t in txns if t["scn"] > doc_scn]
    return _make_batches(rng, keep, heartbeats, diags, monotone)


def _kill_plan(rng, monotone=True):
    """(kill_kind, restart_kind): kill ∈ {none, pre_commit, mid_batch},
    restart ∈ {warm, cold}. Non-monotone replays get WARM restarts
    only: a doc-based COLD start is only zero-loss under the
    sequence-ordered input contract (an inversion still sitting in an
    unprocessed batch is invisible to any online completeness proof —
    the freeze/cap hardening bounds the observed case, and the
    engine documents the contract)."""
    kill = rng.choice(["none", "none", "pre_commit", "mid_batch",
                       "mid_batch"])
    restart = rng.choice(["warm", "cold"]) if monotone else "warm"
    return kill, restart


# ---------------------------------------------------------------------------
# file funnel chaos
# ---------------------------------------------------------------------------


def _run_file_schedule(seed: int, tmpdir: str) -> None:
    rng = random.Random(seed)
    txns, heartbeats, diags = _gen_schedule(rng)
    oracle = {p: t["scn"] for t in txns for p in t["msgs"]}
    diag_payloads = {p for d in diags for p in d["msgs"]}
    hb_payloads = {p for _, p in heartbeats}

    state_dir = os.path.join(tmpdir, f"state{seed}")
    # aggressive pacing (every batch) vs lazy (first forced doc only):
    # both must satisfy the contract
    interval_s = rng.choice([0, 10 ** 9])
    # 40% of schedules replay non-sequence-ordered files: commits
    # interleave non-monotonically across batches and the doc must
    # FREEZE at the first inversion (r11 hardening) instead of
    # advancing past unwritten transactions
    monotone = rng.random() < 0.6
    writer = _CaptureWriter()
    allowed = Counter()  # payload → extra deliveries permitted
    segments = []        # (start, end) frame ranges per session

    batches = _make_batches(rng, txns, heartbeats, diags, monotone)
    committed = 0   # Spark offset log: batches whose offsets committed
    ckpt_gen = 0    # cold start = fresh checkpoint dir = fresh sidecar
    kills = 0

    written_set = set()

    def _doc_sound(where: str) -> None:
        """THE doc invariant, checked continuously on SEQUENCE-ORDERED
        schedules (where the contract promises it): at no point may the
        persisted doc cover a commit scn whose messages are not yet
        durably written — the exact loss window the r10 pass-6 bugs
        (heartbeat advance, incomplete-scn advance) lived in. Checked
        mid-run, not just at the end, so a bad advance is caught the
        batch it happens even if no cold start ever consumes it. The
        non-monotone arm cannot promise this before an inversion is
        OBSERVED (the documented unread-inversion limit), so there the
        freeze's contract is pinned deterministically instead
        (test_file_doc_freezes_on_observed_inversion)."""
        if not monotone:
            return
        doc = read_checkpoint_doc(state_dir, "DB")
        if doc is None:
            return
        written_set.clear()
        written_set.update(writer.frames)
        bad = [
            p for p, pscn in oracle.items()
            if pscn <= int(doc["scn"]) and p not in written_set
        ]
        assert not bad, (
            f"seed {seed} [{where}]: doc at {doc['scn']} covers "
            f"unwritten {bad}"
        )

    while True:
        core = FileFunnelCore(
            writer,
            state_path=os.path.join(
                tmpdir, f"ckpt{seed}-{ckpt_gen}", "sidecar"
            ),
            state_dir=state_dir,
            database="DB",
            interval_s=interval_s,
            interval_mb=10 ** 9,
        )
        seg_start = len(writer.frames)
        kill, restart = (
            _kill_plan(rng, monotone) if kills < 4 else ("none", "warm")
        )
        died = False
        for bid in range(committed, len(batches)):
            rows = batches[bid]
            do_kill = kill != "none" and (
                bid == len(batches) - 1 or rng.random() < 0.5
            )
            if core.skip_batch(bid):
                committed = bid + 1
                continue
            # FileFunnelCore.feed rows: (data, commit_scn, is_data, seq)
            feed_rows = [(p, scn, d, 1) for p, scn, d, _x, _n in rows]
            if do_kill and kill == "mid_batch":
                k = rng.randrange(len(rows) + 1) if rows else 0
                partial = feed_rows[:k]

                def feed_then_die(prefix=partial):
                    yield from prefix
                    raise _Kill()

                try:
                    core.feed(feed_then_die(), bid)
                except _Kill:
                    pass
                if restart == "warm":
                    # the warm replay rewrites the partial prefix (the
                    # sidecar never recorded this batch) — the
                    # documented at-least-once window; a cold restart
                    # is covered by the boundary allowance instead
                    for p, _scn, _is_data, _seq in partial:
                        allowed[p] += 1
                died = True
                break
            core.feed(iter(feed_rows), bid)
            _doc_sound(f"batch {bid}")
            if do_kill and kill == "pre_commit":
                # batch rows + sidecar are durable, offsets are NOT:
                # warm restart replays this batch id and the sidecar
                # skip must make the replay a no-op (no allowance!)
                died = True
                break
            committed = bid + 1
        segments.append((seg_start, len(writer.frames)))
        if not died:
            break
        kills += 1
        if restart == "cold":
            doc = read_checkpoint_doc(state_dir, "DB")
            doc_scn = int(doc["scn"]) if doc else None
            # every already-written data frame the predicate re-emits
            # is an allowed duplicate — the boundary's written prefix
            # (the re-emission writes each eligible message once, so
            # +1 per DISTINCT written frame)
            for f in set(writer.frames):
                if f in oracle and (doc_scn is None or oracle[f] > doc_scn):
                    allowed[f] += 1
                elif f in diag_payloads or f in hb_payloads:
                    allowed[f] += 1
            batches = _refilter(
                rng, txns, heartbeats, diags, doc_scn,
                boundary_whole=False, monotone=monotone,
            )
            committed = 0
            ckpt_gen += 1
        # warm restart: same batches, same ids, resume at `committed`

    data_written = [f for f in writer.frames if f in oracle]
    got = Counter(data_written)
    # 1. ZERO LOSS — every committed transaction message written
    missing = [p for p in oracle if got[p] == 0]
    assert not missing, (
        f"seed {seed}: LOST messages {missing}; doc="
        f"{read_checkpoint_doc(state_dir, 'DB')}"
    )
    # 2. BOUNDED DUPLICATES — extras only inside the allowed windows
    for p, n in got.items():
        assert n - 1 <= allowed[p], (
            f"seed {seed}: {p!r} written {n}× but only "
            f"{allowed[p]} duplicate(s) allowed"
        )
    # 3. per-session emission order: data frames non-decreasing in scn
    #    (only the sequence-ordered replay promises this)
    if monotone:
        for s, e in segments:
            scns = [oracle[f] for f in writer.frames[s:e] if f in oracle]
            assert scns == sorted(scns), (
                f"seed {seed}: out-of-order emission within a session"
            )
    # 4. the doc never records an incomplete scn: everything at or
    #    below it must be fully written (the complete-commit-scn rule)
    doc = read_checkpoint_doc(state_dir, "DB")
    if doc is not None:
        for p, pscn in oracle.items():
            if pscn <= int(doc["scn"]):
                assert got[p] >= 1, (
                    f"seed {seed}: doc at {doc['scn']} covers unwritten "
                    f"{p!r} (scn {pscn})"
                )


@pytest.mark.parametrize("block", range(10))
def test_file_funnel_chaos_zero_loss_bounded_dups(block, tmp_path):
    """300 randomized schedules × random kill points through the REAL
    FileFunnelCore: zero loss, duplicates confined to the boundary
    windows, per-session order, complete-scn doc invariant."""
    for seed in range(block * 30, (block + 1) * 30):
        _run_file_schedule(seed, str(tmp_path))

# ---------------------------------------------------------------------------
# network sink chaos (real StreamServer + StreamClient over loopback)
# ---------------------------------------------------------------------------


class _QueueMirror:
    """The client-side protocol model: replays the WriterStream queue
    semantics (enqueue order, CONFIRM prune, CONTINUE/START cursor —
    WriterStream.cpp:165-232) so the harness client can attribute an
    exact (scn, idx) to every raw frame it receives, the metadata a
    real protobuf client reads from the RedoResponse header. Every
    received frame is cross-checked against the mirror's predicted
    next frame, so any divergence between the REAL server's delivery
    and the protocol spec fails the run immediately instead of
    silently skewing the confirm watermark."""

    def __init__(self) -> None:
        self.q: list[tuple[int, int, bytes]] = []
        self.cursor = 0
        self.wm = (0, 0)

    def enqueue(self, scn: int, idx: int, frame: bytes) -> None:
        self.q.append((scn, idx, frame))

    def _prune_le(self, c_scn: int, c_idx: int) -> None:
        # full-queue prune, mirroring StreamServer._prune_le: a batch
        # replay's duplicate can sit DEEP behind higher keys
        keep = []
        removed_before = 0
        for i, entry in enumerate(self.q):
            if entry[0] < c_scn or (
                entry[0] == c_scn and entry[1] <= c_idx
            ):
                if i < self.cursor:
                    removed_before += 1
                continue
            keep.append(entry)
        self.q[:] = keep
        self.cursor = max(0, self.cursor - removed_before)

    def on_confirm(self, c_scn: int, c_idx: int) -> None:
        if (c_scn, c_idx) <= self.wm:
            return  # server ignores stale/duplicate confirms
        self._prune_le(c_scn, c_idx)
        self.wm = (c_scn, c_idx)

    def on_continue(self, c_scn: int, c_idx: int) -> None:
        # r12 semantics: destructive prune only at the CONFIRMED
        # watermark (provable duplicates); the client's claimed
        # watermark only repositions the cursor past the leading
        # ≤-claim run — the reference's CONTINUE never destroys
        self._prune_le(*self.wm)
        cur = 0
        for scn, idx, _f in self.q:
            if scn < c_scn or (scn == c_scn and idx <= c_idx):
                cur += 1
            else:
                break
        self.cursor = cur

    def on_start(self) -> None:
        self.cursor = 0

    def next_meta(self, frame: bytes) -> tuple[int, int]:
        scn, idx, expect = self.q[self.cursor]
        assert expect == frame, (
            "server delivery diverged from the WriterStream protocol "
            f"model: expected {expect!r} at cursor, got {frame!r}"
        )
        self.cursor += 1
        return scn, idx

    def clear(self) -> None:
        """Server process death: the in-memory queue is gone."""
        self.q.clear()
        self.cursor = 0


class _MirroringServer:
    """Producer-side proxy: records every enqueue into the mirror so
    the client can attribute frames; delegates everything else to the
    real server (NetworkFunnelCore reads confirmed_scn/idx for its
    watermark seeding)."""

    def __init__(self, server: StreamServer, mirror: _QueueMirror):
        self._server = server
        self._mirror = mirror

    def enqueue(self, scn: int, idx: int, frame: bytes) -> None:
        self._mirror.enqueue(scn, idx, frame)
        self._server.enqueue(scn, idx, frame)

    @property
    def confirmed_scn(self) -> int:
        return self._server.confirmed_scn

    @property
    def confirmed_idx(self) -> int:
        return self._server.confirmed_idx

    def set_doc_cap(self, scn: int) -> None:
        # forward the inversion doc cap — hiding it from the real
        # server would silently disable the r11 hardening under test
        self._server.set_doc_cap(scn)


def _raw_recv_tcp(client):
    return recv_frame(client._sock)


def _raw_recv_zmq(client):
    return client._pair.recv()


# transport matrix: the W5 ZMQ server/client share the WriterStream
# state machine (queue, CONTINUE, CONFIRM) — only the framing differs,
# so the same randomized schedules drive both
_TRANSPORTS = {
    "tcp": (StreamServer, StreamClient, _raw_recv_tcp),
}


def _zmq_transport():
    from openlogreplicator_spark.streaming.stream_network import (
        ZmqStreamClient,
        ZmqStreamServer,
    )

    return ZmqStreamServer, ZmqStreamClient, _raw_recv_zmq


def _drain_frames(client, raw_recv, budget: float = 0.3):
    """Receive raw data frames until the stream goes quiet."""
    import select as _select

    out = []
    while True:
        r, _, _ = _select.select([client._sock], [], [], budget)
        if not r:
            return out
        f = raw_recv(client)
        if f is None:
            return out
        out.append(f)


def _settle_confirm(server: StreamServer, want: tuple[int, int]) -> None:
    """CONFIRM is fire-and-forget; wait until the server applied it so
    the mirror and the server watermark agree before the next step."""
    import time

    for _ in range(200):
        if (server.confirmed_scn, server.confirmed_idx) >= want:
            return
        time.sleep(0.01)
    raise AssertionError(f"server never applied CONFIRM {want}")


def _run_network_schedule(seed: int, tmpdir: str,
                          transport: str = "tcp") -> None:
    rng = random.Random(seed)
    txns, heartbeats, diags = _gen_schedule(rng)
    oracle = {p: t["scn"] for t in txns for p in t["msgs"]}
    state_dir = os.path.join(tmpdir, f"net{seed}")

    mirror = _QueueMirror()
    received: list[tuple[int, int, bytes]] = []   # (scn, idx, frame)
    allowed = Counter()

    monotone = rng.random() < 0.6
    batches = _make_batches(rng, txns, heartbeats, diags, monotone)
    committed = 0
    kills = 0
    server_cls, client_cls, raw_recv = (
        _TRANSPORTS[transport] if transport in _TRANSPORTS
        else _zmq_transport()
    )
    server = server_cls("DB", state_dir=state_dir)
    proxy = _MirroringServer(server, mirror)
    client = client_cls("127.0.0.1", server.address[1], "DB")
    client.start()
    mirror.on_start()
    confirmed = (0, 0)

    def drain_and_maybe_confirm():
        nonlocal confirmed
        frames = _drain_frames(client, raw_recv)
        for f in frames:
            scn, idx = mirror.next_meta(f)
            received.append((scn, idx, f))
        if frames and rng.random() < 0.8:
            # confirm the exact (scn, idx) of a received frame — the
            # faithful client watermark (the reference's Debezium
            # client confirms the header's c_scn/c_idx). Half the time
            # pick the HIGHEST key received: that is where an
            # ahead-of-data heartbeat would sit, the exact frame whose
            # confirm once pushed the doc past unemitted transactions
            # (the bug class the non-data key rule closes)
            if rng.random() < 0.5:
                scn, idx, _ = max(received, key=lambda t: (t[0], t[1]))
            else:
                scn, idx, _ = received[rng.randrange(len(received))]
            if (scn, idx) > confirmed:
                client.confirm(scn, idx)
                _settle_confirm(server, (scn, idx))
                mirror.on_confirm(scn, idx)
                confirmed = (scn, idx)

    def reconnect():
        nonlocal client
        try:
            client.close()
        except OSError:
            pass
        # frames above the confirmed watermark legally re-deliver
        for scn, idx, f in received:
            if (scn, idx) > confirmed:
                allowed[f] += 1
        client = client_cls("127.0.0.1", server.address[1], "DB")
        client.resume(confirmed[0] or None, confirmed[1])
        mirror.on_continue(*confirmed)

    try:
        while True:
            core = NetworkFunnelCore(proxy)
            kill, restart = (
                _kill_plan(rng, monotone) if kills < 4 else ("none", "warm")
            )
            died = False
            for bid in range(committed, len(batches)):
                rows = batches[bid]
                pairs = [(scn, d, p) for (p, scn, d, _x, _n) in rows]
                do_kill = kill != "none" and (
                    bid == len(batches) - 1 or rng.random() < 0.5
                )
                if do_kill and kill == "mid_batch":
                    k = rng.randrange(len(pairs) + 1) if pairs else 0

                    def feed_then_die(prefix=pairs[:k]):
                        yield from prefix
                        raise _Kill()

                    try:
                        core.feed(feed_then_die(), bid)
                    except _Kill:
                        pass
                    for _scn, _d, p in pairs[:k]:
                        allowed[p] += 1   # whole batch replays warm
                    died = True
                    break
                core.feed(iter(pairs), bid)
                if do_kill and kill == "pre_commit":
                    # enqueued whole but offsets never committed: the
                    # warm replay re-enqueues the batch byte- and
                    # idx-identically (batch snapshot) — duplicates the
                    # client dedups via its watermark, but an eager
                    # drain may hold both copies: allowed window
                    for _scn, _d, p in pairs:
                        allowed[p] += 1
                    died = True
                    break
                committed = bid + 1
                if rng.random() < 0.5:
                    drain_and_maybe_confirm()
            if not died:
                break
            kills += 1
            if rng.random() < 0.6:
                drain_and_maybe_confirm()
                if rng.random() < 0.4:
                    reconnect()
            else:
                # CLIENT CRASH without draining: socket-buffered frames
                # are lost unread — everything above the confirmed
                # watermark must re-deliver after CONTINUE. This is the
                # arm that makes queue-key monotonicity load-bearing:
                # an inverted key at/below the watermark hiding in the
                # prefix would be CONTINUE-skipped undelivered (the
                # exact loss the r11 clamp closes)
                reconnect()
            if restart == "cold":
                # producer cold start from the doc the CONFIRMs
                # persisted (Writer.cpp:235-268 topology); sometimes
                # the SERVER died too — its in-memory queue is gone and
                # the new instance hydrates the watermark from the doc
                doc = read_checkpoint_doc(state_dir, "DB")
                doc_scn = int(doc["scn"]) if doc else None
                if rng.random() < 0.5:
                    server.stop()
                    try:
                        client.close()
                    except OSError:
                        pass
                    for scn, idx, f in received:
                        if (scn, idx) > confirmed:
                            allowed[f] += 1
                    mirror.clear()
                    server = server_cls("DB", state_dir=state_dir)
                    proxy = _MirroringServer(server, mirror)
                    client = client_cls(
                        "127.0.0.1", server.address[1], "DB"
                    )
                    client.resume(confirmed[0] or None, confirmed[1])
                    mirror.on_continue(*confirmed)
                # every re-emitted message may duplicate a delivery of
                # its earlier enqueue — the boundary's written prefix
                for t in txns:
                    if doc_scn is None or t["scn"] >= doc_scn:
                        for p in t["msgs"]:
                            allowed[p] += 1
                for d in diags:
                    for p in d["msgs"]:
                        allowed[p] += 1
                for _hscn, hp in heartbeats:
                    allowed[hp] += 1
                batches = _refilter(
                    rng, txns, heartbeats, diags, doc_scn,
                    boundary_whole=True, monotone=monotone,
                )
                committed = 0
            # warm: same batches resume at `committed`; the fresh
            # NetworkFunnelCore seeds from the server watermark

        # final drain: everything still queued must reach the client
        drain_and_maybe_confirm()
        for f in _drain_frames(client, raw_recv):
            scn, idx = mirror.next_meta(f)
            received.append((scn, idx, f))
        got = Counter(f for _s, _i, f in received if f in oracle)
        # 1. ZERO LOSS at the client
        lost = [p for p in oracle if got[p] == 0]
        assert not lost, f"seed {seed}: client never received {lost}"
        # 2. BOUNDED DUPLICATES
        for p, n in got.items():
            assert n - 1 <= allowed[p], (
                f"seed {seed}: {p!r} delivered {n}× but only "
                f"{allowed[p]} duplicate(s) allowed"
            )
        # 3. delivery order already protocol-checked per frame by the
        #    mirror (next_meta asserts the exact expected frame)
    finally:
        try:
            client.close()
        except OSError:
            pass
        server.stop()


@pytest.mark.parametrize("block", range(5))
def test_network_sink_chaos_zero_loss_bounded_dups(block, tmp_path):
    """Randomized schedules through the REAL StreamServer/StreamClient
    loopback + NetworkFunnelCore: producer kills (mid-batch, pre-offset-
    commit), warm and cold producer restarts, full SERVER restarts
    (queue lost, watermark re-hydrated from the doc), client disconnects
    with CONTINUE watermark resumes — zero loss at the client,
    duplicates confined to the at-least-once windows."""
    for seed in range(block * 6, (block + 1) * 6):
        _run_network_schedule(seed, str(tmp_path))


@pytest.mark.parametrize("block", range(2))
def test_zmq_sink_chaos_zero_loss_bounded_dups(block, tmp_path):
    """The same randomized schedules over the W5 ZMTP PAIR transport
    (ZmqStreamServer/ZmqStreamClient) — the state machine is shared,
    the framing is not; transport-agnosticism gets randomized
    evidence, not just the deterministic handshake e2e."""
    for seed in range(100 + block * 6, 100 + (block + 1) * 6):
        _run_network_schedule(seed, str(tmp_path), transport="zmq")

# ---------------------------------------------------------------------------
# randomized e2e: REAL build_pipeline drains with foreachBatch crashes
# ---------------------------------------------------------------------------


class _KillingWriter:
    """RotatingFileWriter proxy that dies after N writes — a real
    foreachBatch crash mid-batch, so the full Spark replay machinery
    (offset log, batch-id sidecar, doc positioning) is exercised, not
    simulated. ``kill_flush`` kills on the Nth per-batch flush instead
    (1-based, BEFORE the batch-id sidecar advances): with the straddle
    fixture the early batches emit nothing — only a flush-point kill
    can land while the assembly state holds the open-transaction
    window, which is the restore path the r12 arm exists to exercise."""

    def __init__(self, inner, kill_after: int | None,
                 kill_flush: int | None = None):
        self._inner = inner
        self._kill_after = kill_after
        self._kill_flush = kill_flush
        self._n = 0
        self._flushes = 0

    def write(self, data: bytes, seq: int = 0) -> None:
        if self._kill_after is not None and self._n >= self._kill_after:
            raise OSError("chaos kill")
        self._n += 1
        self._inner.write(data, seq=seq)

    def flush(self) -> None:
        self._flushes += 1
        if self._kill_flush is not None and self._flushes >= self._kill_flush:
            raise OSError("chaos kill")
        self._inner.flush()

    def close(self) -> None:
        self._inner.close()


def _e2e_lines(out_dir) -> list[dict]:
    import json as _json

    rows = []
    for f in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, f)) as fh:
            rows += [
                _json.loads(line) for line in fh if line.strip()
            ]
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_e2e_file_pipeline_crash_restart_zero_loss(seed, spark, tmp_path):
    """Randomized end-to-end tie-back for the model harness: a real
    multi-file binary fixture drains through build_pipeline with
    maxFilesPerTrigger=1; the rotating writer CRASHES mid-batch at a
    random point; a warm restart (same checkpoint) and then a COLD
    doc-only restart (checkpoint deleted, W7 doc positioning) finish
    the drain. Contract: the no-kill oracle's messages all appear;
    duplicates only above the cold-start doc scn or inside the crashed
    batch (Writer.cpp:130-140 window)."""
    from conftest import drain
    from openlogreplicator_spark.config import EngineConfig, Format
    from openlogreplicator_spark.sources.binary_redo import (
        encode_redo_file,
    )
    from openlogreplicator_spark.streaming.engine import build_pipeline
    from openlogreplicator_spark.streaming.file_writer import (
        RotatingFileWriter,
    )

    rng = random.Random(seed)
    records = []
    scn = 10
    for t in range(8):
        xid = f"7.0.{t}"
        scn += rng.choice([0, 10])
        records.append(
            {"scn": scn, "subscn": 0, "block": 1, "offset": 0, "seq": 1,
             "xid": xid, "opcode": "begin", "obj": 9, "bdba": None,
             "slot": None, "fb": 0, "cols": None, "rows": None}
        )
        for j in range(rng.randint(1, 3)):
            records.append(
                {"scn": scn + 1, "subscn": j, "block": 1, "offset": 0,
                 "seq": 1, "xid": xid, "opcode": "insert", "obj": 9,
                 "bdba": 5, "slot": j, "fb": 0,
                 "cols": {"A": f"{xid}:{j}"}, "rows": None}
            )
        records.append(
            {"scn": scn + 5, "subscn": 0, "block": 1, "offset": 0,
             "seq": 1, "xid": xid, "opcode": "commit", "obj": 9,
             "bdba": None, "slot": None, "fb": 0, "cols": None,
             "rows": None}
        )
        scn += 10
    redo_dir = str(tmp_path / "redo")
    # SEQUENCE-ORDERED segments (the S4 scheduler's contract, which the
    # doc-based cold start requires): contiguous scn-ordered slices of
    # the redo, one OLRS file per sequence — a transaction may straddle
    # files (begin in one, commit in the next: the straddle case), but
    # commits never run backwards across files
    os.makedirs(redo_dir)
    cut = len(records) // 4
    import time as _time

    base_t = _time.time() - 1000
    for i in range(4):
        seg = records[i * cut: (i + 1) * cut if i < 3 else len(records)]
        for r in seg:
            r["seq"] = i + 1
        path = os.path.join(redo_dir, f"{i + 1:04d}.olrs")
        with open(path, "wb") as fh:
            fh.write(encode_redo_file(seg, sequence=i + 1))
        # files appear OVER TIME in the online contract — Spark's file
        # source orders batches by modification time, and same-instant
        # fixture writes would batch in undefined order (commits before
        # their ops: the assembly's in-order premise, like the
        # reference's sequential reader, Parser.cpp redo order)
        os.utime(path, (base_t + i * 10, base_t + i * 10))
    cfg = EngineConfig(
        fmt=Format(skip_begin=True, skip_commit=True),
        checkpoint_interval_s=0,   # aggressive doc pacing
    )

    def run(out, ckpt, state_dir, kill_after=None, expect_fail=False):
        os.makedirs(out, exist_ok=True)
        fw = RotatingFileWriter(
            os.path.join(out, "o-%3i.json"), max_file_size=1 << 20
        )
        w = _KillingWriter(fw, kill_after)
        q = build_pipeline(
            spark, cfg, redo_dir, checkpoint=ckpt,
            sink="file", file_writer=w,
            query_name=f"olr_chaos_e2e_{seed}",
            state_dir=state_dir, max_files_per_trigger=1,
        )
        if expect_fail:
            with pytest.raises(Exception, match="chaos kill"):
                q.awaitTermination(180)
            if q.isActive:
                q.stop()
        else:
            drain(q)
        fw.close()

    # oracle: clean drain
    oracle_out = str(tmp_path / "oracle")
    run(oracle_out, str(tmp_path / "ckpt_oracle"),
        str(tmp_path / "state_oracle"))
    oracle = [(r["scn"], r["payload"][0]["after"]["A"])
              for r in _e2e_lines(oracle_out)]
    assert len(oracle) == sum(1 for r in records
                              if r["opcode"] == "insert")

    # chaos: crash mid-drain, warm restart, then cold doc-only restart
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    state_dir = str(tmp_path / "state")
    kill_at = rng.randrange(1, len(oracle))
    run(out, ckpt, state_dir, kill_after=kill_at, expect_fail=True)
    # warm restart on the same checkpoint completes part of the drain,
    # then dies again at a later random point (or finishes)
    kill2 = rng.choice([None, rng.randrange(kill_at, len(oracle) + 1)])
    if kill2 is not None:
        from _pytest.outcomes import Failed

        try:
            run(out, ckpt, state_dir, kill_after=kill2,
                expect_fail=True)
        except Failed as e:
            # pytest.raises DID-NOT-RAISE: the second kill point fell
            # beyond the remaining work and the run simply completed —
            # valid; any OTHER Failed (e.g. a genuine pipeline error
            # failing the 'chaos kill' match) must surface
            if "DID NOT RAISE" not in str(e):
                raise
    # COLD doc-only restart: Spark checkpoint is gone, only the W7 doc
    # positions the re-read
    doc = read_checkpoint_doc(state_dir, cfg.fmt.db_name)
    doc_scn = int(doc["scn"]) if doc else None
    import shutil as _shutil

    _shutil.rmtree(ckpt, ignore_errors=True)
    run(out, str(tmp_path / "ckpt2"), state_dir)

    got = Counter((r["scn"], r["payload"][0]["after"]["A"])
                  for r in _e2e_lines(out))
    # 1. ZERO LOSS
    lost = [m for m in oracle if got[m] == 0]
    assert not lost, f"seed {seed}: lost {lost} (doc={doc_scn})"
    # 2. duplicates only above the cold-start boundary or from the
    #    crashed batches' written prefixes (same commit scn window)
    for (mscn, mid), n in got.items():
        if n > 1:
            assert doc_scn is None or mscn > doc_scn or n <= 2, (
                f"seed {seed}: {mid} duplicated {n}x at scn {mscn} "
                f"below doc {doc_scn}"
            )

# ---------------------------------------------------------------------------
# r12 arm: assembly-state restore under STRADDLE (the segment fixture)
# ---------------------------------------------------------------------------
#
# The 342 randomized schedules above exercise the SINK cores Spark-free,
# and the 3 file + 1 lake e2e runs kill a real pipeline — but none on a
# workload where open transactions actually cross the kill point. This
# arm kills a REAL build_pipeline drain over write_binary_redo_segments
# with an open window of _STRADDLE_N (≥ 1k) transactions live in the
# applyInPandasWithState checkpoint at the kill, then finishes via warm
# restart (assembly-state restore) and sometimes a cold doc-only
# restart, asserting the no-kill oracle. Reference semantics: a restart
# re-reads from the checkpoint scn and re-buffers open transactions
# (8.checkpointing.adoc:40-45 — the checkpoint records the scn of the
# oldest uncommitted transaction precisely so open windows survive).

_STRADDLE_N = 1100       # open window at the kill point — keep ≥ 1000
_STRADDLE_FILES = 6


@pytest.fixture(scope="module")
def straddle_fixture(spark, tmp_path_factory):
    """Deterministic segment workload where EVERY transaction straddles
    into the commit-phase files: begins fill files 1-2, inserts 3-4,
    commits 5-6 (scn ranges [1,N], [N+1,2N], [2N+1,3N] range-partition
    that way) — any kill before the commit batches leaves the whole
    _STRADDLE_N window open in assembly state. Built and oracle-drained
    once per module; the seeds randomize only kill schedules."""
    from openlogreplicator_spark.config import EngineConfig, Format
    from openlogreplicator_spark.event_model import REDO_RECORD_SCHEMA
    from openlogreplicator_spark.sources.binary_redo import (
        write_binary_redo_segments,
    )

    N = _STRADDLE_N
    rows = []
    for i in range(N):
        xid = f"9.1.{i}"
        rows.append((i + 1, 0, 1, 0, 1, xid, "begin", 9, None, None, 0,
                     None, None))
        rows.append((N + i + 1, 0, 1, 0, 1, xid, "insert", 9, 5, 0, 0,
                     {"A": xid}, None))
        rows.append((2 * N + i + 1, 0, 1, 0, 1, xid, "commit", 9, None,
                     None, 0, None, None))
    df = spark.createDataFrame(rows, REDO_RECORD_SCHEMA)
    base = tmp_path_factory.mktemp("straddle")
    redo_dir = str(base / "redo")
    write_binary_redo_segments(df, redo_dir, n_files=_STRADDLE_FILES)

    cfg = EngineConfig(
        fmt=Format(skip_begin=True, skip_commit=True),
        checkpoint_interval_s=0,
    )
    oracle_out = str(base / "oracle")
    _straddle_run(spark, cfg, redo_dir, oracle_out,
                  str(base / "ckpt_oracle"), str(base / "state_oracle"))
    oracle = [(r["scn"], r["payload"][0]["after"]["A"])
              for r in _e2e_lines(oracle_out)]
    assert len(oracle) == N and len(set(oracle)) == N
    return redo_dir, cfg, oracle


def _straddle_run(spark, cfg, redo_dir, out, ckpt, state_dir,
                  kill_after=None, kill_flush=None, tag="straddle"):
    """One pipeline (partial or full) over the straddle fixture; a kill
    schedule makes it raise 'chaos kill' mid-drain."""
    from conftest import drain
    from openlogreplicator_spark.streaming.engine import build_pipeline
    from openlogreplicator_spark.streaming.file_writer import (
        RotatingFileWriter,
    )

    os.makedirs(out, exist_ok=True)
    fw = RotatingFileWriter(
        os.path.join(out, "o-%3i.json"), max_file_size=1 << 22
    )
    w = _KillingWriter(fw, kill_after, kill_flush=kill_flush)
    q = build_pipeline(
        spark, cfg, redo_dir, checkpoint=ckpt,
        sink="file", file_writer=w,
        query_name=f"olr_chaos_{tag}",
        state_dir=state_dir, max_files_per_trigger=1,
    )
    try:
        if kill_after is not None or kill_flush is not None:
            with pytest.raises(Exception, match="chaos kill"):
                q.awaitTermination(180)
        else:
            drain(q)
    finally:
        if q.isActive:
            q.stop()
        fw.close()


@pytest.mark.parametrize("seed", range(200, 210))
def test_e2e_straddle_assembly_state_restore(seed, straddle_fixture,
                                             spark, tmp_path):
    """≥1k open transactions cross every kill point: a flush-point kill
    lands in the buffering phase (nothing emitted yet — the restart
    must restore the WHOLE open window from the state checkpoint), a
    write-count kill lands mid-emission (state restore plus sink
    replay). Warm restart finishes the drain; half the seeds then also
    prove the state checkpoint is not load-bearing for durability by
    deleting it (cold doc-only restart). Contract vs the no-kill
    oracle: zero loss, no spurious messages, duplicates bounded by the
    crash/cold windows."""
    redo_dir, cfg, oracle = straddle_fixture
    rng = random.Random(seed)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    state_dir = str(tmp_path / "state")
    # EXACT duplicate ledger: only a killed run's written delta (its
    # in-flight batch may replay) and the cold re-read above the doc
    # may legally duplicate — a blanket per-kill allowance would absorb
    # a doc-positioning regression (mutation audit, r12)
    allowed = Counter()
    written = Counter()

    def _snapshot_delta():
        now = Counter((r["scn"], r["payload"][0]["after"]["A"])
                      for r in _e2e_lines(out))
        delta = now - written
        written.clear()
        written.update(now)
        return delta

    # first kill: buffering phase (the whole open window live in
    # state — nothing emitted yet) or mid-emission
    if rng.random() < 0.5:
        kill_flush = rng.randint(1, _STRADDLE_FILES - 2)
        _straddle_run(spark, cfg, redo_dir, out, ckpt, state_dir,
                      kill_flush=kill_flush, tag=f"s{seed}k1")
    else:
        kill_after = rng.randrange(0, len(oracle))
        _straddle_run(spark, cfg, redo_dir, out, ckpt, state_dir,
                      kill_after=kill_after, tag=f"s{seed}k1")
    allowed.update(_snapshot_delta())

    # sometimes a second kill on the warm restart, mid-emission
    if rng.random() < 0.4:
        from _pytest.outcomes import Failed

        try:
            _straddle_run(
                spark, cfg, redo_dir, out, ckpt, state_dir,
                kill_after=rng.randrange(0, len(oracle)),
                tag=f"s{seed}k2",
            )
            allowed.update(_snapshot_delta())
        except Failed as e:
            # ONLY the kill point falling beyond the remaining work
            # (run completed without raising) is benign; a Failed from
            # a genuine pipeline error failing the 'chaos kill' match
            # must surface, not be re-baselined away (r12 review pass)
            if "DID NOT RAISE" not in str(e):
                raise
            _snapshot_delta()

    # warm restart finishes the drain: the assembly state checkpoint
    # must restore the open window the kill left behind
    _straddle_run(spark, cfg, redo_dir, out, ckpt, state_dir,
                  tag=f"s{seed}warm")
    _snapshot_delta()

    cold = rng.random() < 0.5
    doc_scn = None
    if cold:
        # cold doc-only restart AFTER a complete drain: the Spark
        # checkpoint (offsets AND the assembly state store) is deleted
        # — only the W7 doc positions the re-read, which must re-buffer
        # open transactions at the boundary from the redo itself and
        # re-emit NOTHING below the doc scn
        import shutil as _shutil

        doc = read_checkpoint_doc(state_dir, cfg.fmt.db_name)
        doc_scn = int(doc["scn"]) if doc else None
        _shutil.rmtree(ckpt, ignore_errors=True)
        _straddle_run(spark, cfg, redo_dir, out, str(tmp_path / "ckpt2"),
                      state_dir, tag=f"s{seed}cold")
        # the doc boundary lives in COMMIT-scn space; a message's own
        # scn is its record scn (insert at N+i+1, commit at 2N+i+1)
        for (mscn, mid) in oracle:
            commit_scn = 2 * _STRADDLE_N + int(mid.rsplit(".", 1)[1]) + 1
            if doc_scn is None or commit_scn >= doc_scn:
                allowed[(mscn, mid)] += 1

    got = Counter((r["scn"], r["payload"][0]["after"]["A"])
                  for r in _e2e_lines(out))
    # 1. ZERO LOSS — every oracle message arrived (the open window
    #    survived the kill via state restore or doc re-read)
    lost = [m for m in oracle if got[m] == 0]
    assert not lost, (
        f"seed {seed}: lost {len(lost)} of {len(oracle)} "
        f"(first {lost[:3]}, doc={doc_scn}, cold={cold})"
    )
    # 2. NO SPURIOUS messages
    assert set(got) <= set(oracle), (
        f"seed {seed}: spurious {sorted(set(got) - set(oracle))[:3]}"
    )
    # 3. EXACTLY BOUNDED DUPLICATES per the ledger
    for m, n in got.items():
        assert n - 1 <= allowed[m], (
            f"seed {seed}: {m} delivered {n}× but only {allowed[m]} "
            f"duplicate(s) allowed (doc={doc_scn}, cold={cold})"
        )


class _EnqueueKillingServer:
    """StreamServer proxy that dies after N enqueues — a real
    foreachBatch crash mid-emission through the NETWORK funnel, so the
    warm restart exercises Spark state restore + the funnel's
    watermark re-seed + the confirm protocol together."""

    def __init__(self, server, kill_after=None):
        self._server = server
        self._kill_after = kill_after
        self._n = 0

    def enqueue(self, scn: int, idx: int, frame: bytes) -> None:
        if self._kill_after is not None and self._n >= self._kill_after:
            raise OSError("chaos kill")
        self._n += 1
        self._server.enqueue(scn, idx, frame)

    @property
    def confirmed_scn(self) -> int:
        return self._server.confirmed_scn

    @property
    def confirmed_idx(self) -> int:
        return self._server.confirmed_idx

    def set_doc_cap(self, scn: int) -> None:
        self._server.set_doc_cap(scn)


@pytest.mark.parametrize("seed", range(300, 305))
def test_e2e_straddle_network_sink_state_restore(seed, straddle_fixture,
                                                 spark, tmp_path):
    """Network twin of the straddle file arm: the same ≥1k-open-window
    segment workload drains through build_pipeline(sink='network') with
    a live consuming client; kills land either as a graceful stop in
    the buffering phase (the open window lives in assembly state — the
    warm restart must restore it) or as an enqueue-count crash
    mid-emission (state restore + funnel watermark re-seed + batch
    replay dedup via CONTINUE keys); half the seeds finish with a cold
    doc-only restart (Spark checkpoint deleted, W7 doc + confirmed
    watermark position the re-read). Contract: the client's deduped
    receive set equals the oracle's commit-scn set exactly — zero loss,
    no spurious frames — through every schedule."""
    import time as _time

    from openlogreplicator_spark.streaming.engine import build_pipeline

    redo_dir, cfg, oracle = straddle_fixture
    rng = random.Random(seed)
    db = cfg.fmt.db_name
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    oracle_scns = {2 * _STRADDLE_N + i + 1 for i in range(_STRADDLE_N)}

    server = StreamServer(db, state_dir=state_dir)
    client = StreamClient("127.0.0.1", server.address[1], db)
    received: list[int] = []
    confirmed = 0

    def drain_client():
        nonlocal confirmed
        while True:
            ev = client.recv_event(timeout=2.0)
            if ev is None:
                break
            received.append(ev.get("c_scn", ev["scn"]))
        if received and rng.random() < 0.8:
            hi = max(received)
            if hi > confirmed:
                client.confirm(hi, 10 ** 9)
                for _ in range(500):   # fire-and-forget: wait applied
                    if server.confirmed_scn >= hi:
                        break
                    _time.sleep(0.01)
                assert server.confirmed_scn >= hi
                confirmed = hi

    def leg(kill_after=None, stop_after_batches=None, ck=None):
        proxy = _EnqueueKillingServer(server, kill_after)
        q = build_pipeline(
            spark, cfg, redo_dir, checkpoint=ck or ckpt, sink="network",
            network_server=proxy, query_name=f"olr_net_straddle_{seed}",
            state_dir=state_dir, max_files_per_trigger=1,
        )
        try:
            if kill_after is not None:
                with pytest.raises(Exception, match="chaos kill"):
                    q.awaitTermination(180)
            elif stop_after_batches is not None:
                deadline = _time.time() + 180
                while q.isActive and _time.time() < deadline:
                    if len(q.recentProgress) >= stop_after_batches:
                        q.stop()
                        break
                    _time.sleep(0.2)
                q.awaitTermination(120)
            else:
                from conftest import drain

                drain(q)
        finally:
            if q.isActive:
                q.stop()

    try:
        assert client.start(scn=0)["code"] == RESP_REPLICATE
        # leg 1: interruption with the open window live in state
        if rng.random() < 0.5:
            # graceful stop during the buffering phase (batches 1-4
            # emit nothing — an enqueue kill cannot land there)
            leg(stop_after_batches=rng.randint(1, _STRADDLE_FILES - 2))
        else:
            leg(kill_after=rng.randrange(0, len(oracle)))
        if rng.random() < 0.7:
            drain_client()
        if rng.random() < 0.6:
            # client reconnect — SOMETIMES without draining first, so
            # socket-buffered frames are lost unread and everything
            # unconfirmed must re-deliver after CONTINUE. This makes
            # the arm sensitive to funnel key-numbering bugs: a warm
            # replay numbered below the confirmed watermark (the
            # re-seed contract) would be CONTINUE-skipped undelivered
            # — without the reconnect this mutation sails through
            # (mutation audit, r12)
            try:
                client.close()
            except OSError:
                pass
            client = StreamClient("127.0.0.1", server.address[1], db)
            client.resume(
                confirmed or None, 10 ** 9 if confirmed else 0
            )
        # leg 2: warm restart finishes the drain on the same checkpoint
        leg()
        drain_client()
        if rng.random() < 0.5:
            # cold doc-only restart: checkpoint (offsets + assembly
            # state) deleted; W7 doc + confirmed watermark position the
            # re-read; the client dedups re-deliveries by its set
            import shutil as _shutil

            _shutil.rmtree(ckpt, ignore_errors=True)
            leg(ck=str(tmp_path / "ckpt2"))
            drain_client()
        got = set(received)
        assert got == oracle_scns, (
            f"seed {seed}: lost {len(oracle_scns - got)}, "
            f"spurious {sorted(got - oracle_scns)[:3]}"
        )
    finally:
        try:
            client.close()
        except OSError:
            pass
        server.stop()


# ---------------------------------------------------------------------------
# deterministic pins for the r11 hardening the harness found
# ---------------------------------------------------------------------------


def test_file_doc_freezes_on_observed_inversion(tmp_path):
    """An out-of-order commit voids the completeness proof: the doc
    freezes at the last sound watermark instead of advancing past a
    transaction that may still be unwritten (fail-safe: duplicates,
    never loss)."""
    writer = _CaptureWriter()
    core = FileFunnelCore(
        writer, state_dir=str(tmp_path), database="DB",
        interval_s=0, interval_mb=10 ** 9,
    )
    core.feed(iter([(b"a", 10, True, 1), (b"b", 20, True, 1)]), 0)
    doc = read_checkpoint_doc(str(tmp_path), "DB")
    assert doc is not None and int(doc["scn"]) == 10
    # inversion: 15 after 20 — then 30 would "prove" 20 complete, but
    # the proof is void from the inversion on
    core.feed(iter([(b"c", 15, True, 1), (b"d", 30, True, 1)]), 1)
    doc = read_checkpoint_doc(str(tmp_path), "DB")
    assert int(doc["scn"]) == 10, "doc advanced past a void proof"


def test_file_doc_rewritten_below_late_commit_on_inversion(tmp_path):
    """r12 review pass (mirror of the network rewrite-down): freezing
    only stops FUTURE advancement — a doc already persisted at or above
    the late commit would still skip it on a doc cold start (the file
    boundary is strict commit_scn > doc, and the late batch's bytes may
    not be flushed yet). The doc must come down STRICTLY BELOW the late
    commit's scn at observation time."""
    writer = _CaptureWriter()
    core = FileFunnelCore(
        writer, state_dir=str(tmp_path), database="DB",
        interval_s=0, interval_mb=10 ** 9,
    )
    core.feed(iter([(b"a", 10, True, 1), (b"b", 20, True, 1),
                    (b"c", 30, True, 1)]), 0)
    assert int(read_checkpoint_doc(str(tmp_path), "DB")["scn"]) == 20
    # late commit 15 arrives: doc at 20 would skip it on cold start
    core.feed(iter([(b"d", 15, True, 1)]), 1)
    doc = read_checkpoint_doc(str(tmp_path), "DB")
    assert int(doc["scn"]) == 14, doc  # strictly below the late commit
    # a second, LOWER inversion pulls it further down
    core.feed(iter([(b"e", 12, True, 1)]), 2)
    assert int(read_checkpoint_doc(str(tmp_path), "DB")["scn"]) == 11
    # ... and a HIGHER late commit never raises it back
    core.feed(iter([(b"f", 13, True, 1)]), 3)
    assert int(read_checkpoint_doc(str(tmp_path), "DB")["scn"]) == 11


def test_network_doc_cap_survives_server_restart(tmp_path):
    """r12 review pass (mirror of the file funnel's durable freeze):
    the inversion cap is a fact about the INPUT, so it must survive a
    server restart — otherwise a confirm landing before the inversion
    is re-observed persists an uncapped doc past the late commit, and
    a cold start in that window silently skips it."""
    state_dir = str(tmp_path / "st")
    server = StreamServer("DB", state_dir=state_dir)
    try:
        core = NetworkFunnelCore(server)
        core.feed(iter([(20, True, b"a"), (15, True, b"c")]), 0)
        assert server._doc_cap == 15
    finally:
        server.stop()
    # restarted server rehydrates the cap; a high confirm stays capped
    s2 = StreamServer("DB", state_dir=state_dir)
    try:
        assert s2._doc_cap == 15
        s2._handle({"database": "DB", "code": 3, "c_scn": 40, "c_idx": 0})
        assert int(read_checkpoint_doc(state_dir, "DB")["scn"]) == 15
    finally:
        s2.stop()


def test_file_doc_freeze_survives_funnel_restart(tmp_path):
    """r12 ADVICE: the freeze was in-memory only — a restarted funnel
    on persistently non-sequential input resumed doc advancement until
    another inversion happened to be re-observed, re-opening the skip
    window. The marker is durable now: a NEW FileFunnelCore on the same
    state dir rehydrates frozen and keeps the doc pinned even when the
    post-restart batches look perfectly sequential."""
    writer = _CaptureWriter()
    core = FileFunnelCore(
        writer, state_dir=str(tmp_path), database="DB",
        interval_s=0, interval_mb=10 ** 9,
    )
    core.feed(iter([(b"a", 10, True, 1), (b"b", 20, True, 1)]), 0)
    core.feed(iter([(b"c", 15, True, 1)]), 1)   # inversion → freeze
    assert core.scns.get("frozen") is True
    # funnel dies; a new incarnation sees only sequential input — the
    # doc must STAY at the last sound watermark
    core2 = FileFunnelCore(
        _CaptureWriter(), state_dir=str(tmp_path), database="DB",
        interval_s=0, interval_mb=10 ** 9,
    )
    assert core2.scns.get("frozen") is True, "freeze lost on restart"
    core2.feed(iter([(b"d", 40, True, 1), (b"e", 50, True, 1)]), 2)
    doc = read_checkpoint_doc(str(tmp_path), "DB")
    assert int(doc["scn"]) == 10, "restart re-opened the doc skip window"
    # a DIFFERENT database in the same state dir is unaffected
    other = FileFunnelCore(
        _CaptureWriter(), state_dir=str(tmp_path), database="OTHER",
        interval_s=0, interval_mb=10 ** 9,
    )
    assert other.scns.get("frozen") is None


def test_network_keys_clamped_and_doc_capped_on_inversion(tmp_path):
    """An out-of-order data commit rides the current watermark key
    (queue keys stay monotone — CONTINUE/CONFIRM stay exact) and caps
    the persisted doc at the inverted commit scn, so a cold start's
    >= boundary re-emits it."""
    state_dir = str(tmp_path / "st")
    server = StreamServer("DB", state_dir=state_dir)
    try:
        core = NetworkFunnelCore(server)
        core.feed(
            iter([(20, True, b"a"), (30, True, b"b"),
                  (15, True, b"c"), (40, True, b"d")]),
            0,
        )
        keys = [(s, i) for s, i, _f in server._queue]
        assert keys == sorted(keys), f"non-monotone keys {keys}"
        assert keys[2][0] == 30, "inverted frame must ride the watermark"
        assert server._doc_cap == 15
        # a confirm at the tail persists the CAPPED doc
        server._handle(
            {"database": "DB", "code": 3, "c_scn": 40, "c_idx": 0}
        )
        doc = read_checkpoint_doc(state_dir, "DB")
        assert int(doc["scn"]) == 15 and int(doc["idx"]) == 0
        # in-memory watermark is NOT capped — pruning stays exact
        assert server.confirmed_scn == 40
    finally:
        server.stop()


def test_doc_persisted_before_inversion_is_rewritten_down(tmp_path):
    """r12 ADVICE: a checkpoint doc persisted ABOVE a late low commit's
    scn BEFORE the first inversion is observed would still make a
    doc-based cold start skip that transaction — set_doc_cap must pull
    the already-written doc down the moment the inversion arrives, not
    just cap future writes."""
    state_dir = str(tmp_path / "st")
    server = StreamServer("DB", state_dir=state_dir)
    try:
        core = NetworkFunnelCore(server)
        # batch 0: monotone commits; client confirms — doc lands at 30
        core.feed(iter([(20, True, b"a"), (30, True, b"b")]), 0)
        server._handle(
            {"database": "DB", "code": 3, "c_scn": 30, "c_idx": 0}
        )
        assert int(read_checkpoint_doc(state_dir, "DB")["scn"]) == 30
        # batch 1: the INVERSION arrives only now (late commit 15) —
        # the doc already sitting at 30 must come down immediately, or
        # a cold start in this window skips transaction 15
        core.feed(iter([(15, True, b"c")]), 1)
        doc = read_checkpoint_doc(state_dir, "DB")
        assert int(doc["scn"]) == 15 and int(doc["idx"]) == 0, doc
        # and future confirms stay capped as before
        server._handle(
            {"database": "DB", "code": 3, "c_scn": 40, "c_idx": 0}
        )
        assert int(read_checkpoint_doc(state_dir, "DB")["scn"]) == 15
    finally:
        server.stop()


def test_doc_cap_never_mints_a_doc_on_virgin_state_dir(tmp_path):
    """The rewrite-down must only LOWER an existing doc: on a virgin
    state dir an inversion before any confirm must not create a
    synthetic doc (a cold start must still position from the log head,
    not from a minted scn)."""
    state_dir = str(tmp_path / "st")
    server = StreamServer("DB", state_dir=state_dir)
    try:
        core = NetworkFunnelCore(server)
        core.feed(iter([(20, True, b"a"), (15, True, b"c")]), 0)
        assert server._doc_cap == 15
        assert read_checkpoint_doc(state_dir, "DB") is None
    finally:
        server.stop()


def test_e2e_lake_sink_kill_between_batches_exactly_once(spark, tmp_path):
    """The third sink family of the chaos matrix: the lake sink rides
    Spark's transactional file sink, so a kill BETWEEN micro-batches
    plus a warm restart on the same checkpoint must yield exactly-once
    parquet (no loss, no duplicates) — and a doc cold start would use
    the same strict ``commit_scn > doc`` predicate the file-funnel
    model arm already exercises (``_doc_resume_predicate``: lake never
    writes docs from inside build_pipeline, so strict ``>`` is the
    conservative boundary)."""
    import time as _time

    from conftest import drain
    from openlogreplicator_spark.config import EngineConfig, Format
    from openlogreplicator_spark.sources.binary_redo import (
        encode_redo_file,
    )
    from openlogreplicator_spark.streaming.engine import build_pipeline

    rng = random.Random(7)
    records = []
    scn = 10
    for t in range(6):
        xid = f"8.0.{t}"
        records.append(
            {"scn": scn, "subscn": 0, "block": 1, "offset": 0, "seq": 1,
             "xid": xid, "opcode": "begin", "obj": 9, "bdba": None,
             "slot": None, "fb": 0, "cols": None, "rows": None}
        )
        for j in range(rng.randint(1, 3)):
            records.append(
                {"scn": scn + 1, "subscn": j, "block": 1, "offset": 0,
                 "seq": 1, "xid": xid, "opcode": "insert", "obj": 9,
                 "bdba": 5, "slot": j, "fb": 0,
                 "cols": {"A": f"{xid}:{j}"}, "rows": None}
            )
        records.append(
            {"scn": scn + 5, "subscn": 0, "block": 1, "offset": 0,
             "seq": 1, "xid": xid, "opcode": "commit", "obj": 9,
             "bdba": None, "slot": None, "fb": 0, "cols": None,
             "rows": None}
        )
        scn += 10
    n_inserts = sum(1 for r in records if r["opcode"] == "insert")
    redo_dir = str(tmp_path / "redo")
    os.makedirs(redo_dir)
    cut = len(records) // 3
    base_t = _time.time() - 1000
    for i in range(3):
        seg = records[i * cut: (i + 1) * cut if i < 2 else len(records)]
        for r in seg:
            r["seq"] = i + 1
        path = os.path.join(redo_dir, f"{i + 1:04d}.olrs")
        with open(path, "wb") as fh:
            fh.write(encode_redo_file(seg, sequence=i + 1))
        os.utime(path, (base_t + i * 10, base_t + i * 10))

    cfg = EngineConfig(fmt=Format(skip_begin=True, skip_commit=True))
    out = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    # dictionary (obj, owner, name) so the lake's owner/table partition
    # columns resolve
    dict_obj = spark.createDataFrame(
        [(9, "APP", "ORDERS")], "obj long, owner string, name string"
    )

    # run 1: kill between micro-batches — stop the query as soon as a
    # data batch committed (graceful stop = the between-batches kill;
    # Spark's file-sink commit log makes any torn epoch invisible)
    q = build_pipeline(
        spark, cfg, redo_dir, checkpoint=ckpt, out_dir=out,
        sink="lake", query_name="olr_lake_chaos", dict_obj=dict_obj,
        max_files_per_trigger=1,
    )
    for _ in range(600):
        if any(
            (p if isinstance(p, dict) else json.loads(p.json)).get(
                "numInputRows", 0
            )
            for p in q.recentProgress
        ):
            break
        _time.sleep(0.05)
    q.stop()
    q.awaitTermination(60)
    mid = (
        spark.read.parquet(out).count()
        if os.path.exists(os.path.join(out, "_spark_metadata"))
        else 0
    )
    # on a fast box the stop can land after the last batch — the warm
    # restart is then the drained-checkpoint no-op case, which the
    # exactly-once asserts below still pin
    assert mid <= n_inserts

    # run 2: warm restart on the same checkpoint finishes the drain
    q2 = build_pipeline(
        spark, cfg, redo_dir, checkpoint=ckpt, out_dir=out,
        sink="lake", query_name="olr_lake_chaos", dict_obj=dict_obj,
        max_files_per_trigger=1,
    )
    drain(q2)
    rows = spark.read.parquet(out).select("xid", "scn", "after").collect()
    got = Counter((r.xid, r.after["A"]) for r in rows)
    want = {
        (r["xid"], r["cols"]["A"])
        for r in records
        if r["opcode"] == "insert"
    }
    assert set(got) == want, "lake sink lost events across the kill"
    dups = {k: n for k, n in got.items() if n > 1}
    assert not dups, f"lake sink duplicated {dups} (exactly-once broken)"


def test_leading_heartbeat_on_virgin_stream_is_confirmable(tmp_path):
    """Review pass 1 pin: a heartbeat arriving BEFORE any data on a
    virgin stream must not be keyed (0, 0) — that IS the initial
    confirm watermark, so CONTINUE at it would skip the frame
    undelivered and no CONFIRM could ever cover it. The key starts
    strictly above, stays deliverable after a virgin-watermark
    CONTINUE, and is prunable by a confirm."""
    server = StreamServer("DB", state_dir=str(tmp_path / "st"))
    try:
        core = NetworkFunnelCore(server)
        core.feed(iter([(500, False, b"hb")]), 0)
        keys = [(s, i) for s, i, _f in server._queue]
        assert keys == [(0, 1)], keys
        # CONTINUE at the virgin watermark must NOT skip it
        server._handle({"database": "DB", "code": 2, "c_scn": 0,
                        "c_idx": 0})
        assert server._cursor == 0
        # and a confirm at its key prunes it
        server._handle({"database": "DB", "code": 3, "c_scn": 0,
                        "c_idx": 1})
        assert server._queue == []
        # data after the leading heartbeat gets its true scn key
        core.feed(iter([(500, True, b"d0"), (500, True, b"d1")]), 1)
        assert [(s, i) for s, i, _f in server._queue] == [
            (500, 0), (500, 1),
        ]
    finally:
        server.stop()


def test_ahead_of_data_heartbeat_confirm_cannot_starve_cold_start(tmp_path):
    """Mutation-testing find (pass 5): with the non-data key rule
    disabled, an UNTHROTTLED heartbeat describing redo far ahead of the
    emitted data gets keyed at its own scn; a client confirming it
    persists a doc past every unemitted transaction, and a cold start
    before more data arrives loses them all. The rule keeps the
    heartbeat at the data watermark key, so the persisted doc can never
    outrun what was actually enqueued."""
    state_dir = str(tmp_path / "st")
    server = StreamServer("DB", state_dir=state_dir)
    try:
        core = NetworkFunnelCore(server)
        # data through scn 200, then a heartbeat describing scn 900
        core.feed(
            iter([(100, True, b"t1"), (200, True, b"t2"),
                  (900, False, b"hb@900")]),
            0,
        )
        keys = [(s, i) for s, i, _f in server._queue]
        assert keys == [(100, 0), (200, 0), (200, 1)], keys
        # the client confirms the LAST frame it received — the heartbeat
        server._handle({"database": "DB", "code": 3, "c_scn": 200,
                        "c_idx": 1})
        doc = read_checkpoint_doc(state_dir, "DB")
        # the doc sits at the DATA watermark, not the heartbeat's 900:
        # a cold start re-emits everything after scn 200 — zero loss
        assert int(doc["scn"]) == 200, doc
    finally:
        server.stop()


def test_confirm_prunes_deep_replay_duplicates(tmp_path):
    """Chaos find (no-drain reconnect arm, seed 111): a Spark batch
    replay re-enqueues frames at their ORIGINAL keys, so a duplicate
    can sit DEEP behind higher-keyed first copies. A head-only prune
    left it there and a later CONTINUE re-delivered a frame the client
    had already confirmed — a third delivery outside every documented
    window. CONFIRM prunes at-or-below the watermark across the WHOLE
    queue (the faithful generalization of the reference's
    monotone-queue prune, WriterStream.cpp:199-232). CONTINUE (r12
    ADVICE) destroys only at the server's OWN confirmed watermark and
    merely cursor-skips up to the client's claim — an erroneously high
    claim is recoverable on a later correct reconnect, matching the
    reference where CONTINUE repositions and never prunes
    (WriterStream.cpp:165-196)."""
    server = StreamServer("DB")
    try:
        server.enqueue(100, 0, b"a")
        server.enqueue(200, 0, b"b")
        server.enqueue(100, 0, b"a")   # replayed batch, original key
        server._handle({"database": "DB", "code": 3, "c_scn": 100,
                        "c_idx": 0})
        assert [(s, i) for s, i, _f in server._queue] == [(200, 0)], (
            server._queue
        )
        # CONTINUE above the confirmed watermark prunes only proven
        # duplicates (≤ confirmed); a received-but-unconfirmed deep
        # frame stays queued — re-delivered, deduped by the client's
        # watermark (at-least-once), never destroyed
        server.enqueue(150, 0, b"c")   # replay below the tail again
        server._handle({"database": "DB", "code": 2, "c_scn": 150,
                        "c_idx": 0})
        assert [(s, i) for s, i, _f in server._queue] == [
            (200, 0), (150, 0),
        ]
        # leading entry (200, 0) exceeds the claim — cursor stays put
        assert server._cursor == 0
        # RECOVERABILITY (the property the r12 change buys): a client
        # that erroneously claimed far too high has destroyed nothing —
        # a later reconnect at the true confirmed watermark re-delivers
        # every unconfirmed frame
        server._handle({"database": "DB", "code": 2, "c_scn": 10**9,
                        "c_idx": 0})
        assert [(s, i) for s, i, _f in server._queue] == [
            (200, 0), (150, 0),
        ]
        assert server._cursor == 2   # skipped, not pruned
        server._handle({"database": "DB", "code": 2, "c_scn": 100,
                        "c_idx": 0})
        assert server._cursor == 0
        assert [(s, i) for s, i, _f in server._queue] == [
            (200, 0), (150, 0),
        ]
    finally:
        server.stop()
