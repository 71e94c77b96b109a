"""W2 Kafka delivery over the public Kafka wire protocol.

The reference ships change events to Kafka through librdkafka
(src/writer/WriterKafka.cpp:86-158: one topic, message key = the tag
bytes when present, value = the rendered message, delivery-report
callbacks feed the W1 confirm protocol). This module implements the
same delivery contract directly over the documented Kafka protocol —
Metadata v0 (api_key 3) for topic discovery and Produce v2 (api_key 0)
carrying message-format v1 sets — so the sink is wire-compatible with a
real broker yet e2e-testable against the in-process loopback broker
below, exactly the pattern the W4 network sink uses for the
StreamClient protocol.

Only the legacy (pre-record-batch) v1 message format is used: it is a
stable, documented part of the protocol that every broker still
accepts, and its checksum is plain CRC-32 (zlib), which keeps this
pure-Python with no Castagnoli dependency.

Wire layout (Kafka protocol guide):
    request  = INT32 size | INT16 api_key | INT16 api_version
             | INT32 correlation_id | STRING client_id | body
    response = INT32 size | INT32 correlation_id | body
    message(v1) = INT32 crc | INT8 magic=1 | INT8 attrs
                | INT64 timestamp | BYTES key | BYTES value
    (crc covers magic..value)
"""

from __future__ import annotations

import socket
import struct
import threading
import zlib

_API_PRODUCE = 0
_API_METADATA = 3
_CLIENT_ID = b"OpenLogReplicator"  # WriterKafka.cpp:68 client.id


def _str(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">h", -1)
    return struct.pack(">h", len(b)) + b


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _read_exact(sock: socket.socket, n: int) -> bytes:
    # shared read-exact helper; this protocol treats EOF as an error
    from openlogreplicator_spark.streaming.stream_network import _recv_exact

    out = _recv_exact(sock, n)
    if out is None:
        raise ConnectionError("kafka peer closed")
    return out


def _rpc(sock: socket.socket, api: int, version: int, corr: int,
         body: bytes) -> bytes:
    req = (
        struct.pack(">hhi", api, version, corr)
        + _str(_CLIENT_ID)
        + body
    )
    sock.sendall(struct.pack(">i", len(req)) + req)
    (size,) = struct.unpack(">i", _read_exact(sock, 4))
    resp = _read_exact(sock, size)
    (rcorr,) = struct.unpack(">i", resp[:4])
    if rcorr != corr:
        raise ConnectionError(f"correlation mismatch {rcorr} != {corr}")
    return resp[4:]


def encode_message_v1(key: bytes | None, value: bytes | None,
                      timestamp_ms: int = 0) -> bytes:
    body = (
        struct.pack(">bbq", 1, 0, timestamp_ms)  # magic=1, attrs=0
        + _bytes(key)
        + _bytes(value)  # None ⇒ -1 length: a tombstone
    )
    return struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body


def encode_message_set(messages: list[tuple[bytes | None, bytes | None]],
                       timestamp_ms: int = 0) -> bytes:
    out = []
    for i, (key, value) in enumerate(messages):
        m = encode_message_v1(key, value, timestamp_ms)
        out.append(struct.pack(">qi", i, len(m)) + m)
    return b"".join(out)


def decode_message_set(data: bytes) -> list[tuple[bytes | None, bytes]]:
    """Inverse of :func:`encode_message_set`, CRC-checked."""
    out = []
    pos = 0
    while pos + 12 <= len(data):
        _, size = struct.unpack_from(">qi", data, pos)
        pos += 12
        m = data[pos: pos + size]
        pos += size
        (crc,) = struct.unpack_from(">I", m, 0)
        body = m[4:]
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise ValueError("kafka message CRC mismatch")
        magic, _attrs, _ts = struct.unpack_from(">bbq", body, 0)
        if magic != 1:
            raise ValueError(f"unsupported magic {magic}")
        p = 10
        (klen,) = struct.unpack_from(">i", body, p)
        p += 4
        key = None if klen < 0 else body[p: p + max(klen, 0)]
        p += max(klen, 0)
        (vlen,) = struct.unpack_from(">i", body, p)
        p += 4
        # vlen = -1 is a null value — a Kafka tombstone (delete marker),
        # semantically distinct from an empty value
        value = None if vlen < 0 else body[p: p + vlen]
        p += max(vlen, 0)
        out.append((key, value))
    return out


class KafkaWireProducer:
    """Minimal producer speaking Metadata v0 + Produce v2, one topic,
    partition 0, acks=1 — the delivery contract of WriterKafka
    (sendMessage → delivery report → confirmMessage maps to
    produce → acked base_offset here)."""

    def __init__(self, bootstrap: str, topic: str, acks: int = 1,
                 timeout_ms: int = 30_000):
        # bootstrap.servers canonical form is a comma-separated list —
        # try each endpoint in order, like a real client's bootstrap
        last_err: Exception | None = None
        self._sock = None
        for endpoint in bootstrap.split(","):
            host, _, port = endpoint.strip().rpartition(":")
            if not host:
                continue
            try:
                self._sock = socket.create_connection(
                    (host, int(port)), timeout=30
                )
                break
            except OSError as ex:
                last_err = ex
        if self._sock is None:
            raise ConnectionError(
                f"no reachable broker in bootstrap {bootstrap!r}"
            ) from last_err
        self._topic = topic.encode()
        self._acks = acks
        self._timeout_ms = timeout_ms
        self._corr = 0
        # topic discovery (auto-created by the loopback broker, like a
        # broker with auto.create.topics.enable)
        self._metadata()

    def _next(self) -> int:
        self._corr += 1
        return self._corr

    def _metadata(self) -> None:
        """Topic discovery + LEADER FOLLOW: parse the Metadata v0
        response's broker list and the topic's partition-0 leader, and
        reconnect to the leader when it is not the bootstrap endpoint —
        produces must go to the partition leader on a real cluster."""
        body = struct.pack(">i", 1) + _str(self._topic)
        resp = _rpc(self._sock, _API_METADATA, 0, self._next(), body)
        (n_brokers,) = struct.unpack_from(">i", resp, 0)
        if n_brokers < 1:
            raise ConnectionError("kafka metadata: no brokers")
        pos = 4
        brokers: dict[int, tuple[str, int]] = {}
        for _ in range(n_brokers):
            (node,) = struct.unpack_from(">i", resp, pos)
            pos += 4
            (hlen,) = struct.unpack_from(">h", resp, pos)
            pos += 2
            host = resp[pos: pos + hlen].decode()
            pos += hlen
            (bport,) = struct.unpack_from(">i", resp, pos)
            pos += 4
            brokers[node] = (host, bport)
        (n_topics,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        leader = None
        for _ in range(n_topics):
            terr, tlen = struct.unpack_from(">hh", resp, pos)
            pos += 4
            tname = resp[pos: pos + tlen]
            pos += tlen
            (n_parts,) = struct.unpack_from(">i", resp, pos)
            pos += 4
            for _ in range(n_parts):
                _perr, pid, pleader = struct.unpack_from(">hii", resp, pos)
                pos += 10
                (n_repl,) = struct.unpack_from(">i", resp, pos)
                pos += 4 + 4 * n_repl
                (n_isr,) = struct.unpack_from(">i", resp, pos)
                pos += 4 + 4 * n_isr
                if tname == self._topic and pid == 0:
                    leader = pleader
            if tname == self._topic and terr not in (0, 5):
                # 5 = LEADER_NOT_AVAILABLE during auto-create; anything
                # else is a hard topic error
                raise ConnectionError(f"kafka metadata: topic error {terr}")
        if leader is not None and leader in brokers:
            lhost, lport = brokers[leader]
            peer = self._sock.getpeername()
            if (lhost, lport) not in (peer, ("localhost", peer[1])):
                # partition 0's leader is another broker — reconnect
                self._sock.close()
                self._sock = socket.create_connection(
                    (lhost, lport), timeout=30
                )

    def send(self, messages: list[tuple[bytes | None, bytes]]) -> int:
        """Produce one message set; returns the acked base offset
        (-1 when acks=0: fire-and-forget sends have no response on the
        wire, per protocol)."""
        if not messages:
            return -1
        ms = encode_message_set(messages)
        body = (
            struct.pack(">hi", self._acks, self._timeout_ms)
            + struct.pack(">i", 1)  # one topic
            + _str(self._topic)
            + struct.pack(">i", 1)  # one partition
            + struct.pack(">i", 0)  # partition 0
            + struct.pack(">i", len(ms))
            + ms
        )
        if self._acks == 0:
            req = (
                struct.pack(">hhi", _API_PRODUCE, 2, self._next())
                + _str(_CLIENT_ID)
                + body
            )
            self._sock.sendall(struct.pack(">i", len(req)) + req)
            return -1
        resp = _rpc(self._sock, _API_PRODUCE, 2, self._next(), body)
        pos = 4  # skip topic array count
        (tlen,) = struct.unpack_from(">h", resp, pos)
        pos += 2 + tlen + 4  # topic name + partition array count
        _part, err, base_offset = struct.unpack_from(">ihq", resp, pos)
        if err != 0:
            raise ConnectionError(f"kafka produce error {err}")
        return base_offset

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class LoopbackKafkaBroker:
    """In-process single-node broker for e2e tests: Metadata v0 +
    Produce v2, auto-created topics, one partition per topic, messages
    retained in memory and exposed via :meth:`messages`."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(16)
        self.address = self._srv.getsockname()
        self._log: dict[bytes, list[tuple[bytes | None, bytes]]] = {}
        self._lock = threading.Lock()
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    @property
    def bootstrap(self) -> str:
        return f"{self.address[0]}:{self.address[1]}"

    def messages(self, topic: str) -> list[tuple[bytes | None, bytes]]:
        with self._lock:
            return list(self._log.get(topic.encode(), []))

    def stop(self) -> None:
        self._stop = True
        try:
            self._srv.close()
        except OSError:
            pass

    # -- server side -------------------------------------------------
    def _serve(self) -> None:
        while not self._stop:
            try:
                client, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._session, args=(client,), daemon=True
            ).start()

    def _session(self, client: socket.socket) -> None:
        try:
            while not self._stop:
                (size,) = struct.unpack(">i", _read_exact(client, 4))
                req = _read_exact(client, size)
                api, _ver, corr = struct.unpack_from(">hhi", req, 0)
                pos = 8
                (cid_len,) = struct.unpack_from(">h", req, pos)
                pos += 2 + max(cid_len, 0)
                if api == _API_METADATA:
                    body = self._handle_metadata(req[pos:])
                elif api == _API_PRODUCE:
                    body = self._handle_produce(req[pos:])
                    # acks=0 produces get NO response on the wire —
                    # replying would desynchronize a conformant client
                    (acks,) = struct.unpack_from(">h", req, pos)
                    if acks == 0:
                        continue
                else:
                    body = b""
                resp = struct.pack(">i", corr) + body
                client.sendall(struct.pack(">i", len(resp)) + resp)
        except (ConnectionError, OSError, struct.error):
            pass
        finally:
            try:
                client.close()
            except OSError:
                pass

    def _handle_metadata(self, body: bytes) -> bytes:
        (n,) = struct.unpack_from(">i", body, 0)
        pos = 4
        topics = []
        for _ in range(max(n, 0)):
            (tlen,) = struct.unpack_from(">h", body, pos)
            pos += 2
            topics.append(body[pos: pos + tlen])
            pos += tlen
        host, port = self.address
        out = struct.pack(">i", 1)  # one broker
        out += struct.pack(">i", 0) + _str(host.encode()) + struct.pack(
            ">i", port
        )
        out += struct.pack(">i", len(topics))
        for t in topics:
            with self._lock:
                self._log.setdefault(t, [])
            out += struct.pack(">h", 0) + _str(t)
            out += struct.pack(">i", 1)  # one partition
            out += struct.pack(">hii", 0, 0, 0)  # err, id=0, leader=0
            out += struct.pack(">ii", 1, 0)  # replicas [0]
            out += struct.pack(">ii", 1, 0)  # isr [0]
        return out

    def _handle_produce(self, body: bytes) -> bytes:
        _acks, _timeout = struct.unpack_from(">hi", body, 0)
        pos = 6
        (n_topics,) = struct.unpack_from(">i", body, pos)
        pos += 4
        out_topics = []
        for _ in range(n_topics):
            (tlen,) = struct.unpack_from(">h", body, pos)
            pos += 2
            topic = body[pos: pos + tlen]
            pos += tlen
            (n_parts,) = struct.unpack_from(">i", body, pos)
            pos += 4
            parts = []
            for _ in range(n_parts):
                part, ms_size = struct.unpack_from(">ii", body, pos)
                pos += 8
                msgs = decode_message_set(body[pos: pos + ms_size])
                pos += ms_size
                with self._lock:
                    log = self._log.setdefault(topic, [])
                    base = len(log)
                    log.extend(msgs)
                parts.append((part, 0, base))
            out_topics.append((topic, parts))
        out = struct.pack(">i", len(out_topics))
        for topic, parts in out_topics:
            out += _str(topic) + struct.pack(">i", len(parts))
            for part, err, base in parts:
                out += struct.pack(">ihqq", part, err, base, -1)
        out += struct.pack(">i", 0)  # throttle_time_ms
        return out
