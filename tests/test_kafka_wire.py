"""W2 Kafka wire protocol: message-format v1 codec + produce/metadata
round trips against the loopback broker (WriterKafka.cpp delivery
contract: key = tag bytes or null, value = rendered message, acked
offset = delivery report)."""

from __future__ import annotations

import struct

import pytest

from openlogreplicator_spark.streaming.kafka_wire import (
    KafkaWireProducer,
    LoopbackKafkaBroker,
    decode_message_set,
    encode_message_set,
)


def test_message_set_round_trip_and_null_key():
    msgs = [(b"tag", b"v1"), (None, b"v2"), (b"", b""), (b"k", b"\x00\xff")]
    assert decode_message_set(encode_message_set(msgs)) == msgs


def test_crc_corruption_detected():
    data = bytearray(encode_message_set([(b"k", b"value")]))
    data[-1] ^= 0xFF  # flip a value byte; stored CRC no longer matches
    with pytest.raises(ValueError, match="CRC"):
        decode_message_set(bytes(data))


def test_magic_v0_rejected():
    body = struct.pack(">bbq", 0, 0, 0)  # magic=0 (v0 has no timestamp,
    # but the decoder checks magic before width, so this suffices)
    import zlib

    m = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body
    data = struct.pack(">qi", 0, len(m)) + m
    with pytest.raises(ValueError, match="magic"):
        decode_message_set(data)


def test_producer_offsets_monotonic_and_multi_topic():
    broker = LoopbackKafkaBroker()
    try:
        pa = KafkaWireProducer(broker.bootstrap, "topic.a")
        pb = KafkaWireProducer(broker.bootstrap, "topic.b")
        assert pa.send([(b"k", b"a1"), (None, b"a2")]) == 0
        assert pb.send([(b"k", b"b1")]) == 0  # per-topic offsets
        assert pa.send([(b"k", b"a3")]) == 2
        assert [v for _, v in broker.messages("topic.a")] == [
            b"a1", b"a2", b"a3"
        ]
        assert broker.messages("topic.b") == [(b"k", b"b1")]
        assert pa.send([]) == -1  # empty set is a no-op
        pa.close()
        pb.close()
    finally:
        broker.stop()


def test_tombstone_and_libzmq_style_greeting():
    """Null values (Kafka tombstones) survive the codec round trip, and
    the ZMTP greeting accepts libzmq's non-zero padding octet."""
    msgs = [(b"k", None), (None, None), (b"k2", b"v")]
    assert decode_message_set(encode_message_set(msgs)) == msgs

    # libzmq-style greeting: 0x01 in the 9th signature octet
    import socket
    import threading

    from openlogreplicator_spark.streaming.zmtp import ZmtpPair

    a, b = socket.socketpair()
    try:
        err = []

        def server():
            try:
                ZmtpPair(a, as_server=True)
            except Exception as ex:  # pragma: no cover
                err.append(ex)

        t = threading.Thread(target=server)
        t.start()
        # hand-rolled client greeting with libzmq's 0x01 padding octet
        sig = b"\xff" + b"\x00" * 7 + b"\x01" + b"\x7f"
        b.sendall(sig + b"\x03\x00" + b"NULL" + b"\x00" * 16 + b"\x00" * 32)
        assert len(b.recv(64, socket.MSG_WAITALL)) == 64  # server greeting
        # READY command with Socket-Type PAIR
        import struct

        ready = (
            bytes([5]) + b"READY"
            + bytes([len(b"Socket-Type")]) + b"Socket-Type"
            + struct.pack(">I", 4) + b"PAIR"
        )
        b.sendall(bytes([0x04, len(ready)]) + ready)
        t.join(timeout=5)
        assert not err, err
    finally:
        a.close()
        b.close()


def test_zmtp_ping_gets_pong():
    """A libzmq peer with heartbeats enabled sends PING commands and
    drops the connection without a PONG — the PAIR transport must
    answer with the echoed context (ZMTP 3.1 heartbeat, rfc 37)."""
    import socket
    import struct
    import threading

    from openlogreplicator_spark.streaming.zmtp import ZmtpPair

    a, b = socket.socketpair()
    try:
        result = {}

        def server():
            pair = ZmtpPair(a, as_server=True)
            result["msg"] = pair.recv()  # consumes PING, answers PONG

        t = threading.Thread(target=server)
        t.start()
        peer = ZmtpPair(b, as_server=False)
        # PING command: name | u16 TTL | context
        ping = bytes([4]) + b"PING" + struct.pack(">H", 100) + b"ctx"
        peer._send_frame(0x04, ping)
        peer.send(b"after-ping")
        flags, body = peer._recv_frame()
        assert flags & 0x04 and body[1:5] == b"PONG"
        assert body[5:] == b"ctx"  # echoed context
        t.join(timeout=5)
        assert result["msg"] == b"after-ping"
    finally:
        a.close()
        b.close()


def test_foreach_batch_replay_is_at_least_once(spark):
    """W2 restart semantics, pinned (r11 chaos-matrix completion): a
    foreachBatch RETRY re-produces the batch — Kafka delivery is
    AT-LEAST-ONCE, exactly the guarantee the reference's librdkafka
    acks=1 producer gives (WriterKafka.cpp:123-155); nothing is lost,
    duplicates are confined to the replayed batch, and consumers dedup
    on the message key like any Kafka CDC consumer."""
    from collections import Counter

    from openlogreplicator_spark.streaming.pipeline import (
        kafka_foreach_batch,
    )

    broker = LoopbackKafkaBroker()
    try:
        write = kafka_foreach_batch(broker.bootstrap, "olr.replay")
        batch = spark.createDataFrame(
            [(f"k{i}", f"v{i}") for i in range(6)], "key string, value string"
        )
        write(batch, 0)
        write(batch, 0)   # in-flight retry of the SAME epoch
        got = Counter(
            v.decode() for _k, v in broker.messages("olr.replay")
        )
        assert set(got) == {f"v{i}" for i in range(6)}, "loss"
        assert all(n == 2 for n in got.values()), (
            "replay must re-deliver the whole batch (at-least-once), "
            f"got {got}"
        )
    finally:
        broker.stop()
