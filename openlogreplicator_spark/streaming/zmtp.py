"""W5 ZeroMQ delivery transport — ZMTP 3.0 PAIR over TCP, pure Python.

The reference's third stream transport (src/stream/StreamZeroMQ.cpp:
39-60) is a ZMQ_PAIR socket carrying exactly the same WriterStream
protocol payloads as the raw-TCP StreamNetwork transport — the Stream
base class swaps transports under the writer. This module implements
the documented ZMTP 3.0 wire protocol (https://rfc.zeromq.org/spec/23/)
for the PAIR pattern with the NULL security mechanism, so the W4
StreamServer/StreamClient state machine runs unchanged over it and a
stock libzmq peer could interoperate.

Wire layout (ZMTP 3.0):
    greeting  = 0xFF + 8 padding + 0x7F          (signature, 10 octets)
              | 0x03 0x00                         (version major.minor)
              | "NULL" + 16 zero octets           (mechanism, 20 octets)
              | as-server octet | 31 zero octets  (filler)      = 64 B
    frame     = flags octet | size | body
                flags bit0 MORE, bit1 LONG, bit2 COMMAND
                size: 1 octet (short) or 8 octets BE (LONG)
    handshake = READY command both ways, metadata "Socket-Type" = PAIR
"""

from __future__ import annotations

import select
import socket
import struct

_SIGNATURE = b"\xff" + b"\x00" * 8 + b"\x7f"
_VERSION = b"\x03\x00"
_MECHANISM = b"NULL" + b"\x00" * 16

_FLAG_MORE = 0x01
_FLAG_LONG = 0x02
_FLAG_COMMAND = 0x04


# one read-exact helper for the whole streaming package (None ⇒ EOF)
from openlogreplicator_spark.streaming.stream_network import (  # noqa: E402
    _recv_exact as _read_exact,
)


def _ready_command(socket_type: bytes) -> bytes:
    # command-name: size octet + "READY"; metadata: name-size octet +
    # name + value-size u32 BE + value
    body = (
        bytes([5]) + b"READY"
        + bytes([len(b"Socket-Type")]) + b"Socket-Type"
        + struct.pack(">I", len(socket_type)) + socket_type
    )
    return body


class ZmtpPair:
    """One connected ZMTP 3.0 PAIR peer (NULL mechanism). Presents the
    same poll/recv/send surface as the raw-TCP frame transport, so the
    WriterStream protocol runs unchanged on either."""

    def __init__(self, sock: socket.socket, as_server: bool) -> None:
        self._sock = sock
        sock.setblocking(True)
        # greeting exchange (send first — both sides may, per spec)
        sock.sendall(
            _SIGNATURE + _VERSION + _MECHANISM
            + (b"\x01" if as_server else b"\x00") + b"\x00" * 31
        )
        greet = _read_exact(sock, 64)
        # only the first and last signature octets are significant —
        # the 8 padding octets are explicitly "not significant" in the
        # spec and stock libzmq sends 0x01 in the 9th octet
        if greet is None or greet[0] != 0xFF or greet[9] != 0x7F:
            raise ConnectionError("ZMTP: bad greeting signature")
        if greet[10] != 3:
            raise ConnectionError(f"ZMTP: unsupported version {greet[10]}")
        mech = greet[12:32].rstrip(b"\x00")
        if mech != b"NULL":
            raise ConnectionError(f"ZMTP: unsupported mechanism {mech!r}")
        # READY handshake, both directions
        self._send_frame(_FLAG_COMMAND, _ready_command(b"PAIR"))
        flags, body = self._recv_frame()
        if not flags & _FLAG_COMMAND or not body[1:6] == b"READY":
            raise ConnectionError("ZMTP: expected READY")
        peer_type = self._metadata(body).get(b"Socket-Type")
        if peer_type != b"PAIR":
            raise ConnectionError(f"ZMTP: peer socket type {peer_type!r}")

    @staticmethod
    def _metadata(ready_body: bytes) -> dict[bytes, bytes]:
        out: dict[bytes, bytes] = {}
        pos = 1 + ready_body[0]  # skip command name
        while pos < len(ready_body):
            nlen = ready_body[pos]
            pos += 1
            name = ready_body[pos: pos + nlen]
            pos += nlen
            (vlen,) = struct.unpack_from(">I", ready_body, pos)
            pos += 4
            out[name] = ready_body[pos: pos + vlen]
            pos += vlen
        return out

    # -- framing -------------------------------------------------------
    def _send_frame(self, flags: int, body: bytes) -> None:
        if len(body) < 256:
            self._sock.sendall(bytes([flags, len(body)]) + body)
        else:
            self._sock.sendall(
                bytes([flags | _FLAG_LONG])
                + struct.pack(">Q", len(body))
                + body
            )

    def _recv_frame(self) -> tuple[int, bytes]:
        hdr = _read_exact(self._sock, 1)
        if hdr is None:
            raise ConnectionError("ZMTP: peer closed")
        flags = hdr[0]
        if flags & _FLAG_LONG:
            raw = _read_exact(self._sock, 8)
            if raw is None:
                raise ConnectionError("ZMTP: truncated long size")
            (size,) = struct.unpack(">Q", raw)
        else:
            raw = _read_exact(self._sock, 1)
            if raw is None:
                raise ConnectionError("ZMTP: truncated size")
            size = raw[0]
        body = _read_exact(self._sock, size) if size else b""
        if body is None:
            raise ConnectionError("ZMTP: truncated body")
        return flags, body

    # -- transport surface (same as the raw-TCP frame transport) --------
    def poll(self, timeout: float) -> bool:
        r, _, _ = select.select([self._sock], [], [], timeout)
        return bool(r)

    def send(self, payload: bytes) -> None:
        # the reference sends one zmq message per protocol payload
        # (StreamZeroMQ::sendMessage, single-part)
        self._send_frame(0, payload)

    def _handle_command(self, body: bytes) -> None:
        """PING → PONG (ZMTP 3.1 heartbeats, rfc 37): a libzmq peer with
        ZMQ_HEARTBEAT_IVL set drops the connection unless its PINGs are
        answered. PING body: name | u16 TTL | context; PONG echoes the
        context. Other commands are ignored."""
        name_len = body[0] if body else 0
        name = body[1: 1 + name_len]
        if name == b"PING":
            context = body[1 + name_len + 2:]
            self._send_frame(
                _FLAG_COMMAND, bytes([4]) + b"PONG" + context
            )

    def recv(self) -> bytes | None:
        """Next MESSAGE payload (single- or multi-part concatenated);
        command frames are answered/consumed transparently (PING→PONG).
        None ⇒ peer closed. b"" ⇒ a command-only wakeup: the frame(s)
        read were commands and no message bytes are pending — the
        caller must treat it as 'nothing to read yet', NOT as a
        payload. Without this, a quiet libzmq peer with
        ZMQ_HEARTBEAT_IVL set wedged StreamServer._session permanently:
        its PING woke poll(), recv() answered PONG and re-entered the
        blocking read, and the thread never returned to the
        queue-draining half of the session loop (r12 review pass).
        Mid-MESSAGE (a MORE part already read) the read keeps blocking:
        a message, once started, completes atomically."""
        try:
            parts: list[bytes] = []
            while True:
                flags, body = self._recv_frame()
                if flags & _FLAG_COMMAND:
                    self._handle_command(body)
                    if not parts and not self.poll(0):
                        return b""
                    continue
                parts.append(body)
                if not flags & _FLAG_MORE:
                    return b"".join(parts)
        except ConnectionError:
            return None

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass
