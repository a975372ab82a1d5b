"""
Multiprocess log relay.

Capability parity with the reference's ZMQ log transport
(reference: src/lenskit/logging/multiprocess/_monitor.py:111,233 ``Monitor``
+ ``MonitorThread``, _worker.py:93 ``WorkerContext``, blake2b-authenticated
protocol _protocol.py:17): child processes (or multi-host workers) forward
log records to a singleton monitor thread in the coordinating process.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import logging
import os
import secrets
import threading
from typing import Any

__all__ = ["Monitor", "WorkerContext", "get_monitor", "shutdown_monitor"]

_monitor: "Monitor | None" = None
_monitor_lock = threading.Lock()


def _sign(key: bytes, payload: bytes) -> bytes:
    return hashlib.blake2b(payload, key=key, digest_size=16).digest()


class Monitor:
    """Singleton ZMQ monitor collecting log records from workers
    (reference: _monitor.py:111)."""

    def __init__(self, address: str | None = None, auth_key: bytes | None = None):
        """Bind to ``address`` (default: a fresh IPC socket; pass a
        ``tcp://host:port`` endpoint for cross-host relay) with ``auth_key``
        (default: random; share it with remote workers out-of-band, e.g. the
        LKT_LOG_RELAY_KEY env var)."""
        import zmq

        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.PULL)
        addr = address or f"ipc:///tmp/lkt-monitor-{os.getpid()}-{secrets.token_hex(4)}"
        self._sock.bind(addr)
        self.address = addr
        self.auth_key = auth_key if auth_key is not None else secrets.token_bytes(32)
        self._shutdown = threading.Event()
        self._thread = threading.Thread(target=self._run, name="lkt-monitor", daemon=True)
        self._thread.start()
        self.record_sinks: dict[str, Any] = {}

    def add_record_sink(self, sink, sink_id: str | None = None):
        sid = sink_id or str(id(sink))
        self.record_sinks[sid] = sink
        return sid

    def remove_record_sink(self, sink_id: str):
        self.record_sinks.pop(sink_id, None)

    def _run(self):
        import zmq

        poller = zmq.Poller()
        poller.register(self._sock, zmq.POLLIN)
        while not self._shutdown.is_set():
            events = dict(poller.poll(timeout=200))
            if self._sock not in events:
                continue
            try:
                sig, payload = self._sock.recv_multipart()
            except Exception:  # pragma: no cover
                continue
            if not hmac.compare_digest(sig, _sign(self.auth_key, payload)):
                logging.getLogger(__name__).warning("dropping unauthenticated monitor message")
                continue
            try:
                msg = json.loads(payload)
            except json.JSONDecodeError:  # pragma: no cover
                continue
            self._dispatch(msg)

    def _dispatch(self, msg: dict):
        kind = msg.get("kind")
        if kind == "log":
            logger = logging.getLogger(msg.get("name", "worker"))
            logger.log(msg.get("level", logging.INFO), "[worker %s] %s", msg.get("pid"), msg.get("event"))
        elif kind == "record":
            for sink in list(self.record_sinks.values()):
                sink.record(msg.get("data", {}))

    def shutdown(self):
        self._shutdown.set()
        self._thread.join(timeout=2)
        self._sock.close(linger=0)


def get_monitor() -> Monitor:
    """The process-wide monitor, started on first use (reference: _monitor.py ``get_monitor``)."""
    global _monitor
    with _monitor_lock:
        if _monitor is None:
            _monitor = Monitor()
        return _monitor


def shutdown_monitor():
    global _monitor
    with _monitor_lock:
        if _monitor is not None:
            _monitor.shutdown()
            _monitor = None


class WorkerContext:
    """Worker-side log forwarding (reference: _worker.py:93).

    Construct with the monitor's (address, auth_key) — e.g. shipped to a
    subprocess or another host — then use as a logging.Handler target or
    call :meth:`send_log` / :meth:`send_record` directly.
    """

    def __init__(self, address: str, auth_key: bytes):
        import zmq

        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.PUSH)
        self._sock.connect(address)
        self._key = auth_key

    def _send(self, msg: dict):
        payload = json.dumps(msg).encode()
        self._sock.send_multipart([_sign(self._key, payload), payload])

    def send_log(self, name: str, level: int, event: str):
        self._send({"kind": "log", "name": name, "level": level, "event": event, "pid": os.getpid()})

    def send_record(self, data: dict):
        self._send({"kind": "record", "data": data})

    def install_handler(self, level: int = logging.INFO):
        """Install a root logging handler that forwards to the monitor."""
        ctx = self

        class _Fwd(logging.Handler):
            def emit(self, record):
                try:
                    ctx.send_log(record.name, record.levelno, record.getMessage())
                except Exception:  # pragma: no cover
                    pass

        h = _Fwd(level)
        logging.getLogger().addHandler(h)
        return h

    def close(self):
        self._sock.close(linger=200)
