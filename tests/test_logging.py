import logging
import time

import pytest

from lkpy_tpu.logging import LoggingConfig, Stopwatch, Task, get_logger, trace, activate_tracing
from lkpy_tpu.logging.multiprocess import Monitor, WorkerContext, shutdown_monitor


def test_kv_logger(caplog):
    log = get_logger("test.kv").bind(run=1)
    with caplog.at_level(logging.INFO):
        log.info("something happened", items=5)
    assert "something happened" in caplog.text
    assert "items=5" in caplog.text
    assert "run=1" in caplog.text


def test_stopwatch():
    sw = Stopwatch()
    time.sleep(0.01)
    sw.stop()
    assert 0.005 < sw.elapsed() < 1.0
    assert "ms" in str(sw) or "s" in str(sw)


def test_task_tracking(tmp_path):
    with Task("outer") as outer:
        with Task("inner") as inner:
            time.sleep(0.01)
    assert outer.status == "finished"
    assert outer.duration > 0
    assert len(outer.subtasks) == 1
    assert outer.subtasks[0].label == "inner"
    f = tmp_path / "task.json"
    outer.save(f)
    loaded = Task.load(f)
    assert loaded.label == "outer"
    assert loaded.subtasks[0].label == "inner"


def test_monitor_roundtrip(caplog):
    mon = Monitor()
    try:
        worker = WorkerContext(mon.address, mon.auth_key)
        with caplog.at_level(logging.INFO):
            worker.send_log("test.worker", logging.INFO, "hello from worker")
            time.sleep(0.5)
        assert "hello from worker" in caplog.text

        # record sink
        records = []

        class Sink:
            def record(self, data):
                records.append(data)

        mon.add_record_sink(Sink())
        worker.send_record({"stage": 0.5})
        time.sleep(0.5)
        assert records == [{"stage": 0.5}]

        # unauthenticated messages are dropped
        bad = WorkerContext(mon.address, b"wrong-key-000000")
        bad.send_record({"evil": 1})
        time.sleep(0.3)
        assert all("evil" not in r for r in records)
        worker.close()
        bad.close()
    finally:
        mon.shutdown()


def test_task_energy_meter(tmp_path):
    """Tasks record per-scope Joules from a cumulative meter
    (reference: logging/tasks.py:399-401 power fields)."""
    from lkpy_tpu.logging.power import register_energy_meter

    counters = {"system": 100.0, "cpu": 40.0}

    def meter(scope):
        return counters.get(scope)

    register_energy_meter(meter)
    try:
        with Task("metered") as t:
            counters["system"] += 12.5
            counters["cpu"] += 5.0
    finally:
        register_energy_meter(None)
    assert t.system_power == pytest.approx(12.5)
    assert t.cpu_power == pytest.approx(5.0)
    assert t.tpu_power is None  # meter reports no tpu scope
    # power fields survive serialization
    loaded = Task.model_validate_json(t.model_dump_json())
    assert loaded.system_power == pytest.approx(12.5)


def test_task_energy_absent():
    """No meter, no RAPL, no Prometheus -> power fields stay None."""
    with Task("unmetered") as t:
        pass
    assert t.system_power is None and t.cpu_power is None


def test_rapl_meter(tmp_path):
    from lkpy_tpu.logging.power import RaplMeter

    zone = tmp_path / "intel-rapl:0"
    zone.mkdir()
    (zone / "energy_uj").write_text("5000000")
    m = RaplMeter(tmp_path)
    assert m.available
    assert m("cpu") == pytest.approx(5.0)
    assert m("tpu") is None


def test_distributed_log_relay(monkeypatch, caplog):
    """setup_log_relay binds the monitor on the coordinator and forwards
    worker logs to it (parallel/distributed.py multi-host log plane)."""
    import jax

    from lkpy_tpu.parallel.distributed import setup_log_relay

    addr = "tcp://127.0.0.1:29765"
    key = "ab" * 32
    monkeypatch.setenv("LKT_LOG_RELAY", addr)
    monkeypatch.setenv("LKT_LOG_RELAY_KEY", key)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    # coordinator role binds the monitor
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    mon = setup_log_relay()
    assert mon is not None and mon.address == addr
    try:
        # worker role attaches and forwards
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        ctx = setup_log_relay()
        assert ctx is not None and ctx is not mon
        with caplog.at_level(logging.INFO):
            ctx.send_log("worker.test", logging.INFO, "hello from host 1")
            deadline = time.time() + 5
            while "hello from host 1" not in caplog.text and time.time() < deadline:
                time.sleep(0.05)
        assert "hello from host 1" in caplog.text
        ctx.close()
    finally:
        shutdown_monitor()


def test_log_relay_unconfigured(monkeypatch):
    from lkpy_tpu.parallel.distributed import setup_log_relay

    monkeypatch.delenv("LKT_LOG_RELAY", raising=False)
    assert setup_log_relay() is None


def test_notebook_logging_selects_notebook_backend():
    """Reference: logging/_config.py notebook_logging."""
    import logging as _logging

    from lkpy_tpu.logging import notebook_logging
    from lkpy_tpu.logging import progress as prog

    prior = prog._impl
    try:
        notebook_logging(_logging.WARNING)
        assert prog._impl == "notebook"
        root = _logging.getLogger()
        assert any(h.level == _logging.WARNING for h in root.handlers)
    finally:
        prog.set_progress_impl(prior)
        for h in list(_logging.getLogger().handlers):
            _logging.getLogger().removeHandler(h)
