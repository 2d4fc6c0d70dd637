"""Watch-mode state machine (ST3): debounce + queue-next semantics,
no Spark needed."""

from __future__ import annotations

from blq_cli_spark.sources.watch import WatchController, scan_mtimes


class FakeClock:
    def __init__(self) -> None:
        self.t = 0.0

    def __call__(self) -> float:
        return self.t


def test_scan_include_exclude(tmp_path):
    (tmp_path / "a.py").write_text("x")
    (tmp_path / "a.log").write_text("x")
    (tmp_path / ".git").mkdir()
    (tmp_path / ".git" / "b.py").write_text("x")
    snap = scan_mtimes(str(tmp_path), include=["*.py"], exclude=["test_*"])
    assert set(snap) == {"a.py"}


def test_debounce_and_fire(tmp_path):
    clock = FakeClock()
    runs = []
    c = WatchController(str(tmp_path), lambda: runs.append(1), debounce_s=0.5, clock=clock)
    assert c.poll() is False  # nothing changed

    (tmp_path / "f.txt").write_text("1")
    assert c.poll() is False  # change seen, debouncing
    clock.t = 0.2
    assert c.poll() is False  # still inside debounce window
    clock.t = 0.6
    assert c.poll() is True  # debounce expired -> run
    assert runs == [1] and c.state == "idle"


def test_change_during_run_queues_one(tmp_path):
    clock = FakeClock()
    runs = []
    c = WatchController(str(tmp_path), lambda: None, debounce_s=0.0, clock=clock)

    def touch_on_first_run():
        runs.append(1)
        if len(runs) == 1:  # a change lands while the first run executes
            (tmp_path / "mid.txt").write_text("x")

    c.runner = touch_on_first_run
    (tmp_path / "f.txt").write_text("1")
    assert c.poll() is True  # debounce 0 -> fires; mid-run change -> queued
    assert c.state == "queued"
    assert c.poll() is True  # queued follow-up fires without debounce
    assert c.poll() is False  # drained
    assert runs == [1, 1] and c.state == "idle"
