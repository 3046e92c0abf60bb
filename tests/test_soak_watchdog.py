"""tools/soak.py run_phase: the stall watchdog that keeps multi-hour chip
soaks alive through tunnel hangs (round 5: a b20 run froze >13 min with the
process asleep in a tunnel read; an early watchdog version then
false-positive-killed the NEXT child mid-compile because the train loop
creates metrics.jsonl empty at startup).

These tests substitute a fake trainer for the real one (monkeypatching
``_trainer_argv``) so the supervisor logic runs in seconds with no backend:
launch/relaunch counting, stall detection via metrics staleness, the
cold-compile grace while a child has produced no row, and the
exactly-once SIGTERM drill.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools import soak  # noqa: E402


def _fake_trainer(tmp_path, body: str):
    """argv factory for a fake trainer; ``body`` runs with OUT (outdir),
    METRICS (metrics path) and LAUNCHES (a per-test launch-count file)
    defined, and appends one line to LAUNCHES at startup."""

    def argv(outdir):
        code = (
            "import json, os, signal, sys, time\n"
            f"OUT = {str(tmp_path)!r}\n"
            "METRICS = os.path.join(OUT, 'metrics.jsonl')\n"
            "LAUNCHES = os.path.join(OUT, 'launches.txt')\n"
            "open(LAUNCHES, 'a').write('x\\n')\n"
            "open(METRICS, 'a').close()\n"  # like the real loop: file first
            + body
        )
        return [sys.executable, "-c", code]

    return argv


def _launches(tmp_path) -> int:
    try:
        with open(tmp_path / "launches.txt") as f:
            return len(f.readlines())
    except OSError:
        return 0


def _write_rows(upto: int):
    return (
        f"for s in range(50, {upto} + 1, 50):\n"
        "    open(METRICS, 'a').write(json.dumps({'step': s}) + '\\n')\n"
        "    time.sleep(0.05)\n"
    )


def test_healthy_child_runs_once(tmp_path, monkeypatch):
    monkeypatch.setattr(soak, "_trainer_argv",
                        _fake_trainer(tmp_path, _write_rows(200)))
    soak.run_phase(str(tmp_path), stall_s=5.0, poll_s=0.1, backoff_s=0.0)
    assert _launches(tmp_path) == 1


def test_stalled_child_is_killed_and_relaunched(tmp_path, monkeypatch):
    # 1st launch: one row then hang forever; later launches: finish cleanly.
    body = (
        "if len(open(LAUNCHES).readlines()) == 1:\n"
        "    open(METRICS, 'a').write(json.dumps({'step': 50}) + '\\n')\n"
        "    time.sleep(600)\n"
        + _write_rows(200)
    )
    monkeypatch.setattr(soak, "_trainer_argv", _fake_trainer(tmp_path, body))
    t0 = time.time()
    soak.run_phase(str(tmp_path), stall_s=5.0, poll_s=0.1, backoff_s=0.0)
    assert _launches(tmp_path) == 2
    assert time.time() - t0 < 120  # killed the hang, didn't sit out 600 s


def test_compile_grace_covers_rowless_startup(tmp_path, monkeypatch):
    # Empty metrics file + no rows for longer than stall_s must NOT trip the
    # watchdog while within the compile grace (the round-5 false positive).
    monkeypatch.setattr(soak, "_COMPILE_GRACE_S", 30.0)
    body = "time.sleep(4.0)\n" + _write_rows(100)
    monkeypatch.setattr(soak, "_trainer_argv", _fake_trainer(tmp_path, body))
    # stall_s comfortably above child interpreter-exit lag (a child that
    # has written its last row but not yet exited must not read as stalled)
    soak.run_phase(str(tmp_path), stall_s=8.0, poll_s=0.1, backoff_s=0.0)
    assert _launches(tmp_path) == 1  # 4 s rowless < 8 + 30 s grace


def test_stale_rows_from_previous_child_do_not_retrip(tmp_path, monkeypatch):
    # Rows mtimed BEFORE this launch must count as "no row from this child"
    # (grace), not as instant staleness.
    monkeypatch.setattr(soak, "_COMPILE_GRACE_S", 30.0)
    with open(tmp_path / "metrics.jsonl", "a") as f:
        f.write(json.dumps({"step": 50}) + "\n")
    old = time.time() - 1000
    os.utime(tmp_path / "metrics.jsonl", (old, old))
    body = "time.sleep(1.0)\n" + _write_rows(100)
    monkeypatch.setattr(soak, "_trainer_argv", _fake_trainer(tmp_path, body))
    soak.run_phase(str(tmp_path), stall_s=8.0, poll_s=0.1, backoff_s=0.0)
    assert _launches(tmp_path) == 1


def test_drill_sigterm_sent_exactly_once(tmp_path, monkeypatch):
    # Child writes rows past kill_at_step and records any SIGTERM received;
    # a graceful exit after SIGTERM ends the phase with one launch.
    body = (
        "hits = os.path.join(OUT, 'sigterms.txt')\n"
        "def h(sig, frm):\n"
        "    open(hits, 'a').write('t\\n')\n"
        "    sys.exit(0)\n"
        "signal.signal(signal.SIGTERM, h)\n"
        "for s in range(50, 801, 50):\n"
        "    open(METRICS, 'a').write(json.dumps({'step': s}) + '\\n')\n"
        "    time.sleep(0.05)\n"
    )
    monkeypatch.setattr(soak, "_trainer_argv", _fake_trainer(tmp_path, body))
    soak.run_phase(str(tmp_path), kill_at_step=500, stall_s=10.0,
                   poll_s=0.1, backoff_s=0.0)
    assert _launches(tmp_path) == 1
    with open(tmp_path / "sigterms.txt") as f:
        assert len(f.readlines()) == 1


def test_child_exiting_before_drill_is_relaunched(tmp_path, monkeypatch):
    # A crash before the drill step must relaunch until the drill happens.
    body = (
        "n = len(open(LAUNCHES).readlines())\n"
        "if n == 1:\n"
        "    open(METRICS, 'a').write(json.dumps({'step': 100}) + '\\n')\n"
        "    sys.exit(1)\n"  # dies before kill_at_step
        "signal.signal(signal.SIGTERM, lambda *a: sys.exit(0))\n"
        "for s in range(150, 801, 50):\n"
        "    open(METRICS, 'a').write(json.dumps({'step': s}) + '\\n')\n"
        "    time.sleep(0.05)\n"
    )
    monkeypatch.setattr(soak, "_trainer_argv", _fake_trainer(tmp_path, body))
    soak.run_phase(str(tmp_path), kill_at_step=500, stall_s=10.0,
                   poll_s=0.1, backoff_s=0.0)
    assert _launches(tmp_path) == 2
