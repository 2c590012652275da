"""tools/watchdog_run.py: wedge detection, checkpoint resume, clean exit."""
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATCHDOG = os.path.join(REPO, "tools", "watchdog_run.py")


def _fake_trainer(tmp_path, body):
    p = tmp_path / "fake_trainer.py"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_clean_exit_passthrough(tmp_path):
    trainer = _fake_trainer(tmp_path, """
        import sys
        print("ok")
        sys.exit(7)
    """)
    r = subprocess.run(
        [sys.executable, WATCHDOG, "--log", str(tmp_path / "run.log"),
         "--info", "t", "--model_dir", str(tmp_path),
         "--stall_s", "5", "--poll_s", "0.2", "--", sys.executable, trainer],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 7
    assert "child exited 7" in r.stdout


def test_wedge_restart_resumes_newest_checkpoint(tmp_path):
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "t_19").touch()
    (model_dir / "t_39").touch()
    (model_dir / "other_99").touch()  # different run tag: ignored
    trainer = _fake_trainer(tmp_path, """
        import sys, time
        if "--resume" in sys.argv:
            print("resumed", sys.argv[sys.argv.index("--resume") + 1])
            sys.exit(0)
        print("training", flush=True)
        time.sleep(300)  # wedge: no further output, no CPU
    """)
    r = subprocess.run(
        [sys.executable, WATCHDOG, "--log", str(tmp_path / "run.log"),
         "--info", "t", "--model_dir", str(model_dir),
         "--stall_s", "3", "--poll_s", "0.2", "--max_restarts", "2",
         "--", sys.executable, trainer],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0
    assert "resuming from t_39" in r.stdout
    assert "resumed t_39" in (tmp_path / "run.log").read_text()


def test_restart_budget_exhausted(tmp_path):
    trainer = _fake_trainer(tmp_path, """
        import time
        print("training", flush=True)
        time.sleep(300)
    """)
    r = subprocess.run(
        [sys.executable, WATCHDOG, "--log", str(tmp_path / "run.log"),
         "--info", "t", "--model_dir", str(tmp_path),
         "--stall_s", "2", "--poll_s", "0.2", "--max_restarts", "1",
         "--", sys.executable, trainer],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 86
    assert "restart budget exhausted" in r.stdout


def test_tunnel_wait_holds_then_proceeds(tmp_path):
    """Under the axon platform with a dead relay port, the (re)start is held
    until the cap, then proceeds; inert on other platforms."""
    trainer = _fake_trainer(tmp_path, """
        import sys
        print("ran")
        sys.exit(0)
    """)
    env = dict(os.environ, JAX_PLATFORMS="axon")
    r = subprocess.run(
        [sys.executable, WATCHDOG, "--log", str(tmp_path / "run.log"),
         "--info", "t", "--model_dir", str(tmp_path),
         "--stall_s", "5", "--poll_s", "0.2",
         "--tunnel_port", "1", "--tunnel_wait_s", "1",
         "--", sys.executable, trainer],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "relay still down" in r.stdout
    assert "ran" in (tmp_path / "run.log").read_text()
