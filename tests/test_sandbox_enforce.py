"""Sandbox ENFORCEMENT: bwrap argv builder (pure string assembly, no
bwrap needed), rlimit resource enforcement (real, e2e), engine-ladder
degrade, stored declared-vs-enforced record, spec timeout tightening."""

from __future__ import annotations

import json
import sys

from blq_cli_spark import sandbox as sbx
from blq_cli_spark import sandbox_enforce as enf
from blq_cli_spark.sources.execution import run_command
from blq_cli_spark.sources.store import LogStore


def test_bwrap_argv_readonly_preset():
    spec = sbx.PRESETS["readonly"]
    argv = enf.build_bwrap_argv(spec, "/ws", "/ws/sub")
    assert argv[0] == "bwrap"
    assert ["--die-with-parent", "--new-session"] == argv[1:3]
    assert ["--ro-bind", "/", "/"] == argv[3:6]
    assert "--bind" not in argv  # readonly: no writable workspace
    assert "--unshare-net" in argv  # network=none
    assert "--unshare-pid" in argv  # processes=isolated
    assert argv[-2:] == ["--chdir", "/ws/sub"]


def test_bwrap_argv_build_preset_binds_workspace():
    spec = sbx.PRESETS["build"]
    argv = enf.build_bwrap_argv(spec, "/ws")
    i = argv.index("--bind")
    assert argv[i : i + 3] == ["--bind", "/ws", "/ws"]
    assert ["--ro-bind", "/", "/"] == argv[3:6]  # ro root under the bind


def test_bwrap_argv_unrestricted_and_hidden_paths():
    spec = sbx.SandboxSpec(paths_hidden=["/secrets"], paths_readable=["/data"])
    argv = enf.build_bwrap_argv(spec, "/ws")
    assert ["--bind", "/", "/"] == argv[3:6]  # filesystem unrestricted
    assert "--unshare-net" not in argv
    i = argv.index("--tmpfs")
    assert argv[i : i + 2] == ["--tmpfs", "/secrets"]
    j = argv.index("--ro-bind")
    assert argv[j : j + 3] == ["--ro-bind", "/data", "/data"]


def test_bwrap_argv_localhost_maps_to_unshare_net():
    spec = sbx.SandboxSpec(network="localhost")
    assert "--unshare-net" in enf.build_bwrap_argv(spec, "/ws")


def test_wrap_command_engine_ladder(monkeypatch):
    # no spec -> untouched
    argv, pre, info = enf.wrap_command(["echo", "hi"], None, "/ws")
    assert argv == ["echo", "hi"] and pre is None and info is None

    # isolation declared + bwrap "installed" -> wrapped argv
    monkeypatch.setattr(enf, "bwrap_available", lambda: True)
    argv, pre, info = enf.wrap_command(["make", "all"], "build", "/ws")
    assert argv[0] == "bwrap" and argv[-3:] == ["--", "make", "all"]
    assert info["engine"].startswith("bwrap")
    assert set(info["enforced"]) >= {"filesystem", "network", "processes"}
    assert "memory" in info["enforced"] and "cpu" in info["enforced"]
    assert pre is not None  # build preset has memory+cpu -> rlimits

    # isolation declared, no engine -> clean degrade, recorded
    monkeypatch.setattr(enf, "bwrap_available", lambda: False)
    argv, pre, info = enf.wrap_command(["make", "all"], "build", "/ws")
    assert argv == ["make", "all"]
    assert info["degraded_reason"] == "bwrap not installed"
    assert info["enforced"] == ["memory", "cpu"]  # rlimits still real
    assert info["engine"] == "rlimit"

    # resources only -> no bwrap needed, no degrade note
    argv, pre, info = enf.wrap_command(
        ["x"], {"memory": 1 << 20}, "/ws"
    )
    assert argv == ["x"] and "degraded_reason" not in info


def test_rlimit_memory_enforced_e2e(spark, tmp_path):
    """A child trying to allocate 256 MB under a 64 MB RLIMIT_AS dies;
    the same command without a sandbox succeeds — REAL enforcement, no
    bwrap/systemd needed."""
    st = LogStore(spark, str(tmp_path / "bird"))
    alloc = "x = bytearray(256 * 1024 * 1024); print('allocated')"
    free = run_command(st, [sys.executable, "-c", alloc], source_name="free")
    assert free["exit_code"] == 0
    capped = run_command(
        st,
        [sys.executable, "-c", alloc],
        source_name="capped",
        sandbox={"memory": 64 * 1024 * 1024},
    )
    assert capped["exit_code"] not in (0, None)
    ext = json.loads(capped["extension_data"])
    assert ext["sandbox"]["engine"] == "rlimit"
    assert ext["sandbox"]["enforced"] == ["memory"]
    assert ext["sandbox"]["declared"] == {"memory": 64 * 1024 * 1024}


def test_spec_timeout_tightens_and_degrade_recorded(spark, tmp_path):
    st = LogStore(spark, str(tmp_path / "bird"))
    run = run_command(
        st,
        [sys.executable, "-c", "import time; time.sleep(30)"],
        source_name="sleepy",
        timeout=300,
        sandbox={"network": "none", "timeout": 1},
    )
    assert run["exit_code"] is None and run["duration_ms"] < 20_000
    ext = json.loads(run["extension_data"])
    # this container has no bwrap: the isolation dimension degrades to
    # declaration-only and says so (reference LogEngine behavior)
    if not enf.bwrap_available():
        assert ext["sandbox"]["engine"] == "log"
        assert ext["sandbox"]["degraded_reason"] == "bwrap not installed"
    assert ext["sandbox"]["grade"] == "sealed"  # network=none, nothing else open-coupled


def test_registered_command_spec_enforced_automatically(spark, tmp_path):
    from blq_cli_spark.sources import store as store_mod

    st = LogStore(spark, str(tmp_path / "bird"))
    store_mod.register_command(
        st, "alloc",
        [sys.executable, "-c", "x = bytearray(256 * 1024 * 1024)"],
    )
    sbx.set_spec(st, "alloc", {"memory": 64 * 1024 * 1024})
    run = run_command(st, ["alloc"])
    assert run["exit_code"] not in (0, None)
    assert json.loads(run["extension_data"])["sandbox"]["enforced"] == ["memory"]


# ---- systemd-run engine (round 7, reference SystemdEngine twin) -------------


def test_systemd_argv_per_grade():
    """Pure argv assembly per preset (reference
    src/blq_sandbox_systemd/__init__.py:42-66): accounting always on,
    MemoryMax from spec.memory, scope unit named after the attempt.
    spec.cpu is deliberately absent — Limit* properties are systemd.exec
    settings that transient --scope units reject at runtime, so CPU
    seconds stay on the rlimit floor (wrap_command)."""
    argv = enf.build_systemd_argv(sbx.PRESETS["build"], "att0123456789")
    assert argv[:4] == ["systemd-run", "--scope", "--quiet", "--unit=blq-att01234"]
    assert ["-p", "MemoryAccounting=yes"] == argv[4:6]
    assert ["-p", "CPUAccounting=yes"] == argv[6:8]
    assert ["-p", f"MemoryMax={2 << 30}"] == argv[8:10]
    assert argv[-1] == "--"
    assert not any("LimitCPU" in p or "CPUQuota" in p for p in argv)

    # resource-free spec: accounting only, no Max properties
    bare = enf.build_systemd_argv(sbx.SandboxSpec(), "att")
    assert not any(p.startswith("MemoryMax") for p in bare)

    # adhoc scopes are uniquified: two unnamed runs must not collide on
    # the transient unit name
    a = enf.build_systemd_argv(sbx.SandboxSpec(memory=1 << 20))
    b = enf.build_systemd_argv(sbx.SandboxSpec(memory=1 << 20))
    assert a[3] != b[3] and a[3].startswith("--unit=blq-")


def test_ladder_systemd_ahead_of_rlimit(monkeypatch):
    """When systemd-run exists, the MEMORY cgroup cap is a scope
    property while CPU seconds stay on the rlimit preexec (no scope
    equivalent for RLIMIT_CPU); otherwise the rlimit floor covers both.
    systemd wraps OUTERMOST around bwrap (systemd-run needs the host
    DBus, which an inner bwrap namespace severs)."""
    spec = sbx.PRESETS["build"]

    monkeypatch.setattr(enf, "systemd_mode", lambda: "system")
    monkeypatch.setattr(enf, "bwrap_available", lambda: True)
    argv, pre, info = enf.wrap_command(["make"], spec, "/ws", attempt_id="att1")
    assert argv[0] == "systemd-run" and "bwrap" in argv and argv[-1] == "make"
    assert argv.index("systemd-run") < argv.index("bwrap")
    assert pre is not None  # cpu rides the rlimit preexec
    assert info["engine"] == "bwrap+systemd+rlimit"
    assert "memory" in info["enforced"] and "cpu" in info["enforced"]

    # systemd without bwrap: isolation degrades, resources still real
    monkeypatch.setattr(enf, "bwrap_available", lambda: False)
    argv, pre, info = enf.wrap_command(["make"], spec, "/ws", attempt_id="att2")
    assert argv[0] == "systemd-run" and "bwrap" not in argv
    assert pre is not None and info["engine"] == "systemd+rlimit"
    assert info["degraded_reason"] == "bwrap not installed"

    # memory-only spec under systemd: no preexec at all
    mem_spec = sbx.SandboxSpec(memory=1 << 20)
    argv, pre, info = enf.wrap_command(["make"], mem_spec, "/ws")
    assert pre is None and info["engine"] == "systemd"
    assert info["enforced"] == ["memory"]

    # no systemd: the rlimit floor returns for both dimensions
    monkeypatch.setattr(enf, "systemd_mode", lambda: None)
    argv, pre, info = enf.wrap_command(["make"], spec, "/ws", attempt_id="att3")
    assert argv[0] == "make" and pre is not None
    assert info["engine"] == "rlimit"
    assert "memory" in info["enforced"] and "cpu" in info["enforced"]

    # non-root with a user bus: the scope goes to the user manager
    monkeypatch.setattr(enf, "systemd_mode", lambda: "user")
    argv, pre, info = enf.wrap_command(["make"], spec, "/ws", attempt_id="att4")
    assert argv[0] == "systemd-run" and argv[2] == "--user"
    assert "systemd" in info["engine"]


def test_systemd_mode_authorization_gating(monkeypatch):
    """ADVICE r7 (medium): a system-scope transient unit needs
    root/polkit — wrap_command must NOT route through plain systemd-run
    on a non-root host ('Interactive authentication required' hard
    fail). Root -> 'system'; non-root with a user session bus ->
    'user'; non-root without one -> None (rlimit fallback)."""
    import os as _os

    monkeypatch.setattr(enf, "systemd_available", lambda: True)
    monkeypatch.setattr(_os, "geteuid", lambda: 0)
    assert enf.systemd_mode() == "system"

    monkeypatch.setattr(_os, "geteuid", lambda: 1000)
    monkeypatch.delenv("XDG_RUNTIME_DIR", raising=False)
    assert enf.systemd_mode() is None

    rtdir = "/tmp/blq-test-xdg-rt"
    _os.makedirs(rtdir, exist_ok=True)
    monkeypatch.setenv("XDG_RUNTIME_DIR", rtdir)
    assert enf.systemd_mode() is None  # no bus socket -> no user manager
    open(f"{rtdir}/bus", "w").close()
    try:
        assert enf.systemd_mode() == "user"
        # the whole ladder degrades to rlimit when unauthorized
        monkeypatch.delenv("XDG_RUNTIME_DIR", raising=False)
        monkeypatch.setattr(enf, "bwrap_available", lambda: False)
        spec = sbx.SandboxSpec(memory=1 << 20)
        argv, pre, info = enf.wrap_command(["make"], spec, "/ws")
        assert argv[0] == "make" and pre is not None
        assert info["engine"] == "rlimit" and info["enforced"] == ["memory"]
    finally:
        _os.unlink(f"{rtdir}/bus")

    monkeypatch.setattr(enf, "systemd_available", lambda: False)
    monkeypatch.setattr(_os, "geteuid", lambda: 0)
    assert enf.systemd_mode() is None
