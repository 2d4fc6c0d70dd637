"""Sandbox spec management + MCP install (reference sandbox_cmd.py:13-330,
mcp_cmd.py:132-190, blq_sandbox/spec.py presets/grade)."""

from __future__ import annotations

import json
import os

import pytest

from blq_cli_spark import sandbox as sbx
from blq_cli_spark.cli import main
from blq_cli_spark.sources import store as store_mod
from blq_cli_spark.sources.store import LogStore


# ---- spec model ---------------------------------------------------------


def test_presets_and_grades():
    assert sbx.resolve("readonly").grade == "pinhole"
    assert sbx.resolve("build").grade == "scoped"
    assert sbx.resolve("integration").grade == "broad"
    assert sbx.resolve("unrestricted").grade == "open"
    assert sbx.SandboxSpec("none", "unrestricted").grade == "sealed"
    assert sbx.resolve("test").matching_preset() == "test"
    with pytest.raises(ValueError):
        sbx.resolve("nope")
    with pytest.raises(ValueError):
        sbx.SandboxSpec(network="wifi")


def test_resolve_dict_round_trip():
    spec = sbx.resolve({"network": "none", "filesystem": "readonly", "memory": 1024})
    assert spec.grade == "pinhole"
    assert spec.to_dict() == {
        "network": "none", "filesystem": "readonly", "memory": 1024,
    }


# ---- CRUD + observed metrics -------------------------------------------


@pytest.fixture()
def sandbox_store(spark, tmp_path):
    root = str(tmp_path / "s")
    st = LogStore(spark, root)
    store_mod.register_command(st, "build", ["make"], fmt="gcc")
    # three runs with metrics in extension_data, one without
    for i, (mem, cpu, dur) in enumerate(
        [(100 << 20, 4_000_000, 2000), (180 << 20, 9_000_000, 5000), (50 << 20, 1_000_000, 900)]
    ):
        st.append_run({
            "cmd": "make",
            "source_name": "build",
            "duration_ms": dur,
            "extension_data": json.dumps(
                {"metrics": {"memory_peak_bytes": mem, "cpu_usage_usec": cpu}}
            ),
        }, events=[])
    st.append_run({"cmd": "make", "source_name": "build", "duration_ms": 100}, events=[])
    return st


def test_spec_crud(sandbox_store):
    st = sandbox_store
    assert sbx.get_spec(st, "build") is None
    sbx.set_spec(st, "build", "test")
    assert sbx.get_spec(st, "build") == "test"
    sbx.set_spec(st, "build", {"network": "none", "filesystem": "readonly"})
    assert sbx.resolve(sbx.get_spec(st, "build")).grade == "pinhole"
    with pytest.raises(ValueError):
        sbx.set_spec(st, "build", "bogus-preset")  # validated before persist
    assert sbx.unset_spec(st, "build") is True
    assert sbx.get_spec(st, "build") is None
    with pytest.raises(KeyError):
        sbx.set_spec(st, "unregistered", "test")


def test_suggest_from_observed_runs(sandbox_store):
    observed, suggested = sbx.suggest_spec(sandbox_store.runs(), "build")
    assert observed["run_count"] == 4
    assert observed["max_memory_bytes"] == 180 << 20
    assert suggested["memory"] == (180 << 20) * 2  # 2x headroom
    assert suggested["cpu"] == 18  # 9s observed * 2
    assert suggested["timeout"] == 15  # 5s wall * 3
    assert suggested["network"] == "none" and suggested["filesystem"] == "readonly"
    # unknown source -> None
    assert sbx.suggest_spec(sandbox_store.runs(), "nothere") is None


def test_tighten_keeps_stricter_existing_bounds(sandbox_store):
    st = sandbox_store
    sbx.set_spec(st, "build", {"network": "none", "filesystem": "readonly", "cpu": 5})
    written = sbx.tighten_spec(st, st.runs(), "build")
    assert written["cpu"] == 5  # existing 5s is tighter than suggested 18s
    assert written["memory"] == (180 << 20) * 2
    assert sbx.resolve(sbx.get_spec(st, "build")).grade == "pinhole"


# ---- CLI ----------------------------------------------------------------


def test_cli_sandbox_list_inspect_set(sandbox_store, capsys):
    root = sandbox_store.root
    assert main(["--store", root, "sandbox", "list"]) == 0
    assert "build" in capsys.readouterr().out
    assert main(["--store", root, "sandbox", "set", "build", "--preset", "test"]) == 0
    capsys.readouterr()
    assert main(["--store", root, "sandbox", "inspect", "build", "--json"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data["preset"] == "test" and data["grade"] == "pinhole"
    assert main(["--store", root, "sandbox", "list", "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows == [{
        "command": "build", "sandbox": "test", "grade": "pinhole",
        "network": "none", "filesystem": "readonly",
    }]
    assert main(["--store", root, "sandbox", "set", "build",
                 "network=none", "filesystem=workspace_only"]) == 0
    capsys.readouterr()
    assert main(["--store", root, "sandbox", "inspect", "build", "--json"]) == 0
    assert json.loads(capsys.readouterr().out)["grade"] == "scoped"
    assert main(["--store", root, "sandbox", "unset", "build"]) == 0
    # unknown command -> error
    assert main(["--store", root, "sandbox", "inspect", "zzz"]) == 2


def test_cli_sandbox_suggest_and_tighten(sandbox_store, capsys):
    root = sandbox_store.root
    assert main(["--store", root, "sandbox", "suggest", "build"]) == 0
    got = capsys.readouterr().out
    assert "4 run(s)" in got and "2x headroom" in got
    assert main(["--store", root, "sandbox", "tighten", "build", "--dry-run"]) == 0
    assert "would set" in capsys.readouterr().out
    assert sbx.get_spec(sandbox_store, "build") is None  # dry-run wrote nothing
    assert main(["--store", root, "sandbox", "tighten", "build"]) == 0
    capsys.readouterr()
    assert sbx.resolve(sbx.get_spec(sandbox_store, "build")).network == "none"


# ---- mcp install --------------------------------------------------------


def test_mcp_install_merge_and_marker_safety(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    store = str(tmp_path / ".bird")
    # fresh file
    assert main(["--store", store, "mcp", "install"]) == 0
    cfg = json.load(open(".mcp.json"))
    entry = cfg["mcpServers"][sbx.MCP_SERVER_KEY]
    assert entry["args"][-1] == "serve" and store in entry["args"]
    # idempotent
    assert main(["--store", store, "mcp", "install"]) == 0
    assert "already configured" in capsys.readouterr().out
    # preserves other servers
    cfg["mcpServers"]["other"] = {"command": "x"}
    json.dump(cfg, open(".mcp.json", "w"))
    assert main(["--store", store, "mcp", "install"]) == 0
    cfg2 = json.load(open(".mcp.json"))
    assert "other" in cfg2["mcpServers"]
    # foreign blq-spark entry -> refused without --force
    cfg2["mcpServers"][sbx.MCP_SERVER_KEY] = {"command": "theirs"}
    json.dump(cfg2, open(".mcp.json", "w"))
    assert main(["--store", store, "mcp", "install"]) == 2
    assert main(["--store", store, "mcp", "install", "--force"]) == 0
    cfg3 = json.load(open(".mcp.json"))
    assert cfg3["mcpServers"][sbx.MCP_SERVER_KEY]["_comment"] == sbx.MCP_MARKER
    # corrupt json -> clean error
    open(".mcp.json", "w").write("{nope")
    assert main(["--store", store, "mcp", "install"]) == 2


def test_cli_sandbox_profile_reports_recorded_metrics(sandbox_store, capsys):
    """VERDICT r4 parity nit: `sandbox profile` in portable degraded mode
    — per-run recorded rusage metrics + suggested spec; clean skip when
    there is no run evidence."""
    root = sandbox_store.root
    assert main(["--store", root, "sandbox", "profile", "build"]) == 0
    out = capsys.readouterr().out
    assert "4 run(s)" in out and "Suggested sandbox spec" in out
    assert "180m" in out  # peak memory of the heaviest run, humanized

    assert main(["--store", root, "sandbox", "profile", "build", "--json"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert len(data["runs"]) == 4
    assert data["observed"]["max_memory_bytes"] == 180 << 20
    assert data["suggested"]["memory"] == (180 << 20) * 2
    # per-run rows carry the recorded metrics, newest first
    mems = [r["memory_peak_bytes"] for r in data["runs"]]
    assert None in mems and (180 << 20) in mems

    # no-evidence path: registered but never run -> exit 1, not a crash
    store_mod.register_command(sandbox_store, "deploy", ["./deploy.sh"])
    assert main(["--store", root, "sandbox", "profile", "deploy"]) == 1
    assert "no runs" in capsys.readouterr().out
    # unknown command -> usage error
    assert main(["--store", root, "sandbox", "profile", "zzz"]) == 2


def test_run_command_records_rusage_metrics(spark, tmp_path):
    """run_command must stamp $.metrics rusage into extension_data so
    sandbox suggest/tighten/profile work on real runs end-to-end."""
    from blq_cli_spark.sources import execution

    st = LogStore(spark, str(tmp_path / "rusage_store"))
    run = execution.run_command(st, ["python", "-c", "print('hi')"],
                                source_name="hello")
    row = st.runs().filter(f"id = '{run['id']}'").select("extension_data").first()
    metrics = json.loads(row["extension_data"])["metrics"]
    assert metrics["memory_peak_bytes"] > 0
    assert metrics["cpu_usage_usec"] >= 0
    # and the profile pipeline picks them up
    prof = sbx.profile_runs(st.runs(), "hello").collect()
    assert prof and prof[0]["memory_peak_bytes"] == metrics["memory_peak_bytes"]
