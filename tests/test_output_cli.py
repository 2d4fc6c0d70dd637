"""Formatters + CLI surface (in-process main() with captured stdout)."""

from __future__ import annotations

import json

import pytest

from blq_cli_spark import output as out
from blq_cli_spark.cli import main


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "error", None, "boom"), (2, "warning", "a.c", "")],
        "id int, severity string, file string, message string",
    )


def test_format_table(df):
    s = out.format_table(df)
    lines = s.splitlines()
    assert lines[0].split() == ["id", "severity", "file", "message"]
    assert lines[1].startswith("--")
    assert "error" in lines[2] and "warning" in lines[3]


def test_format_table_truncation(spark):
    df = spark.createDataFrame([("x" * 100,)], "long string")
    s = out.format_table(df, max_col_width=10)
    assert "…" in s and "x" * 11 not in s


def test_format_json_scrubs_nulls(df):
    data = json.loads(out.format_json(df))
    assert data[0] == {"id": 1, "severity": "error", "message": "boom"}  # None dropped
    assert "message" not in data[1]  # empty string dropped


def test_format_csv_and_markdown(df):
    c = out.format_csv(df)
    assert c.splitlines()[0] == "id,severity,file,message"
    m = out.format_markdown(df)
    assert m.splitlines()[1].startswith("| ---")
    assert out.format_output(df, "markdown") == m
    with pytest.raises(ValueError):
        out.format_output(df, "xml")


@pytest.fixture(scope="module")
def cli_store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("clistore")
    log = root / "build.log"
    log.write_text(
        "src/a.c:10:5: error: undefined reference to 'foo'\n"
        "src/a.c:20:1: warning: unused variable 'x'\n"
    )
    store = str(root / ".bird-spark")
    assert main(["--store", store, "import", str(log), "--tag", "build"]) == 0
    log2 = root / "build2.log"
    log2.write_text("src/a.c:20:1: warning: unused variable 'x'\n")
    assert main(["--store", store, "import", str(log2), "--tag", "build"]) == 0
    return store


def test_cli_errors(cli_store, capsys):
    assert main(["--store", cli_store, "errors", "-n", "5"]) == 0
    got = capsys.readouterr().out
    assert "undefined reference" in got and "src/a.c:10:5" in got


def test_cli_events(cli_store, capsys):
    # plain listing: both severities present
    assert main(["--store", cli_store, "events"]) == 0
    got = capsys.readouterr().out
    assert "undefined reference" in got and "unused variable" in got
    # severity comma-list filter
    assert main(["--store", cli_store, "events", "-S", "warning"]) == 0
    got = capsys.readouterr().out
    assert "unused variable" in got and "undefined reference" not in got
    # positional run ref: run 2 holds only the warning
    assert main(["--store", cli_store, "events", "2"]) == 0
    got = capsys.readouterr().out
    assert "unused variable" in got and "undefined reference" not in got
    # positional source name
    assert main(["--store", cli_store, "events", "build.log"]) == 0
    got = capsys.readouterr().out
    assert "undefined reference" in got


def test_cli_exec_adhoc(tmp_path, capsys):
    # `exec`/`x` is the ad-hoc capture path (reference cli.py:373-418);
    # fresh store: the run it appends must not pollute cli_store
    store = str(tmp_path / ".bird-spark")
    assert main(["--store", store, "exec", "--name", "hello", "--",
                 "echo", "hi"]) == 0
    got = capsys.readouterr().out
    assert "exit=0" in got


def test_cli_history_json(cli_store, capsys):
    assert main(["--store", cli_store, "--format", "json", "history"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 2 and rows[0]["n_errors"] in (0, 1)


def test_cli_query_dsl(cli_store, capsys):
    assert (
        main(["--store", cli_store, "query", "-f", "severity=warning", "--select", "ref", "message"])
        == 0
    )
    got = capsys.readouterr().out
    assert "unused variable" in got and "undefined" not in got


def test_cli_sql_limit_guard(cli_store, capsys):
    assert main(["--store", cli_store, "sql", "SELECT severity FROM events_flat"]) == 0
    got = capsys.readouterr().out
    assert "severity" in got


def test_cli_diff_fingerprints(cli_store, capsys):
    assert main(["--store", cli_store, "--format", "json", "diff", "1", "2", "--fingerprints"]) == 0
    rows = json.loads(capsys.readouterr().out)
    changes = sorted(r["change"] for r in rows)
    assert changes == ["fixed", "unchanged"]  # error fixed, warning persists


def test_cli_output_modes(cli_store, capsys):
    # full output
    assert main(["--store", cli_store, "output", "1"]) == 0
    got = capsys.readouterr().out
    assert "undefined reference" in got and "unused variable" in got
    # head / tail
    assert main(["--store", cli_store, "output", "-H", "1", "1"]) == 0
    got = capsys.readouterr().out
    assert "undefined" in got and "unused" not in got
    assert main(["--store", cli_store, "output", "-t", "1", "1"]) == 0
    got = capsys.readouterr().out
    assert "unused" in got and "undefined" not in got
    # grep (case-insensitive default, grep -n style markers)
    assert main(["--store", cli_store, "output", "-g", "ERROR", "1"]) == 0
    got = capsys.readouterr().out
    assert got.startswith("1:") and "undefined" in got and "unused" not in got
    # grep with context pulls in the neighbor line, marked '-'
    assert main(["--store", cli_store, "output", "-g", "ERROR", "-C", "1", "1"]) == 0
    got = capsys.readouterr().out
    assert "1:" in got and "2-" in got
    # case-sensitive grep misses
    assert main(["--store", cli_store, "output", "-g", "ERROR", "--no-ignore-case", "1"]) == 0
    assert capsys.readouterr().out.strip() == ""
    # line-spec selection
    assert main(["--store", cli_store, "output", "-l", "2", "1"]) == 0
    got = capsys.readouterr().out
    assert got.startswith("2: ") and "unused" in got
    # default ref = most recent run (run 2 has only the warning)
    assert main(["--store", cli_store, "output"]) == 0
    got = capsys.readouterr().out
    assert "unused" in got and "undefined" not in got
    # bare source name resolves to that source's latest run
    assert main(["--store", cli_store, "output", "build.log"]) == 0
    got = capsys.readouterr().out
    assert "undefined" in got
    # unknown source -> clean error
    assert main(["--store", cli_store, "output", "nope.log"]) == 1


def test_cli_event_detail_and_run_listing(cli_store, capsys):
    # event ref -> pretty detail
    assert main(["--store", cli_store, "event", "1:1"]) == 0
    got = capsys.readouterr().out
    assert "Event: 1:1" in got and "Severity: error" in got
    assert "File: src/a.c:10:5" in got and "undefined reference" in got
    # run ref -> event listing
    assert main(["--store", cli_store, "event", "1"]) == 0
    got = capsys.readouterr().out
    assert "undefined reference" in got and "unused variable" in got
    # --json round-trips
    assert main(["--store", cli_store, "event", "1:2", "-j"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data["severity"] == "warning"
    # missing event / relative ref -> errors
    assert main(["--store", cli_store, "event", "1:99"]) == 1
    assert main(["--store", cli_store, "event", "~1"]) == 2


def test_cli_context_window(cli_store, capsys):
    assert main(["--store", cli_store, "context", "1:2", "-n", "1"]) == 0
    got = capsys.readouterr().out
    assert "Context for 1:2" in got
    lines = got.splitlines()[1:]
    marked = [ln for ln in lines if ln.startswith(">")]
    assert len(marked) == 1 and "unused variable" in marked[0]
    assert any(ln.startswith(" ") and "undefined" in ln for ln in lines)
    # run ref is rejected
    assert main(["--store", cli_store, "context", "1"]) == 2


def test_cli_capture_stdin(cli_store, capsys, monkeypatch):
    import io

    monkeypatch.setattr("sys.stdin", io.StringIO("src/z.c:1:1: error: kaboom\n"))
    assert main(["--store", cli_store, "capture", "--source", "adhoc"]) == 0
    assert "captured run 3" in capsys.readouterr().out
    assert main(["--store", cli_store, "status"]) == 0
    got = capsys.readouterr().out
    assert "adhoc" in got


def test_cli_inspect_and_ci(cli_store, capsys):
    # inspect the most recent run (relative ref)
    assert main(["--store", cli_store, "--format", "json", "inspect", "~1"]) == 0
    out = capsys.readouterr().out
    assert '"run_serial"' in out
    # bad ref -> clean error
    assert main(["--store", cli_store, "inspect", "::x::"]) == 2
    # ci: same run as baseline and candidate -> no new fingerprints -> pass
    assert main(["--store", cli_store, "ci", "--baseline", "1", "--candidate", "1"]) == 0
    res = capsys.readouterr()
    assert '"passed": true' in res.out


def test_cli_report_markdown_and_json(cli_store, capsys):
    assert main(["--store", cli_store, "report"]) == 0
    md = capsys.readouterr().out
    assert md.startswith("# Build Report")
    assert "**Status:**" in md and "| Run | #" in md  # latest run, whatever prior tests added
    assert "Errors by file" in md or "| Errors | 0 |" in md

    assert main(["--store", cli_store, "report", "--run", "1", "--baseline", "2", "--json"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data["run_serial"] == 1 and data["baseline_serial"] == 2
    assert "new_errors" in data and "total_errors" in data

    # old per-tool summary table still available
    assert main(["--store", cli_store, "report", "--summary", "--latest"]) == 0
    assert capsys.readouterr().out.strip()


def test_cli_shell_pipe(cli_store, capsys, monkeypatch):
    import io

    monkeypatch.setattr(
        "sys.stdin",
        io.StringIO(
            "SELECT count(*) AS n_events FROM events_flat;\n"
            ".tables\n"
            "SELECT bogus FROM nowhere;\n"
            ".quit\n"
        ),
    )
    assert main(["--store", cli_store, "shell"]) == 0
    got = capsys.readouterr()
    assert "n_events" in got.out  # result table printed
    assert "events_flat" in got.out  # .tables listing
    assert "error:" in got.err  # bad SQL reports, shell survives


def test_cli_ci_generate_and_comment(cli_store, capsys, tmp_path):
    import sys as _sys

    assert main(["--store", cli_store, "register", "build",
                 "--", _sys.executable, "-c", "print('ok')"]) == 0
    capsys.readouterr()
    out = str(tmp_path / "ci")
    assert main(["--store", cli_store, "ci", "generate", "--output", out]) == 0
    capsys.readouterr()
    import os as _os

    assert _os.path.exists(_os.path.join(out, "build.sh"))
    assert _os.path.exists(_os.path.join(out, "workflow.yml"))
    assert _os.path.exists(_os.path.join(out, "pre-commit"))
    script = open(_os.path.join(out, "build.sh")).read()
    assert "tee" in script and "PIPESTATUS" in script
    # gitlab + drone twins (reference templates/gitlab_ci.yml.j2, drone.yml.j2)
    gitlab = open(_os.path.join(out, ".gitlab-ci.blq.yml")).read()
    assert "blq-build:" in gitlab and "./ci/build.sh" in gitlab
    drone = open(_os.path.join(out, "drone.yml")).read()
    assert "kind: pipeline" in drone and "- name: build" in drone

    assert main(["--store", cli_store, "ci", "comment",
                 "--baseline", "1", "--candidate", "2"]) == 0
    md = capsys.readouterr().out
    assert md.startswith("## Build Log Analysis")
    assert "| Baseline run | #1 |" in md and "**Status:**" in md


def test_cli_hooks_install_uninstall_status(cli_store, capsys, tmp_path):
    import subprocess
    import sys as _sys

    repo = tmp_path / "proj"
    repo.mkdir()
    subprocess.run(["git", "init", "-q", str(repo)], check=True)
    # needs a registered command first
    assert main(["--store", cli_store, "register", "lint",
                 "--", _sys.executable, "-c", "print('lint ok')"]) == 0
    capsys.readouterr()

    # unknown command refused
    assert main(["--store", cli_store, "hooks", "install", "nope",
                 "--repo", str(repo)]) == 2
    capsys.readouterr()

    assert main(["--store", cli_store, "hooks", "install", "lint",
                 "--repo", str(repo)]) == 0
    assert "installed pre-commit hook" in capsys.readouterr().out
    hook = repo / ".git" / "hooks" / "pre-commit"
    content = hook.read_text()
    assert "blq-spark-managed-hook" in content and "lint" in content
    import os as _os

    assert _os.access(str(hook), _os.X_OK)

    # double install without force refused; with force ok
    assert main(["--store", cli_store, "hooks", "install", "lint",
                 "--repo", str(repo)]) == 2
    capsys.readouterr()
    assert main(["--store", cli_store, "hooks", "install", "lint",
                 "--repo", str(repo), "--force"]) == 0
    capsys.readouterr()

    assert main(["--store", cli_store, "hooks", "status", "--repo", str(repo)]) == 0
    got = capsys.readouterr().out
    assert "pre-commit: installed" in got and "lint" in got

    assert main(["--store", cli_store, "hooks", "uninstall", "--repo", str(repo)]) == 0
    assert "removed pre-commit hook" in capsys.readouterr().out
    assert not hook.exists()

    # a foreign hook is never touched
    hook.write_text("#!/bin/sh\necho custom\n")
    assert main(["--store", cli_store, "hooks", "uninstall", "--repo", str(repo)]) == 2
    assert "not created by blq-spark" in capsys.readouterr().err
    assert hook.exists()
    # outside a git repo -> clean error
    assert main(["--store", cli_store, "hooks", "install", "lint",
                 "--repo", str(tmp_path / "norepo")]) == 2


def test_cli_annotate(cli_store, capsys):
    assert main(["--store", cli_store, "annotate", "--list"]) == 0
    assert "fingerprint_count" in capsys.readouterr().out
    assert main(["--store", cli_store, "annotate", "first_seen"]) == 0
    assert "wrote" in capsys.readouterr().out


def test_cli_migrate(cli_store, capsys, tmp_path, spark):
    from blq_cli_spark.sources.store import LogStore

    src = LogStore(spark, cli_store)
    root = str(tmp_path / "export")
    src.sync_to(root, hostname="h1", namespace="ns", project="p")
    dst = str(tmp_path / "dst-store")
    assert main(["--store", dst, "migrate", root]) == 0
    out_text = capsys.readouterr().out
    assert "migrated" in out_text
    assert LogStore(spark, dst).runs().count() > 0


def test_cli_sync_round_trip(cli_store, capsys, tmp_path, spark):
    """Sync two stores into one global tree, then query the union via
    read_global and the --status summary."""
    from blq_cli_spark.sources.store import LogStore

    tree = str(tmp_path / "global")
    assert main(["--store", cli_store, "sync", tree, "--hostname", "h1",
                 "--namespace", "ns", "--project", "p1"]) == 0
    assert "synced to" in capsys.readouterr().out

    other_root = tmp_path / "other"
    log = other_root / "x.log"
    other_root.mkdir()
    log.write_text("src/b.c:7:1: error: second store\n")
    other = str(other_root / ".bird-spark")
    assert main(["--store", other, "import", str(log)]) == 0
    capsys.readouterr()
    assert main(["--store", other, "sync", tree, "--hostname", "h2",
                 "--namespace", "ns", "--project", "p2"]) == 0
    capsys.readouterr()

    g = LogStore.read_global(spark, tree)
    assert {r["hostname"] for r in g.select("hostname").distinct().collect()} == {"h1", "h2"}
    assert g.filter("project = 'p2'").count() == 1

    assert main(["--store", cli_store, "--format", "json", "sync", tree, "--status"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert {(r["hostname"], r["project"]) for r in rows} == {("h1", "p1"), ("h2", "p2")}

    # dry run prints the target, writes nothing
    assert main(["--store", cli_store, "sync", str(tmp_path / "nope"),
                 "--dry-run", "--hostname", "hX"]) == 0
    out_text = capsys.readouterr().out
    assert "hostname=hX" in out_text
    import os as _os

    assert not _os.path.exists(str(tmp_path / "nope"))


def test_cli_watch_runs_until_max(cli_store, capsys, tmp_path, monkeypatch):
    import sys as _sys

    watched = tmp_path / "src"
    watched.mkdir()
    (watched / "a.txt").write_text("v1")

    # poke the watched file from a side thread until the watcher exits:
    # a FIXED poke budget raced the runner — when one triggered run (a
    # few Spark jobs) outlived the poker, no change ever arrived again
    # and the loop polled forever (observed as a 45-min suite hang on a
    # slow machine)
    import threading, time as _time

    done = threading.Event()

    def poker():
        k = 0
        while not done.is_set() and k < 2400:  # hard cap ~2 min
            (watched / "a.txt").write_text(f"v{k}")
            k += 1
            _time.sleep(0.05)

    t = threading.Thread(target=poker, daemon=True)
    t.start()
    try:
        assert main([
            "--store", cli_store, "watch", "--path", str(watched),
            "--debounce", "0.05", "--interval", "0.05", "--max-runs", "2",
            "--", _sys.executable, "-c", "print('watched build ok')",
        ]) == 0
    finally:
        done.set()
    out_text = capsys.readouterr().out
    assert out_text.count("exit=0") >= 2


def test_cli_filter_grep_like(cli_store, capsys, tmp_path):
    """`blq filter` positional mix of expressions and files (reference
    cli.py:944-961): stored-data filtering, count mode, file mode."""
    assert main(["--store", cli_store, "filter", "severity=error"]) == 0
    got = capsys.readouterr().out
    assert "undefined reference" in got and "unused variable" not in got
    # count mode agrees with the printed row count (other module tests
    # may have appended runs to the shared store — don't pin absolutes)
    n_rows = len([ln for ln in got.splitlines() if ln.strip()]) - 2  # header+sep
    assert main(["--store", cli_store, "filter", "severity=error", "-c"]) == 0
    assert capsys.readouterr().out.strip() == str(n_rows)
    # invert
    assert main(["--store", cli_store, "f", "severity=error", "-v", "-c"]) == 0
    assert int(capsys.readouterr().out.strip()) >= 2
    # file mode: path arg is treated as a file, rest as expressions
    log = tmp_path / "x.log"
    log.write_text("a.c:1:1: error: alpha\nb.c:2:2: warning: beta\n")
    assert main(["--store", cli_store, "filter", str(log), "message~alp"]) == 0
    got = capsys.readouterr().out
    assert "alpha" in got and "beta" not in got


def test_cli_inspect_enriched(tmp_path, capsys):
    """inspect REF --full: log context, source context, git blame,
    fingerprint history (reference cmd_inspect, events.py:223-373)."""
    import os as _os
    import subprocess as _sp

    proj = tmp_path / "proj"
    (proj / "src").mkdir(parents=True)
    src = proj / "src" / "a.c"
    src.write_text("\n".join(f"int line{i};" for i in range(1, 31)) + "\n")
    _sp.run(["git", "init", "-q"], cwd=proj, check=True)
    _sp.run(["git", "add", "."], cwd=proj, check=True)
    _sp.run(["git", "-c", "user.email=t@t", "-c", "user.name=T",
             "commit", "-qm", "add a.c"], cwd=proj, check=True)

    log = tmp_path / "build.log"
    log.write_text("src/a.c:10:5: error: undefined reference to 'foo'\n")
    store = str(tmp_path / ".bird-spark")
    assert main(["--store", store, "import", str(log), "--tag", "build"]) == 0
    capsys.readouterr()

    assert main(["--store", store, "inspect", "1:1", "--full",
                 "--source-root", str(proj)]) == 0
    out = capsys.readouterr().out
    assert "== Log Context ==" in out and "undefined reference" in out
    assert "== Source Context ==" in out and "int line10;" in out
    assert "== Git Context ==" in out and "add a.c" in out
    assert "== Fingerprint History ==" in out and "run 1" in out

    # -F field selection emits JSON with just those keys
    assert main(["--store", store, "inspect", "1:1", "-F", "severity",
                 "-F", "message"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert set(data) == {"severity", "message"}

    # run ref falls back to the resolved run-row listing
    assert main(["--store", store, "inspect", "1"]) == 0
    got = capsys.readouterr().out
    assert "run_serial" in got and "build:1" in got


def test_cli_sql_macros(cli_store, capsys):
    """blq_* table macros in raw SQL (reference docs/query-guide.md:69-80)."""
    assert main(["--store", cli_store, "--format", "json", "sql",
                 "SELECT severity, message FROM blq_errors(5)"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and all(r["severity"] == "error" for r in rows)
    # macro composes inside a bigger query (join against another macro);
    # scoped to runs 1-2 — earlier tests in this module append more runs
    assert main(["--store", cli_store, "--format", "json", "sql",
                 "SELECT h.run_serial, e.severity FROM blq_history(100) h "
                 "JOIN blq_load_events() e ON h.run_serial = e.run_serial "
                 "WHERE h.run_serial <= 2"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) == 3  # 2 events in run 1 + 1 in run 2
    # diff macro takes two run serials
    assert main(["--store", cli_store, "--format", "json", "sql",
                 "SELECT * FROM blq_diff(1, 2)"]) == 0
    assert json.loads(capsys.readouterr().out)
    # unknown macro / bad args -> clean errors
    assert main(["--store", cli_store, "sql", "SELECT * FROM blq_nope()"]) == 2
    assert main(["--store", cli_store, "sql", "SELECT * FROM blq_errors('x')"]) == 2


def test_cli_report_output_file_and_branch_baseline(cli_store, capsys, tmp_path):
    dest = str(tmp_path / "report.md")
    assert main(["--store", cli_store, "report", "-o", dest]) == 0
    assert "wrote report" in capsys.readouterr().out
    assert "# Build Report" in open(dest).read()
    # branch-name baseline with no matching run -> clean error
    assert main(["--store", cli_store, "report", "-b", "no-such-branch"]) == 2


def test_cli_sql_explain_prints_plan(cli_store, capsys):
    rc = main(["--store", cli_store, "sql",
               "SELECT severity, count(*) AS n FROM events GROUP BY severity",
               "--explain"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "HashAggregate" in out


def test_cli_anomalies_flags_burst_day(spark, tmp_path, capsys):
    """Seed 10 quiet days then one burst day: the burst must be flagged
    and the quiet days must not."""
    import datetime as dt

    from blq_cli_spark.sources.store import LogStore

    st = LogStore(spark, str(tmp_path / "astore"))
    base = dt.datetime(2026, 5, 1, 10)
    for i in range(11):
        day = base + dt.timedelta(days=i)
        n_err = 20 if i == 10 else (2 + i % 2)
        st.append_run(
            {"cmd": "build", "timestamp": day, "date": day.date(),
             "source_name": "build", "exit_code": 1},
            [{"severity": "error", "message": f"e{j}", "event_type": "diagnostic"}
             for j in range(n_err)],
        )
    assert main(["--store", str(tmp_path / "astore"), "anomalies"]) == 0
    out = capsys.readouterr().out
    assert "2026-05-11" in out
    assert "2026-05-05" not in out


def test_cli_hooks_agent_install_merge_and_uninstall(tmp_path, capsys, monkeypatch):
    """`hooks install claude-code [--record]`: marker-tagged scripts +
    idempotent settings.json merge; uninstall removes only ours."""
    import json
    import os

    from blq_cli_spark.cli import main

    repo = str(tmp_path)
    # pre-existing foreign hook entry must survive untouched
    os.makedirs(os.path.join(repo, ".claude"))
    foreign = {
        "hooks": {
            "PostToolUse": [
                {"matcher": "Bash",
                 "hooks": [{"type": "command", "command": "my-own-hook.sh"}]}
            ]
        },
        "other_setting": 1,
    }
    with open(os.path.join(repo, ".claude", "settings.json"), "w") as fh:
        json.dump(foreign, fh)

    assert main(["hooks", "install", "claude-code", "--record",
                 "--repo", repo]) == 0
    out = capsys.readouterr().out
    assert "blq-suggest.sh" in out and "blq-record-pre.sh" in out
    hooks_dir = os.path.join(repo, ".claude", "hooks")
    assert sorted(os.listdir(hooks_dir)) == [
        "blq-record-post.sh", "blq-record-pre.sh", "blq-suggest.sh"
    ]
    for f in os.listdir(hooks_dir):
        body = open(os.path.join(hooks_dir, f)).read()
        assert "blq-spark-managed-hook" in body
        assert body.startswith("#!/bin/bash")
        assert os.access(os.path.join(hooks_dir, f), os.X_OK)
    with open(os.path.join(repo, ".claude", "settings.json")) as fh:
        settings = json.load(fh)
    assert settings["other_setting"] == 1
    post = settings["hooks"]["PostToolUse"]
    assert any(h["hooks"][0]["command"] == "my-own-hook.sh" for h in post)
    assert any(h["hooks"][0]["command"].endswith("blq-suggest.sh") for h in post)
    assert any(h["hooks"][0]["command"].endswith("blq-record-post.sh") for h in post)
    assert any(
        h["hooks"][0]["command"].endswith("blq-record-pre.sh")
        for h in settings["hooks"]["PreToolUse"]
    )

    # re-install is idempotent (no duplicate entries)
    assert main(["hooks", "install", "claude-code", "--record",
                 "--repo", repo]) == 0
    capsys.readouterr()
    with open(os.path.join(repo, ".claude", "settings.json")) as fh:
        again = json.load(fh)
    assert len(again["hooks"]["PostToolUse"]) == len(post)

    # uninstall removes ours only
    assert main(["hooks", "uninstall", "claude-code", "--repo", repo]) == 0
    capsys.readouterr()
    assert os.listdir(hooks_dir) == []
    with open(os.path.join(repo, ".claude", "settings.json")) as fh:
        final = json.load(fh)
    assert final["hooks"]["PostToolUse"] == [
        {"matcher": "Bash",
         "hooks": [{"type": "command", "command": "my-own-hook.sh"}]}
    ]
    assert final["other_setting"] == 1
