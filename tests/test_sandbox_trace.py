"""Syscall-trace profiling: strace text parsing (distributed, pure
column), per-source summaries, and observed-access -> spec suggestion.
No strace in this container — fixtures carry the public output format;
the runner degrades to None exactly like the reference's."""

from __future__ import annotations

from blq_cli_spark import sandbox_trace as st

BUILD_TRACE = """\
execve("/usr/bin/cc", ["cc", "-O2", "main.c"], 0x7ffd) = 0
access("/etc/ld.so.preload", R_OK)      = -1 ENOENT (No such file or directory)
openat(AT_FDCWD, "/lib/libc.so.6", O_RDONLY|O_CLOEXEC) = 3
openat(AT_FDCWD, "/work/proj/main.c", O_RDONLY) = 4
openat(AT_FDCWD, "/work/proj/main.o", O_WRONLY|O_CREAT|O_TRUNC, 0666) = 5
openat(AT_FDCWD, "/work/proj/missing.h", O_RDONLY) = -1 ENOENT (No such file)
clone(child_stack=NULL, flags=CLONE_CHILD_CLEARTID|SIGCHLD) = 12345
clone3({flags=CLONE_VM|CLONE_VFORK, exit_signal=SIGCHLD}, 88) = 12346
"""

NET_TRACE = """\
openat(AT_FDCWD, "/etc/resolv.conf", O_RDONLY|O_CLOEXEC) = 3
connect(4, {sa_family=AF_INET, sin_port=htons(443), sin_addr=inet_addr("93.184.216.34")}, 16) = 0
connect(5, {sa_family=AF_INET6, sin6_port=htons(8080), inet_pton(AF_INET6, "::1", &sin6_addr), sin6_flowinfo=htonl(0), sin6_scope_id=0}, 28) = 0
connect(6, {sa_family=AF_INET, sin_port=htons(9999), sin_addr=inet_addr("10.0.0.9")}, 16) = -1 ECONNREFUSED (Connection refused)
"""

LOOPBACK_TRACE = """\
connect(4, {sa_family=AF_INET, sin_port=htons(5432), sin_addr=inet_addr("127.0.0.1")}, 16) = 0
openat(AT_FDCWD, "/tmp/x.sock", O_RDONLY) = 3
"""


def _parsed(spark, traces):
    df = spark.createDataFrame(traces, "source_id string, content string")
    return st.parse_strace_df(df)


def test_parse_strace_rows(spark):
    rows = _parsed(spark, [("build", BUILD_TRACE)]).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    assert len(by_kind["execve"]) == 1
    assert by_kind["execve"][0]["path"] == "/usr/bin/cc"
    reads = {r["path"]: r["success"] for r in by_kind["open_read"]}
    assert reads["/lib/libc.so.6"] is True
    assert reads["/work/proj/missing.h"] is False  # rc -1 -> failed
    writes = [r for r in by_kind["open_write"]]
    assert [w["path"] for w in writes] == ["/work/proj/main.o"]
    assert by_kind["access"][0]["success"] is False
    assert len(by_kind["clone"]) == 2  # clone + clone3
    # pure-column plan: no Python stages
    plan = (
        _parsed(spark, [("b", BUILD_TRACE)])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_parse_connect_families(spark):
    rows = _parsed(spark, [("net", NET_TRACE)]).collect()
    conns = sorted(
        ((r["addr"], r["port"], r["success"]) for r in rows if r["kind"] == "connect")
    )
    assert conns == [
        ("10.0.0.9", 9999, False),
        ("93.184.216.34", 443, True),
        ("::1", 8080, True),
    ]


def test_summary_and_spec_suggestion(spark):
    acc = _parsed(
        spark,
        [("build", BUILD_TRACE), ("net", NET_TRACE), ("local", LOOPBACK_TRACE)],
    )
    summ = {r["source_id"]: r.asDict() for r in st.strace_summary(acc).collect()}

    b = summ["build"]
    assert not b["has_network"] and b["has_writes"] and b["n_spawns"] == 2
    assert "/work/proj" in b["read_dirs"] and b["write_dirs"] == ["/work/proj"]
    spec = st.spec_from_summary(b, workspace="/work/proj")
    assert (spec.network, spec.filesystem) == ("none", "workspace_only")
    # writes outside the workspace -> scoped_write
    spec2 = st.spec_from_summary(b, workspace="/elsewhere")
    assert spec2.filesystem == "scoped_write"

    n = summ["net"]
    assert n["has_network"] and not n["loopback_only"]
    assert "93.184.216.34:443" in n["endpoints"]
    # the FAILED connect (10.0.0.9) must not appear as granted access
    assert all(not e.startswith("10.0.0.9") for e in n["endpoints"])
    spec3 = st.spec_from_summary(n)
    assert (spec3.network, spec3.filesystem) == ("unrestricted", "readonly")

    lo = summ["local"]
    assert lo["has_network"] and lo["loopback_only"]
    assert st.spec_from_summary(lo).network == "localhost"


def test_runner_degrades_without_strace(spark):
    if st.strace_available():  # pragma: no cover - not in this container
        assert st.run_strace_profile(spark, ["true"]) is not None
    else:
        assert st.run_strace_profile(spark, ["true"]) is None


def test_cli_sandbox_trace_from_file(tmp_path, capsys):
    from blq_cli_spark.cli import main

    f = tmp_path / "build.strace"
    f.write_text(BUILD_TRACE)
    store = str(tmp_path / "bird")
    assert main(["--store", store, "sandbox", "trace", "--file", str(f), "-j"]) == 0
    import json

    out = json.loads(capsys.readouterr().out)
    assert out["suggested_spec"]["network"] == "none"
    assert out["summary"]["n_spawns"] == 2
    # no strace on this host: running a registered command degrades
    assert main(["--store", store, "sandbox", "trace"]) == 2  # no name
