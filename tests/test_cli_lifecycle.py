"""Lifecycle / maintenance CLI verbs added for reference parity:
init, formats, completions, info, last, config, commands suggest,
record attempt/outcome, clean data/prune/orphans/compact/full
(reference cli.py:229-267 init, :620-637 prune/formats/completions,
:445-471 info/last, :872-922 clean, :1021-1067 config, :1254-1289
record-invocation)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from blq_cli_spark.cli import main
from blq_cli_spark.sources import store as store_mod
from blq_cli_spark.sources.store import LogStore
from tests.fixtures_blq import make_runs_and_events


# ---- init ---------------------------------------------------------------


def test_init_then_run_e2e(tmp_path, capsys, monkeypatch):
    """Fresh dir -> init --detect -> import -> status, no manual store
    plumbing. Detect registers a pytest command off pyproject.toml."""
    proj = tmp_path / "proj"
    proj.mkdir()
    (proj / "pyproject.toml").write_text("[project]\nname='x'\n")
    monkeypatch.chdir(proj)
    store = str(proj / ".bird-spark")
    assert main(["--store", store, "init", "--detect"]) == 0
    got = capsys.readouterr().out
    assert "initialized" in got and "registered test:" in got
    assert os.path.isfile(os.path.join(store, "config.json"))
    # idempotent without --force
    assert main(["--store", store, "init"]) == 0
    assert "already initialized" in capsys.readouterr().out
    # the detected command is in the registry
    assert main(["--store", store, "commands"]) == 0
    assert "python -m pytest" in capsys.readouterr().out
    # and the store works end-to-end from here
    log = proj / "b.log"
    log.write_text("a.c:1:1: error: boom\n")
    assert main(["--store", store, "import", str(log)]) == 0
    capsys.readouterr()
    assert main(["--store", store, "status"]) == 0
    assert "b.log" in capsys.readouterr().out


# ---- formats / completions ---------------------------------------------


def test_formats_lists_all(capsys, tmp_path):
    assert main(["--store", str(tmp_path / "s"), "formats"]) == 0
    got = capsys.readouterr().out
    assert "Available log formats (110 total)" in got
    for fmt in ("gcc", "pytest", "eslint", "cargo_test", "generic"):
        assert f"\n    {fmt} " in got or f"    {fmt}" in got
    # grouped by category
    assert "  test:" in got and "  lint:" in got and "  compile:" in got


@pytest.mark.parametrize("shell", ["bash", "zsh", "fish"])
def test_completions(shell, capsys, tmp_path):
    assert main(["--store", str(tmp_path / "s"), "completions", shell]) == 0
    got = capsys.readouterr().out
    assert "blq-spark" in got
    # every live subcommand is present in the script
    for cmd in ("status", "errors", "init", "formats", "clean", "config"):
        assert cmd in got


# ---- shared populated store --------------------------------------------


@pytest.fixture(scope="module")
def _seed_src(spark, tmp_path_factory):
    """Seed ONCE per module; tests get directory copies (see
    test_services_store._store_seed for the rationale — round 11,
    VERDICT r10 ask #2)."""
    root = str(tmp_path_factory.mktemp("cliseed") / "store")
    st = LogStore(spark, root)
    runs, events = make_runs_and_events()
    by_run: dict[str, list] = {}
    for ev in events:
        by_run.setdefault(ev["invocation_id"], []).append(ev)
    for run in runs:
        st.append_run(run, by_run.get(run["id"], []), output=f"out {run['id']}\n" * 5)
    return root


@pytest.fixture()
def seeded(spark, _seed_src, tmp_path):
    import shutil

    root = str(tmp_path / "store")
    shutil.copytree(_seed_src, root)
    return LogStore(spark, root)


# ---- info / last --------------------------------------------------------


def test_info_latest_and_json(seeded, capsys):
    root = seeded.root
    assert main(["--store", root, "info"]) == 0
    got = capsys.readouterr().out
    assert "Run:" in got and "Events:" in got and "make target8" in got
    assert main(["--store", root, "info", "~2", "--json"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data["run_serial"] == 7
    # unknown ref -> clean error
    assert main(["--store", root, "info", "nosuch:99"]) == 1


def test_info_with_output_tail(seeded, capsys):
    assert main(["--store", seeded.root, "info", "--tail", "2"]) == 0
    got = capsys.readouterr().out
    assert got.rstrip().endswith("out run-0008")


def test_last_events_and_filters(seeded, capsys):
    root = seeded.root
    assert main(["--store", root, "last"]) == 0
    got = capsys.readouterr().out
    assert "Run:" in got and "severity" in got
    assert main(["--store", root, "last", "-e", "-q"]) == 0
    got = capsys.readouterr().out
    assert "Run:" not in got
    assert "warning" not in got.replace("n_warnings", "")
    assert main(["--store", root, "last", "--json"]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data["run"]["run_serial"] == 8 and isinstance(data["events"], list)


# ---- config -------------------------------------------------------------


def test_config_round_trip(tmp_path, capsys):
    store = str(tmp_path / "s")
    assert main(["--store", store, "config"]) == 0
    assert "defaults" in capsys.readouterr().out
    assert main(["--store", store, "config", "set", "output.default_limit", "3"]) == 0
    capsys.readouterr()
    assert main(["--store", store, "config", "get", "output.default_limit"]) == 0
    assert capsys.readouterr().out.strip() == "3"
    # typed parse: bool
    assert main(["--store", store, "config", "set", "clean.max_age_days", "14"]) == 0
    capsys.readouterr()
    cfg = json.load(open(os.path.join(store, "config.json")))
    assert cfg["user"] == {"output.default_limit": 3, "clean.max_age_days": 14}
    assert main(["--store", store, "config", "unset", "output.default_limit"]) == 0
    capsys.readouterr()
    assert main(["--store", store, "config", "get", "output.default_limit"]) == 0
    assert capsys.readouterr().out.strip() == "10"  # back to schema default
    # unknown key rejected on set
    assert main(["--store", store, "config", "set", "no.such.key", "1"]) == 2


def test_config_changes_cli_behavior(seeded, capsys):
    """output.default_limit actually drives the errors default -n."""
    root = seeded.root
    assert main(["--store", root, "config", "set", "output.default_limit", "1"]) == 0
    capsys.readouterr()
    assert main(["--store", root, "errors"]) == 0
    got = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(got) == 3  # header + separator + exactly ONE event row
    # explicit -n still wins
    assert main(["--store", root, "errors", "-n", "3"]) == 0
    got = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(got) == 5


# ---- commands suggest ---------------------------------------------------


def test_commands_suggest_match_and_history(seeded, capsys):
    root = seeded.root
    store_mod.register_command(seeded, "build", ["make", "target1"], fmt="gcc")
    assert main(["--store", root, "commands", "suggest", "make  target1"]) == 0
    assert "build" in capsys.readouterr().out
    # no match -> silent success (hook contract, reference registry.py:299)
    assert main(["--store", root, "commands", "suggest", "cargo nope"]) == 0
    assert capsys.readouterr().out == ""
    # history scan: fixture cmds are all distinct (1x each) so nothing
    # clears the default min-count; with --min-count 1 they surface
    assert main(["--store", root, "commands", "suggest", "--min-count", "1"]) == 0
    got = capsys.readouterr().out
    assert "blq-spark register" in got and "make target2" in got
    assert "make target1" not in got  # registered ones are excluded


# ---- record attempt/outcome --------------------------------------------


def test_record_attempt_outcome_parse(seeded, capsys, tmp_path):
    root = seeded.root
    assert main([
        "--store", root, "record", "attempt", "-c", "make all", "--json",
    ]) == 0
    attempt_id = json.loads(capsys.readouterr().out)["attempt_id"]
    out_file = tmp_path / "o.log"
    out_file.write_text("x.c:3:1: error: kaboom\n")
    assert main([
        "--store", root, "record", "outcome", "-a", attempt_id,
        "-e", "2", "--parse", "-o", str(out_file), "--json",
    ]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data["exit_code"] == 2 and "run_serial" in data
    # the parsed run is queryable and carries the attempt's command
    assert main(["--store", root, "info", "--json"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["cmd"] == "make all" and info["n_errors"] == 1
    # attempt is completed, not pending
    assert main(["--store", root, "running"]) == 0
    assert attempt_id not in capsys.readouterr().out


def test_record_outcome_without_attempt(seeded, capsys):
    assert main([
        "--store", seeded.root, "record", "outcome", "-c", "lint src", "-e", "0",
        "--json",
    ]) == 0
    data = json.loads(capsys.readouterr().out)
    assert data["exit_code"] == 0 and data["attempt_id"]


# ---- clean --------------------------------------------------------------


def test_clean_prune_age(seeded, capsys):
    """Fixture runs are at 2026-03-01 (+hours); --days 30 from today
    drops all 8 as whole date-partition removals."""
    root = seeded.root
    assert main(["--store", root, "clean", "prune", "--days", "30", "--dry-run"]) == 0
    assert "would remove 8" in capsys.readouterr().out
    # destructive without confirm -> refused
    assert main(["--store", root, "clean", "prune", "--days", "30"]) == 2
    capsys.readouterr()
    assert main(["--store", root, "clean", "prune", "--days", "30", "-y"]) == 0
    assert "removed 8" in capsys.readouterr().out
    assert seeded.runs().count() == 0


def test_clean_prune_max_runs(seeded, capsys):
    root = seeded.root
    assert main(["--store", root, "clean", "prune", "--max-runs", "1", "-y"]) == 0
    capsys.readouterr()
    # 4 sources in the fixture -> one newest run kept per source
    assert seeded.runs().count() == 4
    kept = {r["source_name"] for r in seeded.runs().collect()}
    assert kept == {"build", "test", "lint", "typecheck"}
    # events/outputs pruned consistently with runs
    run_ids = {r["id"] for r in seeded.runs().collect()}
    assert {
        r["invocation_id"] for r in seeded.events().select("invocation_id").distinct().collect()
    } <= run_ids


def test_clean_prune_max_size(seeded, capsys):
    root = seeded.root
    total = sum(
        r["byte_length"] for r in seeded.outputs().select("byte_length").collect()
    )
    assert total > 0
    # 0 MB budget -> everything goes
    assert main(["--store", root, "clean", "prune", "--max-size", "0", "-y"]) == 0
    assert seeded.runs().count() == 0


def test_clean_orphans_and_data_and_full(spark, tmp_path, capsys):
    root = str(tmp_path / "s2")
    st = LogStore(spark, root)
    st.start_attempt({"cmd": "sleep", "started_at": dt.datetime.now() - dt.timedelta(hours=1)})
    st.append_run({"cmd": "x", "source_name": "s"}, events=[], output="hello")
    assert main(["--store", root, "clean", "orphans", "--dry-run"]) == 0
    assert "would orphan 1" in capsys.readouterr().out
    assert main(["--store", root, "clean", "orphans"]) == 0
    assert "orphaned 1" in capsys.readouterr().out
    assert st.outcomes().count() == 1
    # data: clears tables, keeps config
    store_mod.config_set(st, "output.format", "json")
    assert main(["--store", root, "clean", "data"]) == 2  # refused w/o confirm
    assert main(["--store", root, "clean", "data", "-y"]) == 0
    capsys.readouterr()
    assert st.runs().count() == 0
    assert store_mod.config_get(st, "output.format") == "json"
    # full: wipes everything including config
    assert main(["--store", root, "clean", "full", "-y"]) == 0
    assert not os.path.isfile(os.path.join(root, "config.json"))


def test_clean_bare_still_cleans_blobs(seeded, capsys):
    assert main(["--store", seeded.root, "clean"]) == 0
    assert "orphaned blobs" in capsys.readouterr().out


def test_clean_schema_keeps_blobs_and_config(spark, tmp_path, capsys):
    root = str(tmp_path / "s3")
    st = LogStore(spark, root)
    store_mod.config_set(st, "output.format", "json")
    st.append_run({"cmd": "x", "source_name": "s"}, events=[], output="B" * 100_000)
    assert os.path.isdir(os.path.join(root, "blobs"))
    assert main(["--store", root, "clean", "schema"]) == 2  # refused w/o confirm
    assert main(["--store", root, "clean", "schema", "-y"]) == 0
    assert st.runs().count() == 0
    assert os.path.isdir(os.path.join(root, "blobs"))  # blobs kept
    assert store_mod.config_get(st, "output.format") == "json"  # config kept


def test_prune_top_level_drops_date_dirs(seeded, capsys):
    """Top-level prune = pure date-partition directory removal
    (reference management.py:1008-1031); fixture dates (2026-03) are
    past any 30-day cutoff."""
    root = seeded.root
    assert main(["--store", root, "prune", "--dry-run"]) == 0
    got = capsys.readouterr().out
    assert "would remove" in got and "runs/date=2026-03-01" in got
    assert main(["--store", root, "prune"]) == 0
    capsys.readouterr()
    assert seeded.runs().count() == 0
    assert main(["--store", root, "prune"]) == 0
    assert "no data older than" in capsys.readouterr().out


def test_commands_config_suppression_lifecycle(seeded, capsys):
    """commands config NAME: suppress by event ref (resolved to its
    fingerprint), by raw fp, show, clear (reference
    management_cmd.py:17-110)."""
    root = seeded.root
    store_mod.register_command(seeded, "bld", ["make"], fmt="gcc")
    # unregistered command -> error
    assert main(["--store", root, "commands", "config", "zzz"]) == 2
    # suppress by event ref: run 8's first event
    assert main(["--store", root, "commands", "config", "bld",
                 "--suppress-event", "8:1"]) == 0
    out = capsys.readouterr().out
    assert "suppressed fp_" in out
    fp = out.split()[1]
    # the suppression is per-command
    assert fp in store_mod.suppressed_fingerprints(seeded, command="bld")
    assert fp not in store_mod.suppressed_fingerprints(seeded, command="other")
    # raw fp + show
    assert main(["--store", root, "commands", "config", "bld", "-F", "fp_raw1"]) == 0
    capsys.readouterr()
    assert main(["--store", root, "commands", "config", "bld"]) == 0
    shown = capsys.readouterr().out
    assert fp in shown and "fp_raw1" in shown
    # clear
    assert main(["--store", root, "commands", "config", "bld", "--clear-suppress"]) == 0
    assert "cleared 2" in capsys.readouterr().out
    assert store_mod.suppressed_fingerprints(seeded, command="bld") == []


def test_run_json_and_summary_output(tmp_path, capsys):
    """run/exec --json and --summary structured results (reference exec
    output modes, cli.py:381-386)."""
    import sys as _sys

    from blq_cli_spark.cli import main

    store = str(tmp_path / "store")
    script = (
        "import sys; print('src/a.c:10:5: error: boom'); "
        "print('src/a.c:20:1: warning: meh'); sys.exit(1)"
    )
    rc = main(["--store", store, "exec", "--json", "-f", "gcc", "--",
               _sys.executable, "-c", script])
    assert rc == 1  # propagates the command's exit code
    data = json.loads(capsys.readouterr().out)
    assert data["exit_code"] == 1
    assert data["n_errors"] == 1 and data["n_warnings"] == 1
    assert data["events"][0]["severity"] == "error"
    assert data["events"][0]["ref_file"] == "src/a.c"

    rc = main(["--store", store, "exec", "--summary", "--",
               _sys.executable, "-c", "print('all good')"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "0 error(s)" in out and out.startswith("✓")


def test_auto_prune_triggers_and_throttles(tmp_path, capsys):
    """clean.auto_prune: retention fires after a run when configured,
    respects the throttle marker (reference test_autoprune.py logic)."""
    import sys as _sys
    import time as _time

    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark
    from blq_cli_spark.sources import store as store_mod
    from blq_cli_spark.sources.store import LogStore

    store = str(tmp_path / "store")
    # off by default: no marker appears
    assert main(["--store", store, "exec", "--",
                 _sys.executable, "-c", "print('one')"]) == 0
    capsys.readouterr()
    assert not os.path.exists(os.path.join(store, "last_prune"))

    st = LogStore(get_spark(), store)
    assert store_mod.maybe_auto_prune(st) is None  # not enabled
    store_mod.config_set(st, "clean.auto_prune", "true")
    assert store_mod.maybe_auto_prune(st) is None  # no policy keys set
    store_mod.config_set(st, "clean.max_runs", "1")
    store_mod.config_set(st, "clean.prune_interval_minutes", "0")

    # two more runs so a per-source cap of 1 has something to remove
    for i in range(2):
        assert main(["--store", store, "exec", "-n", "src", "--",
                     _sys.executable, "-c", f"print({i})"]) == 0
    capsys.readouterr()
    # the post-run hook fired: marker exists and old runs are gone
    assert os.path.exists(os.path.join(store, "last_prune"))
    assert st.runs().count() <= 2  # one per source at most, post-prune
    # throttled: with a fresh marker and a real interval, nothing fires
    store_mod.config_set(st, "clean.prune_interval_minutes", "60")
    with open(os.path.join(store, "last_prune"), "w") as fh:
        fh.write(str(_time.time()))
    os.utime(os.path.join(store, "last_prune"))
    assert store_mod.maybe_auto_prune(st) is None
    # expired marker -> allowed again
    old = _time.time() - 7200
    os.utime(os.path.join(store, "last_prune"), (old, old))
    assert store_mod.maybe_auto_prune(st) is not None


def test_cli_corpus_actions(tmp_path, capsys):
    """`blq-spark corpus` exposes the curation operators over arbitrary
    parquet: preview mode prints a bounded sample; --output writes the
    full result distributed."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta", "web"),
            (2, "alpha beta gamma alpha beta", "web"),
            (3, "mail x@y.io now", "books"),
        ],
        "doc_id long, text string, source string",
    ).write.parquet(src)

    assert main(["corpus", "profile", "--input", src]) == 0
    out = capsys.readouterr().out
    assert "n_tokens" in out

    assert main(["corpus", "redact", "--input", src]) == 0
    assert "<EMAIL>" in capsys.readouterr().out

    dst = str(tmp_path / "deduped.parquet")
    assert main(["corpus", "exact-dedup", "--input", src, "--output", dst]) == 0
    capsys.readouterr()
    assert spark.read.parquet(dst).count() == 2  # docs 1+2 collapse

    assert (
        main(["corpus", "mix", "--input", src, "--rates", '{"web": 1.0}']) == 0
    )
    mix_out = capsys.readouterr().out
    assert "books" not in mix_out  # default rate 0 drops unlisted sources

    bench = str(tmp_path / "bench.parquet")
    spark.createDataFrame(
        [(100, "alpha beta gamma alpha beta here")], "doc_id long, text string"
    ).write.parquet(bench)
    assert (
        main(["corpus", "decontaminate", "--input", src,
              "--benchmark", bench, "--ngram", "3"]) == 0
    )
    assert "n_gram_hits" in capsys.readouterr().out

    assert main(["corpus", "mix", "--input", src, "--rates", "notjson"]) == 2


def test_cli_embeddings_actions(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = "/root/testdata/sf0.001/embeddings.parquet"

    assert main(["embeddings", "topk", "--input", src, "-k", "3"]) == 0
    out = capsys.readouterr().out
    assert "qid" in out and "cos" in out

    dst = str(tmp_path / "q8.parquet")
    assert main(["embeddings", "quantize", "--input", src, "--output", dst]) == 0
    capsys.readouterr()
    q = spark.read.parquet(dst)
    assert q.count() == 500 and "qvec" in q.columns and "scale" in q.columns

    assert main(["embeddings", "topk", "--input", src, "-k", "3",
                 "--method", "quantized"]) == 0
    assert "cos" in capsys.readouterr().out


def test_cli_corpus_winnow_and_tokens(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "wdocs.parquet")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta v2.0")],
        "doc_id long, text string",
    ).write.parquet(src)
    assert main(["corpus", "tokens", "--input", src]) == 0
    out = capsys.readouterr().out
    assert "n_subword_tokens" in out
    assert main(["corpus", "winnow", "--input", src]) == 0
    assert "fp" in capsys.readouterr().out


def test_cli_corpus_jsonl_export_and_materialize(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "jdocs.parquet")
    spark.createDataFrame(
        [(i, "the quick brown fox is running here and it is fine today ok", "s")
         for i in range(8)],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    dst = str(tmp_path / "out.jsonl")
    assert main(["corpus", "redact", "--input", src, "--output", dst,
                 "--output-format", "jsonl"]) == 0
    out = capsys.readouterr().out
    assert "(jsonl)" in out
    assert spark.read.json(dst).count() == 8
    assert main(["corpus", "materialize", "--input", src]) == 0
    assert "text" in capsys.readouterr().out


def test_cli_corpus_score_and_source_kl(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "sdocs.parquet")
    spark.createDataFrame(
        [(1, "common common common words", "a"), (2, "rare tokens here now", "b")],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    assert main(["corpus", "score", "--input", src]) == 0
    assert "avg_logprob" in capsys.readouterr().out
    assert main(["corpus", "source-kl", "--input", src]) == 0
    assert "kl_vs_corpus" in capsys.readouterr().out


def test_cli_corpus_mix_rejects_non_object_rates(tmp_path, capsys):
    """ADVICE r4: valid-JSON non-objects ('[0.5]', '"web"') and
    non-numeric values must exit 2 with the usage message, not crash."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="t-mix-validate")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "a", "web")], "doc_id long, text string, source string"
    ).write.parquet(src)
    for bad in ("[0.5]", '"web"', '{"web": "high"}', '{"web": true}',
                '{"web": Infinity}', '{"web": NaN}'):
        assert main(["corpus", "mix", "--input", src, "--rates", bad]) == 2
        assert "JSON object" in capsys.readouterr().err


def test_cli_corpus_dedup_incremental_signatures_roundtrip(tmp_path, capsys):
    """VERDICT r4 ask #7: `corpus dedup --signatures PATH` from the shell.
    Batch 1 writes the banded-signature state; batch 2 dedups against it
    without re-hashing batch 1; the union of survivors equals a full
    recompute over both batches."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.operators import corpus as corpus_ops
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="t-incr-dedup")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten eleven"
    b1 = [("a1", base), ("a2", other)]
    # b2: near-dup of a1, plus a genuinely new doc (and its own near-dup)
    b2 = [("b1", base + " tail"),
          ("b2", "completely fresh unrelated words appear in this document"),
          ("b3", "completely fresh unrelated words appear in this document now")]
    p1, p2 = str(tmp_path / "b1.parquet"), str(tmp_path / "b2.parquet")
    spark.createDataFrame(b1, "doc_id string, text string").write.parquet(p1)
    spark.createDataFrame(b2, "doc_id string, text string").write.parquet(p2)
    sig = str(tmp_path / "sigs.parquet")
    o1, o2 = str(tmp_path / "kept1.parquet"), str(tmp_path / "kept2.parquet")

    assert main(["corpus", "dedup", "--input", p1, "--signatures", sig,
                 "--output", o1]) == 0
    capsys.readouterr()
    assert main(["corpus", "dedup", "--input", p2, "--signatures", sig,
                 "--output", o2]) == 0
    capsys.readouterr()

    kept = {r["doc_id"] for r in spark.read.parquet(o1).collect()} | {
        r["doc_id"] for r in spark.read.parquet(o2).collect()
    }
    full = {
        r["doc_id"]
        for r in corpus_ops.neardup_dedup(
            spark.createDataFrame(b1 + b2, "doc_id string, text string")
        ).collect()
    }
    assert kept == full, (kept, full)
    assert "b1" not in kept  # cross-batch near-dup dropped via signatures
    # signature store accumulated batch-1 docs + batch-2 survivors only
    sig_ids = {r["id"] for r in spark.read.parquet(sig).select("id").distinct().collect()}
    assert sig_ids == kept
    # simhash + --signatures is a usage error, not a crash
    assert main(["corpus", "dedup", "--input", p2, "--signatures", sig,
                 "--method", "simhash"]) != 0


def test_cli_corpus_clean_spans(tmp_path, capsys):
    """`corpus clean-spans` removes cross-document boilerplate spans and
    writes the cleaned corpus distributed."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "subscribe to our newsletter unique content one"),
            (2, "subscribe to our newsletter fresh words two"),
            (3, "entirely distinct document body here now three"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    dst = str(tmp_path / "clean.parquet")
    assert main(
        ["corpus", "clean-spans", "--input", src, "--output", dst,
         "--span-tokens", "4", "--min-docs", "2"]
    ) == 0
    capsys.readouterr()
    got = {r["id"]: r for r in spark.read.parquet(dst).collect()}
    assert got[1]["clean_text"] == "unique content one"
    assert got[2]["clean_text"] == "fresh words two"
    assert got[3]["n_kept"] == got[3]["n_spans"]


def test_cli_embeddings_cluster(tmp_path, capsys):
    """`embeddings cluster` trains distributed k-means and writes
    per-vector cell assignments."""
    import numpy as np

    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    rng = np.random.RandomState(5)
    rows = []
    for c in range(2):
        base = np.zeros(8)
        base[c] = 4.0
        for i in range(40):
            v = base + rng.normal(0, 0.2, 8)
            rows.append((c * 100 + i, [float(x) for x in v]))
    src = str(tmp_path / "emb.parquet")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(src)
    dst = str(tmp_path / "cells.parquet")
    assert main(
        ["embeddings", "cluster", "--input", src, "--output", dst,
         "--k-cells", "2", "--iters", "5"]
    ) == 0
    capsys.readouterr()
    got = spark.read.parquet(dst).collect()
    assert len(got) == 80
    cells = {r["id"]: r["cell"] for r in got}
    # the two planted blobs land in two distinct cells
    a = {cells[i] for i in cells if i < 100}
    b = {cells[i] for i in cells if i >= 100}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_cli_corpus_classifier_roundtrip(tmp_path, capsys):
    """train-classifier writes weights JSON; classify scores a corpus
    with them — the GPT-3-style model-based quality filter from the
    shell."""
    import json

    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    schema = "doc_id long, text string"
    pos_rows = [(i, "careful analysis research evidence method insight") for i in range(30)]
    neg_rows = [(100 + i, "buy click free winner casino pills offer") for i in range(30)]
    pos_p = str(tmp_path / "pos.parquet")
    raw_p = str(tmp_path / "raw.parquet")
    spark.createDataFrame(pos_rows, schema).write.parquet(pos_p)
    spark.createDataFrame(neg_rows, schema).write.parquet(raw_p)
    wpath = str(tmp_path / "w.json")
    assert main(
        ["corpus", "train-classifier", "--input", raw_p,
         "--positives", pos_p, "--weights-out", wpath]
    ) == 0
    capsys.readouterr()
    w = json.load(open(wpath))
    assert len(w) == 257  # default dim + bias

    mixed_p = str(tmp_path / "mixed.parquet")
    spark.createDataFrame(pos_rows[:5] + neg_rows[:5], schema).write.parquet(mixed_p)
    dst = str(tmp_path / "scored.parquet")
    assert main(
        ["corpus", "classify", "--input", mixed_p, "--weights", wpath,
         "--output", dst]
    ) == 0
    capsys.readouterr()
    scores = {r["id"]: r["score"] for r in spark.read.parquet(dst).collect()}
    assert all(scores[i] > 0.5 for i in range(5))
    assert all(scores[100 + i] < 0.5 for i in range(5))


def test_cli_corpus_round5_actions_smoke(tmp_path, capsys):
    """Thin-dispatch smoke for the round-5 corpus actions: gopher,
    passages, score-bigram, clean-spans preview (library semantics are
    gate/unit-tested; this pins the CLI wiring)."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today again"),
            (2, "the quick brown fox jumps over the lazy dog today also"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    for action, marker in [
        ("gopher", "passes"),
        ("passages", "start_tok"),
        ("score-bigram", "avg_logprob"),
        ("clean-spans", "n_kept"),
    ]:
        assert main(["corpus", action, "--input", src]) == 0, action
        out = capsys.readouterr().out
        assert marker in out, (action, out)


def test_cli_corpus_pipeline(tmp_path, capsys):
    """`corpus pipeline --stages stages.json` runs the declarative
    curation flow and writes the surviving corpus."""
    import json

    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today again"),
            (2, "the quick brown fox jumps over the lazy dog today again"),
            (3, "bad"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    stages = str(tmp_path / "stages.json")
    with open(stages, "w") as fh:
        json.dump([{"op": "gopher"}, {"op": "exact-dedup"}], fh)
    dst = str(tmp_path / "out.parquet")
    assert main(
        ["corpus", "pipeline", "--input", src, "--stages", stages,
         "--output", dst]
    ) == 0
    err = capsys.readouterr().err
    assert "stage 0 gopher: 2 rows" in err
    assert "stage 1 exact-dedup: 1 rows" in err
    assert spark.read.parquet(dst).count() == 1


def test_cli_corpus_jsonl_input_and_output_partitions(tmp_path, capsys):
    """JSONL corpora read directly (--input-format auto by extension);
    --output-partitions controls the written file count."""
    import json
    import os

    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.jsonl")
    with open(src, "w") as fh:
        for i in range(20):
            fh.write(json.dumps({"doc_id": i, "text": f"alpha beta doc {i}"}) + "\n")
    dst = str(tmp_path / "prof.parquet")
    assert main(
        ["corpus", "profile", "--input", src, "--output", dst,
         "--output-partitions", "2"]
    ) == 0
    capsys.readouterr()
    assert spark.read.parquet(dst).count() == 20
    parts = [f for f in os.listdir(dst) if f.startswith("part-")]
    assert len(parts) == 2


def test_cli_corpus_mix_temperature(tmp_path, capsys):
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "tdocs.parquet")
    spark.createDataFrame(
        [(i, "text", "big" if i < 450 else "small") for i in range(500)],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    dst = str(tmp_path / "mixed.parquet")
    assert main(
        ["corpus", "mix", "--input", src, "--temperature", "0.5",
         "--output", dst]
    ) == 0
    err = capsys.readouterr().err
    assert "temperature rates" in err and "small=1.000" in err
    got = spark.read.parquet(dst)
    n_small = got.filter("source = 'small'").count()
    n_big = got.filter("source = 'big'").count()
    assert n_small == 50 and n_big < 260
    # both flags together is a usage error
    assert main(
        ["corpus", "mix", "--input", src, "--temperature", "0.5",
         "--rates", "{}"]
    ) == 2


def test_cli_corpus_select_dsir(tmp_path, capsys):
    """`corpus select` runs DSIR importance resampling: --target-source
    fits the target on a slice of the input; --target takes a separate
    parquet; exactly one of the two is required."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.parquet")
    rows = [(i, "def class import return yield " * 4, "code") for i in range(10)]
    rows += [(i, "the quick brown fox jumps over " * 4, "web") for i in range(10, 40)]
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(src)

    # neither / both target flags -> usage error
    assert main(["corpus", "select", "--input", src]) == 2
    capsys.readouterr()

    dst = str(tmp_path / "picked.parquet")
    assert main(["corpus", "select", "--input", src,
                 "--target-source", "code", "--n-select", "8",
                 "--output", dst]) == 0
    capsys.readouterr()
    picked = spark.read.parquet(dst)
    assert picked.count() == 8
    # the code-vocabulary docs carry far higher importance weight
    ids = {r["doc_id"] for r in picked.collect()}
    assert len([i for i in ids if i < 10]) >= 6, ids

    # separate --target parquet path
    tgt = str(tmp_path / "target.parquet")
    spark.createDataFrame(
        [(100, "def class import return yield lambda")],
        "doc_id long, text string",
    ).write.parquet(tgt)
    assert main(["corpus", "select", "--input", src, "--target", tgt,
                 "--n-select", "5"]) == 0
    out = capsys.readouterr().out
    assert "log_weight" in out


def test_cli_corpus_chunk(tmp_path, capsys):
    """`corpus chunk` windows documents into overlapping token chunks."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    ).write.parquet(src)
    dst = str(tmp_path / "chunks.parquet")
    assert main(["corpus", "chunk", "--input", src, "--chunk-size", "4",
                 "--chunk-overlap", "1", "--output", dst]) == 0
    capsys.readouterr()
    got = spark.read.parquet(dst)
    assert got.count() == 3
    assert set(got.columns) == {"doc_id", "chunk_idx", "n_chunk_tokens",
                                "chunk_text"}


def test_cli_corpus_exact_dedup_history_roundtrip(tmp_path, capsys):
    """`corpus exact-dedup --history DIR` round-trip: batch 1 seeds the
    Bloom+hash state, batch 2 keeps only genuinely new content."""
    import os

    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    hist = str(tmp_path / "state")
    os.makedirs(hist)
    b1 = str(tmp_path / "b1.parquet")
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string",
    ).write.parquet(b1)
    d1 = str(tmp_path / "kept1.parquet")
    assert main(["corpus", "exact-dedup", "--input", b1, "--history", hist,
                 "--output", d1]) == 0
    capsys.readouterr()
    assert spark.read.parquet(d1).count() == 2

    b2 = str(tmp_path / "b2.parquet")
    spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "brand new text")],
        "doc_id long, text string",
    ).write.parquet(b2)
    d2 = str(tmp_path / "kept2.parquet")
    assert main(["corpus", "exact-dedup", "--input", b2, "--history", hist,
                 "--output", d2]) == 0
    capsys.readouterr()
    assert [r["doc_id"] for r in spark.read.parquet(d2).collect()] == [11]


def test_cli_corpus_shuffle(tmp_path, capsys):
    """`corpus shuffle` emits a dense deterministic training-order rank."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
    ).write.parquet(src)
    dst = str(tmp_path / "order.parquet")
    assert main(["corpus", "shuffle", "--input", src, "--seed", "5",
                 "--output", dst]) == 0
    capsys.readouterr()
    got = spark.read.parquet(dst)
    assert set(got.columns) == {"id", "shuffle_key", "shuffle_rank"}
    ranks = sorted(r["shuffle_rank"] for r in got.collect())
    assert ranks == list(range(20))


def test_cli_corpus_sample_exact_budget(tmp_path, capsys):
    """`corpus sample --per-source N` keeps exactly N docs per source."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"doc {i}", f"s{i % 2}") for i in range(40)],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    dst = str(tmp_path / "sampled.parquet")
    assert main(["corpus", "sample", "--input", src, "--per-source", "3",
                 "--output", dst]) == 0
    capsys.readouterr()
    got = spark.read.parquet(dst)
    counts = {r["source"]: r["count"] for r in
              got.groupBy("source").count().collect()}
    assert counts == {"s0": 3, "s1": 3}


def test_cli_corpus_upsample(tmp_path, capsys):
    """`corpus upsample` duplicates high-rate sources with an epoch
    column; bad --rates is a usage error."""
    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"d{i}", "wiki") for i in range(10)],
        "doc_id long, text string, source string",
    ).write.parquet(src)
    for bad in ("[2.0]", '{"wiki": Infinity}', '{"wiki": NaN}'):
        assert main(["corpus", "upsample", "--input", src,
                     "--rates", bad]) == 2
        capsys.readouterr()
    dst = str(tmp_path / "up.parquet")
    assert main(["corpus", "upsample", "--input", src,
                 "--rates", '{"wiki": 2.0}', "--output", dst]) == 0
    capsys.readouterr()
    got = spark.read.parquet(dst)
    assert got.count() == 20
    assert set(r["epoch"] for r in got.collect()) == {0, 1}


def test_cli_corpus_shuffle_shards(tmp_path, capsys):
    """`corpus shuffle --shards N --output DIR` writes the full corpus as
    N globally-ordered shard files; --shards without --output is a
    usage error."""
    import glob

    from blq_cli_spark.cli import main
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="blq-tests")
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(30)], "doc_id long, text string"
    ).write.parquet(src)
    assert main(["corpus", "shuffle", "--input", src, "--shards", "3"]) == 2
    capsys.readouterr()
    dst = str(tmp_path / "shards")
    assert main(["corpus", "shuffle", "--input", src, "--shards", "3",
                 "--output", dst]) == 0
    assert "3 ordered shards" in capsys.readouterr().out
    assert len(glob.glob(dst + "/part-*.parquet")) == 3
    got = spark.read.parquet(dst)
    assert got.count() == 30
    assert "shuffle_rank" in got.columns and "text" in got.columns
