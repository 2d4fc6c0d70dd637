"""Rule-table log parser: per-format extraction, auto-detection, fallback
chain, fingerprint stability, and the distributed mapInPandas path.
Sample logs mirror the reference's fixture style (tests/test_query_api.py:
19-30 there) without copying them."""

from __future__ import annotations

import pytest

from blq_cli_spark.sources import logparse as lp

GCC_LOG = """\
src/main.c:10:5: error: undefined reference to 'foo'
src/main.c:22:1: warning: unused variable 'x'
make: *** [all] Error 1
"""

PYTEST_LOG = """\
============================= test session starts ==============================
tests/test_app.py::test_ok PASSED
FAILED tests/test_app.py::test_math - AssertionError: 1 != 2
ERROR tests/test_io.py::test_read - FileNotFoundError: missing.txt
E       AssertionError: 1 != 2
========================= 2 failed, 1 passed in 0.12s ==========================
"""

MYPY_LOG = """\
src/app.py:12: error: Incompatible types in assignment [assignment]
src/app.py:30:8: note: Revealed type is "builtins.int"
src/lib.py:4: warning: unused 'type: ignore' comment
"""

ESLINT_LOG = """\
app.js
  7:1   error  'x' is defined but never used  no-unused-vars
  9:12  warning  Missing semicolon  semi
"""

TRACEBACK_LOG = """\
Traceback (most recent call last):
  File "main.py", line 4, in <module>
    run()
  File "lib.py", line 9, in run
    raise ValueError("bad input")
ValueError: bad input
"""

RUST_LOG = """\
error[E0308]: mismatched types
 --> src/main.rs:5:9
warning: unused import: `std::io`
 --> src/lib.rs:1:5
"""

GO_LOG = """\
--- FAIL: TestAdd
    math_test.go:12: got 3, want 4
ok      example.com/pkg 0.002s
"""

MAVEN_LOG = """\
[ERROR] /src/Main.java:[10,5] cannot find symbol
[WARNING] Using platform encoding
"""


def test_gcc_extraction():
    evs = lp.parse_content(GCC_LOG, "gcc")
    assert len(evs) == 2
    e0 = evs[0]
    assert (e0["ref_file"], e0["ref_line"], e0["ref_column"]) == ("src/main.c", 10, 5)
    assert e0["severity"] == "error" and "undefined reference" in e0["message"]


def test_pytest_extraction():
    evs = lp.parse_content(PYTEST_LOG, "pytest")
    fails = [e for e in evs if e["event_type"] == "test_result"]
    assert {e["test_name"] for e in fails} == {"test_math", "test_read"}
    assert all(e["severity"] == "error" for e in fails)


def test_mypy_code_extraction():
    evs = lp.parse_content(MYPY_LOG, "mypy")
    assert evs[0]["code"] == "assignment"
    assert evs[1]["severity"] == "note" and evs[1]["ref_column"] == 8
    assert len(evs) == 3


def test_eslint_stateful_file_binding():
    evs = lp.parse_content(ESLINT_LOG, "eslint")
    assert len(evs) == 2
    assert all(e["ref_file"] == "app.js" for e in evs)
    assert evs[0]["rule"] == "no-unused-vars"


def test_traceback_final_frame_and_span():
    evs = lp.parse_content(TRACEBACK_LOG, "python_traceback")
    assert len(evs) == 1
    e = evs[0]
    assert (e["ref_file"], e["ref_line"], e["code"]) == ("lib.py", 9, "ValueError")
    assert e["log_line_start"] == 1 and e["log_line_end"] == 6


def test_rust_location_attachment():
    evs = lp.parse_content(RUST_LOG, "rustc")
    assert evs[0]["code"] == "E0308" and evs[0]["ref_file"] == "src/main.rs"
    assert evs[1]["severity"] == "warning" and evs[1]["ref_line"] == 1


def test_go_test_binding():
    evs = lp.parse_content(GO_LOG, "go_test")
    assert evs[0]["test_name"] == "TestAdd"
    assert evs[1]["ref_file"] == "math_test.go" and evs[1]["ref_line"] == 12


def test_maven():
    evs = lp.parse_content(MAVEN_LOG, "maven")
    assert evs[0]["ref_file"] == "/src/Main.java" and evs[0]["ref_line"] == 10
    assert evs[1]["severity"] == "warning"


@pytest.mark.parametrize(
    "log,expected",
    [
        (GCC_LOG, "gcc"),
        (MYPY_LOG, "mypy"),
        (ESLINT_LOG, "eslint"),
        (TRACEBACK_LOG, "python_traceback"),
        (RUST_LOG, "rustc"),
        (GO_LOG, "go_test"),
        (MAVEN_LOG, "maven"),
    ],
)
def test_auto_detection(log, expected):
    assert lp.detect_format(log) == expected


def test_auto_parse_marks_format():
    evs = lp.parse_content(GCC_LOG, "auto")
    assert evs and all(e["format_used"] == "gcc" for e in evs)


def test_fallback_to_generic():
    evs = lp.parse_content("something went wrong\nERROR: disk full\nall fine\n", "auto")
    assert evs[0]["format_used"] == "generic"
    assert evs[0]["severity"] == "error" and "disk full" in evs[0]["message"]


def test_empty_and_unparseable():
    assert lp.parse_content("", "auto") == []
    assert lp.parse_content("nothing to see here\n", "auto") == []


def test_fingerprint_stability_and_normalization():
    a = lp.fingerprint_of("gcc", None, "undefined reference to foo at 0xdeadbeef line 42")
    b = lp.fingerprint_of("gcc", None, "undefined reference to foo at 0xCAFE line 7")
    c = lp.fingerprint_of("gcc", None, "some other message")
    assert a == b != c


def test_command_format_matching():
    assert lp.match_command_format("gcc -O2 main.c") == "gcc"
    assert lp.match_command_format("python -m pytest tests/") == "pytest"
    assert lp.match_command_format("cargo build --release") == "rustc"
    assert lp.match_command_format("unknown-tool xyz") is None


def test_distributed_parse_df(spark):
    docs = spark.createDataFrame(
        [("r1", GCC_LOG), ("r2", PYTEST_LOG), ("r3", ""), ("r4", MYPY_LOG)],
        "source_id string, content string",
    )
    out = lp.parse_df(docs, fmt="auto")
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source_id"], []).append(r)
    assert len(by_src["r1"]) == 2 and by_src["r1"][0]["tool_name"] == "gcc"
    assert "r3" not in by_src
    assert {r["format_used"] for r in by_src["r4"]} == {"mypy"}
    # event_index restarts per document
    assert [r["event_index"] for r in sorted(by_src["r1"], key=lambda r: r["event_index"])] == [1, 2]


TSC_LOG = """src/app.ts(10,5): error TS2304: Cannot find name 'foo'.
src/util.ts(3,1): warning TS6133: 'x' is declared but never used.
"""

JEST_LOG = """PASS src/ok.test.js
FAIL src/math.test.js
  ✕ adds numbers (4 ms)
  ✕ multiplies numbers
"""

SHELLCHECK_LOG = """In deploy.sh line 3:
cp $SRC $DST
   ^--^ SC2086 (info): Double quote to prevent globbing and word splitting.

In deploy.sh line 7:
eval $CMD
^-- SC2294 (warning): eval negates the benefit of arrays.
"""

RUFF_LOG = """src/a.py:1:1: F401 [*] `os` imported but unused
src/b.py:12:80: E501 Line too long (92 > 79)
"""


def test_parse_tsc():
    evs = lp.parse_content(TSC_LOG, "tsc")
    assert len(evs) == 2
    assert evs[0]["severity"] == "error" and evs[0]["code"] == "TS2304"
    assert (evs[0]["ref_file"], evs[0]["ref_line"], evs[0]["ref_column"]) == ("src/app.ts", 10, 5)
    assert evs[1]["severity"] == "warning"


def test_parse_jest():
    evs = lp.parse_content(JEST_LOG, "jest")
    # one FAIL header + two failing tests, nothing for PASS
    assert len(evs) == 3
    assert evs[0]["ref_file"] == "src/math.test.js"
    assert evs[1]["test_name"] == "adds numbers"
    assert all(e["severity"] == "error" for e in evs)


def test_parse_shellcheck():
    evs = lp.parse_content(SHELLCHECK_LOG, "shellcheck")
    assert len(evs) == 2
    assert evs[0]["code"] == "SC2086" and evs[0]["ref_line"] == 3
    assert evs[1]["code"] == "SC2294" and evs[1]["severity"] == "warning"
    # span covers header line through caret line
    assert evs[0]["log_line_start"] < evs[0]["log_line_end"]


def test_parse_ruff():
    evs = lp.parse_content(RUFF_LOG, "ruff")
    assert len(evs) == 2
    assert evs[0]["rule"] == "F401" and evs[0]["ref_column"] == 1
    assert evs[1]["ref_line"] == 12


def test_autodetect_new_formats():
    assert lp.detect_format(TSC_LOG) == "tsc"
    assert lp.detect_format(RUFF_LOG) == "ruff"
    assert lp.match_command_format("npx tsc --noEmit") == "tsc"
    assert lp.match_command_format("shellcheck deploy.sh") == "shellcheck"


MSBUILD_LOG = """Program.cs(12,34): error CS0103: The name 'foo' does not exist [App.csproj]
Util.cs(3,5): warning CS0168: The variable 'x' is declared but never used
"""

CMAKE_LOG = """CMake Error at CMakeLists.txt:14 (message):
  Required library FOO not found

CMake Warning (dev) at src/CMakeLists.txt:7 (add_library):
  Policy CMP0115 is not set.
"""

GRADLE_LOG = """> Task :app:compileJava FAILED

FAILURE: Build failed with an exception.

* What went wrong:
Execution failed for task ':app:compileJava'.
"""


def test_parse_msbuild():
    evs = lp.parse_content(MSBUILD_LOG, "msbuild")
    assert len(evs) == 2
    assert evs[0]["code"] == "CS0103" and evs[0]["ref_column"] == 34
    assert "[App.csproj]" not in evs[0]["message"]
    assert evs[1]["severity"] == "warning"


def test_parse_cmake_multiline_body():
    evs = lp.parse_content(CMAKE_LOG, "cmake")
    assert len(evs) == 2
    assert evs[0]["severity"] == "error"
    assert "FOO not found" in evs[0]["message"]
    assert (evs[0]["ref_file"], evs[0]["ref_line"]) == ("CMakeLists.txt", 14)
    assert evs[0]["log_line_end"] > evs[0]["log_line_start"]
    assert evs[1]["severity"] == "warning" and evs[1]["code"] == "add_library"


def test_parse_gradle():
    evs = lp.parse_content(GRADLE_LOG, "gradle")
    assert len(evs) == 2
    assert evs[0]["test_name"] == ":app:compileJava"
    assert "Execution failed" in evs[1]["message"]


def test_msbuild_not_confused_with_tsc():
    assert lp.detect_format(MSBUILD_LOG) == "msbuild"
    assert lp.detect_format(TSC_LOG) == "tsc"
    assert lp.match_command_format("dotnet build -c Release") == "msbuild"
    assert lp.match_command_format("./gradlew assemble") == "gradle"


JAVA_LOG = """Exception in thread "main" java.lang.NullPointerException: oops
	at com.example.App.run(App.java:42)
	at com.example.App.main(App.java:10)
Caused by: java.lang.IllegalStateException: root cause
	at com.example.Util.check(Util.java:7)
"""

NPM_LOG = """npm WARN deprecated left-pad@1.0.0: use String.padStart
npm ERR! code ELIFECYCLE
npm ERR! errno 1
npm ERR! myapp@1.0.0 build: `webpack`
"""

DOCKER_LOG = """Step 3/7 : RUN make
 ---> Running in abc123
#7 1.23 ERROR: process "/bin/sh -c make" did not complete successfully
failed to solve: executor failed running [/bin/sh -c make]: exit code 2
"""

TF_LOG = """Error: Reference to undeclared resource

  on main.tf line 12, in resource "aws_instance" "web":

Warning: Deprecated attribute
"""


def test_parse_java_stacktrace():
    evs = lp.parse_content(JAVA_LOG, "java_stacktrace")
    assert len(evs) == 2
    assert evs[0]["code"] == "NullPointerException" and evs[0]["message"] == "oops"
    assert (evs[0]["ref_file"], evs[0]["ref_line"]) == ("App.java", 42)
    assert evs[0]["log_line_end"] == 3  # spans header + 2 frames
    assert evs[1]["code"] == "IllegalStateException"
    assert evs[1]["ref_file"] == "Util.java"


def test_parse_npm_collapses_err_block():
    evs = lp.parse_content(NPM_LOG, "npm")
    assert len(evs) == 2  # one WARN + one collapsed ERR block
    assert evs[0]["severity"] == "warning"
    assert evs[1]["severity"] == "error" and evs[1]["code"] == "ELIFECYCLE"


def test_parse_docker_build():
    evs = lp.parse_content(DOCKER_LOG, "docker_build")
    assert len(evs) == 2
    assert "did not complete successfully" in evs[0]["message"]
    assert "executor failed" in evs[1]["message"]  # prefix stripped


def test_parse_terraform():
    evs = lp.parse_content(TF_LOG, "terraform")
    assert len(evs) == 2
    assert (evs[0]["ref_file"], evs[0]["ref_line"]) == ("main.tf", 12)
    assert evs[1]["severity"] == "warning" and evs[1]["ref_file"] is None


def test_batch2_command_hints():
    assert lp.match_command_format("npm run build") == "npm"
    assert lp.match_command_format("docker build -t app .") == "docker_build"
    assert lp.match_command_format("terraform plan") == "terraform"
    assert lp.match_command_format("java -jar app.jar") == "java_stacktrace"
    assert lp.match_command_format("javac Main.java") == "gcc"  # javac is gcc-shaped


GOLANGCI_LOG = """main.go:10:2: ineffectual assignment to err (ineffassign)
pkg/util.go:3: exported function Foo should have comment (golint)
"""

ANSIBLE_LOG = """TASK [deploy app] *******
fatal: [web01]: FAILED! => {"msg": "connection refused"}
TASK [restart nginx] *******
failed: [web02] (item=conf): {"msg": "template error"}
"""


def test_parse_golangci_lint():
    evs = lp.parse_content(GOLANGCI_LOG, "golangci_lint")
    assert len(evs) == 2
    assert evs[0]["rule"] == "ineffassign" and evs[0]["ref_column"] == 2
    assert evs[1]["rule"] == "golint" and evs[1]["ref_column"] is None


def test_parse_ansible_task_attribution():
    evs = lp.parse_content(ANSIBLE_LOG, "ansible")
    assert len(evs) == 2
    assert evs[0]["test_name"] == "deploy app" and evs[0]["code"] == "web01"
    assert evs[1]["test_name"] == "restart nginx" and evs[1]["code"] == "web02"
    assert lp.match_command_format("ansible-playbook site.yml") == "ansible"
    assert lp.match_command_format("golangci-lint run") == "golangci_lint"
