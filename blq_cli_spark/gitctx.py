"""Git context for event locations: blame + recent file history.

The reference enriches `blq inspect --git` with last-touch blame and the
file's recent commits (src/blq/git.py get_file_context, used by
services/inspect.py:98-157). Driver-side subprocess work by design — a
per-event DETAIL lookup on one file, not a distributed operator; the
distributed side only supplies the (ref_file, ref_line) to look up.
"""

from __future__ import annotations

import subprocess


def _git(args: list[str], cwd: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", *args], cwd=cwd, capture_output=True, text=True, timeout=10
        )
        return out.stdout if out.returncode == 0 else None
    except (OSError, subprocess.TimeoutExpired):
        return None


def blame_line(path: str, line: int, cwd: str) -> dict | None:
    """Last-touch blame for one line: author, commit, author-time ISO."""
    raw = _git(
        ["blame", "-L", f"{line},{line}", "--porcelain", "--", path], cwd
    )
    if not raw:
        return None
    info: dict = {}
    first = raw.splitlines()
    if first:
        info["commit"] = first[0].split()[0][:12]
    for ln in first[1:]:
        if ln.startswith("author "):
            info["author"] = ln[len("author "):]
        elif ln.startswith("author-time "):
            import datetime as _dt

            info["modified"] = _dt.datetime.fromtimestamp(
                int(ln.split()[1])
            ).isoformat()
    return info or None


def recent_commits(path: str, cwd: str, limit: int = 2) -> list[dict]:
    """The file's last `limit` commits (short hash, author, time, subject)."""
    raw = _git(
        ["log", "-n", str(limit), "--format=%h%x1f%an%x1f%aI%x1f%s", "--", path],
        cwd,
    )
    if not raw:
        return []
    out = []
    for ln in raw.splitlines():
        parts = ln.split("\x1f")
        if len(parts) == 4:
            out.append(
                {"hash": parts[0], "author": parts[1], "time": parts[2],
                 "message": parts[3]}
            )
    return out


def file_context(
    path: str, line: int | None = None, cwd: str = ".", history_limit: int = 2
) -> dict | None:
    """Compose blame (when a line is known) + recent commits for a file;
    None when the file is untracked or git is unavailable (reference
    get_git_context returns None on any failure — enrichment must never
    break inspect)."""
    result: dict = {"file": path, "line": line}
    if line is not None:
        b = blame_line(path, line, cwd)
        if b:
            result["blame"] = b
    commits = recent_commits(path, cwd, history_limit)
    if commits:
        result["recent_commits"] = commits
    return result if ("blame" in result or "recent_commits" in result) else None
