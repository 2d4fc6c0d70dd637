"""Minimal GitHub REST client for CI PR comments (reference parity:
src/blq/github.py GitHubClient + commands/ci_cmd.py:370-470 context
detection and marker-based create-or-update flow).

stdlib urllib only — no third-party HTTP dependency — and the request
function is injectable so tests exercise the full flow without network.
The marker convention (an HTML comment embedded in the body) lets
`--update` replace the bot's previous comment instead of stacking new
ones on every push.
"""

from __future__ import annotations

import json
import os
import re
import urllib.error
import urllib.request
from collections.abc import Callable

API_BASE = "https://api.github.com"
COMMENT_MARKER = "<!-- blq-spark-ci-comment -->"


class GitHubError(Exception):
    def __init__(self, message: str, status: int | None = None):
        super().__init__(message)
        self.status = status


def _default_request(url: str, method: str, headers: dict, body: bytes | None):
    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as exc:
        return exc.code, exc.read()
    except urllib.error.URLError as exc:
        raise GitHubError(f"network error: {exc.reason}") from exc


class GitHubClient:
    """Create / update / find PR issue-comments.

    `request` takes (url, method, headers, body) -> (status, bytes);
    the default uses urllib. Inject a fake in tests."""

    def __init__(self, token: str, request: Callable | None = None):
        self._token = token
        self._request = request or _default_request

    def _call(self, method: str, path: str, payload: dict | None = None):
        headers = {
            "Authorization": f"Bearer {self._token}",
            "Accept": "application/vnd.github+json",
            "User-Agent": "blq-spark",
        }
        body = None
        if payload is not None:
            body = json.dumps(payload).encode()
            headers["Content-Type"] = "application/json"
        status, raw = self._request(f"{API_BASE}{path}", method, headers, body)
        if status >= 400:
            raise GitHubError(f"GitHub API {status} for {path}", status=status)
        return json.loads(raw) if raw else None

    def create_comment(self, repo: str, pr_number: int, body: str) -> int:
        got = self._call(
            "POST", f"/repos/{repo}/issues/{pr_number}/comments", {"body": body}
        )
        return int(got["id"])

    def update_comment(self, repo: str, comment_id: int, body: str) -> None:
        self._call(
            "PATCH", f"/repos/{repo}/issues/comments/{comment_id}", {"body": body}
        )

    def find_comment(self, repo: str, pr_number: int, marker: str) -> int | None:
        """First comment whose body contains `marker` (paged, newest
        pages not needed: the bot comment is posted early)."""
        page = 1
        while True:
            got = self._call(
                "GET",
                f"/repos/{repo}/issues/{pr_number}/comments?per_page=100&page={page}",
            )
            if not got:
                return None
            for c in got:
                if marker in (c.get("body") or ""):
                    return int(c["id"])
            if len(got) < 100:
                return None
            page += 1


def github_context(env: dict | None = None) -> tuple[str | None, int | None]:
    """(repo, pr_number) from GitHub Actions env: GITHUB_REPOSITORY plus
    refs/pull/N/... in GITHUB_REF, or GITHUB_PR_NUMBER."""
    env = env if env is not None else dict(os.environ)
    repo = env.get("GITHUB_REPOSITORY")
    if not repo:
        return None, None
    m = re.match(r"refs/pull/(\d+)/", env.get("GITHUB_REF", ""))
    if m:
        return repo, int(m.group(1))
    pr = env.get("GITHUB_PR_NUMBER", "")
    return repo, int(pr) if pr.isdigit() else None


def post_pr_comment(
    body: str,
    update: bool = True,
    env: dict | None = None,
    request: Callable | None = None,
) -> str:
    """Create-or-update the marker comment on the current PR. Returns a
    human-readable status line; raises GitHubError / ValueError on a
    missing token, missing PR context, or API failure."""
    env = env if env is not None else dict(os.environ)
    token = env.get("GITHUB_TOKEN")
    if not token:
        raise ValueError("GITHUB_TOKEN not set")
    repo, pr = github_context(env)
    if not repo:
        raise ValueError("GITHUB_REPOSITORY not set (not running in CI?)")
    if pr is None:
        raise ValueError("could not determine PR number (not a pull_request event?)")
    client = GitHubClient(token, request=request)
    full = f"{COMMENT_MARKER}\n{body}"
    if update:
        existing = client.find_comment(repo, pr, COMMENT_MARKER)
        if existing is not None:
            client.update_comment(repo, existing, full)
            return f"updated comment on PR #{pr}"
    cid = client.create_comment(repo, pr, full)
    return f"created comment {cid} on PR #{pr}"
