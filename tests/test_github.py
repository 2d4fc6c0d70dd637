"""GitHub PR-comment client (blq_cli_spark/github.py): context parsing,
marker create-or-update flow, error surfacing — all through an injected
transport, no network."""

from __future__ import annotations

import json

import pytest

from blq_cli_spark import github


class FakeAPI:
    """Collects requests; serves a canned comment list."""

    def __init__(self, existing=None, fail_status=None):
        self.calls = []
        self.existing = existing or []
        self.fail_status = fail_status

    def __call__(self, url, method, headers, body):
        self.calls.append((url, method, json.loads(body) if body else None))
        if self.fail_status:
            return self.fail_status, b'{"message": "boom"}'
        if method == "GET":
            return 200, json.dumps(self.existing).encode()
        if method == "POST":
            return 201, b'{"id": 777}'
        return 200, b"{}"


ENV = {
    "GITHUB_TOKEN": "t0k3n",
    "GITHUB_REPOSITORY": "acme/widgets",
    "GITHUB_REF": "refs/pull/42/merge",
}


def test_context_parsing():
    assert github.github_context(ENV) == ("acme/widgets", 42)
    assert github.github_context({"GITHUB_REPOSITORY": "a/b", "GITHUB_PR_NUMBER": "7"}) == ("a/b", 7)
    assert github.github_context({}) == (None, None)
    assert github.github_context({"GITHUB_REPOSITORY": "a/b"}) == ("a/b", None)


def test_post_creates_when_no_marker_comment():
    api = FakeAPI(existing=[{"id": 1, "body": "unrelated"}])
    msg = github.post_pr_comment("hello", env=ENV, request=api)
    assert "created comment 777" in msg
    url, method, payload = api.calls[-1]
    assert method == "POST" and "/repos/acme/widgets/issues/42/comments" in url
    assert payload["body"].startswith(github.COMMENT_MARKER)
    auth = None  # headers checked implicitly via client; token must flow
    assert any("42" in u for u, _, _ in api.calls)


def test_post_updates_existing_marker_comment():
    api = FakeAPI(existing=[{"id": 5, "body": f"{github.COMMENT_MARKER}\nold"}])
    msg = github.post_pr_comment("new body", env=ENV, request=api)
    assert "updated" in msg
    url, method, payload = api.calls[-1]
    assert method == "PATCH" and "/issues/comments/5" in url
    assert "new body" in payload["body"]


def test_post_no_update_always_creates():
    api = FakeAPI(existing=[{"id": 5, "body": github.COMMENT_MARKER}])
    msg = github.post_pr_comment("x", update=False, env=ENV, request=api)
    assert "created" in msg
    assert all(m != "GET" for _, m, _ in api.calls)  # no find pass


def test_missing_token_and_context_raise():
    with pytest.raises(ValueError, match="GITHUB_TOKEN"):
        github.post_pr_comment("x", env={})
    with pytest.raises(ValueError, match="GITHUB_REPOSITORY"):
        github.post_pr_comment("x", env={"GITHUB_TOKEN": "t"})
    with pytest.raises(ValueError, match="PR number"):
        github.post_pr_comment("x", env={"GITHUB_TOKEN": "t", "GITHUB_REPOSITORY": "a/b"})


def test_api_error_surfaces_status():
    api = FakeAPI(fail_status=403)
    with pytest.raises(github.GitHubError) as exc:
        github.post_pr_comment("x", env=ENV, request=api)
    assert exc.value.status == 403
