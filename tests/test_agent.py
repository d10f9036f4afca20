"""AgentGuard / SandboxPolicy (reference python/dataprof/agent.py parity)."""

import os

import pytest

from dataprof_ray.agent import AgentGuard, SandboxPolicy, SandboxViolation


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    return p


def test_path_outside_roots_rejected(tmp_path, csv_file):
    other = tmp_path / "elsewhere"
    other.mkdir()
    policy = SandboxPolicy(allowed_roots=(str(other),))
    with pytest.raises(SandboxViolation, match="outside"):
        policy.check_path(str(csv_file))


def test_no_roots_rejected(csv_file):
    with pytest.raises(SandboxViolation, match="roots"):
        SandboxPolicy().check_path(str(csv_file))


def test_symlink_escape_rejected(tmp_path, csv_file):
    inside = tmp_path / "inside"
    inside.mkdir()
    link = inside / "sneaky.csv"
    outside_target = tmp_path / "secret.csv"
    outside_target.write_text("x\n1\n")
    os.symlink(outside_target, link)
    policy = SandboxPolicy(allowed_roots=(str(inside),))
    with pytest.raises(SandboxViolation, match="outside"):
        policy.check_path(str(link))


def test_network_rejected_by_default():
    with pytest.raises(SandboxViolation, match="network"):
        SandboxPolicy(allowed_roots=("/",)).check_path("https://example.com/x.csv")


def test_size_budget(tmp_path):
    big = tmp_path / "big.csv"
    big.write_text("a\n" + "1\n" * 100)
    policy = SandboxPolicy(allowed_roots=(str(tmp_path),), max_file_bytes=10)
    with pytest.raises(SandboxViolation, match="size"):
        policy.check_path(str(big))


def test_guarded_run(ray_session, tmp_path, csv_file):
    guard = AgentGuard(SandboxPolicy(allowed_roots=(str(csv_file.parent),)))
    report = guard.run(str(csv_file))
    assert report.rows == 2


def test_guarded_run_row_budget(ray_session, tmp_path):
    p = tmp_path / "many.csv"
    p.write_text("a\n" + "\n".join(str(i) for i in range(500)))
    guard = AgentGuard(SandboxPolicy(allowed_roots=(str(tmp_path),), max_rows=100))
    assert guard.run(str(p)).rows == 100


def test_sanitized_errors(ray_session, tmp_path):
    bad = tmp_path / "bad.xyz"
    bad.write_text("???")
    guard = AgentGuard(SandboxPolicy(allowed_roots=(str(tmp_path),)))
    with pytest.raises(SandboxViolation) as ei:
        guard.run(str(bad))
    assert str(tmp_path) not in str(ei.value)  # no path leakage


def test_llm_context_run(ray_session, csv_file):
    guard = AgentGuard(SandboxPolicy(allowed_roots=(str(csv_file.parent),)))
    ctx = guard.run_llm_context(str(csv_file), max_tokens=100)
    assert "rows" in ctx and len(ctx) <= 400
