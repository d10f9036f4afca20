"""Agent sandbox: policy-bounded profiling for LLM-agent callers.

Behavior parity (not a port) with the reference's Python ``AgentGuard`` /
``SandboxPolicy`` (/root/reference/python/dataprof/agent.py:120-450):
path allow-roots with symlink escape checks, network-source rejection,
row/time budgets, and sanitized error strings (no raw paths or values leak
into agent-visible messages).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

from dataprof_ray.schema import ProfileReport

_NETWORK_SCHEMES = ("http://", "https://", "s3://", "gs://", "ftp://", "hdfs://")


class SandboxViolation(Exception):
    """Raised with a SANITIZED message — never echoes user paths/values."""


@dataclass
class SandboxPolicy:
    allowed_roots: tuple = ()
    allow_network: bool = False
    max_rows: int = 1_000_000
    timeout_seconds: float = 300.0
    max_file_bytes: int = 1 << 30

    def check_path(self, path: str) -> str:
        """Resolve symlinks, then require the real path to live under an
        allowed root (agent.py symlink-escape semantics)."""
        if any(path.startswith(s) for s in _NETWORK_SCHEMES):
            if not self.allow_network:
                raise SandboxViolation("network sources are not permitted by policy")
            return path
        real = os.path.realpath(path)
        if not self.allowed_roots:
            raise SandboxViolation("no filesystem roots are permitted by policy")
        for root in self.allowed_roots:
            root_real = os.path.realpath(root)
            if real == root_real or real.startswith(root_real + os.sep):
                break
        else:
            raise SandboxViolation("path is outside the permitted roots")
        if not os.path.exists(real):
            raise SandboxViolation("file not found inside permitted roots")
        if os.path.isfile(real) and os.path.getsize(real) > self.max_file_bytes:
            raise SandboxViolation("file exceeds the permitted size budget")
        return real


@dataclass
class AgentGuard:
    """Resource-bounded ``run()`` wrapper around the Profiler facade."""

    policy: SandboxPolicy = field(default_factory=SandboxPolicy)

    def run(self, path: str, **profiler_kwargs) -> ProfileReport:
        from dataprof_ray.profiler import Profiler
        from dataprof_ray.state.stop import StopCondition

        real = self.policy.check_path(path)
        prof = Profiler()
        for k, v in profiler_kwargs.items():
            setter = getattr(prof, f"with_{k}", None)
            if setter is None:
                raise SandboxViolation(f"unknown profiler option: {k}")
            setter(*v) if isinstance(v, tuple) else setter(v)
        # both budgets enforced DURING execution: the composite stop
        # condition runs in the driver monitor, which truncates the stream
        # the moment either the row cap or the wall-clock budget is hit
        prof.stop_when(StopCondition.any_of(
            StopCondition.max_rows(self.policy.max_rows),
            StopCondition.max_seconds(self.policy.timeout_seconds),
        ))
        try:
            report = prof.analyze_file(real)
        except SandboxViolation:
            raise
        except Exception as e:
            # sanitized error contract: class name only, no message payload
            raise SandboxViolation(
                f"profiling failed ({type(e).__name__})"
            ) from None
        if report.execution.truncation_reason == "TimeBudget":
            raise SandboxViolation("profiling exceeded the permitted time budget")
        return report

    def run_llm_context(self, path: str, max_tokens: int = 800, **kw) -> str:
        """Policy-bounded profile rendered as redacted LLM context."""
        from dataprof_ray.report import to_llm_context

        return to_llm_context(self.run(path, **kw), max_tokens=max_tokens)
