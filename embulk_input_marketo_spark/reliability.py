"""Control-plane reliability: classified retry with exponential backoff.

Carries the reference's retry discipline (SURVEY.md §2.9) for DRIVER-side
control-plane calls (catalog CAS, external service calls); the data plane
needs none of this — Spark task retry + the lake's idempotent manifest gate
cover executor failures.

Reference semantics carried:
- ``MarketoUtils.executeWithRetry`` (MarketoUtils.java:146-180): up to N
  attempts, exponential-ish backoff between them, retryability decided by a
  classifier callback.
- error-code policy (MarketoBaseRestClient.java:247-300): some codes renew a
  credential then retry (601/602), some wait a rate-limit interval (606),
  some retry plainly (604/608/611/615/713/1029), the rest fail fast.
- defaults 7 retries / 20s initial / 120s max (MarketoRestClient.java:128-138).

The sleeper is injectable so tests run without wall-clock sleeps.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


class RetryGiveUpError(Exception):
    def __init__(self, attempts: int, last: Exception):
        super().__init__(f"gave up after {attempts} attempts: {last!r}")
        self.attempts = attempts
        self.last = last


class ServiceError(Exception):
    """A control-plane call failure carrying the service's error code — the
    MarketoAPIException analogue (error code + message)."""

    def __init__(self, code: str | int, message: str = ""):
        super().__init__(f"[{code}] {message}")
        self.code = str(code)


# The reference's concrete error-code → action matrix
# (MarketoBaseRestClient.java:247-300):
#   601/602  access token invalid/expired → renew the credential, retry
#   606      rate limit exceeded          → wait the rate-limit interval
#   604/608/611/615/713/1029 (timeouts, temporarily unavailable, system
#            error, concurrency, export quota) → plain retry with backoff
#   anything else → fail fast
RENEW_CODES = frozenset({"601", "602"})
RATE_LIMIT_CODES = frozenset({"606"})
RETRY_CODES = frozenset({"604", "608", "611", "615", "713", "1029"})


def default_classify(e: Exception) -> str:
    """Default verdict classifier shipping the reference's code table.
    Non-service transport failures (connection reset, timeout) retry, like
    the reference's retry-on-IOException rule; unknown service codes fail
    fast."""
    if isinstance(e, ServiceError):
        if e.code in RENEW_CODES:
            return "renew"
        if e.code in RATE_LIMIT_CODES:
            return "rate_limit"
        if e.code in RETRY_CODES:
            return "retry"
        return "fail"
    if isinstance(e, (ConnectionError, TimeoutError, OSError)):
        return "retry"
    return "fail"


@dataclass
class RetryPolicy:
    max_attempts: int = 7                      # maximum_retries default
    initial_backoff_s: float = 20.0            # initial_retry_interval_milis
    max_backoff_s: float = 120.0               # maximum_retry_interval_milis
    # classify(exc) -> 'retry' | 'renew' | 'rate_limit' | 'fail'; the default
    # ships the reference's error-code matrix (round 1 defaulted to
    # retry-everything, leaving the concrete 601/602/606/... table unshipped)
    classify: Callable[[Exception], str] = field(
        default=lambda e: default_classify(e)
    )
    renew: Callable[[], Any] | None = None     # credential renewal hook
    rate_limit_wait_s: float = 20.0            # marketo_limit_interval_milis
    sleeper: Callable[[float], None] = time.sleep


def execute_with_retry(fn: Callable[[], Any], policy: RetryPolicy | None = None) -> Any:
    policy = policy or RetryPolicy()
    backoff = policy.initial_backoff_s
    last: Exception | None = None
    for attempt in range(1, policy.max_attempts + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — classifier decides
            last = e
            verdict = policy.classify(e)
            if verdict == "fail" or attempt == policy.max_attempts:
                raise RetryGiveUpError(attempt, e) from e
            if verdict == "renew" and policy.renew is not None:
                policy.renew()
                continue  # renewal retries immediately (double-checked lock
                # semantics live in the renew hook, like
                # MarketoBaseRestClient.java:87-166)
            if verdict == "rate_limit":
                policy.sleeper(policy.rate_limit_wait_s)
                continue
            policy.sleeper(backoff)
            backoff = min(backoff * 2, policy.max_backoff_s)
    raise RetryGiveUpError(policy.max_attempts, last or RuntimeError("unreachable"))
