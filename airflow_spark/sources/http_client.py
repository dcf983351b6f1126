"""requests-backed fetcher/poster for the REST source/sink adapters.

The reference performs live HTTP with status checks inside task bodies
(plugins/cloudflare/cloudflare_api.py:15-23 — non-200 raises
ConnectionError with the status + body; dags/DNS_Requests.py:51-61).
This module is the shipped production implementation of the injectable
``fetcher``/``poster`` interfaces in :mod:`airflow_spark.sources.http`:
non-2xx or transport failure maps to :class:`HttpError`, which the task
retry loop (O5 ``retry_on=(HttpError,)``) classifies as transient.

Design notes
------------
- Picklable: instances carry only plain config (headers, timeout), and
  build their ``requests.Session`` lazily per process — so a fetcher can
  be shipped to executors for ``fetch_per_key`` (mapInPandas fan-out)
  without pickling a live socket pool.
- ``success_flag`` reproduces the reference's second-level check on
  mutation responses (cloudflare_api.py:112-115: a 200 whose body says
  ``"success": false`` is still a failure).
"""

from __future__ import annotations

from typing import Any

from .http import HttpError

__all__ = ["RequestsFetcher", "RequestsPoster", "HttpError"]


class _RequestsBase:
    def __init__(
        self,
        headers: dict[str, str] | None = None,
        timeout_s: float = 30.0,
        bearer_token: str | None = None,
    ):
        self.headers = dict(headers or {})
        if bearer_token is not None:
            # reference auth convention: cloudflare_api.py:13
            self.headers["Authorization"] = f"Bearer {bearer_token}"
        self.timeout_s = timeout_s
        self._session = None  # lazy; excluded from pickle

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_session"] = None
        return state

    def _sess(self):
        if self._session is None:
            import requests

            self._session = requests.Session()
        return self._session

    def _check(self, resp, what: str) -> Any:
        """Status-check semantics of cloudflare_api.py:15-23: non-2xx →
        error carrying status + response body."""
        try:
            body: Any = resp.json()
        except ValueError:
            body = resp.text
        if not (200 <= resp.status_code < 300):
            raise HttpError(
                f"{what} failed. Status code: {resp.status_code} -> {body}"
            )
        return body


class RequestsFetcher(_RequestsBase):
    """GET ``url`` → parsed JSON, or :class:`HttpError`.

    Drop-in ``fetcher`` for :func:`http_json_source`,
    :func:`map_payload_source` and :func:`fetch_per_key`.
    """

    def __call__(self, url: str) -> Any:
        import requests

        try:
            resp = self._sess().get(
                url, headers=self.headers, timeout=self.timeout_s
            )
        except requests.RequestException as e:
            raise HttpError(f"GET {url} transport failure: {e}") from e
        return self._check(resp, f"GET {url}")


class RequestsPoster(_RequestsBase):
    """``(url, body)`` → JSON-mutating request, or :class:`HttpError`.

    Drop-in ``poster`` for :func:`http_sink`. ``method`` covers the
    reference's PATCH record update (cloudflare_api.py:105), PUT policy
    replace (:158) and plain POST. With ``success_flag`` set, a 2xx
    response whose JSON lacks a truthy ``success`` field also raises
    (cloudflare_api.py:112-115).
    """

    def __init__(
        self,
        method: str = "POST",
        headers: dict[str, str] | None = None,
        timeout_s: float = 30.0,
        bearer_token: str | None = None,
        success_flag: str | None = None,
    ):
        super().__init__(headers, timeout_s, bearer_token)
        self.method = method.upper()
        self.success_flag = success_flag

    def __call__(self, url: str, body: dict) -> Any:
        import requests

        try:
            resp = self._sess().request(
                self.method,
                url,
                json=body,
                headers=self.headers,
                timeout=self.timeout_s,
            )
        except requests.RequestException as e:
            raise HttpError(
                f"{self.method} {url} transport failure: {e}"
            ) from e
        payload = self._check(resp, f"{self.method} {url}")
        if self.success_flag is not None:
            # a 2xx with a non-object body (proxy error page, array)
            # cannot carry the success flag — treating it as success
            # is exactly the 200-with-failure-body mode the flag guards
            if not isinstance(payload, dict):
                raise HttpError(
                    f"{self.method} {url} expected a JSON object with "
                    f"{self.success_flag!r}, got {type(payload).__name__}"
                )
            if not payload.get(self.success_flag):
                raise HttpError(
                    f"{self.method} {url} reported "
                    f"{self.success_flag}={payload.get(self.success_flag)!r}"
                    f" -> {payload}"
                )
        return payload
