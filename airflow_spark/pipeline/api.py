"""HTTP control plane for the pipeline engine.

Reference analog: the reference exposes an Airflow webserver with a
health endpoint and REST DAG-run triggering
(/root/reference/compose.yml:28-44 api service;
/root/reference/config/healthcheck.sh:20-40 polls
``/api/v2/monitor/health``). This is the engine-native equivalent: a
stdlib ThreadingHTTPServer (no new dependencies) over a pure, testable
dispatch core.

Routes:

- ``GET /health`` — engine health (Spark, scheduler, state store).
- ``GET /pipelines`` — registered pipelines (name, schedule, tags).
- ``GET /pipelines/{name}`` — task graph detail.
- ``POST /pipelines/{name}/trigger`` — body ``{"params": {...},
  "profile": "dev"}`` → starts the run on a daemon thread, returns
  202 + run_id immediately (the Airflow REST dagRuns shape).
- ``POST /pipelines/{name}/resume/{run_id}`` — clear-and-rerun of a
  failed run (succeeded tasks reuse persisted XCom); 202 + a
  placeholder run_id to poll.
- ``GET /runs/{run_id}`` — status of a triggered run (running /
  success / failed + per-task states once finished).
- ``GET /stats`` — per-pipeline run analytics from the state store
  (success rate, duration mean/p95, last run).

Design note: the dispatch core (``ControlPlane.dispatch``) takes
(method, path, body) and returns (status, payload) with no socket
involved — tests drive it directly; ``serve()`` merely adapts it to
HTTP. Trigger runs one pipeline run per thread; Spark job submission
is thread-safe (each task is a job group, same as the parallel
executor in core.py).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .health import health as _health

#: Role lattice (reference parity: the webserver's AUTH_ROLES_MAPPING
#: maps IdP groups onto Admin/Op/Viewer;
#: /root/reference/config/webserver_config.py:22-63,93-118). Higher
#: rank implies every lower-rank permission.
ROLE_RANK = {"Viewer": 0, "Op": 1, "Admin": 2}


class StaticTokenRoles:
    """Bearer-token → (user, role) provider: the engine-native analog
    of the reference's OAuth role mapping — identities and an
    Admin/Op/Viewer split instead of one shared secret. Tokens come
    from config/secret storage; the control plane only sees the
    mapping.

    ``tokens`` maps token → role, or token → (user, role) when the
    audit trail needs a username."""

    def __init__(self, tokens: dict):
        self._tokens = {}
        for tok, v in tokens.items():
            user, role = v if isinstance(v, (tuple, list)) else (None, v)
            if role not in ROLE_RANK:
                raise ValueError(
                    f"unknown role {role!r} (valid: {sorted(ROLE_RANK)})"
                )
            self._tokens[tok] = {"user": user or f"token:{tok[:4]}…",
                                 "role": role}

    def authenticate(self, headers: dict | None) -> dict | None:
        got = (headers or {}).get("Authorization", "")
        if not got.startswith("Bearer "):
            return None
        return self._tokens.get(got[len("Bearer "):])


class GroupRoleMapper:
    """The login-time group→role sync of the reference's
    AUTH_ROLES_MAPPING (webserver_config.py:93-118): given the groups
    an identity provider asserts for a user, resolve the HIGHEST
    mapped role (a user in both a viewer and an admin group is an
    admin). Deliberately transport-agnostic — whatever validates the
    OIDC token upstream hands the group list here."""

    def __init__(self, roles_mapping: dict[str, str]):
        for groups_role in roles_mapping.values():
            if groups_role not in ROLE_RANK:
                raise ValueError(f"unknown role {groups_role!r}")
        self.roles_mapping = roles_mapping

    def role_for(self, groups: list[str]) -> str | None:
        roles = [
            self.roles_mapping[g] for g in groups if g in self.roles_mapping
        ]
        if not roles:
            return None
        return max(roles, key=lambda r: ROLE_RANK[r])


class ControlPlane:
    def __init__(
        self,
        spark,
        pipelines=None,
        state_store=None,
        scheduler=None,
        auth_token: str | None = None,
        role_provider=None,
    ):
        """Authentication is pluggable (reference parity:
        /root/reference/config/webserver_config.py supports multiple
        AUTH_* providers with role mapping):

        - ``role_provider`` — an object with
          ``authenticate(headers) -> {"user": ..., "role": ...} | None``
          (e.g. :class:`StaticTokenRoles`). Read endpoints need
          ``Viewer``; mutations (trigger/resume) need ``Admin``.
        - ``auth_token`` (or env ``SPARK_GRAFT_API_TOKEN``) — the
          single-shared-secret stand-in, kept as one provider: the
          token maps to ``Admin``.
        - neither — open (local dev).

        ``GET /health`` always stays open (probes run unauthenticated,
        matching /root/reference/config/healthcheck.sh)."""
        import os

        self.spark = spark
        self.pipelines = {p.name: p for p in (pipelines or [])}
        self.state_store = state_store
        self.scheduler = scheduler
        auth_token = auth_token or os.environ.get("SPARK_GRAFT_API_TOKEN")
        if role_provider is None and auth_token:
            role_provider = StaticTokenRoles({auth_token: ("shared", "Admin")})
        self.role_provider = role_provider
        self._runs: dict[str, dict] = {}
        self._lock = threading.Lock()
        #: serializes Pipeline.resume calls (new-run-id derivation from
        #: the state store is read-then-act; see _resume)
        self._resume_lock = threading.Lock()

    def _identity(self, headers: dict | None) -> dict | None:
        """None = anonymous-but-open (no provider) handled by caller."""
        if self.role_provider is None:
            return {"user": "anonymous", "role": "Admin"}
        return self.role_provider.authenticate(headers)

    # -- pure dispatch core ------------------------------------------------

    def dispatch(
        self,
        method: str,
        path: str,
        body: dict | None = None,
        headers: dict | None = None,
    ):
        """(method, path, body, headers) → (http_status, payload dict)."""
        from urllib.parse import urlsplit

        # strip any query string/fragment before routing: a health
        # checker's /health?probe=1 must still match
        path = urlsplit(path).path
        if body is not None and not isinstance(body, dict):
            return 400, {"error": "request body must be a JSON object"}
        parts = [p for p in path.split("/") if p]
        if method == "GET" and parts == ["health"]:
            return 200, _health(
                self.spark, scheduler=self.scheduler, state_store=self.state_store
            )
        ident = self._identity(headers)
        if ident is None:
            return 401, {"error": "missing or invalid bearer token"}
        # RBAC: reads need Viewer, mutations need Admin (the reference's
        # Admin/Op/Viewer split from AUTH_ROLES_MAPPING)
        need = "Admin" if method != "GET" else "Viewer"
        rank = ROLE_RANK.get(ident.get("role"))
        if rank is None:
            # a pluggable provider returned an unmapped role (e.g.
            # GroupRoleMapper.role_for -> None): authenticated but
            # holding no grant — an authz denial, never a 500
            return 403, {
                "error": f"no recognized role for user "
                         f"{ident.get('user')!r}",
            }
        if rank < ROLE_RANK[need]:
            return 403, {
                "error": f"role {ident['role']!r} may not {method} {path} "
                         f"(requires {need})",
                "user": ident["user"],
            }
        if method == "GET" and parts == ["pipelines"]:
            return 200, {
                "pipelines": [
                    {
                        "name": p.name,
                        "schedule": p.schedule,
                        "tags": p.tags,
                        "n_tasks": len(p.tasks),
                        "description": p.description,
                    }
                    for p in self.pipelines.values()
                ]
            }
        if method == "GET" and len(parts) == 2 and parts[0] == "pipelines":
            p = self.pipelines.get(parts[1])
            if p is None:
                return 404, {"error": f"unknown pipeline {parts[1]!r}"}
            return 200, {
                "name": p.name,
                "schedule": p.schedule,
                "params": sorted(p.params),
                "tasks": {
                    name: {"depends_on": t.depends_on, "retries": t.retries}
                    for name, t in p.tasks.items()
                },
            }
        if (
            method == "POST"
            and len(parts) == 3
            and parts[0] == "pipelines"
            and parts[2] == "trigger"
        ):
            p = self.pipelines.get(parts[1])
            if p is None:
                return 404, {"error": f"unknown pipeline {parts[1]!r}"}
            return self._trigger(p, body or {})
        if (
            method == "POST"
            and len(parts) == 4
            and parts[0] == "pipelines"
            and parts[2] == "resume"
        ):
            p = self.pipelines.get(parts[1])
            if p is None:
                return 404, {"error": f"unknown pipeline {parts[1]!r}"}
            if self.state_store is None:
                return 409, {"error": "resume requires a state store"}
            return self._resume(p, parts[3], body or {})
        if method == "GET" and parts == ["stats"]:
            if self.state_store is None:
                return 409, {"error": "stats require a state store"}
            rows = self.state_store.run_stats().collect()
            return 200, {
                "pipelines": [
                    {
                        "pipeline": r["pipeline"],
                        "n_runs": r["n_runs"],
                        "n_success": r["n_success"],
                        "success_rate": r["success_rate"],
                        "mean_elapsed_s": r["mean_elapsed_s"],
                        "p95_elapsed_s": r["p95_elapsed_s"],
                        "last_started": str(r["last_started"]),
                    }
                    for r in rows
                ]
            }
        if method == "GET" and len(parts) == 2 and parts[0] == "runs":
            with self._lock:
                rec = self._runs.get(parts[1])
            if rec is None:
                return 404, {"error": f"unknown run {parts[1]!r}"}
            return 200, rec
        return 404, {"error": f"no route {method} {path}"}

    def _resume(self, pipeline, run_id: str, body: dict):
        """``POST /pipelines/{name}/resume/{run_id}`` — clear-and-rerun
        of a failed run: succeeded tasks reuse their persisted XCom,
        the rest re-execute (Pipeline.resume semantics)."""
        import uuid

        rec = {"run_id": None, "pipeline": pipeline.name, "status": "running",
               "tasks": {}, "resumed_from": run_id}
        # unique per REQUEST: a deterministic placeholder would let two
        # concurrent resumes of the same run clobber each other's record
        placeholder = f"{run_id}__resuming__{uuid.uuid4().hex[:8]}"
        with self._lock:
            self._runs[placeholder] = rec

        def _go():
            try:
                # serialize resume attempts: Pipeline.resume derives the
                # new run id from the state store, so two concurrent
                # resumes of one run would both pick '<id>__r2' and
                # execute twice
                with self._resume_lock:
                    run = pipeline.resume(
                        self.spark,
                        self.state_store,
                        run_id,
                        params=body.get("params"),
                        profile=body.get("profile", "dev"),
                    )
                with self._lock:
                    rec["run_id"] = run.run_id
                    rec["status"] = run.status
                    rec["tasks"] = {
                        name: tr.status for name, tr in run.tasks.items()
                    }
                    self._runs[run.run_id] = rec
            except Exception as e:  # noqa: BLE001 - surfaced via the API
                with self._lock:
                    rec["status"] = "failed"
                    rec["error"] = str(e)[:500]

        threading.Thread(
            target=_go, daemon=True, name=placeholder
        ).start()
        return 202, {"run_id": placeholder, "status": "running",
                     "resumed_from": run_id}

    def _trigger(self, pipeline, body: dict):
        import datetime as dt

        run_ts = dt.datetime.now(dt.timezone.utc)
        run_id = f"{pipeline.name}__api__{run_ts.strftime('%Y%m%dT%H%M%S%f')}"
        rec = {"run_id": run_id, "pipeline": pipeline.name, "status": "running",
               "tasks": {}}
        with self._lock:
            self._runs[run_id] = rec

        def _go():
            try:
                run = pipeline.run(
                    self.spark,
                    params=body.get("params"),
                    profile=body.get("profile", "dev"),
                    run_ts=run_ts,
                    run_id=run_id,
                    state_store=self.state_store,
                )
                with self._lock:
                    rec["status"] = run.status
                    rec["tasks"] = {
                        name: tr.status for name, tr in run.tasks.items()
                    }
            except Exception as e:  # noqa: BLE001 - surfaced via the API
                with self._lock:
                    rec["status"] = "failed"
                    rec["error"] = str(e)[:500]

        threading.Thread(target=_go, daemon=True, name=run_id).start()
        return 202, {"run_id": run_id, "status": "running"}

    # -- HTTP adapter ------------------------------------------------------

    def serve(self, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
        """Start the HTTP server on a daemon thread; returns the server
        (``server.server_address[1]`` is the bound port; call
        ``server.shutdown()`` to stop)."""
        plane = self

        class Handler(BaseHTTPRequestHandler):
            def _reply(self, status: int, payload: dict):
                data = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler API
                self._reply(*plane.dispatch("GET", self.path, None, dict(self.headers)))

            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b"{}"
                try:
                    body = json.loads(raw or b"{}")
                except json.JSONDecodeError:
                    self._reply(400, {"error": "invalid JSON body"})
                    return
                self._reply(*plane.dispatch("POST", self.path, body, dict(self.headers)))

            def log_message(self, *a):  # quiet test output
                pass

        server = ThreadingHTTPServer((host, port), Handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server
