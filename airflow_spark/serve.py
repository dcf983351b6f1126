"""Deployment entrypoint: one process running the scheduler loop + the
HTTP control plane — what the container image starts.

Reference parity: the reference ships a runnable deployment
(/root/reference/Dockerfile, /root/reference/compose.yml with
apiserver / scheduler / triggerer / log-groomer services, each with a
healthcheck polling the monitor endpoint via
config/healthcheck.sh:20-40). This engine collapses those planes into
one process — the executor IS Spark, the triggerer IS the deferrable-
sensor loop inside Pipeline.run, and grooming is a registered
pipeline — so the compose file here runs this module once, with the
same healthcheck shape against ``GET /health``.

Pipelines are loaded from ``$SPARK_GRAFT_PIPELINES`` =
``module:callable``; the callable receives the SparkSession and
returns the pipelines to register (each optionally a
``(pipeline, register_kwargs)`` tuple for dataset triggers etc.).
Unset, the plane serves health/stats only — pipelines are deliberately
NOT auto-discovered (a deployment states what it runs).

Usage::

    python -m airflow_spark.serve            # serve until signalled
    python -m airflow_spark.serve --once     # one scheduler poll, exit
                                             # (compose init / smoke)
"""

from __future__ import annotations

import importlib
import logging
import os
import sys

logger = logging.getLogger(__name__)


def load_pipelines(spec: str, spark):
    """``module:callable`` → list of Pipeline or (Pipeline, kwargs)."""
    mod_name, _, fn_name = spec.partition(":")
    if not fn_name:
        raise ValueError(
            f"SPARK_GRAFT_PIPELINES={spec!r} must be 'module:callable'"
        )
    fn = getattr(importlib.import_module(mod_name), fn_name)
    return list(fn(spark))


def build(spark=None, pipelines_spec: str | None = None):
    """Assemble (spark, control_plane, scheduler, state_store) from the
    environment — separated from :func:`main` so tests can drive the
    exact deployment wiring in-process."""
    from .pipeline.api import ControlPlane, StaticTokenRoles
    from .pipeline.scheduler import Scheduler
    from .pipeline.state import RunStateStore
    from .session import get_session

    if spark is None:
        spark = get_session(app_name="airflow_spark-serve")
    state_path = os.environ.get("SPARK_GRAFT_STATE_DIR")
    state = RunStateStore(spark, state_path) if state_path else None
    scheduler = Scheduler(spark)

    spec = pipelines_spec or os.environ.get("SPARK_GRAFT_PIPELINES")
    pipelines = []
    if spec:
        for item in load_pipelines(spec, spark):
            p, kwargs = item if isinstance(item, tuple) else (item, {})
            pipelines.append(p)
            if p.schedule is not None or kwargs.get("dataset") is not None:
                scheduler.register(p, **kwargs)

    role_provider = None
    jwks_path = os.environ.get("SPARK_GRAFT_API_JWKS")
    roles_spec = os.environ.get("SPARK_GRAFT_API_ROLES")
    if jwks_path:
        # OIDC/JWT bearer auth (reference webserver_config.py analog):
        # SPARK_GRAFT_API_JWKS      = path to the IdP's JWKS document
        # SPARK_GRAFT_API_GROUPS    = "idp-group=Role,..." mapping
        # SPARK_GRAFT_API_ISSUER /
        # SPARK_GRAFT_API_AUDIENCE  = optional iss/aud pins
        from .pipeline.auth import JwksRoleProvider

        groups_spec = os.environ.get(
            "SPARK_GRAFT_API_GROUPS", "Admin=Admin,Op=Op,Viewer=Viewer"
        )
        role_provider = JwksRoleProvider(
            jwks_path,
            roles_mapping=dict(
                pair.split("=", 1) for pair in groups_spec.split(",")
            ),
            issuer=os.environ.get("SPARK_GRAFT_API_ISSUER"),
            audience=os.environ.get("SPARK_GRAFT_API_AUDIENCE"),
        )
    elif roles_spec:
        # "token=Role,token2=Role2" — the static provider; richer
        # providers (OIDC group mapping) are wired programmatically
        role_provider = StaticTokenRoles(
            dict(pair.split("=", 1) for pair in roles_spec.split(","))
        )
    plane = ControlPlane(
        spark,
        pipelines,
        state_store=state,
        scheduler=scheduler,
        role_provider=role_provider,
    )
    return spark, plane, scheduler, state


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    logging.basicConfig(level=logging.INFO)
    spark, plane, scheduler, _state = build()
    host = os.environ.get("SPARK_GRAFT_API_HOST", "127.0.0.1")
    port = int(os.environ.get("SPARK_GRAFT_API_PORT", "8080"))
    if (
        plane.role_provider is None
        and host not in ("127.0.0.1", "localhost", "::1")
        and os.environ.get("SPARK_GRAFT_ALLOW_ANON") not in ("1", "true")
    ):
        # fail secure: an unauthenticated plane treats every request as
        # Admin — binding that to a non-loopback interface (the
        # container default is 0.0.0.0) would expose trigger/resume to
        # the network. The reference deployment requires login.
        logger.error(
            "refusing to bind %s without auth: set SPARK_GRAFT_API_ROLES "
            "(token=Role,...) or SPARK_GRAFT_API_TOKEN, or explicitly "
            "opt into an open plane with SPARK_GRAFT_ALLOW_ANON=1",
            host,
        )
        return 2
    server = plane.serve(host=host, port=port)
    logger.info("control plane on %s:%s", *server.server_address[:2])
    if "--once" in argv:
        scheduler.run_pending()
        server.shutdown()
        return 0
    try:
        scheduler.run_loop(
            poll_s=float(os.environ.get("SPARK_GRAFT_POLL_S", "30"))
        )
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
