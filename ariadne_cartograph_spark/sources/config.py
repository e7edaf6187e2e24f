"""YAML config source (SURVEY.md §2.1 S5): the reference loads
`config.yaml` with DB connection parameters and optional authed HTTP
headers for the high-res tile provider
(`/root/reference/update_ways_metadata.py:133-134`,
`/root/reference/config.example.yaml:1-13`). Driver-side only — config
never ships to executors except as literal options baked into the plan
(JDBC reader options, provider header maps).
"""

from __future__ import annotations

from typing import Any

DEFAULT_CONFIG: dict[str, Any] = {
    "database": {},
    "providers": {},
}


def load_config(path: str) -> dict[str, Any]:
    """yaml.safe_load of the engine config; missing file or missing
    pyyaml yields the empty default (every setting is optional)."""
    try:
        import yaml
    except ImportError:  # config then comes from explicit kwargs
        return dict(DEFAULT_CONFIG)
    try:
        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
    except FileNotFoundError:
        return dict(DEFAULT_CONFIG)
    out = dict(DEFAULT_CONFIG)
    out.update(cfg)
    return out


def jdbc_options(cfg: dict[str, Any]) -> dict[str, str]:
    """Translate the reference's psycopg2-style `database:` section
    (host/port/dbname/user/password) into spark JDBC reader options —
    the live-PostGIS parity path for S1
    (`spark.read.format("jdbc").options(**jdbc_options(cfg))`).
    Partition-parallel reads should additionally set partitionColumn/
    lowerBound/upperBound/numPartitions on the gid key."""
    db = cfg.get("database") or {}
    if "url" in db:
        # Explicit JDBC URL escape hatch: lets the same reader path target
        # any JDBC store (pgBouncer URLs, embedded Derby in tests, …).
        opts = {"url": str(db["url"])}
        if "driver" in db:
            opts["driver"] = str(db["driver"])
    else:
        host = db.get("host", "localhost")
        port = db.get("port", 5432)
        dbname = db.get("dbname", db.get("database", "postgres"))
        opts = {
            "url": f"jdbc:postgresql://{host}:{port}/{dbname}",
            "driver": "org.postgresql.Driver",
        }
    if "user" in db:
        opts["user"] = str(db["user"])
    if "password" in db:
        opts["password"] = str(db["password"])
    return opts


def provider_headers(cfg: dict[str, Any], provider: str) -> dict[str, str]:
    """HTTP headers for an authed tile provider (the reference passes
    `config['strava']['headers']` into its high-res provider,
    `update_ways_metadata.py:88-89`). Falls back to {} — the synthetic
    provider needs none."""
    section = cfg.get("providers", {}).get(provider) or cfg.get(provider) or {}
    headers = section.get("headers") or {}
    return {str(k): str(v) for k, v in headers.items()}
