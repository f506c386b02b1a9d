from . import asof, derive, rollup, rollup_route, sessionize  # noqa: F401
