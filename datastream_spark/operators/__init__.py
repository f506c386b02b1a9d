from . import asof, curation, derive, rollup, rollup_route, sessionize  # noqa: F401
