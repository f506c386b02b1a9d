from . import asof, derive, rollup, sessionize  # noqa: F401
