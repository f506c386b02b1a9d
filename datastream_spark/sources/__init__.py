from .tables import TableStore  # noqa: F401
