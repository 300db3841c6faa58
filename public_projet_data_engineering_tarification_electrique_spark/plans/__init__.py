from .registry import QUERIES, ORACLE_SQL, flagship  # noqa: F401
