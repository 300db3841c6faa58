"""Merged DuckDB oracle dict: core literal entries + the band modules.

plans/registry.py imports ORACLE_SQL from here and then appends its
computed / cross-referencing oracles in place (shared dict object).
"""

from .core import ORACLE_SQL as _core
from .ext_100 import ORACLE_SQL as _e1
from .ext_200 import ORACLE_SQL as _e2
from .ext_300 import ORACLE_SQL as _e3

ORACLE_SQL: dict[str, str] = {**_core, **_e1, **_e2, **_e3}

from . import computed  # noqa: E402,F401 — registers the generated oracles in place
