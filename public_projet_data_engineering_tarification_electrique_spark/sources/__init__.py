from .tables import TESTDATA_TABLES, load_table, register_views  # noqa: F401
from .readers import read_csv, read_json_records  # noqa: F401
from .writers import append_parquet, overwrite_date_partition  # noqa: F401
