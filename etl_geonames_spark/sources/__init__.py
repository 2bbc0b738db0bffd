from etl_geonames_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    load_all,
    load_table,
)
from etl_geonames_spark.sources.json import read_ndjson  # noqa: F401
from etl_geonames_spark.sources.sinks import (  # noqa: F401
    write_ndjson,
    write_ndjson_lines,
    write_parquet,
)
from etl_geonames_spark.sources.tsv import (  # noqa: F401
    read_admin_codes,
    read_all_countries,
)
