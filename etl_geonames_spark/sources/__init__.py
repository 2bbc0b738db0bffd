from etl_geonames_spark.sources.tables import load_table, load_all, TABLE_NAMES  # noqa: F401
