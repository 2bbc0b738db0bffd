from etl_geonames_spark.geonames.pipeline import (  # noqa: F401
    GeonamesConfig,
    build_pits,
    build_relations,
    filters_predicate,
    resolve_type,
    run_pipeline,
    tagged_envelope,
    transform_from_paths,
)
