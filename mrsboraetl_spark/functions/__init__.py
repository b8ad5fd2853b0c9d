"""Scalar / expression layer: obs-map codec, decode ladders, text analysis."""

from mrsboraetl_spark.functions.obsmap import (  # noqa: F401
    typed_value,
    blob_entry,
    ordered_collect,
    packed_blob,
    obs_map_from_entries,
    render_legacy_blob,
    blob_extract_all,
    map_first_value,
)
