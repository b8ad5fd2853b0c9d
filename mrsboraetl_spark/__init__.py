"""mrsboraetl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kemri-ucsf/MRSBoraETL.

The reference (mirrored read-only at /root/reference/) is a MySQL
stored-procedure ETL that incrementally flattens an OpenMRS EAV clinical
database into wide flat tables.  This package re-expresses every operator it
uses (SURVEY.md §2) as idiomatic Spark DataFrame/SQL on Catalyst, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) the 100 TB design goal requires.

Layout:
    session.py     SparkSession builder tuned for local[32] tests / cluster prod
    schemas.py     explicit StructTypes for OpenMRS sources + flat targets
    config.py      engine constants (blob boundary/separator, concept domains)
    functions/     scalar layer: obs-map codec, decode ladders, text analysis
    operators/     reusable relational operators: ordered collect, upsert,
                   latest-per-group, dedup, similarity
    sources/       readers (parquet/jdbc) + watermark store
    plans/         the five reference pipeline stages as DataFrame builders
    streaming/     incremental (watermark/CDC-lite) + structured streaming
    engine.py      pipeline runner (topological order, sync/rebuild modes)
"""

__version__ = "0.1.0"
