"""magshield_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of
``hussain-magshield/magshield_data_pipeline`` (an Azure Functions CRM ETL
pipeline: paginated REST scans, broadcast lookup joins, join fan-out,
nested-array custom-field flattening, conditional counts, date/string
formatting, full-row dedup, Excel upsert sink) as idiomatic Spark
DataFrame operations, and extends the surface with scale-oriented
operators (exact/fuzzy dedup, embedding similarity search, text
analysis, multimodal column plumbing, Structured Streaming windows)
designed for 100 TB workloads.

Layout:
    session      SparkSession factory tuned for the engine
    schemas      explicit StructTypes for CRM-shaped entities
    functions/   scalar column-expression library (SURVEY §2.4 F1–F14)
    sources/     parquet/csv/excel/rest readers (SURVEY §2.1 S1–S8)
    sinks/       excel bridge + overwrite-by-name upsert (SURVEY §2.2)
    operators/   export pipelines, dedup, similarity, text analysis
    plans/       oracle-checked analytical queries over the test star schema
    streaming/   event-time windows, watermarks, sessionization
"""

__version__ = "0.1.0"
