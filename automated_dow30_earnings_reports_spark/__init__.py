"""PySpark-native analytics engine with the query and data-processing
capabilities of BigDataIA-TeamRSS/automated-dow30-earnings-reports.

Spark-first re-expression of the reference's operator inventory
(SURVEY.md §2) plus the LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) mandated by BASELINE.json.

Layout:
    session     SparkSession factory with scale-oriented defaults
    schemas     explicit StructTypes for every record type (SURVEY §1)
    tables      star-schema / documents / embeddings loaders
    functions/  scalar column-expression library (SURVEY §2.7)
    operators/  link analytics, dedup, similarity, top-k, rollups
    sources/    CSV / key-value text / nested JSON / binary readers
    plans/      flagship relational queries over the star schema
    streaming/  Structured Streaming surface (windows, sessions, CDC-ish)
    pipeline/   effectful stages (fetch / LLM-extract / download) with
                deterministic fakes for tests
"""

__version__ = "0.1.0"
