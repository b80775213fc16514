"""mapreduce_4_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference MapReduce engine (vssundararaman/MapReduce-4,
surveyed in SURVEY.md): a per-file word-count MapReduce pipeline generalized
into a full DataFrame/SQL operator inventory, plus the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis) the
north star demands — all designed for a 1000-executor / 100 TB deployment
even though tests run on local[32].

Layout
------
- ``session``    SparkSession factory with scale-aware defaults
- ``registry``   query registry: name -> (DataFrame builder, DuckDB oracle SQL)
- ``sources``    readers for the test tables, text dirs, binary files
- ``functions``  column-expression helpers (text cleaning, vector math)
- ``operators``  composite operators (dedup, similarity, top-k, as-of)
- ``plans``      the registered queries (importing it populates the registry)
- ``streaming``  Structured Streaming pipelines over the events table
"""

__version__ = "0.1.0"
