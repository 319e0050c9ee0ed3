"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference pipeline
``CAPSTONE-MIBA-G03/MIBA-2023-CAPSTONE-RB-NLP`` (see SURVEY.md).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Arrow pandas UDFs only where built-ins cannot express the
semantics, MLlib for clustering, Structured Streaming for ingest.
"""

from miba_2023_capstone_rb_nlp_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
