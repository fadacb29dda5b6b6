"""projet_meteo_etl_spark — a PySpark-native analytics + ETL/data-quality engine.

A from-scratch re-expression of the capabilities of
``dongmofr2000/projet-meteo-etl`` (a pandas → MongoDB weather ETL with a
data-quality audit vocabulary; see ``/root/reference/etl_meteo.py``),
re-designed Spark-first:

* sources: quirky CSV (sep=';', latin-1, junk unit row), nested JSON
  (map-of-arrays), Parquet catalog over TPC-H-ish tables;
* a pure Column-expression cleaning/conversion library (no Python UDFs in
  the hot path — everything stays inside WholeStageCodegen);
* a declarative data-quality suite (count / null / type / range / unique /
  date-range expectations) computed as fused single-pass aggregations;
* relational breadth (joins, windows, aggregations, set ops) expressed as
  DataFrame plans that Catalyst optimizes;
* large-scale training-data-pipeline operators: dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard, embedding-cosine), similarity search, text
  analysis, multimodal column plumbing.

Everything is built on public Apache Spark APIs only.
"""

from projet_meteo_etl_spark.session import get_spark
from projet_meteo_etl_spark.catalog import load_tables

__all__ = ["get_spark", "load_tables"]

__version__ = "0.1.0"
