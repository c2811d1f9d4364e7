"""fuzzy_item_matching_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the `databricks-industry-solutions/fuzzy-item-matching` reference
(see SURVEY.md): relational core, array-native text featurization
(tokenize / stopwords / n-grams / TF-IDF / normalize), vector math,
similarity joins (exact + LSH), dedup, ANN top-k, ML scoring surface,
incremental upsert, and a streaming extension.

Everything is expressed Spark-first: DataFrame/SQL plans that Catalyst
optimizes (predicate pushdown, broadcast joins, whole-stage codegen),
with Pandas UDFs only where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from fuzzy_item_matching_spark.session import get_spark  # noqa: F401
from fuzzy_item_matching_spark.tables import TABLE_NAMES, load_tables  # noqa: F401
