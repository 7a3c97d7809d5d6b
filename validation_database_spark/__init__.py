"""validation_database_spark — a PySpark-native analytics / reconciliation engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference tool ``raffiainuls/validation-database`` (a pandas-based
cross-database reconciliation CLI), extended with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication,
similarity search, multimodal column plumbing, and text analysis.

Design principles (see SURVEY.md):
- DataFrame/SQL declarative plans; Catalyst picks physical strategies.
- No driver-side materialization in engine paths (no collect/toPandas).
- Built-in ``pyspark.sql.functions`` in the hot path; Arrow-batched
  pandas UDFs only where semantics require Python (fuzzy ratio).
- Null/coercion semantics match the reference's pandas
  ``errors='coerce'`` behavior via ``try_cast`` / ``try_to_timestamp``
  (explicit, independent of ``spark.sql.ansi.enabled``).
"""

__version__ = "0.1.0"
