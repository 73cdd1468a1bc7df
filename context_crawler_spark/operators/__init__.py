"""Dataflow operators of the frontier scheduler (SURVEY.md §2).

Each module is one operator family, expressed Spark-first: built-in
``pyspark.sql.functions`` on the scheduling path (JVM, whole-stage codegen),
Arrow-batched pandas UDFs only where semantics require Python
(HTML extraction, fingerprints).
"""
