"""Column-level function libraries: weather fidelity transforms, text
analysis, vector math. All built-in ``pyspark.sql.functions`` compositions —
no Python UDFs in any hot path."""
