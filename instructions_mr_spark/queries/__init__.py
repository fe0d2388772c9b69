"""Query inventory (SURVEY.md §2) — each module registers Spark
callables + DuckDB oracle SQL via instructions_mr_spark.registry."""
