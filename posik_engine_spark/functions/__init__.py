from posik_engine_spark.functions.tokenizer import (  # noqa: F401
    tokenize_expr,
    tokenize_py,
    tokenize_udf,
    tokenize_sql_duckdb,
)
