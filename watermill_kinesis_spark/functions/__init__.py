from watermill_kinesis_spark.functions.exact import (
    davg,
    dsum,
    dsum_expr,
    factor,
    money,
    sql_davg,
    sql_dsum,
    sql_factor,
    sql_money,
)

__all__ = [
    "davg",
    "dsum",
    "dsum_expr",
    "factor",
    "money",
    "sql_davg",
    "sql_dsum",
    "sql_factor",
    "sql_money",
]
