from watermill_kinesis_spark.functions.exact import davg, dmul, dsum, money

__all__ = ["davg", "dmul", "dsum", "money"]
