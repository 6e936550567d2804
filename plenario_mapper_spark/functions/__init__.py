from plenario_mapper_spark.functions import coercion, text, vector  # noqa: F401
