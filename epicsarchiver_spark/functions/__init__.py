from epicsarchiver_spark.functions import hashing, scalar, text, vector  # noqa: F401
