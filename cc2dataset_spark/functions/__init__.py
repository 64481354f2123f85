from cc2dataset_spark.functions import links, text, vectors

__all__ = ["links", "text", "vectors"]
