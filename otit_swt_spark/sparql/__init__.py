from otit_swt_spark.sparql.parser import parse_query
from otit_swt_spark.sparql import algebra

__all__ = ["parse_query", "algebra"]
