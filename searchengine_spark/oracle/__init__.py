from .pyoracle import OracleIndex

__all__ = ["OracleIndex"]
