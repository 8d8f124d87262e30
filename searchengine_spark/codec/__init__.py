from .varbyte import CODECS, decode, decode_raw, encode, encode_raw

__all__ = ["encode", "decode", "encode_raw", "decode_raw", "CODECS"]
