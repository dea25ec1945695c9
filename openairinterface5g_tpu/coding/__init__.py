from . import crc, ldpc, rate_matching, segmentation  # noqa: F401
