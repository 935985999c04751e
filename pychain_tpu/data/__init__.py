from .bucketing import BucketSpec, LengthBucketer, pad_to_bucket

__all__ = ["BucketSpec", "LengthBucketer", "pad_to_bucket"]
