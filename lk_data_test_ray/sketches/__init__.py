from .hll import HyperLogLog  # noqa: F401
from .bloom import BloomFilter  # noqa: F401
from .tdigest import TDigest  # noqa: F401
from .topk import ApproxTopK  # noqa: F401
from .cms import CountMin  # noqa: F401
