from vq_tpu.index.base import BaseSearchIndex
from vq_tpu.index.flat import FlatQuantizedIndex

__all__ = ["BaseSearchIndex", "FlatQuantizedIndex"]
