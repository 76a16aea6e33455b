from vq_tpu.index.base import BaseSearchIndex
from vq_tpu.index.flat import FlatQuantizedIndex
from vq_tpu.index.ivf import IvfQuantizedIndex

__all__ = ["BaseSearchIndex", "FlatQuantizedIndex", "IvfQuantizedIndex"]
