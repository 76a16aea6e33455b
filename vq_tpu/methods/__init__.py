from vq_tpu.methods.base import BaseQuantizer
from vq_tpu.methods.pq import PQ, PQParams
from vq_tpu.methods.sq import SQ, SQParams
from vq_tpu.methods.opq import OPQ, OPQParams
from vq_tpu.methods.rabitq import RaBitQ, RaBitQParams
from vq_tpu.methods.lvq import LVQ, LVQParams
from vq_tpu.methods.saq import SAQ, SAQParams, SAQPlan

__all__ = [
    "BaseQuantizer",
    "PQ", "PQParams",
    "SQ", "SQParams",
    "OPQ", "OPQParams",
    "RaBitQ", "RaBitQParams",
    "LVQ", "LVQParams",
    "SAQ", "SAQParams", "SAQPlan",
]
