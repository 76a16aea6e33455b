from vq_tpu.methods.base import BaseQuantizer
from vq_tpu.methods.pq import PQ, PQParams
from vq_tpu.methods.sq import SQ, SQParams
from vq_tpu.methods.opq import OPQ, OPQParams

__all__ = ["BaseQuantizer", "PQ", "PQParams", "SQ", "SQParams", "OPQ", "OPQParams"]
