from vq_tpu.viz.plot import plot

__all__ = ["plot"]
